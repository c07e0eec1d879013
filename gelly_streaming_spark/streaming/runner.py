"""Run streaming queries to completion (test/parity harness).

The reference's ITCases execute a bounded stream through the Flink
mini-cluster and string-compare the sink file
(REF:src/test/java/org/apache/flink/graph/streaming/test/ [M]). The Spark
equivalent: drive the streaming query with an available-now trigger (all
pending data, then stop) and compare the *final state* to the batch
answer — emission granularity is per micro-batch, not per record
(documented semantic delta D1, SURVEY.md §7.4).

``run_to_memory`` deliberately does NOT use Spark's memory sink: that
sink collects every batch's rows into driver memory (a complete-mode
aggregation re-collects the FULL state each micro-batch). Instead each
micro-batch is persisted executor-side via ``foreachBatch`` and the final
state is assembled as a union of persisted frames — the driver never
materializes rows, matching the engine's no-driver-funnel doctrine.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame


def _await(q, timeout_sec: int) -> None:
    try:
        # a False return means the trigger did NOT finish: surfacing a
        # partial sink table would masquerade as a wrong (or luckily
        # right) answer downstream — fail loudly instead.
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming query did not finish within {timeout_sec}s"
            )
    finally:
        q.stop()


_NO_DATA_CONF = "spark.sql.streaming.noDataMicroBatches.enabled"


def _needs_no_data_batch(sdf: DataFrame, output_mode: str) -> bool:
    """Does this sink's FINAL emission depend on a trailing no-data
    micro-batch advancing the watermark?

    Only append-mode plans whose emission is watermark-gated qualify:
    windowed/stateful aggregations (rows emitted when the watermark
    passes the window end) and state-timer operators. Immediate-emission
    operators (dedup, filters) and complete/update sinks emit everything
    with the last data batch — for those the trailing batch is pure
    fixed cost (measured 1.5–5 s per availableNow run) and is skipped.
    """
    if output_mode != "append":
        return False
    try:
        plan = sdf._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    except Exception:
        return True  # can't inspect — keep Spark's safe default
    if "EventTimeWatermark" not in plan:
        return False
    # Err toward Spark's safe default: any watermarked append plan keeps
    # the trailing batch UNLESS every stateful operator is known to emit
    # immediately (dedup evicts on watermark but emits on arrival).
    # "FlatMapGroups" matches both the Scala FlatMapGroupsWithState and
    # the Python FlatMapGroupsInPandasWithState (applyInPandasWithState)
    # nodes; "Join" covers watermark-gated outer stream-stream joins.
    gated = ("Aggregate", "FlatMapGroups", "TransformWithState", "Join")
    return any(g in plan for g in gated)


def _start(writer, spark, no_data: bool):
    """Start a streaming query with the no-data-batch conf pinned for the
    query's lifetime; restore the previous session value afterwards."""
    prev = spark.conf.get(_NO_DATA_CONF, "true")
    spark.conf.set(_NO_DATA_CONF, "true" if no_data else "false")
    try:
        return writer.start()
    finally:
        spark.conf.set(_NO_DATA_CONF, prev)


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "complete",
    name: Optional[str] = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame with an available-now trigger and
    return its final result as a batch DataFrame.

    ``complete`` mode (aggregations): the last micro-batch holds the full
    final state — earlier batches are unpersisted as they are superseded.
    ``append`` mode (row streams: dedup, filters, closed windows): the
    final result is the union of all emitted batches. ``update`` mode is
    NOT supported here: re-emitted keys would leave superseded rows in
    the union — drive update-mode sinks through ``run_update_merge``
    (keyed upsert) or ``run_foreach_batch`` with a caller-side merge.
    """
    from gelly_streaming_spark.plans.memory import free_checkpoint

    if output_mode not in ("complete", "append"):
        raise ValueError(
            "run_to_memory supports only complete/append output modes; "
            f"got {output_mode!r} (update-mode unions keep superseded rows "
            "— use run_update_merge, or run_foreach_batch with a keyed merge)"
        )
    del name  # kept for API compat with the old memory-sink signature
    batches: list[DataFrame] = []

    def _capture(bdf: DataFrame, _epoch: int) -> None:
        # localCheckpoint (eager) SEVERS the batch plan's lineage: the
        # incremental-execution plan reads state-store files that vanish
        # when the query's temp checkpoint is cleaned up on stop, so a
        # later action must never be able to recompute through it.
        ckpt = bdf.localCheckpoint()
        if output_mode == "complete":
            while batches:
                free_checkpoint(batches.pop())
        batches.append(ckpt)

    writer = (
        sdf.writeStream.foreachBatch(_capture)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    q = _start(writer, sdf.sparkSession, _needs_no_data_batch(sdf, output_mode))
    _await(q, timeout_sec)
    if not batches:
        return sdf.sparkSession.createDataFrame([], sdf.schema)
    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b)
    return out


def run_update_merge(
    sdf: DataFrame,
    key_cols: list[str],
    timeout_sec: int = 300,
    collapse_every: int = 8,
) -> DataFrame:
    """Execute an UPDATE-mode streaming aggregation with an available-now
    trigger and return the final upserted state.

    Update mode emits only the CHANGED aggregate rows each micro-batch
    (the reference's update-on-every-edge granularity, semantic delta D1
    batched per trigger — SURVEY.md §7.4); the final state is therefore
    the LAST emitted value per key. Each batch is keyed-upserted into the
    running state: ``new ∪ (prev ⟕̸ new)`` — an anti-join keeps only the
    un-updated previous keys, so re-emitted keys never leave superseded
    rows (the failure mode that makes a naive union wrong and is why
    ``run_to_memory`` rejects update mode and points here).

    Scale: state stays a distributed DataFrame keyed by ``key_cols``;
    per batch one anti-join + union composed LAZILY over per-batch
    checkpoints, collapsed (checkpoint + free superseded blocks) every
    ``collapse_every`` batches — never a driver materialization, never
    more than O(collapse_every) pinned batches.
    """
    from gelly_streaming_spark.plans.memory import free_checkpoint

    state: list[DataFrame] = []
    pinned: list[DataFrame] = []

    def _merge(bdf: DataFrame, _epoch: int) -> None:
        # Each batch is checkpointed ONCE (sever the incremental-exec
        # lineage before the query's temp checkpoint vanishes on stop);
        # the upsert itself stays a LAZY plan over those checkpoints —
        # merging eagerly re-checkpointed every round (one extra job per
        # batch) for state the caller reads only after the last trigger.
        # Every ``collapse_every`` batches the chain is collapsed to one
        # checkpoint and the superseded blocks freed, so an unbounded
        # stream pins O(collapse_every) batches, not its whole history.
        ckpt = bdf.localCheckpoint()
        pinned.append(ckpt)
        if state:
            prev = state.pop()
            state.append(ckpt.unionByName(prev.join(ckpt, key_cols, "left_anti")))
        else:
            state.append(ckpt)
        if len(pinned) >= collapse_every:
            merged = state.pop().localCheckpoint()
            while pinned:
                free_checkpoint(pinned.pop())
            pinned.append(merged)
            state.append(merged)

    writer = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    q = _start(writer, sdf.sparkSession, no_data=False)
    _await(q, timeout_sec)
    if not state:
        return sdf.sparkSession.createDataFrame([], sdf.schema)
    return state[0]


def run_foreach_batch(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    output_mode: str = "update",
    timeout_sec: int = 300,
) -> None:
    """Execute a streaming DataFrame available-now through ``foreachBatch``.

    The callback sees each micro-batch as a bounded DataFrame — the
    engine's escape hatch for patterns Structured Streaming can't express
    in-plan (iterative refinement, global summary merges; SURVEY.md §7.4.H2).
    """
    writer = (
        sdf.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    q = _start(writer, sdf.sparkSession, _needs_no_data_batch(sdf, output_mode))
    _await(q, timeout_sec)
