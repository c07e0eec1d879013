"""Incremental (streaming) connected components & bipartiteness.

Reference parity: library/ConnectedComponents.java — a windowed
union-find summary aggregation: per-window partial ``DisjointSet`` folds,
globally merged each merge-window, state persisted across windows so the
mapping continuously refines (REF:src/main/java/org/apache/flink/graph/
streaming/library/ConnectedComponents.java:~30 [H]; WindowGraphAggregation
run(): keyBy → window fold → timeWindowAll → reduce,
REF:.../WindowGraphAggregation.java:~70-110 [M]). Also
example/IterativeConnectedComponents.java (streaming min-label iteration
with a feedback edge, REF:.../example/IterativeConnectedComponents.java [M]).

Spark has no streaming iteration, so the engine runs the refinement in
``foreachBatch`` (SURVEY.md §7.4.H2): per micro-batch, the new edges are
unioned with the *contracted* previous state — the (vertex → component)
mapping itself, viewed as edges — and a batch min-label fixpoint runs on
that graph. Correctness: contracting a subgraph to its components
preserves the components of the union, so after every batch the mapping
equals batch CC over all edges seen so far.

Scale: state between batches is O(#vertices) rows (the mapping), never
the edge history, and it stays a distributed DataFrame — no driver
materialization. Each refinement's cost is driven by the *new* edges plus
|V| mapping edges; the reference instead funnels every partial forest
through one parallelism-1 subtask per window (its H1 bottleneck).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.algos.connected_components import connected_components
from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.plans.memory import free_checkpoint
from gelly_streaming_spark.streaming.runner import run_foreach_batch


def _is_local_relation(df: DataFrame) -> bool:
    """True when the frame's analyzed plan is a pure driver-local relation
    (createDataFrame rows) — no executor lineage to cut or leak."""
    try:
        return (
            df._jdf.queryExecution().analyzed().getClass().getSimpleName()  # noqa: SLF001
            == "LocalRelation"
        )
    except Exception:
        return False


class IncrementalConnectedComponents:
    """Continuously-refined CC over an unbounded edge stream.

    After each micro-batch, ``state`` holds the (id, component) mapping
    for every vertex seen — equal to batch CC over all edges so far.
    """

    def __init__(self):
        self.state: Optional[DataFrame] = None
        self.batches: int = 0

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("src", "dst")
        if self.state is not None:
            prev_as_edges = self.state.select(
                F.col("id").alias("src"), F.col("component").alias("dst")
            )
            new_edges = new_edges.unionByName(prev_as_edges)
        mapping = connected_components(GraphStream(new_edges))
        # pin the refined mapping; cut lineage so plans don't grow per
        # batch. The adaptive fast path returns a DRIVER-LOCAL relation
        # (createDataFrame rows): nothing to cut, nothing that can leak —
        # checkpointing it would spend a whole job storing rows that are
        # already local, so it is kept as-is.
        prev = self.state
        if _is_local_relation(mapping):
            self.state = mapping
        else:
            self.state = mapping.localCheckpoint()
            free_checkpoint(mapping)  # CC's own final checkpoint, now copied
        if prev is not None:
            free_checkpoint(prev)
        self.batches += 1

    def run(self, edge_stream: DataFrame, timeout_sec: int = 300) -> DataFrame:
        """Consume all available micro-batches; return the final mapping."""
        run_foreach_batch(edge_stream, self._on_batch, timeout_sec=timeout_sec)
        assert self.state is not None, "stream produced no batches"
        return self.state


class IncrementalBipartiteness:
    """Streaming odd-cycle detection (library/BipartitenessCheck.java [H]).

    State: (id, component, parity) — a 2-coloring certificate per seen
    vertex — plus a sticky per-component conflict flag. Per batch the new
    edges are checked against / merged with the coloring: the previous
    state is contracted into parity-preserving virtual edges (parity 0 ⇒
    even path ⇒ two edges via a virtual midpoint; parity 1 ⇒ one edge)
    and the batch parity-propagation fixpoint reruns on the contraction.
    A component once failed stays failed (odd cycles never disappear),
    matching the reference's ``Candidates(false)`` absorbing state.
    """

    #: virtual-midpoint ids live at/above this. They must be HIGHER than
    #: every real vertex id: min-label propagation picks the minimum
    #: reachable id as a component's label, and a virtual label would (a)
    #: be dropped from carried state, losing the component, and (b) never
    #: match any ``state.id`` in the failed-set remap — a detected odd
    #: cycle could silently "heal" on the next batch. Documented operator
    #: contract: real vertex ids are non-negative and < 2^40.
    _VIRTUAL_BASE = 1 << 40

    def __init__(self):
        self.state: Optional[DataFrame] = None  # (id, comp, parity)
        self.failed: Optional[DataFrame] = None  # (component,) absorbing

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from gelly_streaming_spark.algos.bipartiteness import bipartiteness_check

        edges = batch_df.select("src", "dst")
        if self.state is not None:
            odd = self.state.where(F.col("parity") == 1).select(
                F.col("id").alias("src"), F.col("comp").alias("dst")
            )
            even = self.state.where(
                (F.col("parity") == 0) & (F.col("id") != F.col("comp"))
            )
            mid = (self._VIRTUAL_BASE + F.col("id")).alias("midpoint")
            even_half1 = even.select(F.col("id").alias("src"), mid.alias("dst"))
            even_half2 = even.select(
                (self._VIRTUAL_BASE + F.col("id")).alias("src"),
                F.col("comp").alias("dst"),
            )
            edges = edges.unionByName(odd).unionByName(even_half1).unionByName(
                even_half2
            )

        result = bipartiteness_check(GraphStream(edges), return_labels=True)
        labels, verdict = result
        # drop virtual midpoints from carried state
        prev_state = self.state
        self.state = labels.where(
            F.col("id") < self._VIRTUAL_BASE
        ).localCheckpoint()
        newly_failed = verdict.where(~F.col("is_bipartite")).select("component")
        if self.failed is None:
            self.failed = newly_failed.localCheckpoint()
        else:
            # remap old failed roots through the refined mapping: a failed
            # component's root vertex now carries the merged component id
            old_failed = self.failed
            remapped = (
                old_failed.join(
                    self.state, old_failed.component == self.state.id, "left"
                )
                .select(
                    F.coalesce(F.col("comp"), F.col("component")).alias("component")
                )
            )
            self.failed = (
                remapped.unionByName(newly_failed).distinct().localCheckpoint()
            )
            free_checkpoint(old_failed)
        # every consumer of this batch's inputs has materialized: release
        # the superseded coloring state and this batch's internal coloring
        # (verdict reads prev_state via the contraction edges, so the old
        # state must outlive the failed-set computation above)
        if prev_state is not None:
            free_checkpoint(prev_state)
        free_checkpoint(labels)

    def run(self, edge_stream: DataFrame, timeout_sec: int = 300) -> DataFrame:
        """Consume the stream; return (component, is_bipartite) for every
        final component."""
        run_foreach_batch(edge_stream, self._on_batch, timeout_sec=timeout_sec)
        assert self.state is not None, "stream produced no batches"
        comps = self.state.select(F.col("comp").alias("component")).distinct()
        failed = (self.failed or comps.limit(0)).withColumn(
            "is_bipartite", F.lit(False)
        )
        return comps.join(failed, "component", "left").select(
            "component", F.coalesce("is_bipartite", F.lit(True)).alias("is_bipartite")
        )
