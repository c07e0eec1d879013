"""Run streaming queries to completion (test/parity harness).

The reference's ITCases execute a bounded stream through the Flink
mini-cluster and string-compare the sink file
(REF:src/test/java/org/apache/flink/graph/streaming/test/ [M]). The Spark
equivalent: drive the streaming query with an available-now trigger (all
pending data, then stop) into a memory sink or a ``foreachBatch``
callback, and compare the *final state* to the batch answer — emission
granularity is per micro-batch, not per record (documented semantic delta
D1, SURVEY.md §7.4).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "complete",
    name: Optional[str] = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame with an available-now trigger into a
    memory sink; return the sink table as a batch DataFrame.

    ``complete`` mode is the parity default for aggregations: the memory
    table holds exactly the final aggregate state. Use ``append`` for
    row-stream operators (dedup, filters, windowed aggs past watermark).
    """
    name = name or f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return sdf.sparkSession.table(name)


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
    q = (
        sdf.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
