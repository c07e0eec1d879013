"""Explicit lifecycle for lineage-cut checkpoints.

The iterative algorithms (Pregel-style CC, parity propagation, streaming
refinement) call ``localCheckpoint()`` every round to stop plan growth.
Spark pins each checkpoint's RDD in storage memory, and
``DataFrame.unpersist()`` does NOT release it (it only clears
cache-manager entries; a checkpoint scan is a ``LogicalRDD``, not a
cached query). Without explicit release, every round leaks a block until
the JVM's periodic GC lets the ContextCleaner find it — default every 30
minutes, far too slow when a 100 TB job checkpoints per iteration.

``free_checkpoint`` walks the analyzed plan and unpersists the RDD behind
every ``LogicalRDD`` scan it finds (verified: the entry leaves
``SparkContext.getPersistentRDDs`` immediately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _collect_logical_rdds(plan, out: list) -> None:
    if plan.getClass().getSimpleName() == "LogicalRDD":
        out.append(plan)
        return
    children = plan.children()
    for i in range(children.length()):
        _collect_logical_rdds(children.apply(i), out)


def free_checkpoint(df: DataFrame) -> int:
    """Release the storage blocks behind every ``localCheckpoint()`` scan
    in ``df``'s plan. Returns the number of checkpoint RDDs freed.

    Only call once every consumer of those checkpoints has been
    materialized — the lineage is gone, so reading them afterwards fails
    rather than recomputes. Never call it on a DataFrame whose checkpoint
    is shared with a plan that still needs to run.
    """
    freed = 0
    try:
        nodes: list = []
        _collect_logical_rdds(df._jdf.queryExecution().analyzed(), nodes)  # noqa: SLF001
        for node in nodes:
            node.rdd().unpersist(False)
            freed += 1
    except Exception:
        pass
    return freed
