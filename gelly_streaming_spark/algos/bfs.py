"""Bounded-horizon BFS (k-hop distances) — extension algorithm.

The reference library has no shortest-path operator (SURVEY §2.9: CC /
bipartiteness / spanner; its spanner keeps a BFS inside the summary
merge but never exposes distances). This extension exposes the k-hop
neighborhood distance map — the graph-feature-extraction primitive
(hop-bounded reachability, influence radii, seed-set expansion) — as a
frontier-parallel Pregel loop on the batch-CC machinery.

Semantics (the certified q57 contract): undirected ("all"), out- or
in-directed hop distance from a source vertex set, bounded at
``max_hops``; rows (id, dist) for exactly the vertices reached, dist 0
for sources. All arithmetic is integer — no float margins exist for
the cross-engine hash, unlike the cosine/PageRank families.

100 TB shape: each round joins the edge table against ONLY the current
frontier (the rows discovered last round, broadcast when small —
frontier-bounded work, never |V| per round), anti-joins out already-
settled vertices, and appends to the checkpointed distance table; the
loop exits early the round the frontier empties, detected as a side
observation of the checkpoint job that runs anyway (the CC convergence
trick — no extra count job)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.plans.memory import free_checkpoint


def bfs_distances(
    stream: GraphStream,
    sources: DataFrame,
    max_hops: int = 6,
    direction: str = "all",
) -> DataFrame:
    """Rows (id, dist): minimum hop count from any vertex in ``sources``
    (a 1-column id frame), capped at ``max_hops``. Unreached vertices
    emit no row."""
    if max_hops < 0:
        raise ValueError(f"bfs_distances: max_hops must be >= 0, got {max_hops}")
    if direction not in ("out", "in", "all"):
        raise ValueError(f"bfs_distances: direction must be out/in/all, got {direction!r}")
    e = stream.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if direction == "all":
        eu = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    elif direction == "in":
        eu = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    else:
        eu = e
    eu = eu.localCheckpoint()

    from pyspark.sql import Observation

    dist = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist
    try:
        for h in range(max_hops):
            msgs = (
                eu.join(frontier, eu["src"] == frontier["id"])
                .select(F.col("dst").alias("id"))
                .distinct()
            )
            new = msgs.join(dist, "id", "left_anti").withColumn(
                "dist", F.lit(h + 1)
            )
            obs = Observation()
            nxt = (
                dist.unionByName(new)
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint()
            )
            grew = obs.get["n"] > dist.count()
            free_checkpoint(dist)
            dist = nxt
            if not grew:
                break
            # next round's frontier = exactly the rows discovered this
            # round; reading them off the fresh checkpoint costs no
            # recompute
            frontier = dist.where(F.col("dist") == h + 1)
    finally:
        free_checkpoint(eu)
    return dist.select("id", "dist")
