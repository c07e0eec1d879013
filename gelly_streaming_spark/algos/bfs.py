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


def _try_small_bfs(
    eu: DataFrame, sources: DataFrame, max_hops: int, small_input_rows: int
) -> DataFrame | None:
    """Adaptive small-graph fast path (the CC _try_small_union_find
    doctrine): one bounded Arrow collect of the directed adjacency plus
    one bounded collect of the source ids, then a driver-local
    deque-free BFS — a multi-round distributed frontier loop on a
    sub-100k-edge snapshot is all job-floor overhead (measured r12:
    2.0 s distributed vs ~0.3 s driver-local at sf0.1). Spills over the
    limit -> None, caller runs the distributed loop; tests force it
    with small_input_rows=0."""
    if small_input_rows <= 0:
        return None
    import pandas as pd

    from gelly_streaming_spark.plans.probe import bounded_take

    tbl = bounded_take(eu.select("src", "dst"), small_input_rows, as_arrow=True)
    if tbl.num_rows > small_input_rows:
        return None
    # the source set rides the same bound: a huge seed set over a tiny
    # graph must not flood the driver — spill over -> distributed path
    stbl = bounded_take(
        sources.select(sources.columns[0]).distinct(),
        small_input_rows,
        as_arrow=True,
    )
    if stbl.num_rows > small_input_rows:
        return None
    adj: dict = {}
    for a, b in zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist()):
        adj.setdefault(a, []).append(b)
    dist = {v: 0 for v in stbl.column(0).to_pylist()}
    frontier = list(dist)
    for h in range(max_hops):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h + 1
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    pdf = pd.DataFrame(sorted(dist.items()), columns=["id", "dist"])
    return eu.sparkSession.createDataFrame(pdf, "id long, dist int")


def bfs_distances(
    stream: GraphStream,
    sources: DataFrame,
    max_hops: int = 6,
    direction: str = "all",
    small_input_rows: int = 100_000,
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
    small = _try_small_bfs(eu, sources, max_hops, small_input_rows)
    if small is not None:
        return small
    eu = eu.localCheckpoint()

    from pyspark.sql import Observation

    dist = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    # settled-row count, carried across rounds so frontier-emptiness
    # detection costs ZERO extra jobs (each round's count rides the
    # checkpoint job's observation; the previous round's value is the
    # comparison baseline)
    prev_n = dist.count()
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
            n = obs.get["n"]
            free_checkpoint(dist)
            dist = nxt
            if n == prev_n:
                break
            prev_n = n
            # next round's frontier = exactly the rows discovered this
            # round; reading them off the fresh checkpoint costs no
            # recompute
            frontier = dist.where(F.col("dist") == h + 1)
    finally:
        free_checkpoint(eu)
    return dist.select("id", "dist")
