"""Triangle counting — exact, windowed, and sampled-estimate.

Reference parity: example/ExactTriangleCount.java (per-vertex adjacency
state + neighborhood intersection, REF:.../example/ExactTriangleCount.java:~40-160 [M]),
example/WindowTriangles.java (per-window candidate/closing-edge matching,
REF:.../example/WindowTriangles.java:~60-170 [M]), and the one-pass
sampling estimators (BroadcastTriangleCount / IncidenceSamplingTriangleCount
[M], Buriol-style).

Spark-first: the exact plan is DEGREE-ORDERED edge-iterator counting
(compact-forward / Latapy orientation): orient each canonical edge from
its lower-(degree, id) endpoint to the higher one, build each vertex's
sorted higher-neighbor array once, then count per edge (u,v) the size of
N⁺(u) ∩ N⁺(v) with a JVM array_intersect — every triangle x≺y≺z is
found exactly once, at its (x,y) edge. The orientation bounds every
adjacency array at O(√m) entries regardless of hub skew, and — unlike
the join-based wedge plan, which materialized 41M wedge rows at sf0.1
(measured: 25 s naive, 10 s degree-ordered) — nothing wider than the
edge list is ever shuffled: the adjacency table (one row per vertex) is
broadcast and edges stream through two hash probes + an in-core
intersection. The windowed variant adds the window bucket to every key,
which also co-partitions by window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.operators.graphstream import GraphStream


def _canonical(edges: DataFrame, extra_keys: list[str] | None = None) -> DataFrame:
    keys = extra_keys or []
    return (
        edges.select(
            *keys,
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _oriented_triangles(e: DataFrame, keys: list[str]) -> DataFrame:
    """Rows = one per triangle (keyed by ``keys``), via degree orientation.
    ``e`` must be canonical (src<dst, distinct) with ``keys`` columns."""
    # e feeds degrees + both wedge sides: materialize once instead of
    # re-deriving the upstream plan (e.g. the co-purchase self-join) 5x.
    e = e.localCheckpoint()
    deg = (
        e.select(*keys, F.explode(F.array("src", "dst")).alias("id"))
        .groupBy(*keys, "id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # deg has one row per (keys, vertex) — orders of magnitude smaller
    # than the wedge volume; broadcast both degree joins.
    ed = (
        e.join(
            deg.select(*keys, F.col("id").alias("src"), F.col("d").alias("ds")).hint("broadcast"),
            [*keys, "src"],
        )
        .join(
            deg.select(*keys, F.col("id").alias("dst"), F.col("d").alias("dd")).hint("broadcast"),
            [*keys, "dst"],
        )
    )
    low_first = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    o = ed.select(
        *keys,
        F.when(low_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(low_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
    ).localCheckpoint()  # feeds the adjacency build + the edge stream
    adj = o.groupBy(*keys, "u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    au = adj.select(*keys, "u", F.col("nbrs").alias("nu"))
    av = adj.select(*keys, F.col("u").alias("v"), F.col("nbrs").alias("nv"))
    per_edge = (
        o.join(au.hint("broadcast"), [*keys, "u"])
        .join(av.hint("broadcast"), [*keys, "v"], "left")
        .select(
            *keys,
            F.when(F.col("nv").isNull(), F.lit(0))
            .otherwise(F.size(F.array_intersect(F.col("nu"), F.col("nv"))))
            .alias("tri"),
        )
    )
    return per_edge


def triangle_count(stream: GraphStream) -> DataFrame:
    """Exact global triangle count: one row (n_triangles)."""
    per_edge = _oriented_triangles(_canonical(stream.edges), keys=[])
    return per_edge.groupBy().agg(
        F.coalesce(F.sum("tri"), F.lit(0)).alias("n_triangles")
    )


def triangle_count_windowed(
    stream: GraphStream,
    size: str = "1 day",
    strategy: str = "auto",
    per_window_limit: int = 500_000,
) -> DataFrame:
    """Triangles whose three edges share one tumbling window:
    rows (bucket, n_triangles).

    Windows are independent subproblems, so two physical strategies:

    - ``"partitioned"``: one shuffle on the window key, count each
      window in-task (id-ordered adjacency intersection over Arrow
      batches). Optimal while every window fits a task.
    - ``"joins"``: the degree-ordered broadcast-join plan (shared with
      the global count) — windows larger than a task's memory stay
      distributed. The scale-safe default for unbounded window sizes.
    - ``"auto"``: one cheap max-window-size aggregation picks between
      them (the AQE move: choose the physical plan from data stats).
    """
    e = _canonical(
        stream.edges.withColumn("bucket", F.window("ts", size).start),
        extra_keys=["bucket"],
    )
    if strategy == "auto":
        # materialize once: the stats probe and the chosen strategy both
        # consume the canonicalized edges (else the dedup runs twice)
        e = e.localCheckpoint()
        mx = (
            e.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"))
            .collect()[0]["m"]
        )
        strategy = "partitioned" if (mx or 0) <= per_window_limit else "joins"

    if strategy == "partitioned":
        import pandas as pd

        def count_tri(pdf: pd.DataFrame) -> pd.DataFrame:
            nbr: dict = {}
            edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
            for u, v in edges:  # canonical src<dst ⇒ id-oriented N⁺
                nbr.setdefault(u, set()).add(v)
            t = 0
            empty: set = set()
            for u, v in edges:
                t += len(nbr.get(u, empty) & nbr.get(v, empty))
            return pd.DataFrame(
                {"bucket": [pdf["bucket"].iloc[0]], "n_triangles": [t]}
            )

        out = e.groupBy("bucket").applyInPandas(
            count_tri, "bucket timestamp, n_triangles long"
        )
    else:
        per_edge = _oriented_triangles(e, keys=["bucket"])
        out = per_edge.groupBy("bucket").agg(F.sum("tri").alias("n_triangles"))
    return out.where(F.col("n_triangles") > 0)


def triangle_count_estimate(
    stream: GraphStream, sample_fraction: float = 0.1, seed: int = 42
) -> DataFrame:
    """One-pass style estimate (reference sampling examples, P2):
    sample edges Bernoulli(p), count triangles with ≥1 sampled base edge
    closed by full edges, scale by 1/p. Stochastic — property-tested with
    a tolerance, never hash-compared. Scale: the sampled side is tiny ⇒
    broadcast join against the full edge set (the reference's
    BroadcastTriangleCount pattern)."""
    e = _canonical(stream.edges).localCheckpoint()
    s = e.sample(fraction=sample_fraction, seed=seed)
    a, b, c = s.alias("a"), e.alias("b"), e.alias("c")
    wedges = a.hint("broadcast").join(b, F.col("a.dst") == F.col("b.src"))
    tri = wedges.join(
        c,
        (F.col("c.src") == F.col("a.src")) & (F.col("c.dst") == F.col("b.dst")),
        "left_semi",
    )
    return tri.groupBy().agg(
        F.round(F.count(F.lit(1)) / sample_fraction, 2).alias("est_triangles")
    )
