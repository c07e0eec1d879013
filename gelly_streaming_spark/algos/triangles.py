"""Triangle counting — exact, windowed, and sampled-estimate.

Reference parity: example/ExactTriangleCount.java (per-vertex adjacency
state + neighborhood intersection, REF:.../example/ExactTriangleCount.java:~40-160 [M]),
example/WindowTriangles.java (per-window candidate/closing-edge matching,
REF:.../example/WindowTriangles.java:~60-170 [M]), and the one-pass
sampling estimators (BroadcastTriangleCount / IncidenceSamplingTriangleCount
[M], Buriol-style).

Spark-first: the batch-exact formulation is the canonical two-join plan
over id-canonicalized edges (src < dst, distinct) — every triangle
(x < y < z) is counted exactly once as (x,y)⋈(y,z)⋈(x,z). Catalyst/AQE
picks the join strategy; both joins are equi-joins that shuffle once on
the wedge key. The windowed variant adds the window bucket to every join
key, which also co-partitions by window — wedge state never crosses
windows (the reference gets the same isolation from per-window state).
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


def triangle_count(stream: GraphStream) -> DataFrame:
    """Exact global triangle count: one row (n_triangles)."""
    e = _canonical(stream.edges)
    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    wedges = a.join(b, F.col("a.dst") == F.col("b.src"))
    tri = wedges.join(
        c,
        (F.col("c.src") == F.col("a.src")) & (F.col("c.dst") == F.col("b.dst")),
        "left_semi",
    )
    return tri.groupBy().agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_count_windowed(stream: GraphStream, size: str = "1 day") -> DataFrame:
    """Triangles whose three edges share one tumbling window:
    rows (bucket, n_triangles)."""
    e = _canonical(
        stream.edges.withColumn("bucket", F.window("ts", size).start),
        extra_keys=["bucket"],
    )
    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    wedges = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.dst") == F.col("b.src")),
    )
    tri = wedges.join(
        c,
        (F.col("c.bucket") == F.col("a.bucket"))
        & (F.col("c.src") == F.col("a.src"))
        & (F.col("c.dst") == F.col("b.dst")),
        "left_semi",
    )
    return tri.groupBy(F.col("a.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


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
