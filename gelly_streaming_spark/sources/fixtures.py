"""Canonical graph fixtures G1–G5 (FIXTURES.md §2).

G1 is the reference's golden operation-test graph (the 5-vertex Gelly test
graph reused across its per-operator ITCases — SURVEY.md §5.1, citation
REF:src/test/java/org/apache/flink/graph/streaming/test/operations/ [M]).
G2–G4 are the bipartiteness / connected-components fixtures; G5 is the
driver-seeded synthetic power-law graph for property and scale tests.

Each listed edge i (0-based) gets ``ts = 2024-01-01 00:00:00 + i minutes``
so batch and streaming replays see identical event time.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_T0 = _dt.datetime(2024, 1, 1, 0, 0, 0)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# G1 — Gelly 5-vertex test graph: n=5 m=7, triangles {1,2,3} {3,4,5} {1,3,5},
# one component.
G1 = [(1, 2, 12.0), (1, 3, 13.0), (2, 3, 23.0), (3, 4, 34.0), (3, 5, 35.0), (4, 5, 45.0), (5, 1, 51.0)]

# G2 — bipartite K3,3 ({1,2,3} × {4,5,6}); bipartite=true, 0 triangles.
G2 = [(l, r, None) for l in (1, 2, 3) for r in (4, 5, 6)]

# G3 — odd cycle + pendant; bipartite=false, 1 triangle, 1 component.
G3 = [(1, 2, None), (2, 3, None), (3, 1, None), (3, 4, None)]

# G4 — two components: {1,2,3}→1, {10,11,12}→10.
G4 = [(1, 2, None), (2, 3, None), (10, 11, None), (11, 12, None), (12, 10, None)]

FIXTURE_GRAPHS: dict[str, list[tuple]] = {"g1": G1, "g2": G2, "g3": G3, "g4": G4}


def fixture_rows(name: str) -> list[tuple]:
    """Edge rows (src, dst, val, ts) in arrival order."""
    return [
        (s, d, v, _T0 + _dt.timedelta(minutes=i))
        for i, (s, d, v) in enumerate(FIXTURE_GRAPHS[name])
    ]


def fixture_graph(spark: SparkSession, name: str) -> DataFrame:
    """Fixture as a true LocalRelation (SQL ``VALUES``): a
    ``createDataFrame`` over a Python list parallelizes ≤9 rows into
    ``defaultParallelism`` RDD slices, so every downstream collect or
    Arrow staging launched a 32-task scan plus Python-worker
    deserialization per slice; the ``VALUES`` form is driver-local data
    the whole way down and its casts constant-fold."""
    return spark.sql(
        "SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst, "
        "CAST(val AS DOUBLE) AS val, CAST(ts AS TIMESTAMP) AS ts "
        f"FROM {fixture_values_sql(name)}"
    )


def fixture_values_sql(name: str) -> str:
    """The same fixture as a portable SQL VALUES list (for the DuckDB oracle)."""
    rows = ", ".join(
        f"({s}, {d}, {('NULL' if v is None else v)}, TIMESTAMP '{ts:%Y-%m-%d %H:%M:%S}')"
        for s, d, v, ts in fixture_rows(name)
    )
    return f"(VALUES {rows}) AS t(src, dst, val, ts)"


def g5_powerlaw(spark: SparkSession, n_vertices: int = 10_000, n_edges: int = 50_000, seed: int = 42) -> DataFrame:
    """G5 — synthetic power-law graph, deterministic (seed=42).

    src ~ Zipf(s=1.1) over 1..n, dst uniform 1..n, self-loops dropped,
    val = (src*31+dst) % 1000, ts ascending 1 s apart. Generated with
    seeded numpy ON THE DRIVER and shipped via createDataFrame — fine
    for its test/micro-bench role at ≤O(100k) edges, NOT a pattern for
    corpus-scale data (generate via spark.range + column hashes there).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    # Zipf via inverse-CDF over a precomputed table (bounded support).
    ranks = np.arange(1, n_vertices + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    src = rng.choice(n_vertices, size=int(n_edges * 1.2), p=probs) + 1
    dst = rng.integers(1, n_vertices + 1, size=int(n_edges * 1.2))
    keep = src != dst
    src, dst = src[keep][:n_edges], dst[keep][:n_edges]
    rows = [
        (int(s), int(d), float((s * 31 + d) % 1000), _T0 + _dt.timedelta(seconds=int(i)))
        for i, (s, d) in enumerate(zip(src, dst))
    ]
    return spark.createDataFrame(rows, EDGE_SCHEMA)
