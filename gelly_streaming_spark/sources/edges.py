"""Derived edge views over the driver testdata (FIXTURES.md §3).

Each builder returns an edge DataFrame with the engine's canonical schema
``(src LONG, dst LONG, val DOUBLE, ts TIMESTAMP)`` (plus extra columns
where noted). ID namespaces are offset so vertex ids never collide across
entity types (customers < 1e6, orders 1e6+, parts 2e6+).

These are the Spark twins of the DuckDB oracle CTEs in queries.py — keep
both in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gelly_streaming_spark.sources.tables import load_table

ORDER_OFFSET = 1_000_000
PART_OFFSET = 2_000_000
EVENT_DST_OFFSET = 100_000


def edges_cust_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer→order graph (reference-style edge stream)."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("src"),
        (F.lit(ORDER_OFFSET) + F.col("o_orderkey")).alias("dst"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderdate").alias("ts"),
    )


def edges_order_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite order→part graph; keeps the discount as an edge attribute."""
    return load_table(spark, sf_dir, "lineitem").select(
        (F.lit(ORDER_OFFSET) + F.col("l_orderkey")).alias("src"),
        (F.lit(PART_OFFSET) + F.col("l_partkey")).alias("dst"),
        F.col("l_extendedprice").alias("val"),
        F.col("l_discount").alias("disc"),
        F.col("l_shipdate").alias("ts"),
    )


def edges_copart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase part–part projection (triangle-rich).

    Self-join of lineitem on orderkey with ``src < dst`` canonicalization.
    Scale: equi-join on l_orderkey — AQE picks shuffled-hash/broadcast by
    side size; the projection prunes lineitem to 3 columns at the scan.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    a = li.alias("a")
    b = li.select("l_orderkey", "l_partkey").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"),
        F.col("b.l_partkey").alias("dst"),
        F.lit(1.0).alias("val"),
        F.col("a.l_shipdate").alias("ts"),
    )


def edges_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal user-interaction graph from the events stream table."""
    return load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("src"),
        (F.lit(EVENT_DST_OFFSET) + (F.col("event_id") % 50)).alias("dst"),
        F.col("value").alias("val"),
        F.col("ts"),
    )
