"""Parquet table loaders for the driver testdata (TESTDATA.md).

All loads go through ``load_table`` so the one schema quirk — the events
table's Parquet TIMESTAMP(NANOS) column, which Spark 4.x rejects natively
— is fixed in exactly one place: we read nanos as LONG
(``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds,
which matches DuckDB's cast-to-µs semantics on this data (FIXTURES.md §3).

Scale notes: loaders return plain scans — no caching, no collect. Column
pruning and predicate pushdown reach the parquet reader because every
downstream operator composes on the lazy DataFrame (verify with
plans/checks.py: ``assert_pushed_filters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gelly_streaming_spark.session import prepare_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events timestamp column."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Parquet TIMESTAMP(NANOS) read as raw nanos; truncate to µs.
        # Integer division — double division would round (nanos > 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
