"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``gelly_streaming_spark`` package; this module
only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gelly_streaming_spark import queries as _registry
from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.sources.edges import edges_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: slice the temporal event graph into
    1-hour tumbling windows per source vertex and reduce over incident
    edge values (reference: slice().reduceOnEdges(), the README's
    headline windowed-aggregation example)."""
    from pyspark.sql import functions as F

    gs = GraphStream(edges_events(spark, "/root/testdata/sf0.001"))
    return gs.slice("1 hour", "out").reduce_on_edges(
        F.sum("val").cast("double").alias("sum_val"),
        F.count(F.lit(1)).alias("cnt"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
