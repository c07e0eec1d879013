"""Text-file edge sources (CSV / JSON lines).

Reference parity: S3 — the examples parse delimited text into edges,
``env.readTextFile(path).map(split "," -> Edge)``
(REF:src/main/java/org/apache/flink/graph/streaming/example/
ConnectedComponentsExample.java:~90 [H]). Spark-first: the schema'd
csv/json readers — header/permissive-mode/compression handling, column
pruning, and parallel splits come from the data source framework instead
of hand-split strings, and the same call works for ``readStream``
(drop-directory ingestion) by passing ``streaming=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the engine's canonical edge schema for delimited files:
#: ``src,dst[,val[,ts]]``
EDGE_CSV_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def edges_from_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = False,
    streaming: bool = False,
) -> DataFrame:
    """Edge stream from delimited text; missing val/ts columns read NULL
    (reference NullValue ≙ NULL, SURVEY.md §7.4.D3)."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(EDGE_CSV_SCHEMA)
        .option("delimiter", delimiter)
        .option("header", header)
        .csv(path)
    )


def edges_from_json(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Edge stream from JSON lines with src/dst (+ optional val/ts) keys."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(EDGE_CSV_SCHEMA).json(path)


def parse_edge_lines(lines: DataFrame, delimiter: str = ",") -> DataFrame:
    """The reference's literal shape — a DataFrame of raw text lines
    (column ``value``) split into edges. Exposed for sources that deliver
    text payloads (socket, Kafka value column); prefer the schema'd
    readers for files."""
    parts = F.split(F.col("value"), delimiter)
    return lines.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        F.when(F.size(parts) > 2, parts.getItem(2).cast("double")).alias("val"),
    )
