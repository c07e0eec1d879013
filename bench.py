#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the registry's queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced to full materialization with a noop sink (no driver
collect — measures distributed compute, not toPandas transfer).
Set BENCH_DUCKDB=1 to also time the DuckDB oracle side (local tuning aid;
the BASELINE.md gate is engine ≤ 2× DuckDB).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from gelly_streaming_spark.queries import REGISTRY
from gelly_streaming_spark.session import BUILD_CONFS, RUNTIME_CONFS


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    builder = (
        SparkSession.builder.appName("gelly-streaming-bench")
        .master(f"local[{cpus}]")
    )
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up executors/JIT and parquet footers once; timings below then
    # measure query compute, not JVM startup.
    from gelly_streaming_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(REGISTRY.items()):
        t0 = time.time()
        try:
            q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # one broken query must not kill the run
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_wallclock_declared_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    if errors:
        result["errors"] = errors

    if os.environ.get("BENCH_DUCKDB"):
        import duckdb

        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        duck: dict[str, float] = {}
        for name, q in sorted(REGISTRY.items()):
            if q.sql is None:
                continue
            t0 = time.time()
            con.sql(q.sql).fetchall()
            duck[name] = round(time.time() - t0, 3)
        result["duckdb_queries"] = duck
        result["duckdb_total_sec"] = round(sum(duck.values()), 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
