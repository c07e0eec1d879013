#!/usr/bin/env python
"""Round-17 isolation harness: time named registry queries with the noop
sink on the bench's session confs, steady-state (copart prebuilt, N runs),
and optionally dump .explain("formatted"). Usage:
    python plans/r17/isolate.py q17_triangles q23b_embedding_near_dup [--runs 3] [--plans DIR]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import SparkSession

from gelly_streaming_spark.blas import blas_env
from gelly_streaming_spark.queries import REGISTRY
from gelly_streaming_spark.session import BUILD_CONFS, RUNTIME_CONFS


def _cpu_snap() -> list[int]:
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:]))


def _steal_pct(a: list[int], b: list[int]) -> float:
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return round(100.0 * d[7] / tot, 2)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    plans_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.update(blas_env(1))
    b = SparkSession.builder.appName("gss-isolate").master(f"local[{cpus}]")
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # bench-like warm-up: python/arrow worker pool + broadcast kernel path
    import pyspark.sql.functions as F
    d = spark.range(0, 32 * 1024, 1, 32).select(
        (F.col("id") % 997).alias("k"), (F.col("id") % 31).alias("v")
    )
    d.groupBy("k").applyInPandas(lambda p: p.head(1), "k long, v long").write.mode(
        "overwrite").format("noop").save()
    bc = spark.sparkContext.broadcast((1, 2, 3))

    def _echo(batches):
        for pdf in batches:
            yield pdf.assign(v=pdf["v"] + bc.value[0])

    for _ in range(4):
        d.mapInPandas(_echo, "k long, v long").write.mode("overwrite").format(
            "noop").save()

    from gelly_streaming_spark.sources.edges import copart_canonical
    t0 = time.time()
    copart_canonical(spark, sf_dir).write.mode("overwrite").format("noop").save()
    copart_canonical(spark, sf_dir, "1 day").write.mode("overwrite").format("noop").save()
    print(f"copart_build {time.time()-t0:.2f}s", flush=True)

    for name in names:
        q = REGISTRY[name]
        if plans_dir:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        secs = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            s0 = _cpu_snap()
            t0 = time.time()
            q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            secs.append((round(time.time() - t0, 3), _steal_pct(s0, _cpu_snap())))
        print(f"{name}: {secs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
