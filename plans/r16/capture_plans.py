"""Capture .explain('formatted') for named declared queries into
plans/r16/<qshort>_<tag>.txt (the judge's plan-claim evidence).

Usage: python plans/r16/capture_plans.py <tag> q56 q68 ...
Uses sf0.1 and the bench's session shape. Timing is NOT the goal here;
plans are identical across SFs for these queries.
"""
import sys

sys.path.insert(0, "/root/repo")
import importlib

mod = importlib.import_module("__spark_entry__")
from pyspark.sql import SparkSession

tag = sys.argv[1]
want = set(sys.argv[2:])
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
qs = mod.queries()
for name, fn in sorted(qs.items()):
    short = name.split("_")[0]
    if short not in want and name not in want:
        continue
    df = fn(spark, "/root/testdata/sf0.1")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    out = f"/root/repo/plans/r16/{short}_{tag}.txt"
    with open(out, "w") as fh:
        fh.write(plan)
    print("wrote", out, len(plan), "chars")
spark.stop()
