"""Round-17 full-registry plan audit: capture .explain('formatted') for
every declared query at sf0.1 and grep the set for anti-patterns
(row-at-a-time Python eval, cartesian products, scans without pruned
ReadSchema). Writes plans/r17/all/<name>.txt + plans/r17/plan_audit.txt.

Note: driver-loop and streaming queries execute eagerly during
construction; their captured plan is the RETURNED frame's plan (the loop
work is in per-round jobs) — the audit still sees any Python nodes or
joins in the returned shape, and the loop bodies are plan-asserted in
tests/test_plans.py.
"""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
import importlib

mod = importlib.import_module("__spark_entry__")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
out_dir = "/root/repo/plans/r17/all"
os.makedirs(out_dir, exist_ok=True)
qs = mod.queries()
rows = []
for name, fn in sorted(qs.items()):
    try:
        df = fn(spark, "/root/testdata/sf0.1")
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as ex:  # pragma: no cover - audit robustness
        rows.append((name, f"ERROR {type(ex).__name__}: {ex}"))
        continue
    with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
        fh.write(plan)
    flags = []
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_batch = len(re.findall(r"BatchEvalPython", plan))
    n_arrow = len(
        re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
    )
    n_cart = len(
        re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
    )
    wide_scan = bool(
        re.search(r"ReadSchema: struct<[^>]{400,}", plan)
    )
    if n_batch:
        flags.append(f"BatchEvalPython x{n_batch} (row-at-a-time!)")
    if n_cart:
        flags.append(f"nested-loop/cartesian x{n_cart}")
    if wide_scan:
        flags.append("wide ReadSchema")
    rows.append(
        (name, f"Exchange x{n_ex}, arrow-python x{n_arrow}"
         + (", " + "; ".join(flags) if flags else ""))
    )
with open("/root/repo/plans/r17/plan_audit.txt", "w") as fh:
    for name, summary in rows:
        fh.write(f"{name:40s} {summary}\n")
print("audited", len(rows), "queries")
spark.stop()
