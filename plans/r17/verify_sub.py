#!/usr/bin/env python
"""Targeted oracle verification (r17): run named queries (or all) through
the driver contract and diff against DuckDB, at a given SF dir.
Usage: python plans/r17/verify_sub.py [--sf /root/testdata/sf0.01] [--cpus 8] [names...|all]
"""
import importlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb


def norm(pdf):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        r = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                r.append(None)
            elif isinstance(v, float):
                r.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                r.append(str(v))
            else:
                r.append(v)
        out.append(tuple(r))
    return sorted(out, key=lambda r: tuple((x is not None, str(x)) for x in r))


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    cpus = "8"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--cpus":
            cpus = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    mod = importlib.import_module("__spark_entry__")
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(f"local[{cpus}]").getOrCreate()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = mod.queries(), mod.oracle_sql()
    todo = sorted(qs) if (not names or names == ["all"]) else names
    fails = 0
    for name in todo:
        fn = qs[name]
        s = norm(fn(spark, sf).toPandas())
        if name in os_:
            d = norm(con.sql(os_[name]).df())
            if s != d:
                fails += 1
                print(name, "MISMATCH",
                      [r for r in s if r not in set(d)][:2],
                      [r for r in d if r not in set(s)][:2], flush=True)
            else:
                print(name, "MATCH", len(s), flush=True)
        else:
            print(name, "rows-only", len(s), flush=True)
    print("FAILS:", fails, flush=True)


if __name__ == "__main__":
    main()
