#!/usr/bin/env python
"""Connected components, batch and streaming — the Spark-first analog of
the reference's ConnectedComponentsExample
(REF:.../example/ConnectedComponentsExample.java [M]: read an edge text
file / builtin sample, run windowed CC, print the mapping).

Usage:
    python examples/connected_components_example.py [SF_DIR]

Runs three equivalent computations over the same bounded edge set and
shows they agree:

1. batch min-label CC (adaptive: driver union-find under the small-input
   bound, distributed Pregel loop above it);
2. the reference's SummaryAggregation shape (per-bucket union-find folds
   merged in O(buckets));
3. incremental streaming CC over a micro-batched replay of the same
   edges (foreachBatch contraction) — final state must match batch.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from gelly_streaming_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cc-example", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    from gelly_streaming_spark.algos.connected_components import (
        connected_components,
        connected_components_summary,
    )
    from gelly_streaming_spark.operators.graphstream import GraphStream
    from gelly_streaming_spark.sources.edges import edges_cust_order
    from gelly_streaming_spark.streaming.cc import IncrementalConnectedComponents
    from gelly_streaming_spark.streaming.sources import replay

    edges = edges_cust_order(spark, sf_dir).select("src", "dst")
    gs = GraphStream(edges)

    batch = connected_components(gs)
    summary = connected_components_summary(gs, num_buckets=16)
    stream = replay(edges.withColumn("ts", F.lit(None).cast("timestamp")), None, 2)
    streaming = IncrementalConnectedComponents().run(stream)

    b = {r["id"]: r["component"] for r in batch.collect()}
    s = {r["id"]: r["component"] for r in summary.select("id", "component").collect()}
    t = {r["id"]: r["component"] for r in streaming.collect()}
    assert b == s == t, "the three CC paths disagree"

    n_comp = len(set(b.values()))
    print(f"vertices={len(b)} components={n_comp}")
    print("sample mapping:", sorted(b.items())[:5])
    print("batch == summary-aggregation == streaming: OK")


if __name__ == "__main__":
    main()
