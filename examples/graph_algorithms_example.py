#!/usr/bin/env python
"""PageRank + bounded-horizon BFS — the r12 extension algorithms the
reference library never shipped (its library is CC / bipartiteness /
spanner, SURVEY §2.9).

Usage:
    python examples/graph_algorithms_example.py [SF_DIR]

Builds the q15 customer-order-part graph, ranks vertices with three
damped power-iteration steps, then maps the 4-hop neighborhood of the
top-ranked vertex — the seed-set-expansion composition a curation
pipeline uses for domain-authority scoring over a link graph.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from gelly_streaming_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graph-algos-example", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    from gelly_streaming_spark.algos.bfs import bfs_distances
    from gelly_streaming_spark.algos.pagerank import pagerank
    from gelly_streaming_spark.operators.graphstream import GraphStream
    from gelly_streaming_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    lineitem = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    edges = orders.select(
        F.col("o_custkey").alias("src"),
        (F.lit(1_000_000) + F.col("o_orderkey")).alias("dst"),
    ).unionByName(
        lineitem.select(
            (F.lit(1_000_000) + F.col("l_orderkey")).alias("src"),
            (F.lit(2_000_000) + F.col("l_partkey")).alias("dst"),
        )
    )
    gs = GraphStream(edges)

    pr = pagerank(gs, iters=3)
    top = pr.orderBy(F.desc("pr"), "id").limit(5)
    print("top-5 PageRank vertices:")
    top.show()

    seed_id = top.first()["id"]
    seed = spark.createDataFrame([(int(seed_id),)], "id long")
    hops = bfs_distances(gs, seed, max_hops=4)
    print(f"4-hop neighborhood of vertex {seed_id} (per-hop sizes):")
    hops.groupBy("dist").count().orderBy("dist").show()

    spark.stop()


if __name__ == "__main__":
    main()
