#!/usr/bin/env python
"""Similarity search over the embeddings table — the ANN extension layer
(SURVEY.md §2.11) at its three scale tiers, plus centroid assignment.
No reference counterpart (gelly-streaming has no embedding surface);
these are the operators behind q23/q23b/q45/q46/q47.

Usage:
    python examples/similarity_search_example.py [SF_DIR]

Tiers (pick by corpus size — all return the same (qid, vec_id, sim) shape):

  brute-force  -> exact top-k: bounded query batch broadcast against the
                  corpus (the exactness baseline; |Q| must broadcast)
  LSH          -> random-hyperplane buckets + exact rerank within the
                  query's bucket (sub-linear candidates; portable
                  Rademacher planes make the run oracle-checkable)
  IVF          -> k-means inverted lists, nprobe buckets + exact rerank
                  (the production default past ~10^6 vectors)

  centroid     -> nearest-centroid assignment: broadcast label centroids,
                  one map pass (classifier-inference / IVF coarse assign)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from gelly_streaming_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="similarity-search", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    from gelly_streaming_spark.ext.embeddings import (
        centroid_assign,
        knn_bruteforce,
        knn_ivf,
        knn_lsh,
        rademacher_planes,
    )
    from gelly_streaming_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").between(1, 5))

    exact = knn_bruteforce(emb, queries, k=3)
    print("\n== exact top-3 (brute force) ==")
    exact.show(15, truncate=False)

    lsh = knn_lsh(emb, queries, k=3, planes=rademacher_planes(8, 64))
    print("== LSH top-3 (bucketed candidates, exact rerank) ==")
    lsh.show(15, truncate=False)

    ivf = knn_ivf(emb, queries, k=3, n_clusters=8, nprobe=2)
    print("== IVF top-3 (k-means inverted lists, nprobe=2) ==")
    ivf.show(15, truncate=False)

    # LSH/IVF recall vs exact on this sample
    e = {(r.qid, r.vec_id) for r in exact.collect()}
    for name, df in (("lsh", lsh), ("ivf", ivf)):
        hits = {(r.qid, r.vec_id) for r in df.collect()}
        print(f"{name} recall vs exact: {len(hits & e)}/{len(e)}")

    assigned = centroid_assign(emb)
    print("\n== nearest-centroid assignment (per-label agreement) ==")
    assigned.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("assigned") == F.col("label")).cast("int")).alias("self"),
    ).orderBy("label").show(12)

    from gelly_streaming_spark.ext.embeddings import semantic_dedup

    sd = semantic_dedup(emb, threshold=0.38)
    print("== SemDeDup-style semantic dedup (cluster-bounded pruning) ==")
    sd.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("kept")).cast("int")).alias("dropped"),
    ).orderBy("cluster").show(12)

    spark.stop()


if __name__ == "__main__":
    main()
