"""k-Spanner — single-pass subgraph with distance stretch ≤ k.

Reference parity: library/Spanner.java + summaries/AdjacencyListGraph.java
(REF:src/main/java/org/apache/flink/graph/streaming/library/Spanner.java:~30 [M];
REF:.../summaries/AdjacencyListGraph.java:~50 [M]). The reference folds
edges into adjacency summaries, keeping an edge (u,v) only if the current
summary distance(u,v) > k; merging unions adjacencies re-applying the rule.

Output is arrival-order dependent (SURVEY.md §7.4.H3) ⇒ property-tested
(P1: ∀ u,v adjacent in G, dist_spanner(u,v) ≤ k), never hash-compared.

Spark shape: partition edges into ``num_buckets`` hash buckets, run the
greedy fold per bucket in arrival (ts) order via applyInPandas, then
UNION the ≤num_buckets kept-edge sets. The merge must be a plain union:
an edge dropped in a bucket has a ≤k path among that bucket's kept edges,
and kept edges all survive the union, so stretch ≤ k holds; re-applying
the greedy rule during the merge would let kept edges be replaced by
paths and compound the stretch to k². The union trades spanner size
(≤ num_buckets × per-bucket size) for a guaranteed stretch bound and a
fully parallel fold.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gelly_streaming_spark.operators.graphstream import GraphStream


class AdjacencyList:
    """Bounded-BFS adjacency summary (semantics of
    REF:.../summaries/AdjacencyListGraph.java [M]; fresh dict/deque impl)."""

    __slots__ = ("adj",)

    def __init__(self):
        self.adj: dict[int, set[int]] = {}

    def dist_leq(self, a: int, b: int, k: int) -> bool:
        """True iff dist(a, b) ≤ k (BFS bounded at depth k)."""
        if a == b:
            return True
        if a not in self.adj or b not in self.adj:
            return False
        seen = {a}
        frontier = deque([(a, 0)])
        while frontier:
            node, d = frontier.popleft()
            if d >= k:
                continue
            for n in self.adj.get(node, ()):
                if n == b:
                    return True
                if n not in seen:
                    seen.add(n)
                    frontier.append((n, d + 1))
        return False

    def add(self, a: int, b: int) -> None:
        self.adj.setdefault(a, set()).add(b)
        self.adj.setdefault(b, set()).add(a)

    def offer(self, a: int, b: int, k: int) -> bool:
        """Greedy rule: keep (a,b) iff current distance > k."""
        if self.dist_leq(a, b, k):
            return False
        self.add(a, b)
        return True


def spanner(stream: GraphStream, k: int, num_buckets: int = 16) -> DataFrame:
    """Edges of a k-spanner of the (undirected view of the) input graph;
    rows (src, dst)."""
    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        s = AdjacencyList()
        kept = []
        for a, b, ts in zip(pdf["src"], pdf["dst"], pdf["ts"]):
            if s.offer(int(a), int(b), k):
                kept.append((int(a), int(b), ts))
        return pd.DataFrame(kept, columns=["src", "dst", "ts"])

    e = (
        stream.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "ts",
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("pkey", F.pmod(F.xxhash64("src"), F.lit(num_buckets)))
    )
    kept = e.groupBy("pkey").applyInPandas(
        lambda pdf: fold(pdf.drop(columns=["pkey"])), schema
    )
    # Merge = distributed union of the per-bucket spanners (see module doc).
    return kept.select("src", "dst").distinct()
