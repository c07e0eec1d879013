"""Streaming summary aggregation — A6/A8 on an unbounded stream.

Reference parity: SummaryBulkAggregation — partial per-key summaries kept
forever and re-merged on each emission (REF:src/main/java/org/apache/
flink/graph/streaming/SummaryBulkAggregation.java:~40 [M]); the windowed
A7 variant carries state across windows when ``transientState=false``
(REF:.../WindowGraphAggregation.java:~40 [H]).

Spark shape: each micro-batch runs the distributed bucket-fold
(``SummaryAggregation.fold_bounded``: applyInPandas over ≤num_buckets
hash buckets), and the ≤num_buckets partials merge into the carried
global summary. Per batch the driver handles O(num_buckets) pickled
summaries — never raw edges — and the carried state is bounded by the
summary's own size (union-find forest ≤ #vertices; spanner adjacency ≤
spanner edges). The reference instead funnels *every* record's partial
through a parallelism-1 reduce (SURVEY.md §7.4.H1).

Works unchanged for every summary in the library: ``DisjointSet``
(connected components), ``Candidates``-style colorings (bipartiteness),
``AdjacencyList`` (k-spanner).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gelly_streaming_spark.operators.aggregation import SummaryAggregation
from gelly_streaming_spark.streaming.runner import run_foreach_batch


class StreamingSummaryAggregation:
    """Fold an unbounded edge stream into a continuously-refined summary."""

    def __init__(self, agg: SummaryAggregation):
        self.agg = agg
        self.summary: Optional[Any] = None
        self.batches: int = 0

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        s = self.agg.fold_bounded(batch_df)
        self.summary = (
            s if self.summary is None else self.agg.combine_fn(self.summary, s)
        )
        self.batches += 1

    def run(self, edge_stream: DataFrame, timeout_sec: int = 300) -> DataFrame:
        """Consume all available micro-batches; return transform(summary)."""
        run_foreach_batch(edge_stream, self._on_batch, timeout_sec=timeout_sec)
        # the STREAM's session, not getActiveSession(): in a multi-session
        # process the active session can be someone else's, and a result
        # created there cannot join the caller's frames
        spark = edge_stream.sparkSession
        rows = self.agg.transform_fn(self.summary) if self.summary is not None else []
        return spark.createDataFrame(rows, self.agg.out_schema)


def streaming_spanner_aggregation(k: int, num_buckets: int = 16) -> SummaryAggregation:
    """L3 Spanner as a streaming summary aggregation
    (REF:.../library/Spanner.java:~30 [M]).

    Fold: greedy offer in arrival order per bucket. Combine: plain
    adjacency union — NOT re-applying the greedy rule, so the batch-
    spanner stretch argument carries over (an edge dropped by a fold had
    a ≤k path among that fold's kept edges, all of which survive every
    union), at the cost of spanner size. Output is arrival-order
    dependent ⇒ property-checked (P1), never hash-compared.
    """
    import pandas as pd

    from gelly_streaming_spark.algos.spanner import AdjacencyList

    def fold(s: AdjacencyList, pdf: pd.DataFrame) -> AdjacencyList:
        a = pdf["src"].astype("int64")
        b = pdf["dst"].astype("int64")
        for u, v in zip(a.tolist(), b.tolist()):
            u, v = (u, v) if u < v else (v, u)
            if u != v:
                s.offer(u, v, k)
        return s

    def combine(s1: AdjacencyList, s2: AdjacencyList) -> AdjacencyList:
        for u, nbrs in s2.adj.items():
            for v in nbrs:
                if u < v:
                    s1.add(u, v)
        return s1

    def transform(s: AdjacencyList) -> list[tuple]:
        return sorted(
            (u, v) for u, nbrs in s.adj.items() for v in nbrs if u < v
        )

    return SummaryAggregation(
        initial=AdjacencyList,
        fold_pdf=fold,
        combine_fn=combine,
        transform_fn=transform,
        out_schema=T.StructType(
            [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
        ),
        num_buckets=num_buckets,
        # greedy first-offer-wins: the fold must see edges in event-time
        # order within each bucket (fold input carries ts, sorted)
        order_sensitive=True,
    )
