"""GraphWindowStream — windowed graph discretization ("graph slices").

Reference parity: GraphWindowStream + slice()
(REF:src/main/java/org/apache/flink/graph/streaming/GraphWindowStream.java [H];
slice at REF:.../SimpleEdgeStream.java:~400 [H]). ``slice(size, direction)``
keys edges per vertex — OUT keys on src, IN on dst, ALL duplicates each
edge both ways — and discretizes them into tumbling event-time windows.
The three neighborhood operators mirror the reference UDF interfaces:

- reduce_on_edges  ≙ EdgesReduce  (REF:.../EdgesReduce.java [H])
- fold_neighbors   ≙ EdgesFold    (REF:.../EdgesFold.java [H])
- apply_on_neighbors ≙ EdgesApply (REF:.../EdgesApply.java [H])

Spark-first: a slice is just ``groupBy(window(ts, size), vertex)``.
Algebraic reduces/folds compile to built-in hash aggregates (partial +
final, whole-stage codegen); only the general UDTF-style apply drops to
Arrow-batched ``applyInPandas``. Sliding and session windows — absent in
the reference (tumbling-only) — come free from Spark and are exposed via
``slide=`` and ``session_slice``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.group import GroupedData

if TYPE_CHECKING:
    from gelly_streaming_spark.operators.graphstream import GraphStream

_DIRECTIONS = {"out": "src", "in": "dst"}


class GraphWindowStream:
    """Edges keyed per (window, vertex); vertex column exposed as ``id``,
    neighbor column as ``nbr``, window start as ``bucket``.

    Tumbling/sliding slices carry the ``window()`` STRUCT column ``w``
    (not its pre-extracted start): the struct is what holds the
    event-time watermark metadata, so grouping on it keeps append-mode
    streaming aggregation legal; ``bucket`` (= ``w.start``) is exposed
    after aggregation. Session slices carry the gap and raw ``ts`` and
    apply ``session_window`` at aggregation time — sessions only exist
    after *merging* overlapping [ts, ts+gap) intervals inside a groupBy.
    """

    def __init__(self, windowed: DataFrame, session_gap: Optional[str] = None):
        self.windowed = windowed  # columns: w|ts, id, nbr, val (+extras)
        self.session_gap = session_gap

    @classmethod
    def from_stream(
        cls,
        stream: "GraphStream",
        size: str,
        direction: str = "out",
        slide: Optional[str] = None,
        ts_col: str = "ts",
    ) -> "GraphWindowStream":
        direction = direction.lower()
        if direction == "all":
            # ALL duplicates each edge to both endpoints (reference slices
            # the self-unioned reversed stream).
            stream = stream.undirected()
            direction = "out"
        key = _DIRECTIONS[direction]
        nbr = "dst" if key == "src" else "src"
        e = stream.edges
        win = F.window(F.col(ts_col), size, slide) if slide else F.window(F.col(ts_col), size)
        extras = [c for c in e.columns if c not in ("src", "dst", ts_col)]
        df = e.select(
            win.alias("w"),
            F.col(key).alias("id"),
            F.col(nbr).alias("nbr"),
            *[F.col(c) for c in extras],
        )
        return cls(df)

    @classmethod
    def session_slice(
        cls,
        stream: "GraphStream",
        gap: str,
        direction: str = "out",
        ts_col: str = "ts",
    ) -> "GraphWindowStream":
        """Session-window slice (extension; reference is tumbling-only).
        Bucket is the per-vertex merged-session start: consecutive events
        of one vertex closer than ``gap`` share a session."""
        direction = direction.lower()
        if direction == "all":
            stream = stream.undirected()
            direction = "out"
        key = _DIRECTIONS[direction]
        nbr = "dst" if key == "src" else "src"
        e = stream.edges
        extras = [c for c in e.columns if c not in ("src", "dst", ts_col)]
        df = e.select(
            F.col(ts_col).alias("ts"),
            F.col(key).alias("id"),
            F.col(nbr).alias("nbr"),
            *[F.col(c) for c in extras],
        )
        return cls(df, session_gap=gap)

    # ------------------------------------------------------------------
    def _grouped(self) -> GroupedData:
        if self.session_gap is not None:
            return self.windowed.groupBy(
                F.session_window(F.col("ts"), self.session_gap).alias("w"),
                F.col("id"),
            )
        return self.windowed.groupBy("w", "id")

    def _finalize(self, df: DataFrame) -> DataFrame:
        """Aggregations group on the window struct ``w`` (watermark
        metadata lives there); expose its start as ``bucket`` for a
        uniform output schema across slice kinds."""
        if "w" in df.columns:
            rest = [c for c in df.columns if c not in ("w", "id")]
            return df.select(F.col("w.start").alias("bucket"), "id", *rest)
        return df

    def reduce_on_edges(self, *aggs: Column) -> DataFrame:
        """W2 reduceOnEdges — commutative reduce over incident edge values
        per (vertex, window) (REF:.../GraphWindowStream.java:~60 [H]).
        Any Spark aggregate expression qualifies; compiles to partial+final
        hash aggregation — the shuffle carries one partial row per
        (window, vertex, partition)."""
        return self._finalize(self._grouped().agg(*aggs))

    def fold_neighbors(self, *aggs: Column) -> DataFrame:
        """W3 foldNeighbors — seeded fold over (vertex, neighbor, value)
        (REF:.../GraphWindowStream.java:~45 [H]). Algebraic folds are just
        aggregate expressions over ``nbr``/``val`` columns; opaque folds
        use apply_on_neighbors."""
        return self._finalize(self._grouped().agg(*aggs))

    def apply_on_neighbors(self, fn: Callable, schema) -> DataFrame:
        """W4 applyOnNeighbors — UDTF over the full neighborhood of one
        vertex in one window, 0..n output rows
        (REF:.../GraphWindowStream.java:~75 [H], EdgesApply [H]).

        ``fn(pdf) -> pdf`` receives the group's rows (bucket, id, nbr, …)
        as an Arrow-backed pandas DataFrame. Scale: one shuffle on
        (bucket, id); skewed hub vertices are the risk — mitigate upstream
        with filter/sample, or salt the key and merge."""
        if self.session_gap is not None:
            raise NotImplementedError(
                "applyOnNeighbors over session windows: sessions are merged "
                "inside an aggregation, which applyInPandas bypasses — "
                "aggregate with fold_neighbors/neighborhood instead"
            )
        # the UDF sees a plain `bucket` column (batch-only path: Arrow
        # UDTFs don't run inside streaming aggregations anyway)
        flat = self.windowed.withColumn("bucket", F.col("w.start")).drop("w")
        return flat.groupBy("bucket", "id").applyInPandas(fn, schema=schema)

    def neighborhood(self, salt: int = 0) -> DataFrame:
        """Materialize per-(window, vertex) sorted neighbor lists — the
        declarative fast path for the common applyOnNeighbors uses
        (collect_list stays JVM-side; no Python boundary).

        Prefer this over apply_on_neighbors whenever the neighborhood
        function is expressible over an array: at sf0.01 the Arrow
        per-group round-trip made the same query ~40× slower than this
        plan (measured; see BENCH notes).

        ``salt > 1`` shards each (window, vertex) group into ``salt``
        sub-groups before collecting, then merges the sorted shards — the
        skew treatment for hub vertices whose neighborhood would
        otherwise funnel through one task. The merge is `flatten +
        array_sort` over ≤``salt`` pre-sorted arrays, still JVM-side.
        Leave 0 (off) unless a power-law hub dominates a window."""
        if self.session_gap is not None and salt > 1:
            raise NotImplementedError("salting applies to tumbling/sliding slices")
        if salt > 1:
            salted = self.windowed.withColumn(
                "_salt", F.pmod(F.xxhash64("nbr"), F.lit(salt))
            )
            shards = salted.groupBy("w", "id", "_salt").agg(
                F.array_sort(F.collect_list("nbr")).alias("shard"),
                F.count(F.lit(1)).alias("cnt"),
            )
            return self._finalize(
                shards.groupBy("w", "id").agg(
                    F.array_sort(F.flatten(F.collect_list("shard"))).alias("neighbors"),
                    F.sum("cnt").alias("degree"),
                )
            )
        return self._finalize(
            self._grouped().agg(
                F.array_sort(F.collect_list("nbr")).alias("neighbors"),
                F.count(F.lit(1)).alias("degree"),
            )
        )

    def neighborhood_concat(self, sep: str = ",") -> DataFrame:
        """Sorted neighbor ids joined into one string per (window, vertex)
        — fully JVM-side (the Q14 shape)."""
        return self._finalize(
            self._grouped().agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("nbr")), lambda x: x.cast("string")
                    ),
                    sep,
                ).alias("neighbors")
            )
        )
