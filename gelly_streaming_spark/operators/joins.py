"""Join / ranking operators absent in the reference but required by the
engine's general analytics surface (SURVEY.md §2.6–2.7: the reference has
no general join, sort, or top-k operator [H]; join *patterns* appear only
inside its triangle-count examples).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    tie_breaker: str | None = None,
) -> DataFrame:
    """As-of join: each left row matched to the latest right row with
    ``right_ts <= left_ts`` on the same key (Q19b extension).

    Formulation: equi-join on key with a range predicate, then keep the
    max-(ts, tie_breaker) right row per left row via a struct-max
    aggregate — deterministic tie-break, no window-sort over the joined
    blow-up. Scale: the equi-join shuffles on the key (AQE handles skew);
    the struct-max is a partial+final hash agg, so the post-join data is
    reduced map-side before the second shuffle.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c not in (right_key,)]
    j = left.join(
        right,
        (F.col(left_key) == F.col(right_key)) & (F.col(right_ts) <= F.col(left_ts)),
        "left",
    )
    pick = F.max(
        F.when(
            F.col(right_ts).isNotNull(),
            F.struct(
                F.col(right_ts).alias("_ts"),
                *(
                    [F.col(tie_breaker).alias("_tb")] if tie_breaker else []
                ),
                F.struct(*[F.col(c) for c in rcols]).alias("_row"),
            ),
        )
    ).alias("_best")
    out = j.groupBy(*[F.col(c) for c in lcols]).agg(pick)
    return out.select(
        *lcols, *[F.col(f"_best._row.{c}").alias(c) for c in rcols]
    )


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k with a total order (Q20). Spark turns orderBy+limit
    into TakeOrderedAndProject — per-partition heaps, only k rows per
    partition reach the driver; no full sort at any scale."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Top-k per group via rank-window; Catalyst inserts a partial
    window-group-limit below the shuffle (Spark 3.5+), so each partition
    pre-trims to k before exchanging."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
