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

    Formulation: the union-merge plan — tag both inputs, union them, and
    carry the last-seen right payload forward with a running
    ``last(ignorenulls)`` window ordered by (ts, side, tie_breaker).
    ONE shuffle on the key and a per-key sort; no row ever fans out,
    unlike the range-join + aggregate formulation whose intermediate is
    |matches| per left row (measured 6.9 s → sub-second at sf0.1).
    Right rows sort before left rows at equal timestamps ⇒ inclusive
    ``<=`` semantics; ``tie_breaker`` ascending makes the winner among
    equal-ts right rows deterministic (the max tie_breaker).

    SQL join semantics on dirty data: NULL keys never match (the window
    formulation would otherwise group all NULL keys into ONE partition
    and fabricate matches — left NULL-key rows come back with a NULL
    payload instead), and right payload columns that collide with a left
    column name get a ``_right`` suffix (both sides carrying ``ts`` is
    the common case) so the output never has ambiguous duplicates.
    """
    rcols = [c for c in right.columns if c != right_key]
    out_rcols = [
        (c, f"{c}_right" if c in left.columns else c) for c in rcols
    ]
    payload = F.struct(*[F.col(c) for c in rcols]).alias("_r")
    # NULL right timestamps are no-matches under SQL comparison semantics
    # (right_ts <= left_ts is never true) — but Spark sorts nulls FIRST,
    # which would make such a row a valid "prior" for every left row.
    # NULL right KEYS likewise never match anything.
    right = right.where(
        F.col(right_ts).isNotNull() & F.col(right_key).isNotNull()
    )
    r_side = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        payload,
    )
    r_type = r_side.schema["_r"].dataType
    l_side = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_type).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    u = r_side.withColumn("_l", F.lit(None).cast(l_side.schema["_l"].dataType)).unionByName(
        l_side
    )
    order = [F.col("_t"), F.col("_side")]
    if tie_breaker:
        order.append(F.col("_r").getField(tie_breaker))
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_last", F.last("_r", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    # a NULL left key can only have matched fabricated NULL-key partners
    # in the window partition — null its payload out to SQL semantics
    last_or_null = F.when(
        F.col("_k").isNotNull(), F.col("_last")
    ).otherwise(F.lit(None).cast(r_type))
    return matched.withColumn("_last", last_or_null).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_last.{c}").alias(out) for c, out in out_rcols],
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
