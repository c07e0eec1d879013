"""Deterministic dataset splitting and sampling for training-data pipelines.

A 100 TB corpus is split into train/val/test ONCE, and the assignment must
be (a) reproducible across runs, clusters, and engines, (b) a pure
row-local projection — no shuffle, no global ordering, no randomness
state — and (c) stable under re-partitioning and insertion of new rows
(an existing document never changes split when the corpus grows).

``F.rand(seed)`` fails (a) and (c): Spark seeds it per-partition, so the
assignment changes whenever partitioning changes. Instead we hash the
stable row key with a small multiplicative congruential hash chosen to be
expressible in portable integer SQL (so the DuckDB oracle can replicate
it bit-for-bit) and overflow-safe for any BIGINT key:

    bucket(key) = (((key % M + M) % M) * A + B) % M,
    M = 99991 (prime), A = 40503

``key % M`` first keeps the product under 2^42 — no BIGINT overflow for
ANY 64-bit key, unlike hashing ``key * A`` directly; the ``+ M) % M``
folds the dividend-signed remainder (both Spark and DuckDB ``%`` follow
the dividend's sign) so negative keys land in [0, M) like any other key
instead of collapsing into the first split arm. The same integer ops run
identically in Spark, DuckDB, and any ANSI engine.

This is deliberately NOT a cryptographic or avalanche hash: it is a
splitter. For adversarial keys use ``F.xxhash64`` (Spark-only, so the
oracle pairing is lost); for sequential synthetic keys the multiplicative
step already decorrelates bucket from key order (A is coprime to M).

Scale: split assignment is a zero-shuffle projection fused into the scan;
stratified counting is one partial-agg shuffle on (split, stratum);
deterministic per-group sampling is one hash-partitioned window with a
rank-limit pushdown (WindowGroupLimit trims to n per group map-side
before the shuffle — asserted in
tests/test_ext.py::test_deterministic_sample_per_group).

REF: no reference counterpart (gelly-streaming has no dataset-split
surface); this is part of the training-data pipeline extension layer
(SURVEY.md §2.11) alongside ext/dedup.py and ext/text.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_M = 99991  # prime modulus — buckets in [0, 99991)
_A = 40503  # multiplier, coprime to _M
_B = 30029


def split_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 99991) from a BIGINT key column.

    Pure integer arithmetic, overflow-safe and sign-safe for any 64-bit
    key, and replicable verbatim in the SQL oracle (see SPLIT_BUCKET_SQL).
    """
    return ((((key % _M) + _M) % _M * _A + _B) % _M).cast("long")


#: DuckDB/ANSI equivalent of split_bucket() — format with the key column.
SPLIT_BUCKET_SQL = f"((({{key}} % {_M}) + {_M}) % {_M} * {_A} + {_B}) % {_M}"


def assign_split(
    key: Column,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
) -> Column:
    """Label each row train/val/test (or any named fractions) from its
    stable key. Fractions are cumulative thresholds over the bucket
    space, so every row gets exactly one label and the expected share of
    each label equals its weight. Row-local: fuses into the scan with no
    shuffle and no RNG state."""
    total = sum(w for _, w in weights)
    b = split_bucket(key)
    expr = F.lit(weights[-1][0])  # remainder absorbs rounding
    acc = 0.0
    cuts = []
    for name, w in weights[:-1]:
        acc += w / total
        cuts.append((name, int(acc * _M)))
    for name, cut in reversed(cuts):
        expr = F.when(b < cut, F.lit(name)).otherwise(expr)
    return expr


def assign_split_sql(
    key_sql: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
) -> str:
    """The oracle-side CASE expression mirroring assign_split()."""
    total = sum(w for _, w in weights)
    b = SPLIT_BUCKET_SQL.format(key=key_sql)
    acc = 0.0
    arms = []
    for name, w in weights[:-1]:
        acc += w / total
        arms.append(f"WHEN ({b}) < {int(acc * _M)} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{weights[-1][0]}' END"


def stratified_split_report(
    df: DataFrame,
    key_col: str,
    strata_cols: Sequence[str],
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
) -> DataFrame:
    """Per-(split, stratum) audit counts for a deterministic split:
    one partial-agg shuffle, integer outputs only (exactly hashable
    against the oracle)."""
    return (
        df.select(
            assign_split(F.col(key_col), weights).alias("split"),
            *[F.col(c) for c in strata_cols],
        )
        .groupBy("split", *strata_cols)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    num_ranges: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document its
    global token offset and the index of the fixed-size context window
    (``budget`` tokens) its first token lands in when the corpus is
    concatenated in ``order_col`` order — the standard pre-training
    "pack documents into context windows" step (GPT-style concat +
    chunk), computed WITHOUT materializing the concatenation.

    Scale shape — a distributed prefix sum, NOT a global window:

    1. ``repartitionByRange(order_col)`` puts each task a contiguous
       key range (range partition ids are monotonic in the key).
    2. A window partitioned BY PARTITION and ordered by ``order_col``
       computes the local exclusive running sum — each task sorts only
       its own slice; there is no single-partition global sort anywhere.
    3. Per-partition totals (one tiny row per range) get their own
       running sum — the only single-partition window in the plan runs
       over ≤ ``num_ranges`` rows — and are broadcast back.

    ``offset = partition_offset + local_exclusive_sum`` is exact, and
    ``seq_id = offset div budget``. The naive one-window formulation
    (``SUM OVER (ORDER BY order_col)`` with no partitioning) funnels
    the entire corpus through one task — the 100 TB anti-pattern this
    operator exists to avoid; the oracle uses it because DuckDB is
    single-node anyway.

    ``order_col`` must be a unique key (ties across a range boundary
    would make the local sort non-deterministic).

    REF: no reference counterpart (SURVEY.md §2.11 extension layer).
    """
    tok = F.col(token_col).cast("long")
    ranged = df.repartitionByRange(num_ranges, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_local = ranged.withColumn(
        "_local_off", F.coalesce(F.sum(tok).over(local), F.lit(0))
    )
    # _pid comes from SAMPLED range boundaries, so the two consumers
    # below (offset aggregate, probe side) MUST see one materialization:
    # a recomputed exchange re-samples and can assign different _pids,
    # silently corrupting the join. Exchange/stage reuse is not
    # guaranteed across the diamond (the analyzer re-aliases one side),
    # so pin it with a lazy localCheckpoint — the slim projected rows
    # (key, tokens, pid, local offset) materialize once at first action
    # and a lost block is a loud recompute FAILURE, never a silent
    # re-sample. Callers can release the blocks with
    # plans.memory.free_checkpoint(result) when done.
    with_local = with_local.localCheckpoint(eager=False)
    # Partition totals from the WINDOWED result (last inclusive cumsum =
    # max of exclusive+token, tokens being non-negative). Tiny: one row
    # per range; the global window is O(num_ranges).
    totals = with_local.groupBy("_pid").agg(
        F.max(F.col("_local_off") + tok).alias("_tot")
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(off_w), F.lit(0)).alias("_part_off")
    )
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .withColumn("start_token", F.col("_part_off") + F.col("_local_off"))
        # `div` is exact LongType integer division (a float `/` + cast
        # would wobble past 2^53 total tokens)
        .withColumn("seq_id", F.expr(f"start_token div {int(budget)}"))
        .drop("_pid", "_local_off", "_part_off")
    )


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    default_budget: int | None = None,
    num_ranges: int = 32,
) -> DataFrame:
    """Token-budget mixture sampling: fill each source's token budget
    with a deterministic, partitioning-independent prefix of its
    documents — the "data mixture" step of a pre-training pipeline
    (sample N_src tokens from each source at the configured ratio).

    Document order within a source is (split_bucket(key), key): a
    reproducible pseudo-random order with no RNG state, stable when the
    corpus grows or repartitions (same property as assign_split). A
    document is kept iff its EXCLUSIVE per-source running token sum is
    still under the source's budget, so the budget-crossing document is
    included and every budget gets at least one document. Sources
    missing from ``budgets`` fall back to ``default_budget``; with no
    default they are dropped entirely (budget NULL ⇒ predicate false).

    Scale shape — the same distributed prefix sum as pack_sequences,
    never one task per source (a 100 TB corpus has FEW sources and a
    per-source global window would funnel ~everything through a handful
    of tasks):

    1. ``repartitionByRange`` over (source, bucket, key) — each task
       owns a contiguous slice of one-or-more sources' ordered streams.
    2. Per (partition, source) exclusive window cumsum — local sort only.
    3. Per-source offsets across partitions from an O(ranges · sources)
       totals table (the only sequential window, over tiny rows),
       broadcast back.

    Returns the kept rows with ``start_token`` (the exclusive
    per-source offset — the certificate of the prefix sum itself).

    REF: no reference counterpart (SURVEY.md §2.11 extension layer).
    """
    tok = F.col(token_col).cast("long")
    ranged = (
        df.withColumn("_bkt", split_bucket(F.col(key_col)))
        .repartitionByRange(
            num_ranges, F.col(source_col), F.col("_bkt"), F.col(key_col)
        )
        .withColumn("_pid", F.spark_partition_id())
    )
    local = (
        Window.partitionBy("_pid", source_col)
        .orderBy("_bkt", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_local = ranged.withColumn(
        "_local_off", F.coalesce(F.sum(tok).over(local), F.lit(0))
    )
    # Same diamond-reuse hazard as pack_sequences: _pid derives from
    # SAMPLED range boundaries, and the totals aggregate + probe side
    # must see ONE materialization — pin it (see pack_sequences).
    with_local = with_local.localCheckpoint(eager=False)
    totals = with_local.groupBy("_pid", source_col).agg(
        F.max(F.col("_local_off") + tok).alias("_tot")
    )
    off_w = (
        Window.partitionBy(source_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        source_col,
        F.coalesce(F.sum("_tot").over(off_w), F.lit(0)).alias("_src_off"),
    )
    if budgets:
        budget = F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in kv]
        )[F.col(source_col)]
    else:
        budget = F.lit(None).cast("long")
    if default_budget is not None:
        budget = F.coalesce(budget, F.lit(int(default_budget)))
    return (
        with_local.join(F.broadcast(offsets), ["_pid", source_col])
        .withColumn("start_token", F.col("_src_off") + F.col("_local_off"))
        .where(F.col("start_token") < budget.cast("long"))
        .drop("_pid", "_bkt", "_local_off", "_src_off")
    )


def deterministic_sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    n: int,
) -> DataFrame:
    """Keep the ``n`` rows per group with the smallest hash bucket —
    a reproducible, partitioning-independent downsample (the fixed-size
    analogue of reservoir sampling, without RNG state).

    Ties within a bucket break on the raw key, so the selection is a
    total order. Catalyst plans the rank-limit as WindowGroupLimit:
    each map task trims its partition to n rows per group BEFORE the
    shuffle, so the exchange moves O(groups * n), not O(rows) — the
    property that makes this viable at 100 TB.
    """
    k = F.col(key_col)
    w = (
        F.row_number()
        .over(
            Window.partitionBy(*group_cols)
            .orderBy(split_bucket(k).asc(), k.asc())
        )
        .alias("rn")
    )
    return df.select(*df.columns, w).where(F.col("rn") <= n).drop("rn")
