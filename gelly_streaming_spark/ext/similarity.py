"""Set-similarity search (exact Jaccard + MinHash-LSH candidates).

North-star extension (BASELINE.json) — no reference counterpart.

Scale design: the exact path is a PREFIX-FILTERED inverted-index
self-join (the ppjoin/AllPairs family): tokens are globally ordered by
(document frequency, token); a pair with Jaccard ≥ θ must share a token
inside both documents' first ``n - ⌈θ·n⌉ + 1`` tokens of that order
(else all ⌈θ·n⌉ common tokens would have to fit in a suffix of size
⌈θ·n⌉ − 1). Only prefix tokens — by construction the *rarest* — enter
the candidate join, so hot stopwords never explode the shuffle; the
exact verification join then computes true intersections for candidates
only. Measured at sf0.1 (5k docs, θ=0.95): 134 s unfiltered → the
prefix plan cuts the candidate join by ~the prefix/size ratio while
staying exact. A size filter (⌈θ·|A|⌉ ≤ |B| ≤ ⌊|A|/θ⌋) prunes further.
The MinHash-LSH path bounds work per document at O(num_hashes) and meets
only within LSH buckets — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_sets(docs: DataFrame, id_col: str, tokens: Column) -> DataFrame:
    """(id, token) distinct pairs — the inverted index input."""
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens).alias("token"))
        .distinct()
    )


def _verify_intersections(tok: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact |A ∩ B| per candidate pair via per-doc sorted token arrays +
    JVM array_intersect: two joins carrying one array per side, instead
    of re-exploding every candidate to |tokens| rows and re-grouping
    (the row formulation shuffled ~candidates x doc-size rows — 38M at
    sf0.1 — and dominated the query; arrays cut it to one row per pair).
    AQE broadcasts the array table when it fits."""
    arrs = tok.groupBy("id").agg(F.array_sort(F.collect_list("token")).alias("toks"))
    return (
        cand.join(arrs.select(F.col("id").alias("a"), F.col("toks").alias("_ta")), "a")
        .join(arrs.select(F.col("id").alias("b"), F.col("toks").alias("_tb")), "b")
        .select(
            "a", "b", F.size(F.array_intersect("_ta", "_tb")).alias("i")
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    tokens: Column,
    threshold: float,
    prefix_filter: bool = True,
    prefix_order: str = "df",
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold: rows (a, b, jaccard), a < b.

    jaccard is computed from exact integer set sizes ⇒ bit-identical
    across engines (int ratio in IEEE double). ``prefix_filter=False``
    falls back to the naive full inverted-index join (testing aid).

    ``prefix_order`` picks the global token order behind the prefix
    filter — ANY total order is exact; the choice trades candidate count
    against ordering cost:
    - ``"df"``: rare-first (document frequency) — fewest candidates, but
      pays a token-frequency aggregation + join over the full index;
    - ``"hash"``: xxhash64 order — pseudo-random, zero extra passes;
      right when prefixes are short (high thresholds) so candidate
      inflation is bounded anyway.
    """
    tok = token_sets(docs, id_col, tokens).persist()
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    if prefix_filter:
        # Per-doc position by the chosen global order; keep the first
        # n - ceil(t*n) + 1 tokens.
        if prefix_order == "df":
            tdf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
            ranked = tok.join(tdf, "token")
            pos_w = Window.partitionBy("id").orderBy("df", "token")
        else:
            ranked = tok.withColumn("_h", F.xxhash64("token"))
            pos_w = Window.partitionBy("id").orderBy("_h", "token")
        n_w = Window.partitionBy("id")
        # checkpoint: both sides of the candidate self-join scan the
        # prefix — without the cut, the double-window subtree runs twice
        pref = (
            ranked
            .withColumn("pos", F.row_number().over(pos_w))
            .withColumn("n", F.count(F.lit(1)).over(n_w))
            .where(
                F.col("pos")
                <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
            )
            .select("id", "token", "pos", "n")
            .persist()
        )
        pa = pref.select(
            F.col("id").alias("a"), "token",
            F.col("pos").alias("pa"), F.col("n").alias("na"),
        )
        pb = pref.select(
            F.col("id").alias("b"), "token",
            F.col("pos").alias("pb"), F.col("n").alias("nb"),
        )
        # overlap lower bound α = ceil(t/(1+t)·(na+nb)); the positional
        # (ppjoin) filter drops a shared prefix token that cannot be the
        # start of α common tokens given what remains after each position
        alpha = F.ceil(
            F.lit(threshold) / F.lit(1.0 + threshold) * (F.col("na") + F.col("nb"))
        )
        cand = (
            pa.join(pb, "token")
            .where(
                (F.col("a") < F.col("b"))
                & (F.col("nb") >= F.ceil(F.lit(threshold) * F.col("na")))
                & (F.col("nb") <= F.floor(F.col("na") / F.lit(threshold)))
                & (
                    F.least(
                        F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")
                    )
                    + 1
                    >= alpha
                )
            )
            .select("a", "b")
            .distinct()
        )
        inter = _verify_intersections(tok, cand)
    else:
        ta = tok.select(F.col("id").alias("a"), "token")
        tb = tok.select(F.col("id").alias("b"), "token")
        inter = (
            ta.join(tb, "token")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("i"))
        )

    sa = sizes.select(F.col("id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .where(jac >= threshold)
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame, id_col: str, tokens: Column, num_hashes: int = 64
) -> DataFrame:
    """(id, sig array<long>) — num_hashes column-min aggregates over one
    token explosion; the k hash functions are xxhash64 seeded by index, so
    signatures are deterministic across runs and engines."""
    tok = token_sets(docs, id_col, tokens)
    mins = [
        F.min(F.xxhash64("token", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = tok.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate pairs that collide in ≥1
    band: rows (a, b), a < b. Work is per-bucket ⇒ no all-pairs blow-up."""
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.select(F.col("id").alias("a"), "band", "bucket")
    b = banded.select(F.col("id").alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    tokens: Column,
    threshold: float,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup pairs at Jaccard ≥ threshold via LSH candidates + exact
    verification of candidates only (verify joins token sets back, so
    reported pairs are exact — LSH affects recall, not precision)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, tokens, num_hashes)
    cand = lsh_candidate_pairs(sig, bands, rows_per_band)

    tok = token_sets(docs, id_col, tokens).persist()
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = _verify_intersections(tok, cand)
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .where(jac >= threshold)
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )
