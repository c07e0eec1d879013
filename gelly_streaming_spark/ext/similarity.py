"""Set-similarity search (exact Jaccard + MinHash-LSH candidates).

North-star extension (BASELINE.json) — no reference counterpart.

Scale design: the exact path is an inverted-index self-join (explode
tokens → join on token → count intersections), never an O(n²) cross
join: only documents sharing ≥1 token ever meet, and the join shuffles on
the token key. Hot tokens are the skew risk — ``max_token_df`` drops
tokens whose document frequency exceeds a cap (a stopword that appears in
every doc contributes nothing to ≥θ Jaccard pairs discrimination but
quadratic join rows; the cap is a standard prefix-filter trade — at
θ=0.95 any pair sharing only capped tokens is far below threshold).
The MinHash-LSH path bounds work per document at O(num_hashes) and meets
only within LSH buckets — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_sets(docs: DataFrame, id_col: str, tokens: Column) -> DataFrame:
    """(id, token) distinct pairs — the inverted index input."""
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens).alias("token"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    tokens: Column,
    threshold: float,
    max_token_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold: rows (a, b, jaccard), a < b.

    jaccard is computed from exact integer set sizes ⇒ bit-identical
    across engines (int ratio in IEEE double)."""
    tok = token_sets(docs, id_col, tokens)
    if max_token_df is not None:
        hot = tok.groupBy("token").count().where(F.col("count") > max_token_df)
        tok = tok.join(hot.select("token"), "token", "left_anti")
    tok = tok.localCheckpoint()

    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
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

    tok = token_sets(docs, id_col, tokens).localCheckpoint()
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    ta = tok.select(F.col("id").alias("a"), "token")
    tb = tok.select(F.col("id").alias("b"), "token")
    inter = (
        cand.join(ta, "a").join(tb, ["b", "token"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .where(jac >= threshold)
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
    )
