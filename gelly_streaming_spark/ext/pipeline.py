"""One-call corpus curation: the standard pre-training cleanup pipeline
composed from the engine's first-class operators into a SINGLE
declarative DAG — the composition story every piece of ext/ exists for.

    quality filter → exact dedup → repetition filter →
    decontamination → PII scrub

Every filter is a pure function of the document TEXT and the filters are
conjunctive, so their relative order cannot change the surviving set
(dedup's tie-break is the stable doc key, and duplicate texts share
every text-derived verdict). The plan therefore orders them
cheapest-first: the row-local quality predicate fuses into the scan and
prunes before anything shuffles; dedup is one hash shuffle; the shingle
kernels then run over the smaller survivor set; the PII scrub is a
final zero-shuffle projection.

Scale shape (monotonically shrinking data):
  1. quality_score — column expressions fused into the scan, no shuffle
  2. exact dedup — one md5-keyed shuffle; WindowGroupLimit trims each
     map task to one row per text hash BEFORE the exchange
  3. ONE shingle window over the survivors, consumed ONCE: the bounded
     eval-set shingle table broadcast-joins a per-row hit flag onto the
     stream, and the two map-side-combining rollups carry max(flag)
     alongside the repetition counts — repetition violators and
     decontamination hits come out of the same aggregation
  4. scrub_pii — zero-shuffle projection

REF: no reference counterpart (gelly-streaming has no corpus surface);
this is the capstone of the training-data extension layer
(SURVEY.md §2.11), exercised end to end as q42.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gelly_streaming_spark.ext.text import (
    doc_shingles,
    quality_score,
    scrub_pii,
)


def curate_corpus(
    docs: DataFrame,
    blocklist: DataFrame | None = None,
    min_quality: float = 0.5,
    max_rep_permille: int = 200,
    n: int = 3,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Run the full curation pipeline; returns the surviving rows with
    ``quality`` (rounded, [0,1]) and ``<text_col>_scrubbed`` appended.

    ``max_rep_permille`` bounds the duplicate-n-gram fraction as an
    INTEGER cross-multiplication — ``(n_ngrams - n_distinct) * 1000 <=
    max_rep_permille * n_ngrams`` — so the filter decision is exact on
    both engine and oracle (no float division to disagree on). Documents
    too short to have any ``n``-gram pass the repetition filter (their
    duplicate fraction is vacuously zero). ``blocklist=None`` skips the
    decontamination stage.

    Shared-work plan notes: the dedup-survivor set feeds two consumers
    (the shingle rollup and the output row stream) and is deliberately
    NOT pinned (r14 — it was a lazy localCheckpoint): each consumer's
    branch column-prunes its own scan (the shingle branch reads only
    (doc_id, text); the row branch carries the full row), so the
    "duplicated" quality+dedup subtree is two NARROW passes, each
    fused into its scan — measured 2.4 s vs 2.9 s per call at sf0.1
    against the pinned form, because the pin cost a full survivor-set
    materialization PLUS ~1.1 s of per-call physical planning that
    ``localCheckpoint`` forces at build time (toRdd). At 100 TB the
    same argument holds: a checkpoint writes the whole survivor set to
    executor storage, while the re-run is two column-pruned scans that
    Catalyst prunes independently. No pin also makes the whole
    pipeline purely declarative — re-executing the returned frame
    re-runs everything, which is what lets q42 ride the registry's
    analyzed-plan memo. The repetition stats AND the decontamination
    hits still derive from ONE shingle window over the survivors
    rather than one each. Computing hits before the repetition filter
    instead of after is set-equivalent — the filters are conjunctive
    (final = quality ∧ dedup ∧ ¬repetitive ∧ ¬hit), so a hit row the
    repetition filter would also have dropped is removed either way —
    and saves a full corpus window pass.
    """
    t = F.col(text_col)
    key = F.col(doc_id_col)

    d = docs.withColumn("quality", quality_score(t)).where(
        F.col("quality") >= min_quality
    )

    # exact dedup: the smallest doc key survives per distinct text.
    # rank-limit plans as WindowGroupLimit — map tasks trim to one row
    # per hash before the exchange moves anything.
    w = Window.partitionBy(F.md5(t)).orderBy(key)
    d = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    sh = doc_shingles(d, n, text_col, doc_id_col, hashed=True)

    # The repetition verdict is only ever consumed as a FILTER, so the
    # corpus never joins the per-doc stat table (which is corpus-sized —
    # a guaranteed shuffle of every surviving row): instead the stats
    # reduce to the VIOLATOR id set, which unions with the contamination
    # hits into ONE left-anti probe. Violators + hits are the filtered-
    # out minority by construction, so AQE broadcasts the anti side at
    # runtime and the corpus stream never shuffles after dedup (r9 — was
    # a corpus-wide left join + a separate anti join).
    #
    # The decontamination HIT flag rides the repetition rollup (r10):
    # the bounded eval-shingle table broadcast-joins onto the shingle
    # stream as a per-row flag BEFORE the per-(doc,shingle) aggregation,
    # and max(flag) folds through both rollups — the hits' former
    # separate pass over the shingle stream plus its distinct SHUFFLE
    # are gone, and with one consumer left the shingle window needs no
    # checkpoint barrier (one fewer materialization + job).
    if blocklist is not None:
        block_sh = (
            doc_shingles(blocklist, n, text_col, doc_id_col, hashed=True)
            .select("shingle")
            .distinct()
            .withColumn("_hit", F.lit(True))
        )
        sh = sh.join(F.broadcast(block_sh), "shingle", "left")
        hit_col = F.coalesce(F.col("_hit"), F.lit(False))
    else:
        hit_col = F.lit(False)

    per = sh.groupBy("doc_id", "shingle").agg(
        F.count(F.lit(1)).alias("_c"), F.max(hit_col).alias("_h")
    )
    rep = per.groupBy("doc_id").agg(
        F.sum("_c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_h").alias("_hit_doc"),
    )
    # docs with no n-gram never appear in `rep` — vacuously compliant
    # and unhittable (no shingle can match the eval set)
    bad = rep.where(
        (
            (F.col("n_ngrams") - F.col("n_distinct")) * 1000
            > F.lit(int(max_rep_permille)) * F.col("n_ngrams")
        )
        | F.col("_hit_doc")
    ).select(F.col("doc_id").alias(doc_id_col))

    d = d.join(bad, doc_id_col, "left_anti")
    return scrub_pii(d, text_col)
