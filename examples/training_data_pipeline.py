#!/usr/bin/env python
"""End-to-end training-data curation over the documents table — the
extension layer (SURVEY.md §2.11) composed the way a 100 TB corpus
pipeline would run it. No reference counterpart (gelly-streaming has no
document surface); every stage is the declared-query operator behind
q21/q24/q31-q37.

Usage:
    python examples/training_data_pipeline.py [SF_DIR]

Stages (each a lazy DataFrame plan; one linear pass end to end):

  profile   -> token counts, quality score, language id, fingerprint
  filter    -> drop low-quality docs (Gopher-style repetition + quality)
  dedup     -> collapse near-duplicate clusters to one kept doc each
  decontam  -> drop docs sharing shingles with a held-out eval set
  split     -> deterministic train/val/test assignment (hash, no RNG)
  sample    -> reproducible per-language downsample of the train split
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from gelly_streaming_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training-data-pipeline", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")

    from gelly_streaming_spark.ext.dedup import near_dup_collapse
    from gelly_streaming_spark.ext.split import (
        assign_split,
        deterministic_sample_per_group,
    )
    from gelly_streaming_spark.ext.text import (
        decontaminate,
        ngram_repetition,
        text_profile,
    )
    from gelly_streaming_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # profile + quality filter (repetition joins in as exact integers)
    prof = text_profile(docs)
    rep = ngram_repetition(docs, n=3)
    keep = (
        prof.join(rep, "doc_id", "left")
        .where(
            (F.col("quality") >= 0.5)
            & (
                F.col("n_distinct").isNull()
                | (F.col("n_distinct") >= 0.3 * F.col("n_ngrams"))
            )
        )
        .select("doc_id", "text", "lang", "source")
    )
    n1 = keep.count()

    # near-duplicate collapse: keep one representative per cluster
    keepers = near_dup_collapse(keep, threshold=0.9).select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = keep.join(keepers, "doc_id", "left_semi")
    n2 = deduped.count()

    # decontamination against a simulated eval set
    block = docs.where(F.col("doc_id") % 97 == 0)
    contaminated = decontaminate(deduped, block, n=3).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti").join(
        block.select("doc_id"), "doc_id", "left_anti"
    )
    n3 = clean.count()

    # deterministic split + reproducible per-language train sample
    labeled = clean.withColumn("split", assign_split(F.col("doc_id")))
    shares = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    train = labeled.where(F.col("split") == "train")
    sample = deterministic_sample_per_group(
        train.select("doc_id", "lang"), ["lang"], "doc_id", 10
    )
    n4 = sample.count()

    print(f"corpus {n0} -> quality-filtered {n1} -> deduped {n2} "
          f"-> decontaminated {n3}")
    print(f"splits: {shares}")
    print(f"train sample (<=10/lang, reproducible): {n4} docs")
    assert n0 >= n1 >= n2 >= n3 > 0

    # web provenance: canonicalize synthetic crawl URLs, extract the
    # registered domain, drop blocklisted domains (zero-shuffle stage)
    from gelly_streaming_spark.ext.text import source_overlap
    from gelly_streaming_spark.ext.web import domain_filter

    d = F.col("doc_id")
    with_url = clean.withColumn(
        "url",
        F.concat(F.lit("https://www."), F.col("source"),
                 F.lit("-crawl.com/doc/"), d.cast("string"),
                 F.lit("?utm_source=feed&id="), d.cast("string")),
    )
    bl = spark.sql("SELECT * FROM VALUES ('src1-crawl.com') t(domain)")
    webbed = domain_filter(with_url, bl)
    n5 = webbed.where(~F.col("blocked")).count()
    print(f"domain blocklist: {n3} -> {n5} docs "
          f"(dropped {n3 - n5} from blocklisted domains)")

    # cross-source overlap: which sources share content (data-mixture
    # diagnostic — heavily overlapping sources are one source for dedup)
    top = source_overlap(clean, n=3).orderBy(F.desc("shared")).limit(3).collect()
    print("most-overlapping source pairs:",
          [(r.src_a, r.src_b, r.shared) for r in top])


if __name__ == "__main__":
    main()
