"""Training-data pipeline extensions (SURVEY.md §2.11) — the operators a
100 TB corpus-curation pipeline needs beyond the reference's graph
surface. Re-exported here so pipeline code reads as one namespace (see
examples/training_data_pipeline.py for the composed flow).
"""

from gelly_streaming_spark.ext.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_dedup_pairs,
    near_dup_collapse,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from gelly_streaming_spark.ext.embeddings import (
    embedding_near_dup_pairs,
    ivf_index,
    kmeans_refine_distributed,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    knn_pq,
    pq_codebooks,
    pq_codebooks_trained,
    pq_encode,
    pq_index,
    residue_centroids,
    semantic_decontaminate,
    semantic_dedup,
)
from gelly_streaming_spark.ext.similarity import (
    jaccard_pairs,
    minhash_lsh_pairs,
)
from gelly_streaming_spark.ext.pipeline import curate_corpus
from gelly_streaming_spark.ext.web import (
    PSL_RULES,
    canonicalize_url,
    domain_filter,
    load_psl_file,
    parse_psl,
    registered_domain,
    registered_domain_lookup,
    url_host,
)
from gelly_streaming_spark.ext.split import (
    assign_split,
    deterministic_sample_per_group,
    mixture_sample,
    pack_sequences,
    stratified_split_report,
)
from gelly_streaming_spark.ext.multimodal import (
    extract_features,
    frame_sample,
    media_decoder,
    resize_media,
)
from gelly_streaming_spark.ext.text import (
    classifier_score,
    pmi_collocations,
    ngram_lm_scores,
    decontaminate,
    doc_shingles,
    duplicate_passages,
    source_overlap,
    ngram_repetition,
    scrub_pii,
    text_profile,
    tfidf_keywords,
    token_doc_counts,
    vocabulary,
)

__all__ = [
    "exact_dedup",
    "exact_dedup_groups",
    "minhash_dedup_pairs",
    "near_dup_collapse",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "embedding_near_dup_pairs",
    "ivf_index",
    "knn_bruteforce",
    "kmeans_refine_distributed",
    "knn_ivf",
    "semantic_dedup",
    "ngram_lm_scores",
    "classifier_score",
    "pmi_collocations",
    "knn_lsh",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "assign_split",
    "curate_corpus",
    "deterministic_sample_per_group",
    "mixture_sample",
    "pack_sequences",
    "stratified_split_report",
    "extract_features",
    "frame_sample",
    "media_decoder",
    "resize_media",
    "decontaminate",
    "doc_shingles",
    "duplicate_passages",
    "source_overlap",
    "ngram_repetition",
    "scrub_pii",
    "text_profile",
    "tfidf_keywords",
    "token_doc_counts",
    "vocabulary",
    "PSL_RULES",
    "canonicalize_url",
    "domain_filter",
    "load_psl_file",
    "parse_psl",
    "registered_domain",
    "registered_domain_lookup",
    "url_host",
]
