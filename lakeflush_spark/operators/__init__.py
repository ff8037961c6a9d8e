from lakeflush_spark.operators.bpe import (
    bpe_encode,
    train_bpe,
    word_histogram,
)
from lakeflush_spark.operators.compaction import (
    AuditCursor,
    CompactionConfig,
    CompactionResult,
    IncrementResult,
    audit_table,
    compact,
    read_increment,
)
from lakeflush_spark.operators.decontaminate import (
    DecontamResult,
    contamination_pairs,
    decontaminate,
    eval_leak_report,
)
from lakeflush_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample_corpus,
    dsir_select,
    hashed_gram_counts,
)
from lakeflush_spark.operators.dedup import (
    cluster_representatives,
    exact_dedup,
    exact_dedup_by_hash,
    keep_best_per_cluster,
    minhash_near_dups,
    near_dup_clusters,
    simhash_near_dups,
)
from lakeflush_spark.operators.layout import zorder_write
from lakeflush_spark.operators.mixing import (
    deterministic_shuffle,
    epoch_shortfall,
    epoch_shuffle_key,
    materialize_epochs,
    mix_sources,
    sample_fraction,
    select_training_mix,
    plan_epochs,
    unimax_allocations,
    sharded_prefix_sum,
    take_token_budget,
    temperature_weights,
)
from lakeflush_spark.operators.lm_filter import (
    lm_logprob_scores,
    train_bigram_lm,
)
from lakeflush_spark.operators.phash import (
    phash_core_numpy,
    phash_images,
    phash_near_dups,
)
from lakeflush_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    tfidf_doc_terms,
)
from lakeflush_spark.operators.quality import (
    c4_filter,
    c4_flags,
    gopher_filter,
    gopher_flags,
    massivetext_repetition_flags,
    quality_views_inline,
    repetition_filter,
    text_quality_profile,
)
from lakeflush_spark.operators.quality_classifier import (
    classifier_filter,
    pareto_sample_condition,
    quality_score_col,
    quality_score_from_text,
    train_quality_classifier,
)
from lakeflush_spark.operators.report import (
    corpus_report,
    sketch_quantile_verdicts,
)
from lakeflush_spark.operators.similarity import (
    build_ivf_index,
    ivf_search,
    quantize_index,
    semantic_dedup,
    semantic_dedup_pairs,
    semantic_drop_ids,
)
from lakeflush_spark.operators.topk import (
    global_ntile,
    global_row_number,
    grouped_top_k,
)
from lakeflush_spark.operators.manifest import scan_manifest
from lakeflush_spark.operators.multimodal import (
    extract_features,
    media_metadata,
    resize_media,
    sample_frames,
)
from lakeflush_spark.operators.jpeg_codec import decode_jpeg
from lakeflush_spark.operators.png_codec import decode_png, encode_png
from lakeflush_spark.operators.substring_dedup import (
    docs_with_repeated_spans,
    repeated_span_texts,
    repeated_spans,
    strip_repeated_spans,
)

__all__ = [
    "AuditCursor",
    "bpe_encode",
    "CompactionConfig",
    "CompactionResult",
    "DecontamResult",
    "IncrementResult",
    "audit_table",
    "compact",
    "corpus_report",
    "read_increment",
    "contamination_pairs",
    "decode_jpeg",
    "decode_png",
    "decontaminate",
    "deterministic_shuffle",
    "docs_with_repeated_spans",
    "encode_png",
    "eval_leak_report",
    "exact_dedup",
    "exact_dedup_by_hash",
    "extract_features",
    "global_ntile",
    "global_row_number",
    "lm_logprob_scores",
    "grouped_top_k",
    "mix_sources",
    "sample_fraction",
    "plan_epochs",
    "dsir_log_weights",
    "dsir_resample_corpus",
    "dsir_select",
    "hashed_gram_counts",
    "epoch_shortfall",
    "epoch_shuffle_key",
    "materialize_epochs",
    "select_training_mix",
    "unimax_allocations",
    "take_token_budget",
    "temperature_weights",
    "train_bigram_lm",
    "train_bpe",
    "word_histogram",
    "c4_filter",
    "c4_flags",
    "gopher_filter",
    "gopher_flags",
    "massivetext_repetition_flags",
    "repetition_filter",
    "text_quality_profile",
    "quality_views_inline",
    "classifier_filter",
    "pareto_sample_condition",
    "quality_score_col",
    "quality_score_from_text",
    "train_quality_classifier",
    "media_metadata",
    "minhash_near_dups",
    "near_dup_clusters",
    "repeated_span_texts",
    "repeated_spans",
    "resize_media",
    "sample_frames",
    "scan_manifest",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "semantic_drop_ids",
    "sharded_prefix_sum",
    "sketch_quantile_verdicts",
    "simhash_near_dups",
    "bm25_scores",
    "phash_core_numpy",
    "phash_images",
    "phash_near_dups",
    "cluster_representatives",
    "keep_best_per_cluster",
    "bm25_topk",
    "tfidf_doc_terms",
    "strip_repeated_spans",
    "zorder_write",
]
