"""Scalar/array function library (text analysis, hashing, vectors).

All builders return JVM-side Column expressions (pyspark.sql.functions
only — no Python UDFs in any hot path), so every derived column stays
inside whole-stage codegen and scales linearly with executors.
"""

from lakeflush_spark.functions.html import (  # noqa: F401
    html_to_text,
    html_to_text_sql,
)
from lakeflush_spark.functions.text import (  # noqa: F401
    avg_token_len,
    avg_token_len_4dp,
    doc_fingerprint,
    lang_id,
    punct_count,
    quality_score,
    quality_score_4dp,
    shingles,
    stopword_ratio,
    stopword_ratio_4dp,
    token_count,
    token_hash,
    tokens,
    word_count,
    words,
)
from lakeflush_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    jl_sign_matrix,
    l2_norm,
    random_project,
    sign_lsh_bucket,
    to_double_vec,
)
