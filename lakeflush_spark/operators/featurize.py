"""In-engine text featurization — the hashing trick (Weinberger et
al. 2009, "Feature hashing for large scale multitask learning"; the
HashingTF recipe) as plain DataFrame ops.

Absent from the reference (opaque string records, SURVEY §2.B).
Purpose: every vector operator here (ANN, SemDedup, cluster-balanced
sampling, IVF/PQ serving) assumes an ``embedding`` column that some
external model produced. This module closes the loop for the
model-free tier: a deterministic hashed term-frequency embedding
computed FROM the text itself, good enough for coarse near-dup
blocking, topic clustering, and recall-oriented candidate generation
— and fully replayable in SQL, so the pipeline's vector stages can be
driver-hash-verified end to end from raw text (q28's 'htf' label).

Spark shape, all JVM-side: one token explode + a map-side-combinable
``(id, bucket)`` count, optional IDF weights joined from a ≤``dim``-row
broadcast table, dense assembly per doc from a ``map_from_entries``
aggregate (≤ ``dim`` entries per doc), then the shared
:func:`~lakeflush_spark.functions.vectors.l2_normalize`. No Python
stage, no driver collect (the IDF doc count is one scalar aggregate).
At 100 TB the only shuffle carries ``(id, bucket, count)`` triples —
never document bodies.

Cross-engine determinism contract (what the 'htf' label relies on):
buckets are exact integer md5 arithmetic (the ``_term_bucket_col``
recipe both engines already replay), tf counts are exact BIGINTs, and
the L2 normalization is sqrt/divide over a fixed-order dense fold —
IEEE-correctly-rounded ops on bit-identical inputs, so the normalized
values are bit-identical in Spark and DuckDB with no grid snapping.
IDF mode multiplies by ``ln((N+1)/(df+1)) + 1`` — ``ln`` is NOT
correctly rounded across engines, so IDF embeddings are unit-tested
(numpy twin) rather than oracle-replayed; use TF mode where
hash-exactness matters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from lakeflush_spark.functions.text import tokens
from lakeflush_spark.functions.vectors import l2_normalize


def hashed_tf_embeddings(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf: bool = False,
) -> DataFrame:
    """``(id_col, embedding array<double>)`` — L2-normalized hashed
    term-frequency (optionally TF-IDF) vectors of ``dim`` buckets per
    document. ``dim`` ≤ 65536 (buckets come from 16 bits of md5).

    Feed the result straight into :func:`~lakeflush_spark.operators.
    similarity.prepare_vectors` / ``semantic_dedup`` / the IVF-PQ
    build — the model-free embedding tier. Every input document gets
    exactly one output row; a NULL ``text_col`` yields the zero
    vector (which L2 normalization passes through).
    """
    if not 0 < dim <= 65536:
        raise ValueError(f"dim must be in (0, 65536], got {dim}")
    # NULL-sentinel explode (r14): every document's token array gets
    # one appended NULL element, so even a NULL/empty text yields one
    # (id, NULL-token) row and empty documents ride the aggregation
    # chain as a NULL-bucket marker, coming out as the zero vector —
    # the previous ``docs.select(id).join(dense, "left")`` re-scanned
    # the corpus and paid a third |docs|-row shuffle just to resurrect
    # them (guide §2.4). A plain ``explode_outer`` would do the same
    # with one operator, but GenerateExec only participates in
    # WholeStageCodegen when outer=false — measured 1.5 → 2.1 s at
    # sf0.1 from the interpreted Generate alone — so the sentinel
    # keeps the inner explode and its codegen span. The sentinel's
    # cost is one array copy per doc (concat), a wash with the join
    # at sf0.1 (interleaved medians 1.43 vs 1.56 s); the win is the
    # scale shape: one corpus scan instead of two and no join of the
    # |docs|-row dense frame.
    tok = docs.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.coalesce(tokens(text_col), F.array()),
                F.array(F.lit(None).cast("string")),
            )
        ).alias("_tok"),
    )
    tf = (
        tok.withColumn(
            "_b",
            F.conv(F.substring(F.md5("_tok"), 1, 4), 16, 10).cast("bigint")
            % F.lit(dim),
        )
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_w"))
    )
    if idf:
        n_docs = docs.count()  # one scalar aggregate
        df_tab = (
            tf.groupBy("_b")
            .agg(F.count(F.lit(1)).cast("double").alias("_df"))
            .withColumn(
                "_idf",
                F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + 1.0))
                + 1.0,
            )
            .select("_b", "_idf")
        )
        # LEFT join: the NULL-bucket marker rows of token-less docs
        # must survive (an inner join on _b drops NULL keys); their _w
        # is never read — the collect_list below filters them out
        tf = tf.join(F.broadcast(df_tab), "_b", "left").select(
            id_col, "_b", (F.col("_w") * F.col("_idf")).alias("_w")
        )
    # NULL-bucket markers contribute nothing to the map (collect_list
    # skips NULL elements); a doc whose only row is the marker gets an
    # empty map → the coalesce below emits the zero vector
    dense = tf.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("_b").isNotNull(), F.struct(F.col("_b"), F.col("_w")))
            )
        ).alias("_m")
    )
    idx = F.sequence(F.lit(0).cast("bigint"), F.lit(dim - 1).cast("bigint"))
    return dense.select(
        F.col(id_col),
        l2_normalize(
            F.transform(
                idx, lambda j: F.coalesce(F.element_at(F.col("_m"), j), F.lit(0.0))
            )
        ).alias("embedding"),
    )
