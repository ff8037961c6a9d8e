"""BM25 keyword retrieval — the 'bm25' label of q41_wordcount_topk.

Targeted-selection surface next to DSIR (q41 'dsir_*') and the quality
classifier (q60 'clf'): score every document against a fixed keyword
query set with Okapi BM25 and keep the top 100 per query. Hosted as a
q41 label (not a standalone entry) because the driver records at most
50 contract entries — the same consolidation rule every labeled suite
follows (SURVEY §2.C).

Reference parity: none — /root/reference has no text analysis
(SURVEY.md §2.B); the DuckDB oracle contract is the spec.

Hash determinism (the q60-'clf' recipe, applied to ranking):

- All join/agg witnesses (``tf``, ``df``, ``dl``, ``sum_tf``) are
  exact BIGINTs.
- The only transcendental is the idf's single ``ln``; engines may
  differ by ≤1 ulp (measured drift ~1e-15 relative). Per-term scores
  are therefore snapped to an integer 1e-6 grid with half-up rounding
  (``floor(s·1e6 + 0.5)``), and any term whose pre-snap value lies
  within 1e-3 grid units (1e-9 in score units) of a rounding boundary
  marks the whole (query, doc) row masked — both engines agree on
  every unmasked value exactly, and masked rows carry NULL scores so
  disagreement is impossible by construction.
- The per-(query, doc) score is the BIGINT SUM of snapped per-term
  scores — integer addition is order-free, so Spark's nondeterministic
  aggregation order cannot perturb the hash (float sums would).
- Ranking orders by ``(score_e6 DESC NULLS LAST, doc_id)`` — a total
  order over values both engines agree on bit-for-bit.

Scale notes are in operators/retrieval.py: broadcast query terms
prune the corpus explode map-side, one combinable shuffle on
``(term, doc)``, salted two-pass top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.retrieval import (
    B,
    K1,
    bm25_term_scores,
    query_frame,
    tfidf_term_scores,
)
from lakeflush_spark.operators.topk import grouped_top_k

#: the fixed query set — corpus-vocabulary keywords chosen to exercise
#: both idf regimes ('dup' is rare, df≈5% of docs; the rest are
#: common, df≈78%) and varying query lengths.
QUERIES: list[tuple[int, str]] = [
    (0, "hash join dup"),
    (1, "window agg stream"),
    (2, "customer order line sort"),
    (3, "vector scan filter slow"),
]
TOP_K = 100
#: rounding-boundary band, in 1e-6-grid units (1e-9 in score units —
#: six orders above the measured ~1e-15 cross-engine ln drift).
EDGE_BAND = 1e-3

_VALUES = ", ".join(f"({i}, '{q}')" for i, q in QUERIES)

#: CTE chain ending in ``bm_fin`` — spliced into q41's WITH list
#: (bm_-prefixed names to avoid collisions with the host's CTEs).
BM25_CTES = f"""
bm_q (query_id, query) AS (VALUES {_VALUES}),
bm_qt AS (
    SELECT CAST(query_id AS BIGINT) AS query_id,
           unnest(list_distinct(string_split(query, ' '))) AS term
    FROM bm_q),
bm_terms AS (SELECT DISTINCT term FROM bm_qt),
bm_d AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents),
bm_stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_len
    FROM bm_d),
bm_post AS (
    SELECT term, doc_id, dl, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(toks) AS term FROM bm_d) p
    JOIN bm_terms USING (term)
    GROUP BY term, doc_id, dl),
bm_dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM bm_post GROUP BY term),
bm_ts AS (
    SELECT bm_qt.query_id, bm_post.doc_id, bm_post.dl, bm_post.tf,
           (ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            * ((tf * {K1 + 1.0!r}) /
               (tf + {K1!r} * ({1.0 - B!r} + {B!r} *
                    (dl / (CAST(total_len AS DOUBLE) / n_docs)))))
           ) * 1000000.0 AS s6
    FROM bm_post JOIN bm_dft USING (term) JOIN bm_qt USING (term)
    CROSS JOIN bm_stats),
bm_ts2 AS (
    SELECT query_id, doc_id, dl, tf,
           CAST(floor(s6 + 0.5) AS BIGINT) AS si,
           (abs(s6 - floor(s6) - 0.5) < {EDGE_BAND!r}) AS edge
    FROM bm_ts),
bm_agg AS (
    SELECT query_id, doc_id,
           CAST(SUM(tf) AS BIGINT) AS sum_tf,
           CAST(SUM(si) AS BIGINT) AS s_sum,
           bool_or(edge) AS masked
    FROM bm_ts2 GROUP BY query_id, doc_id),
bm_fin AS (
    SELECT query_id, doc_id, sum_tf,
           CASE WHEN masked THEN NULL ELSE s_sum END AS score_e6,
           CAST(row_number() OVER (
                PARTITION BY query_id
                ORDER BY (CASE WHEN masked THEN NULL ELSE s_sum END)
                         DESC NULLS LAST,
                         doc_id) AS BIGINT) AS rank
    FROM bm_agg)
"""

#: the q41 UNION ALL branch over the fragment above.
BM25_BRANCH = f"""
SELECT 'bm25' AS method, query_id::VARCHAR AS k1, doc_id::VARCHAR AS k2,
       score_e6 AS n1, rank AS n2, sum_tf AS n3
FROM bm_fin WHERE rank <= {TOP_K}
"""


#: 'tfidf' label bounds: per-doc keyword extraction verified for the
#: first TFIDF_DOC_LIM docs, top TFIDF_K terms each.
TFIDF_DOC_LIM = 40
TFIDF_K = 3

#: CTE chain ending in ``tfd_fin`` — spliced into q41's WITH list.
TFIDF_CTES = f"""
tfd_tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
    GROUP BY doc_id, term),
tfd_df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfd_tf GROUP BY term),
tfd_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tfd_s AS (
    SELECT doc_id, term, tf,
           (tf * ln(CAST(n_docs AS DOUBLE) / df)) * 1000000.0 AS s6
    FROM tfd_tf JOIN tfd_df USING (term) CROSS JOIN tfd_n
    WHERE doc_id < {TFIDF_DOC_LIM}),
tfd_g AS (
    SELECT doc_id, term, tf,
           CASE WHEN abs(s6 - floor(s6) - 0.5) < {EDGE_BAND!r}
                THEN NULL ELSE CAST(floor(s6 + 0.5) AS BIGINT) END AS score_e6
    FROM tfd_s),
tfd_fin AS (
    SELECT doc_id, term, tf, score_e6,
           CAST(row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_e6 DESC NULLS LAST, term) AS BIGINT) AS rank
    FROM tfd_g)
"""

#: the q41 UNION ALL branch over the fragment above.
TFIDF_BRANCH = f"""
SELECT 'tfidf' AS method, doc_id::VARCHAR AS k1, term AS k2,
       score_e6 AS n1, rank AS n2, tf AS n3
FROM tfd_fin WHERE rank <= {TFIDF_K}
"""


def tfidf_label_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'tfidf' label rows in q41's (method, k1, k2, n1, n2, n3)
    schema: k1 = doc_id, k2 = term, n1 = banded 1e-6-grid tf-idf (NULL
    when within the band of a rounding boundary — per TERM here, no
    summation), n2 = rank, n3 = tf. df/N come from the WHOLE corpus
    (the semantics); only the output is doc-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    ts = tfidf_term_scores(docs).where(F.col("doc_id") < TFIDF_DOC_LIM)
    s6 = F.col("tfidf") * F.lit(1000000.0)
    g = ts.select(
        "doc_id",
        "term",
        "tf",
        F.when(
            F.abs(s6 - F.floor(s6) - F.lit(0.5)) < F.lit(EDGE_BAND),
            F.lit(None).cast("bigint"),
        )
        .otherwise(F.floor(s6 + F.lit(0.5)).cast("bigint"))
        .alias("score_e6"),
    )
    top = grouped_top_k(
        g,
        group_cols=["doc_id"],
        order_cols=[F.col("score_e6").desc_nulls_last(), F.col("term").asc()],
        k=TFIDF_K,
        salt_cols=["term"],
    )
    return top.select(
        F.lit("tfidf").alias("method"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("term").alias("k2"),
        F.col("score_e6").alias("n1"),
        F.col("rank").alias("n2"),
        F.col("tf").alias("n3"),
    )


def bm25_label_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'bm25' label rows in q41's (method, k1, k2, n1, n2, n3)
    schema: k1 = query_id, k2 = doc_id, n1 = banded 1e-6-grid score
    (NULL when masked), n2 = rank, n3 = summed term frequency."""
    docs = load_table(spark, sf_dir, "documents")
    ts = bm25_term_scores(docs, query_frame(spark, QUERIES))
    s6 = F.col("s") * F.lit(1000000.0)
    ts2 = ts.select(
        "query_id",
        "doc_id",
        "tf",
        F.floor(s6 + F.lit(0.5)).cast("bigint").alias("si"),
        (F.abs(s6 - F.floor(s6) - F.lit(0.5)) < F.lit(EDGE_BAND)).alias("edge"),
    )
    agg = ts2.groupBy("query_id", "doc_id").agg(
        F.sum("tf").cast("bigint").alias("sum_tf"),
        F.sum("si").cast("bigint").alias("s_sum"),
        F.bool_or("edge").alias("masked"),
    )
    banded = agg.withColumn(
        "score_e6",
        F.when(F.col("masked"), F.lit(None).cast("bigint")).otherwise(
            F.col("s_sum")
        ),
    )
    top = grouped_top_k(
        banded,
        group_cols=["query_id"],
        order_cols=[F.col("score_e6").desc_nulls_last(), F.col("doc_id").asc()],
        k=TOP_K,
        salt_cols=["doc_id"],
    )
    return top.select(
        F.lit("bm25").alias("method"),
        F.col("query_id").cast("string").alias("k1"),
        F.col("doc_id").cast("string").alias("k2"),
        F.col("score_e6").alias("n1"),
        F.col("rank").alias("n2"),
        F.col("sum_tf").alias("n3"),
    )


# ---------------------------------------------------------------------------
# 'rrf' label (r12) — HYBRID retrieval: the BM25 keyword ranking and an
# embedding ANN ranking fused per query with reciprocal-rank fusion
# (operators/retrieval.reciprocal_rank_fusion). The hybrid query i
# (i = 0..3) is "docs matching keyword set i AND similar to example
# doc i": the text side is QUERIES[i], the vector side is the corpus
# embedding with vec_id == i (documents/embeddings ids align 1:1 by
# the testdata contract). ANN side = exact brute-force cosine top-100
# (q29's engine-independent recipe: 4dp-rounded cosine, id tie-break,
# self excluded); fusion needs no score normalization and no edge
# band — the RRF chain is IEEE-exact on both engines (see the
# operator's docstring).
# ---------------------------------------------------------------------------
RRF_ANN_K = 100
RRF_TOP = 20
RRF_N_QUERIES = 4

RRF_CTES = f"""
rf_e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         FROM embeddings),
rf_n AS (SELECT vec_id, v,
                sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         FROM rf_e),
rf_q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM rf_n
         WHERE vec_id < {RRF_N_QUERIES}),
rf_ann AS (
    SELECT query_id, doc_id, rank FROM (
        SELECT qid AS query_id, vec_id AS doc_id,
               CAST(row_number() OVER (
                   PARTITION BY qid
                   ORDER BY round(list_sum(list_transform(range(1, 65),
                                i -> qv[i] * v[i])) / (qnrm * nrm), 4) DESC,
                            vec_id) AS BIGINT) AS rank
        FROM rf_n JOIN rf_q ON vec_id != qid)
    WHERE rank <= {RRF_ANN_K}),
rf_bm AS (SELECT query_id, doc_id, rank FROM bm_fin
          WHERE rank <= {RRF_ANN_K} AND query_id < {RRF_N_QUERIES}),
rf_f AS (
    SELECT query_id, doc_id,
           (CASE WHEN a.rank IS NULL THEN 0.0
                 ELSE 1.0 / (60 + a.rank) END
            + CASE WHEN b.rank IS NULL THEN 0.0
                   ELSE 1.0 / (60 + b.rank) END) AS rrf,
           (CASE WHEN a.rank IS NULL THEN 0 ELSE 1 END
            + CASE WHEN b.rank IS NULL THEN 0 ELSE 2 END)::BIGINT AS src
    FROM rf_bm a FULL OUTER JOIN rf_ann b USING (query_id, doc_id)),
rf_fin AS (
    SELECT query_id, doc_id,
           CAST(floor(rrf * 1000000000.0 + 0.5) AS BIGINT) AS rrf_e9,
           src,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(floor(rrf * 1000000000.0 + 0.5) AS BIGINT)
                        DESC, doc_id) AS BIGINT) AS rank
    FROM rf_f)
"""

RRF_BRANCH = f"""
SELECT 'rrf' AS method, query_id::VARCHAR AS k1, doc_id::VARCHAR AS k2,
       rrf_e9 AS n1, rank AS n2, src AS n3
FROM rf_fin WHERE rank <= {RRF_TOP}
"""


def rrf_ann_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rrf label's ANN side: exact brute-force cosine top-RRF_ANN_K
    per example query (vec_id < RRF_N_QUERIES), as (query_id, doc_id,
    rank). Built once per (session, sf_dir) by _q41_shared — the
    400-row artifact was the largest term in the label's build time
    when recomputed per call (VERDICT r12 #6)."""
    from lakeflush_spark.io import spread_for_compute
    from lakeflush_spark.operators.similarity import (
        brute_force_topk,
        prepare_vectors,
    )

    emb = spread_for_compute(load_table(spark, sf_dir, "embeddings"), spark)
    corpus = prepare_vectors(emb)
    return brute_force_topk(
        corpus, corpus.where(corpus.vid < RRF_N_QUERIES), k=RRF_ANN_K
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")


def rrf_label_frame(
    spark: SparkSession,
    sf_dir: str,
    bm25_frame: DataFrame,
    ann_ranks: DataFrame | None = None,
) -> DataFrame:
    """The 'rrf' label rows in q41's schema: k1 = query_id, k2 =
    doc_id, n1 = the fused score on the exact 1e-9 grid, n2 = fused
    rank (top RRF_TOP per query), n3 = source bitmask (1 = BM25 only,
    2 = ANN only, 3 = both). ``bm25_frame`` is the already-built
    'bm25' label frame and ``ann_ranks`` the memoized
    :func:`rrf_ann_ranks` artifact — both reused, not recomputed."""
    from lakeflush_spark.operators.retrieval import reciprocal_rank_fusion

    bm_ranks = bm25_frame.select(
        F.col("k1").cast("bigint").alias("query_id"),
        F.col("k2").cast("bigint").alias("doc_id"),
        F.col("n2").alias("rank"),
    ).where(
        (F.col("rank") <= RRF_ANN_K) & (F.col("query_id") < RRF_N_QUERIES)
    )
    if ann_ranks is None:
        ann_ranks = rrf_ann_ranks(spark, sf_dir)
    fused = reciprocal_rank_fusion(bm_ranks, ann_ranks, top_k=RRF_TOP)
    return fused.select(
        F.lit("rrf").alias("method"),
        F.col("query_id").cast("string").alias("k1"),
        F.col("doc_id").cast("string").alias("k2"),
        F.col("rrf_e9").alias("n1"),
        F.col("rank").alias("n2"),
        F.col("src_mask").alias("n3"),
    )
