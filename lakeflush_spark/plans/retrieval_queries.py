"""Q63 — BM25 keyword retrieval over the documents corpus.

Targeted-selection surface next to DSIR (q41 'dsir_*') and the quality
classifier (q60 'clf'): score every document against a fixed keyword
query set with Okapi BM25 and keep the top 100 per query.

Reference parity: none — /root/reference has no text analysis
(SURVEY.md §2.B); the DuckDB oracle contract is the spec.

Hash determinism (the q60-'clf' recipe, applied to ranking):

- All join/agg witnesses (``tf``, ``df``, ``dl``, ``n_hit``,
  ``sum_tf``) are exact BIGINTs.
- The only transcendental is the idf's single ``ln``; engines may
  differ by ≤1 ulp (measured drift ~1e-15 relative). Per-term scores
  are therefore snapped to an integer 1e-6 grid with half-up rounding
  (``floor(s·1e6 + 0.5)``), and any term whose pre-snap value lies
  within 1e-3 grid units (1e-9 in score units) of a rounding boundary
  marks the whole (query, doc) row ``masked`` — both engines agree on
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
from lakeflush_spark.operators.retrieval import B, K1, bm25_term_scores, query_frame
from lakeflush_spark.operators.topk import grouped_top_k
from lakeflush_spark.plans.queries import declare

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

_ORACLE = f"""
WITH q (query_id, query) AS (VALUES {_VALUES}),
qt AS (
    SELECT CAST(query_id AS BIGINT) AS query_id,
           unnest(list_distinct(string_split(query, ' '))) AS term
    FROM q),
terms AS (SELECT DISTINCT term FROM qt),
d AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_len
    FROM d),
post AS (
    SELECT term, doc_id, dl, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d) p
    JOIN terms USING (term)
    GROUP BY term, doc_id, dl),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
ts AS (
    SELECT qt.query_id, post.doc_id, post.dl, post.tf,
           (ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            * ((tf * {K1 + 1.0!r}) /
               (tf + {K1!r} * ({1.0 - B!r} + {B!r} *
                    (dl / (CAST(total_len AS DOUBLE) / n_docs)))))
           ) * 1000000.0 AS s6
    FROM post JOIN dft USING (term) JOIN qt USING (term) CROSS JOIN stats),
ts2 AS (
    SELECT query_id, doc_id, dl, tf,
           CAST(floor(s6 + 0.5) AS BIGINT) AS si,
           (abs(s6 - floor(s6) - 0.5) < {EDGE_BAND!r}) AS edge
    FROM ts),
agg AS (
    SELECT query_id, doc_id, dl,
           CAST(COUNT(*) AS BIGINT) AS n_hit,
           CAST(SUM(tf) AS BIGINT) AS sum_tf,
           CAST(SUM(si) AS BIGINT) AS s_sum,
           bool_or(edge) AS masked
    FROM ts2 GROUP BY query_id, doc_id, dl),
fin AS (
    SELECT query_id, doc_id, n_hit, sum_tf, dl,
           CASE WHEN masked THEN NULL ELSE s_sum END AS score_e6,
           masked,
           CAST(row_number() OVER (
                PARTITION BY query_id
                ORDER BY (CASE WHEN masked THEN NULL ELSE s_sum END)
                         DESC NULLS LAST,
                         doc_id) AS BIGINT) AS rank
    FROM agg)
SELECT query_id, doc_id, n_hit, sum_tf, dl, score_e6, masked, rank
FROM fin
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


@declare(
    "q63_bm25",
    _ORACLE,
    "Okapi BM25 keyword retrieval, top-100 per query: broadcast query "
    "terms prune the corpus explode map-side, exact-integer witnesses, "
    "1e-6-grid-snapped banded scores, salted two-pass top-k.",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = bm25_term_scores(docs, query_frame(spark, QUERIES))
    s6 = F.col("s") * F.lit(1000000.0)
    ts2 = ts.select(
        "query_id",
        "doc_id",
        "dl",
        "tf",
        F.floor(s6 + F.lit(0.5)).cast("bigint").alias("si"),
        (F.abs(s6 - F.floor(s6) - F.lit(0.5)) < F.lit(EDGE_BAND)).alias("edge"),
    )
    agg = ts2.groupBy("query_id", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit"),
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
        "query_id", "doc_id", "n_hit", "sum_tf", "dl", "score_e6", "masked", "rank"
    ).orderBy("query_id", "rank")
