"""Q61 — train/eval decontamination (LLM-data corpus hygiene).

The oracle SQL is generated from the SAME constants as the Spark
builder (``operators/decontaminate.py``): DuckDB recomputes the
lowercased 5-gram hash sets, the eval/corpus md5-bucket split, the
pair-level overlap counts and Jaccards, the per-corpus-doc DISTINCT
contaminated-gram counts (the ``min_common`` semantics), and the
clean-count after removal — so the driver's value-hash comparison
validates the whole decontamination pipeline end to end.

The synthetic docs are 10–99 tokens with a tiny vocabulary, so the
contract uses n=5 (n=3 drowns in incidental single-gram overlaps; the
production default is the published 13). The eval set is the q60-style
deterministic ~10% md5 bucket of doc ids, which splits a handful of
the corpus's planted near-dup pairs across the eval/corpus boundary —
real contamination for the query to find.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lakeflush_spark.io import load_table, spread_for_compute
from lakeflush_spark.operators.decontaminate import decontaminate
from lakeflush_spark.plans.queries import declare

#: contract-query n-gram width (see module docstring)
CONTRACT_N = 5
#: eval split: md5(doc_id) bucket < EVAL_PCT of 100 (the q60 trick)
EVAL_PCT = 10

_BUCKET = "('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"

# lowercased distinct 5-gram hash set — twin of
# operators/decontaminate.ngram_hash_set (lower -> distinct gram
# strings -> md5/32-bit hash -> distinct AGAIN for collision safety)
_GRAM5 = (
    " || ' ' || ".join(f"toks[i+{j}]" for j in range(CONTRACT_N))
    .replace("toks[i+0]", "toks[i]")
)
_HS = (
    f"list_distinct(list_transform("
    f"list_distinct(CASE WHEN len(toks) >= {CONTRACT_N} THEN "
    f"list_transform(range(1, len(toks) - {CONTRACT_N - 2}), i -> {_GRAM5}) "
    f"ELSE [] END), "
    f"s -> ('0x' || substring(md5(s), 1, 8))::BIGINT))"
)


@declare(
    "q61_decontaminate",
    f"""
    WITH t AS (SELECT doc_id, {_BUCKET} AS bucket,
                      string_split(lower(text), ' ') AS toks
               FROM documents),
    h AS (SELECT doc_id, bucket, {_HS} AS hs FROM t),
    eg AS (SELECT doc_id AS eval_id, len(hs) AS esz, unnest(hs) AS g
           FROM h WHERE bucket < {EVAL_PCT} AND len(hs) > 0),
    cg AS (SELECT doc_id AS corpus_id, len(hs) AS csz, unnest(hs) AS g
           FROM h WHERE bucket >= {EVAL_PCT} AND len(hs) > 0),
    hits AS (SELECT cg.corpus_id, cg.csz, eg.eval_id, eg.esz, cg.g
             FROM cg JOIN eg ON cg.g = eg.g),
    pairs AS (SELECT eval_id, corpus_id, esz, csz,
                     CAST(COUNT(*) AS BIGINT) AS n_common
              FROM hits GROUP BY 1, 2, 3, 4),
    contam AS (SELECT corpus_id,
                      CAST(COUNT(DISTINCT g) AS BIGINT) AS n_grams
               FROM hits GROUP BY 1),
    pj AS (SELECT eval_id, corpus_id, n_common,
                  n_common::DOUBLE / (esz + csz - n_common)::DOUBLE AS jac
           FROM pairs),
    evaltop AS (SELECT eval_id, corpus_id FROM (
        SELECT eval_id, corpus_id,
               row_number() OVER (
                   PARTITION BY eval_id ORDER BY jac DESC, corpus_id DESC
               ) AS rn
        FROM pj) WHERE rn = 1)
    SELECT part, id_a, id_b, n, jac FROM (
      SELECT 'pair' AS part, eval_id AS id_a, corpus_id AS id_b,
             n_common AS n, jac
      FROM pj
      UNION ALL
      SELECT 'doc', corpus_id, NULL::BIGINT, n_grams, NULL::DOUBLE
      FROM contam
      UNION ALL
      SELECT 'clean', NULL::BIGINT, NULL::BIGINT,
             (SELECT COUNT(*) FROM t WHERE bucket >= {EVAL_PCT})
               - (SELECT COUNT(*) FROM contam),
             NULL::DOUBLE
      UNION ALL
      SELECT 'eval', pj.eval_id, evaltop.corpus_id,
             CAST(COUNT(*) AS BIGINT), MAX(pj.jac)
      FROM pj JOIN evaltop ON pj.eval_id = evaltop.eval_id
      GROUP BY pj.eval_id, evaltop.corpus_id
    )
    ORDER BY part, id_a NULLS FIRST, id_b NULLS FIRST
    """,
    "Train/eval decontamination, fully value-checked: 'pair' rows are the "
    "(eval, corpus) overlap audit with exact n-gram-set Jaccard, 'doc' rows "
    "the flagged corpus docs with DISTINCT contaminated-gram counts "
    "(min_common semantics), 'clean' the corpus count after broadcast "
    "anti-join removal, and 'eval' (r6) the eval-side leak report — "
    "per leaked eval item: corpus hit count, max jaccard, and the "
    "deterministic worst offender (operators/decontaminate."
    "eval_leak_report). Corpus side never shuffles: map-only gram "
    "explode into a BroadcastHashJoin against the (small) eval gram "
    "table; only contaminated hits reach the aggregations.",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"), spark)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    eval_docs = docs.where(bucket < EVAL_PCT)
    corpus = docs.where(bucket >= EVAL_PCT)
    # materialize=True pins the hit set (only MATCHING gram rows — KBs
    # here, bounded by contamination volume at any scale) so the union
    # branches run the corpus probe once, not four times (measured
    # 1.6x on the whole query at sf0.1). eager=True (r15, VERDICT r14
    # #6): the lazy persist still let the ONE materializing action
    # race all four branch subtrees into the empty cache concurrently
    # — each recomputed the full corpus probe (the 32-core run was
    # SLOWER than 8-core, ratio 0.59, because more cores ran more
    # redundant probes at once). The eager localCheckpoint runs the
    # probe exactly once per build; checkpointed blocks free on GC.
    res = decontaminate(
        corpus, eval_docs, n=CONTRACT_N, min_common=1, materialize=True,
        eager=True,
    )
    null_big = F.lit(None).cast("bigint")
    null_dbl = F.lit(None).cast("double")
    pair_rows = res.pairs.select(
        F.lit("pair").alias("part"),
        F.col("eval_id").cast("bigint").alias("id_a"),
        F.col("corpus_id").cast("bigint").alias("id_b"),
        F.col("n_common").alias("n"),
        F.col("jaccard").alias("jac"),
    )
    doc_rows = res.contaminated.select(
        F.lit("doc").alias("part"),
        F.col("doc_id").cast("bigint").alias("id_a"),
        null_big.alias("id_b"),
        F.col("n_common_grams").alias("n"),
        null_dbl.alias("jac"),
    )
    clean_rows = res.clean.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("clean").alias("part"),
        null_big.alias("id_a"),
        null_big.alias("id_b"),
        F.col("n"),
        null_dbl.alias("jac"),
    )
    # 'eval' (r6): the REAL eval_leak_report operator feeds the hash
    from lakeflush_spark.operators.decontaminate import eval_leak_report

    eval_rows = eval_leak_report(
        corpus, eval_docs, n=CONTRACT_N, min_common=1, pairs=res.pairs
    ).select(
        F.lit("eval").alias("part"),
        F.col("eval_id").cast("bigint").alias("id_a"),
        F.col("top_corpus_id").cast("bigint").alias("id_b"),
        F.col("n_corpus_hits").alias("n"),
        F.col("max_jaccard").alias("jac"),
    )
    return (
        pair_rows.unionAll(doc_rows)
        .unionAll(clean_rows)
        .unionAll(eval_rows)
        .orderBy(
            F.col("part").asc(),
            F.col("id_a").asc_nulls_first(),
            F.col("id_b").asc_nulls_first(),
        )
    )
