"""Bigram-LM quality scoring (operators/lm_filter.py): fluent text
must outscore gibberish under an in-domain model, with exact count
semantics and layout independence."""

import pyspark.sql.functions as F
import pytest

from lakeflush_spark.operators.lm_filter import (
    _hashed_bigrams,
    lm_logprob_scores,
    train_bigram_lm,
)

B = 1 << 16


@pytest.fixture(scope="module")
def fluent_corpus(spark):
    sent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, sent) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_counts_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, "")], "doc_id long, text string"
    )
    lm = train_bigram_lm(docs, buckets=B)
    # "a b a b" -> pairs (a,b), (b,a), (a,b); docs 2 and 3 contribute 0
    ha = (docs.sparkSession.range(1)
          .select(F.pmod(F.xxhash64(F.lit("a")), F.lit(B)).alias("h"))
          .first().h)
    got = {(r.h1, r.h2): (r.c12, r.c1) for r in lm.collect()}
    assert len(got) == 2
    ab = [v for (h1, _), v in got.items() if h1 == ha][0]
    ba = [v for (h1, _), v in got.items() if h1 != ha][0]
    assert ab == (2, 2) and ba == (1, 1)


def test_fluent_outscores_gibberish(spark, fluent_corpus):
    lm = train_bigram_lm(fluent_corpus, buckets=B)
    probe = spark.createDataFrame(
        [
            (100, "the cat sat on the rug"),        # in-domain
            (101, "rug the on sat dog mat cat"),    # shuffled (unseen pairs)
            (102, "zq xv wk jj qqq lpx mnb"),       # out-of-vocab gibberish
            (103, "solo"),                          # < 2 tokens -> NULL
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_logprob for r in
           lm_logprob_scores(lm, probe, buckets=B).collect()}
    assert got[103] is None
    # fluent in-domain text scores far above both degenerate probes
    # (note: under add-alpha smoothing the seen-context unseen-bigram
    # floor alpha/(c1+alpha*B) sits marginally BELOW the unseen-context
    # uniform 1/B, so no ordering is asserted between 101 and 102)
    assert got[100] > max(got[101], got[102]) + 3.0
    # both degenerate probes sit near the smoothed floor
    import math

    floor = math.log(1.0 / B)
    assert abs(got[101] - floor) < 0.5 and abs(got[102] - floor) < 0.5


def test_scores_layout_independent(spark, fluent_corpus):
    lm = train_bigram_lm(fluent_corpus, buckets=B)
    probe = fluent_corpus.withColumn("doc_id", F.col("doc_id") + 1000)
    a = {r.doc_id: r.avg_logprob for r in
         lm_logprob_scores(lm, probe, buckets=B).collect()}
    b = {r.doc_id: r.avg_logprob for r in
         lm_logprob_scores(lm.repartition(7), probe.repartition(5),
                           buckets=B).collect()}
    assert a == b
    # identical docs score identically
    assert len(set(a.values())) == 1


def test_md5_hash_mode_matches_duckdb_twin(spark):
    """hash_fn='md5' (the q41 oracle mode) produces bucket ids DuckDB
    reproduces exactly."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c b c")], "doc_id long, text string"
    )
    lm = {(r.h1, r.h2, r.c12, r.c1)
          for r in train_bigram_lm(docs, buckets=B, hash_fn="md5").collect()}
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    oracle = set(con.sql(f"""
        WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM docs),
        bgl AS (SELECT unnest(list_transform(range(1, len(toks)), i -> struct_pack(
            h1 := ('0x'||substring(md5(toks[i]),1,8))::BIGINT % {B},
            h2 := ('0x'||substring(md5(toks[i+1]),1,8))::BIGINT % {B}))) AS p FROM t),
        bg AS (SELECT p.h1 AS h1, p.h2 AS h2 FROM bgl),
        counts AS (SELECT h1,h2,COUNT(*)::BIGINT c12 FROM bg GROUP BY 1,2),
        ctx AS (SELECT h1, SUM(c12)::BIGINT c1 FROM counts GROUP BY 1)
        SELECT counts.h1, counts.h2, c12, c1 FROM counts JOIN ctx ON counts.h1=ctx.h1
    """).fetchall())
    assert lm == oracle and lm
