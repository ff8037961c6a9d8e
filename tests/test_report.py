"""corpus_report: the per-source data-card aggregation."""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.report import corpus_report


def test_corpus_report_documents_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = corpus_report(docs).collect()
    n_sources = docs.select("source").distinct().count()
    assert len(rep) == n_sources

    # conservation: docs and token shares account for the whole corpus
    assert sum(r.n_docs for r in rep) == docs.count()
    assert abs(sum(r.token_share for r in rep) - 1.0) < 1e-2

    for r in rep:
        assert r.tokens_p10 <= r.tokens_p50 <= r.tokens_p90 <= r.tokens_p99
        assert 0.0 < r.top_lang_share <= 1.0
        assert 0.0 <= r.avg_stopword_ratio <= 1.0
        assert r.n_tokens > 0

    # exact cross-check of one source's aggregates (sketch is exact
    # when the group is smaller than the accuracy knob)
    src = rep[0].source
    grp = docs.where(F.col("source") == src)
    exact = grp.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("nt")
    ).first()
    assert rep[0].n_tokens == exact.nt


def test_corpus_report_deterministic_and_layout_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.source: r for r in corpus_report(docs).collect()}
    b = {r.source: r for r in corpus_report(docs.repartition(17)).collect()}
    assert set(a) == set(b)
    for s in a:
        assert a[s] == b[s]
