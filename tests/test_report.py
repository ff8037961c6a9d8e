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


def test_sketch_quantile_verdicts_pass_and_flip(spark, sf_dir):
    """The q60 'card_q' verdict: every source's percentile_approx
    quantiles satisfy the rank contract on the real card; a planted
    out-of-contract card value flips that source's verdict to False
    while leaving the others True."""
    from lakeflush_spark.operators.report import sketch_quantile_verdicts

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    rep = corpus_report(docs)
    qcols = {"tokens_p10": 0.1, "tokens_p50": 0.5,
             "tokens_p90": 0.9, "tokens_p99": 0.99}
    good = sketch_quantile_verdicts(d, rep, "n_tokens", qcols)
    rows = good.collect()
    assert rows and all(r.ok for r in rows)

    # plant: shift one source's p50 far beyond any real token count —
    # its exact-rank window [n+1, n] can't intersect 0.5*n ± slack
    victim = rows[0].source
    bad_card = rep.withColumn(
        "tokens_p50",
        F.when(F.col("source") == victim, F.lit(10**9)).otherwise(
            F.col("tokens_p50")
        ),
    )
    flipped = {
        r.source: r.ok
        for r in sketch_quantile_verdicts(d, bad_card, "n_tokens", qcols).collect()
    }
    assert flipped[victim] is False
    assert all(ok for s, ok in flipped.items() if s != victim)


def test_corpus_report_flag_profile(spark, sf_dir):
    """The published-filter profile columns (r9): per-source flagged
    doc counts + token mass, exact against an independent per-doc
    recomputation with the same bitmask expressions."""
    from lakeflush_spark.operators.quality import gopher_flags

    docs = load_table(spark, sf_dir, "documents")
    rep = {r.source: r for r in corpus_report(docs).collect()}
    for r in rep.values():
        for fam in ("gopher", "c4", "mt"):
            n = getattr(r, f"n_{fam}_flagged")
            t = getattr(r, f"{fam}_flagged_tokens")
            assert 0 <= n <= r.n_docs
            assert 0 <= t <= r.n_tokens
            assert (n == 0) == (t == 0) or n > 0  # tokens need docs

    # exact cross-check of the gopher family on one source
    src = next(iter(rep))
    grp = docs.where(F.col("source") == src)
    exact = grp.select(
        F.sum((gopher_flags("text") != 0).cast("bigint")).alias("n"),
        F.sum(
            F.when(gopher_flags("text") != 0,
                   F.size(F.split("text", " "))).otherwise(F.lit(0))
        ).cast("bigint").alias("t"),
    ).first()
    assert rep[src].n_gopher_flagged == exact.n
    assert rep[src].gopher_flagged_tokens == exact.t
