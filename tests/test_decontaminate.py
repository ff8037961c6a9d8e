"""Unit tests for train/eval decontamination (operators/decontaminate.py).

Planted-contamination scenarios prove the documented contract:

- lowercasing: a case-variant copy of an eval doc IS flagged;
- min_common counts DISTINCT grams per corpus doc across the whole
  eval set (a gram shared with K eval docs counts once);
- clean docs survive, flagged docs are removed, and the pair audit's
  Jaccard is exact.

The oracle-side twin lives in ``plans/decontam_queries.py`` (q61) and
is hash-verified by the driver and ``tests/test_queries_oracle.py``.
"""

import pyspark.sql.functions as F
import pytest

from lakeflush_spark.operators.decontaminate import (
    contamination_pairs,
    decontaminate,
    ngram_hash_set,
)

EVAL_SENT = "the quick brown fox jumps over the lazy dog tonight"
# same 5-grams, different case — must still be caught (lowercased shingling)
CASED_COPY = "The Quick Brown Fox Jumps Over The Lazy Dog tonight"
# exactly ONE 5-gram ("alpha beta gamma delta epsilon") shared with
# BOTH eval docs e1 and e2 — one distinct contaminated gram
ONE_GRAM = "zz yy alpha beta gamma delta epsilon xx ww vv"
CLEAN = "completely different words with no overlap at all whatsoever here"


@pytest.fixture(scope="module")
def frames(spark):
    eval_docs = spark.createDataFrame(
        [
            (0, EVAL_SENT),
            (1, "alpha beta gamma delta epsilon is in this eval doc too"),
            (2, "alpha beta gamma delta epsilon appears here another time"),
        ],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            (100, CASED_COPY),
            (101, ONE_GRAM),
            (102, CLEAN),
        ],
        "doc_id bigint, text string",
    )
    return corpus, eval_docs


def test_case_variant_copy_is_flagged(spark, frames):
    corpus, eval_docs = frames
    res = decontaminate(corpus, eval_docs, n=5, materialize=False)
    flagged = {r.doc_id for r in res.contaminated.collect()}
    assert 100 in flagged  # lowercase applied before shingling
    clean_ids = {r.doc_id for r in res.clean.collect()}
    assert 100 not in clean_ids and 102 in clean_ids


def test_identical_after_lower_has_jaccard_one(spark, frames):
    corpus, eval_docs = frames
    pairs = contamination_pairs(corpus, eval_docs, n=5).collect()
    by_pair = {(r.eval_id, r.corpus_id): r for r in pairs}
    assert (0, 100) in by_pair
    assert by_pair[(0, 100)].jaccard == pytest.approx(1.0)


def test_min_common_counts_distinct_grams(spark, frames):
    corpus, eval_docs = frames
    # doc 101 shares ONE distinct gram, but with TWO eval docs. Under
    # the old sum-of-pair-counts semantics it would score 2 and be
    # (wrongly) removed at min_common=2.
    res2 = decontaminate(corpus, eval_docs, n=5, min_common=2, materialize=False)
    assert 101 in {r.doc_id for r in res2.clean.collect()}
    res1 = decontaminate(corpus, eval_docs, n=5, min_common=1, materialize=False)
    contam = {r.doc_id: r.n_common_grams for r in res1.contaminated.collect()}
    assert contam.get(101) == 1  # distinct count, not per-pair sum


def test_hash_set_is_distinct_after_hashing(spark):
    # collision-safety contract: the hash array is a true set
    df = spark.createDataFrame([(EVAL_SENT,)], "text string").select(
        ngram_hash_set("text", n=2).alias("hs")
    )
    row = df.select(
        F.size("hs").alias("n"), F.size(F.array_distinct("hs")).alias("nd")
    ).collect()[0]
    assert row.n == row.nd > 0


def test_shuffle_fallback_matches_broadcast(spark, frames):
    corpus, eval_docs = frames
    by_bc = sorted(
        map(tuple, contamination_pairs(corpus, eval_docs, n=5).collect())
    )
    by_sj = sorted(
        map(
            tuple,
            contamination_pairs(
                corpus, eval_docs, n=5, broadcast_eval=False
            ).collect(),
        )
    )
    assert by_bc == by_sj and by_bc


def test_materialize_roundtrip(spark, frames):
    corpus, eval_docs = frames
    res = decontaminate(corpus, eval_docs, n=5)
    try:
        assert res.pairs.count() > 0
        assert res.contaminated.count() == 2  # docs 100 and 101
        assert res.clean.count() == 1
    finally:
        res.unpersist()


def test_eval_leak_report(spark):
    """r6: the eval-side contamination view — planted leaks surface
    with hit counts and the worst offender; clean eval items don't."""
    from lakeflush_spark.operators.decontaminate import eval_leak_report

    leak = "the secret benchmark question about unusual marine biology topics"
    corpus = spark.createDataFrame(
        [
            (1, f"intro text then {leak} and a trailing sentence here"),
            (2, f"another copy content {leak} wrapped differently today"),
            (3, "completely unrelated corpus document about finance"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, leak), (200, "pristine eval item nothing shares these words")],
        "doc_id long, text string",
    )
    rep = {r.eval_id: r for r in eval_leak_report(corpus, eval_docs, n=5).collect()}
    assert set(rep) == {100}
    assert rep[100].n_corpus_hits == 2
    assert rep[100].top_corpus_id in (1, 2)
    assert 0 < rep[100].max_jaccard <= 1.0
    # deterministic top offender: max (jaccard, corpus_id)
    again = eval_leak_report(corpus, eval_docs, n=5).collect()[0]
    assert again.top_corpus_id == rep[100].top_corpus_id
