"""DSIR importance resampling: model shape, weight semantics, selection."""

import math

import pyspark.sql.functions as F

from lakeflush_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    hashed_gram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gram_counts_cover_unigrams_and_bigrams(spark):
    docs = _docs(spark, [(1, "a b c")])
    # grams: a, b, c, "a b", "b c" -> total mass 5
    counts = hashed_gram_counts(docs, buckets=1 << 16)
    assert counts.agg(F.sum("c")).collect()[0][0] == 5
    # single-token doc contributes exactly its unigram
    one = hashed_gram_counts(_docs(spark, [(1, "a")]), buckets=1 << 16)
    assert one.agg(F.sum("c")).collect()[0][0] == 1


def test_gram_counts_bounded_by_buckets(spark):
    docs = _docs(spark, [(i, f"t{i} u{i} v{i}") for i in range(50)])
    counts = hashed_gram_counts(docs, buckets=8)
    rows = counts.collect()
    assert len(rows) <= 8
    assert all(0 <= r.h < 8 for r in rows)
    # mass conserved under bucketing: 50 docs x (3 uni + 2 bi)
    assert sum(r.c for r in rows) == 50 * 5


def test_log_weights_favor_target_like_docs(spark):
    target = _docs(spark, [(i, "alpha beta gamma") for i in range(10)])
    raw = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "zeta eta theta")],
    )
    tc = hashed_gram_counts(target)
    rc = hashed_gram_counts(raw)
    scored = {r.doc_id: r for r in dsir_log_weights(raw, tc, rc).collect()}
    # the target-identical doc outweighs the disjoint one
    assert scored[1].log_weight > scored[2].log_weight
    # integer witnesses: doc 2 matches nothing in the target model
    assert scored[2].sum_ct == 0 and scored[1].sum_ct > 0
    # both docs have 3 unigrams + 2 bigrams
    assert scored[1].n_grams == scored[2].n_grams == 5


def test_log_weight_value_matches_reference_math(spark):
    # one-gram corpora keep the closed form small enough to hand-check
    target = _docs(spark, [(1, "x")])
    raw = _docs(spark, [(2, "x"), (3, "y")])
    b = 1 << 16
    tc = hashed_gram_counts(target, buckets=b)
    rc = hashed_gram_counts(raw, buckets=b)
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(raw, tc, rc, buckets=b).collect()
    }
    const = math.log(2 + b) - math.log(1 + b)  # ln(Nr+aB) - ln(Nt+aB)
    # doc 2 ("x"): ct=1, cr=1 -> ln(2) - ln(2) + const
    assert abs(got[2] - const) < 1e-12
    # doc 3 ("y"): ct=0, cr=1 -> ln(1) - ln(2) + const
    assert abs(got[3] - (const - math.log(2.0))) < 1e-12


def test_empty_doc_gets_null_weight(spark):
    target = _docs(spark, [(1, "a b")])
    raw = _docs(spark, [(2, ""), (3, "a")])
    tc, rc = hashed_gram_counts(target), hashed_gram_counts(raw)
    rows = {r.doc_id: r for r in dsir_log_weights(raw, tc, rc).collect()}
    # "" splits to [''] — one (empty-string) unigram, still scored;
    # genuinely gram-free docs cannot occur with split semantics, so
    # assert the weaker contract: every input doc survives the left join
    assert set(rows) == {2, 3}
    assert rows[3].log_weight is not None


def test_select_is_deterministic_and_seed_sensitive(spark):
    target = _docs(spark, [(i, f"w{i % 3} common") for i in range(20)])
    raw = _docs(spark, [(i, f"w{i % 5} common filler{i}") for i in range(40)])
    tc, rc = hashed_gram_counts(target), hashed_gram_counts(raw)
    scored = dsir_log_weights(raw, tc, rc)
    a = {r.doc_id for r in dsir_select(scored, -5.0, seed="s").collect()
         if r.dsir_selected}
    b = {r.doc_id for r in dsir_select(scored, -5.0, seed="s").collect()
         if r.dsir_selected}
    c = {r.doc_id for r in dsir_select(scored, -5.0, seed="other").collect()
         if r.dsir_selected}
    assert a == b                      # same seed -> same sample
    assert a != c                      # Gumbel draws move with the seed
    # threshold is monotone: raising it can only shrink the sample
    hi = {r.doc_id for r in dsir_select(scored, -1.0, seed="s").collect()
          if r.dsir_selected}
    assert hi <= a


def test_select_band_masks_boundary_rows(spark):
    target = _docs(spark, [(1, "a")])
    raw = _docs(spark, [(2, "a"), (3, "b")])
    tc, rc = hashed_gram_counts(target), hashed_gram_counts(raw)
    scored = dsir_log_weights(raw, tc, rc)
    keyed = dsir_select(scored, 0.0, seed="0").collect()
    # re-threshold exactly AT one row's key: that row lands in the band
    tau = keyed[0].dsir_key
    banded = dsir_select(scored, tau, seed="0").collect()
    hit = [r for r in banded if abs(r.dsir_key - tau) <= 1e-9]
    assert hit and all(r.dsir_banded and not r.dsir_selected for r in hit)
    others = [r for r in banded if abs(r.dsir_key - tau) > 1e-9]
    assert all(
        r.dsir_selected == (r.dsir_key > tau) and not r.dsir_banded
        for r in others
    )


def test_resample_corpus_honors_fraction_and_is_deterministic(spark):
    from lakeflush_spark.operators.dsir import dsir_resample_corpus

    target = _docs(spark, [(i, f"t{i % 4} shared") for i in range(20)])
    raw = _docs(
        spark, [(i, f"t{i % 7} shared filler{i % 11}") for i in range(200)]
    )
    kept = dsir_resample_corpus(raw, target, keep_frac=0.25, seed="s")
    ids = {r.doc_id for r in kept.collect()}
    # exact percentile calibration: strict-> cut keeps <= 25%, and ties
    # aside it should land within a few docs of the target
    assert 40 <= len(ids) <= 50
    # deterministic end-to-end
    ids2 = {r.doc_id for r in dsir_resample_corpus(
        raw, target, keep_frac=0.25, seed="s").collect()}
    assert ids == ids2
    # selected docs carry the scoring columns
    row = kept.limit(1).collect()[0]
    assert row.log_weight is not None and row.dsir_key is not None
    # keep_frac=1.0 short-circuits to every scored doc
    assert dsir_resample_corpus(raw, target, keep_frac=1.0).count() == 200
    # invalid fraction raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dsir_resample_corpus(raw, target, keep_frac=0.0)


def test_dsir_composes_with_select_training_mix(spark):
    # the SURVEY §8 claim: DSIR-select the pool toward a target, then
    # assemble the token-budget mix from the selected docs
    import pyspark.sql.functions as F2

    from lakeflush_spark.operators.dsir import dsir_resample_corpus
    from lakeflush_spark.operators.mixing import select_training_mix

    target = _docs(spark, [(i, "aa bb cc") for i in range(10)])
    raw = spark.createDataFrame(
        [
            (i, f"aa bb word{i % 13} tail{i % 7}", f"s{i % 3}")
            for i in range(120)
        ],
        "doc_id bigint, text string, source string",
    )
    kept = dsir_resample_corpus(raw, target, keep_frac=0.5, seed="m")
    pool = kept.select(
        "doc_id", "source", F2.size(F2.split("text", " ")).alias("n_tokens")
    )
    selected, plan = select_training_mix(pool, target_tokens=100)
    n_sel = selected.count()
    assert 0 < n_sel <= pool.count()
    # the mix draws only from DSIR-selected docs
    pool_ids = {r.doc_id for r in pool.select("doc_id").collect()}
    assert {r.doc_id for r in selected.select("doc_id").collect()} <= pool_ids
    # plan covers exactly the surviving sources
    assert {r["key"] for r in plan.collect()} == {
        r.source for r in pool.select("source").distinct().collect()
    }


def test_select_e6_never_masks_null_weight_docs(spark):
    """A gram-less doc (NULL weight) must come back masked=False and
    selected=False even when its Gumbel term sits inside the edge band
    (r12 bug: NULL lw_edge OR TRUE = TRUE masked it)."""
    import hashlib

    from lakeflush_spark.functions.grid import py_edge_e6
    from lakeflush_spark.operators.dsir import dsir_select_e6

    def gumbel(seed: str, doc_id: int) -> float:
        h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / float(1 << 32)
        return -math.log(-math.log(u))

    # brute-force (driver-side, no Spark jobs) a seed whose Gumbel draw
    # for doc 7 lands in the edge band — the exact r12 failure shape
    edge_seed = next(
        (f"s{i}" for i in range(200_000) if py_edge_e6(gumbel(f"s{i}", 7))),
        None,
    )
    assert edge_seed is not None, "no edge-band seed in 200k draws"
    scored = spark.createDataFrame(
        [(7, None, None), (8, 123_456, False)],
        "doc_id bigint, log_weight_e6 bigint, lw_edge boolean",
    )
    rows = {r.doc_id: r for r in dsir_select_e6(scored, 0.0, seed=edge_seed).collect()}
    assert rows[7].dsir_masked is False and rows[7].dsir_selected is False
    assert rows[7].dsir_key_e6 is None
    # the non-NULL doc still follows the normal decision chain
    assert rows[8].dsir_masked in (False, True)
    # end-to-end: NULL-text doc flows through dsir_log_weights with NULL
    # weight and NULL lw_edge, and is never masked by any seed
    raw = spark.createDataFrame(
        [(7, None), (8, "a b")], "doc_id bigint, text string"
    )
    tc = hashed_gram_counts(_docs(spark, [(1, "a b")]))
    rc = hashed_gram_counts(raw.where("text is not null"))
    sc2 = dsir_log_weights(raw, tc, rc)
    r7 = {r.doc_id: r for r in dsir_select_e6(sc2, 0.0, seed=edge_seed).collect()}[7]
    assert r7.log_weight_e6 is None and r7.lw_edge is None
    assert r7.dsir_masked is False and r7.dsir_selected is False


def test_hashed_gram_counts_split_equals_two_pass(spark):
    """The one-pass conditional build is row-identical to building the
    target and raw tables with separate corpus passes."""
    import pyspark.sql.functions as F

    from lakeflush_spark.operators.dsir import (
        hashed_gram_counts,
        hashed_gram_counts_split,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c", "t"),
            (1, "b c d d", "t"),
            (2, "c d e", "r"),
            (3, "e", "r"),
            (4, "", "r"),
        ],
        "doc_id long, text string, source string",
    )
    cond = F.col("source") == "t"
    split = hashed_gram_counts_split(docs, cond, buckets=64, hash_fn="md5")
    tc2 = {
        (r.h, r.c_target)
        for r in split.where("c_target > 0").select("h", "c_target").collect()
    }
    rc2 = {
        (r.h, r.c_raw)
        for r in split.where("c_raw > 0").select("h", "c_raw").collect()
    }
    tc1 = {
        (r.h, r.c)
        for r in hashed_gram_counts(
            docs.where(cond), buckets=64, hash_fn="md5"
        ).collect()
    }
    rc1 = {
        (r.h, r.c)
        for r in hashed_gram_counts(
            docs.where(~cond), buckets=64, hash_fn="md5"
        ).collect()
    }
    assert tc1 == tc2 and rc1 == rc2
