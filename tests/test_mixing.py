"""Training-data mixing: determinism, weight accuracy, budget prefix."""

import pyspark.sql.functions as F
import pytest

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.mixing import (
    deterministic_shuffle,
    mix_sources,
    sample_fraction,
    take_token_budget,
)


def test_shuffle_is_seed_reproducible_and_seed_sensitive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = [r.doc_id for r in deterministic_shuffle(docs, seed="s1").collect()]
    b = [r.doc_id for r in deterministic_shuffle(docs, seed="s1").collect()]
    c = [r.doc_id for r in deterministic_shuffle(docs, seed="s2").collect()]
    assert a == b                       # reproducible
    assert a != c                       # seed changes the permutation
    assert sorted(a) == sorted(c)       # same multiset
    assert a != sorted(a)               # actually shuffled


def test_shuffle_layout_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = [r.doc_id for r in deterministic_shuffle(docs, seed="x").collect()]
    b = [
        r.doc_id
        for r in deterministic_shuffle(docs.repartition(17), seed="x").collect()
    ]
    assert a == b  # partition layout cannot change the order


def test_sample_fraction_rate_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    kept = sample_fraction(docs, 0.25, seed="k")
    k1 = {r.doc_id for r in kept.collect()}
    k2 = {r.doc_id for r in sample_fraction(docs, 0.25, seed="k").collect()}
    assert k1 == k2
    assert abs(len(k1) / n - 0.25) < 0.05  # binomial tolerance at n≈600+
    # nested fractions are NOT prefixes (independent thresholds), but
    # a higher fraction with the same seed IS a superset
    k_half = {r.doc_id for r in sample_fraction(docs, 0.5, seed="k").collect()}
    assert k1 <= k_half
    with pytest.raises(ValueError):
        sample_fraction(docs, 1.5)


def test_mix_sources_weights(spark):
    # synthetic: 2000 docs per source -> tight binomial bounds
    docs = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    weights = {"src0": 1.0, "src1": 0.3}  # src2 dropped
    mixed = mix_sources(docs, weights)
    got = {r["source"]: r["cnt"] for r in mixed.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) <= set(weights)
    assert got["src0"] == 2000
    assert abs(got.get("src1", 0) / 2000 - 0.3) < 0.04  # ~4 sd
    # determinism: the same call selects the same rows
    ids1 = {r.doc_id for r in mixed.collect()}
    ids2 = {r.doc_id for r in mix_sources(docs, weights).collect()}
    assert ids1 == ids2
    with pytest.raises(ValueError):
        mix_sources(docs, {"src0": 2.0})


def test_take_token_budget_prefix_and_bound(spark, sf_dir):
    from lakeflush_spark.functions.text import token_count

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", token_count("text").alias("n_tokens"))
    )
    srcs = sorted(r["source"] for r in docs.select("source").distinct().collect())
    budgets = {srcs[0]: 2_000, srcs[1]: 500}
    sel = take_token_budget(docs, budgets)
    rows = sel.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) <= set(budgets)
    max_doc_tokens = max(r["n_tokens"] for r in rows)
    for s, sel_rows in by_src.items():
        total = sum(r["n_tokens"] for r in sel_rows)
        # budget respected up to the one straddling document
        assert total < budgets[s] + max_doc_tokens
        assert total >= min(
            budgets[s],
            sum(r["n_tokens"] for r in docs.where(F.col("source") == s).collect()),
        )
    # monotone: a bigger budget selects a superset
    bigger = take_token_budget(docs, {srcs[0]: 4_000, srcs[1]: 500})
    ids_small = {r.doc_id for r in rows}
    ids_big = {r.doc_id for r in bigger.collect()}
    assert ids_small <= ids_big
