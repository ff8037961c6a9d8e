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


def test_take_token_budget_sharded_identical_to_naive(spark):
    """The two-pass sharded prefix sum (the 100 TB plan) must select
    EXACTLY the rows of the naive single-window path, including on a
    deliberately skewed source distribution."""
    # skew: src0 has 3000 docs, src1 has 40, src2 has 3
    docs = spark.range(3043).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3000, "src0")
        .when(F.col("id") < 3040, "src1")
        .otherwise("src2")
        .alias("source"),
        (F.col("id") % 37 + 1).cast("bigint").alias("n_tokens"),
    )
    budgets = {"src0": 20_000, "src1": 300, "src2": 5}
    for shards in (2, 7, 64):
        naive = take_token_budget(docs, budgets, shards=1)
        sharded = take_token_budget(docs, budgets, shards=shards)
        a = sorted(r.doc_id for r in naive.collect())
        b = sorted(r.doc_id for r in sharded.collect())
        assert a == b, f"selection diverged at shards={shards}"
    # column contract preserved by the sharded path
    assert sharded.columns == docs.columns


def test_sharded_prefix_sum_bounds_partition_size(spark):
    """No (source, shard) window group may hold a whole skewed source:
    the max group must be well under the naive per-source partition."""
    from lakeflush_spark.operators.mixing import hex_order_shard, shuffle_key

    n = 4096
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("hot").alias("source"),  # ALL rows in one source
        F.lit(1).cast("bigint").alias("n_tokens"),
    )
    shards = 64
    keyed = docs.withColumn("_k", shuffle_key("doc_id", "0")).withColumn(
        "_shard", hex_order_shard(F.col("_k"), shards)
    )
    sizes = [
        r["cnt"]
        for r in keyed.groupBy("source", "_shard")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    # md5 prefixes are uniform: every shard is populated and the max
    # group is a small multiple of n/shards, never the full source
    assert len(sizes) == shards
    assert max(sizes) < 3 * n / shards


def test_sharded_prefix_sum_null_partition_key(spark):
    """NULL partition keys must form their own group exactly like
    Window.partitionBy does — a plain equi-join against the offsets
    frame would silently drop every NULL-keyed row."""
    from pyspark.sql import Window

    from lakeflush_spark.operators.mixing import (
        hex_order_shard,
        sharded_prefix_sum,
        shuffle_key,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, None).otherwise("s").alias("source"),
        F.lit(1).cast("bigint").alias("n_tokens"),
    )
    keyed = docs.withColumn("_k", shuffle_key("doc_id", "0")).withColumn(
        "_shard", hex_order_shard(F.col("_k"), 4)
    )
    got = sharded_prefix_sum(
        keyed, ["source"], [F.col("_k"), F.col("doc_id")], "n_tokens", "_shard", "pre"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("_k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = keyed.withColumn(
        "pre", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    a = {r.doc_id: r.pre for r in got.collect()}
    b = {r.doc_id: r.pre for r in want.collect()}
    assert a == b  # no rows lost, offsets correct for the NULL group
    assert len(a) == 100


def test_sharded_prefix_sum_values_match_window(spark):
    """The helper's exclusive running sum equals the naive window's,
    value for value (not just the downstream selection)."""
    from pyspark.sql import Window

    from lakeflush_spark.operators.mixing import (
        hex_order_shard,
        sharded_prefix_sum,
        shuffle_key,
    )

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
        (F.col("id") % 11 + 1).cast("bigint").alias("n_tokens"),
    )
    keyed = docs.withColumn("_k", shuffle_key("doc_id", "s")).withColumn(
        "_shard", hex_order_shard(F.col("_k"), 8)
    )
    got = sharded_prefix_sum(
        keyed, ["source"], [F.col("_k"), F.col("doc_id")], "n_tokens", "_shard", "pre"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("_k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = keyed.withColumn(
        "pre", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    a = {r.doc_id: r.pre for r in got.collect()}
    b = {r.doc_id: r.pre for r in want.collect()}
    assert a == b


def test_mix_sources_column_weight_out_of_range_raises(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    )
    # a buggy weight FORMULA (> 1) must fail fast like the dict path,
    # not silently keep 100% of every source
    bad = mix_sources(df, F.lit(1.3))
    with pytest.raises(Exception) as ei:
        bad.collect()
    assert "weight out of [0, 1]" in str(ei.value)
    # NULL weights still mean "drop", no error
    assert mix_sources(df, F.lit(None).cast("double")).count() == 0


def test_temperature_weights_model_and_alpha_semantics(spark):
    """alpha=0.5 weights match the exact isqrt model and shares sum to
    ~scale; alpha=1 reproduces natural proportions; alpha->0 flattens
    toward uniform (smaller keys gain share)."""
    import math

    from lakeflush_spark.operators.mixing import temperature_weights

    counts = [("a", 400), ("b", 100), ("c", 2500)]
    df = spark.createDataFrame(counts, "source string, n long")

    half = {r.source: (r.weight, r.share_x10000)
            for r in temperature_weights(df, "n").collect()}
    model_w = {k: math.floor(10000 * math.sqrt(v)) for k, v in counts}
    tot = sum(model_w.values())
    for k, v in counts:
        assert half[k][0] == model_w[k]
        assert half[k][1] == (2 * 10000 * model_w[k] + tot) // (2 * tot)
    assert abs(sum(s for _, s in half.values()) - 10000) <= len(counts)

    nat = {r.source: r.share_x10000
           for r in temperature_weights(df, "n", alpha=1.0).collect()}
    assert nat["c"] > nat["a"] > nat["b"]
    assert abs(nat["c"] - 8333) <= 1  # 2500/3000

    cold = {r.source: r.share_x10000
            for r in temperature_weights(df, "n", alpha=0.1).collect()}
    # flattening: the small source gains share as alpha drops
    assert cold["b"] > half["b"][1] > nat["b"]
    assert cold["c"] < half["c"][1] < nat["c"]


def test_plan_epochs(spark):
    """Epoch budgeting: proportional scaling when data is plentiful,
    the max_epochs cap when constrained (plan falls short — the
    go-find-more-data signal)."""
    import pytest

    from lakeflush_spark.operators.mixing import plan_epochs

    card = spark.createDataFrame(
        [("a", 1000), ("b", 3000)], "source string, n_tokens long"
    )
    # plentiful: target 2000 of 4000 -> factor 0.5, proportions kept
    plenty = {r.key: r for r in plan_epochs(card, 2000).collect()}
    assert plenty["a"].epochs == 0.5 and plenty["a"].planned_tokens == 500
    assert plenty["b"].planned_tokens == 1500
    # constrained: target 40000 needs 10 epochs -> capped at 4
    capped = {r.key: r for r in plan_epochs(card, 40_000).collect()}
    assert capped["a"].epochs == 4.0
    assert capped["a"].planned_tokens == 4000
    assert capped["b"].planned_tokens == 12000
    assert sum(r.planned_tokens for r in capped.values()) < 40_000
    with pytest.raises(ValueError):
        plan_epochs(card, 0)


def test_epoch_shortfall_report(spark):
    """desired = uncapped proportional ask; shortfall positive exactly
    when the cap binds, zero when data is plentiful."""
    from lakeflush_spark.operators.mixing import epoch_shortfall, plan_epochs

    card = spark.createDataFrame(
        [("a", 1000), ("b", 3000)], "source string, n_tokens long"
    )
    plenty = {r.key: r for r in
              epoch_shortfall(plan_epochs(card, 2000), 2000).collect()}
    assert all(r.shortfall_tokens == 0 for r in plenty.values())
    assert plenty["a"].desired_tokens == 500
    capped = {r.key: r for r in
              epoch_shortfall(plan_epochs(card, 40_000), 40_000).collect()}
    # 40000 of 4000 available -> uncapped factor 10, capped at 4
    assert capped["a"].desired_tokens == 10_000
    assert capped["a"].shortfall_tokens == 10_000 - 4000
    assert capped["b"].shortfall_tokens == 30_000 - 12_000
    import pytest

    with pytest.raises(ValueError):
        epoch_shortfall(plan_epochs(card, 10), 0)


def _epoch_corpus(spark, n_per_source=40):
    rows = []
    for s, base in (("a", 0), ("b", 1000), ("c", 2000)):
        for i in range(n_per_source):
            rows.append((base + i, s, 5 + (base + i) % 7))
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def test_materialize_epochs_delivers_planned_tokens(spark):
    """Delivered tokens match planned within one document per source —
    including epochs > 1, the case take_token_budget cannot execute."""
    from lakeflush_spark.operators.mixing import materialize_epochs, plan_epochs

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    avail = {r.source: r.n_tokens for r in card.collect()}
    total = sum(avail.values())
    target = int(2.6 * total)  # factor 2.6: 2 full epochs + 0.6 fractional
    plan = plan_epochs(card, target, key_col="source")
    planned = {r.key: r.planned_tokens for r in plan.collect()}
    out = materialize_epochs(df, plan)
    got = {r.source: (r.n, r.t) for r in
           out.groupBy("source").agg(
               F.count("*").alias("n"), F.sum("n_tokens").alias("t")
           ).collect()}
    max_doc = 11  # max n_tokens in the corpus
    for s in avail:
        n, t = got[s]
        assert planned[s] > avail[s], "test must exercise epochs > 1"
        assert t >= planned[s], f"{s}: under-delivered {t} < {planned[s]}"
        assert t < planned[s] + max_doc, f"{s}: overshoot beyond one doc"


def test_materialize_epochs_permutations_and_determinism(spark):
    """Each epoch is a FULL copy under a distinct permutation (not a
    replay of one order); the selection is layout- and seed-stable;
    sharded plan == single-window reference bit-for-bit."""
    from lakeflush_spark.operators.mixing import (
        epoch_shuffle_key,
        materialize_epochs,
        plan_epochs,
    )

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    total = sum(r.n_tokens for r in card.collect())
    plan = plan_epochs(card, int(2.5 * total), key_col="source")

    out = materialize_epochs(df, plan).withColumn(
        "k", epoch_shuffle_key("epoch", "doc_id")
    )
    rows = out.collect()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    # full epochs 0 and 1 contain every doc exactly once
    n_docs = df.count()
    assert len(by_epoch[0]) == n_docs and len(by_epoch[1]) == n_docs
    assert len(by_epoch[2]) < n_docs  # fractional
    # distinct permutations: the key-order of epoch 0 differs from 1
    o0 = [r.doc_id for r in sorted(by_epoch[0], key=lambda r: (r.k, r.doc_id))]
    o1 = [r.doc_id for r in sorted(by_epoch[1], key=lambda r: (r.k, r.doc_id))]
    assert sorted(o0) == sorted(o1) and o0 != o1

    key = {(r.source, r.doc_id, r.epoch) for r in rows}
    # layout determinism: a different partitioning selects identically
    again = materialize_epochs(df.repartition(13), plan).collect()
    assert {(r.source, r.doc_id, r.epoch) for r in again} == key
    # window reference (shards=1) is bit-identical
    ref = materialize_epochs(df, plan, shards=1).collect()
    assert {(r.source, r.doc_id, r.epoch) for r in ref} == key
    # a different seed changes the fractional selection (same sizes)
    seeded = materialize_epochs(df, plan, seed="7").collect()
    assert {(r.source, r.doc_id, r.epoch) for r in seeded} != key
    assert len(seeded) == len(rows) or abs(len(seeded) - len(rows)) <= 3


def test_materialize_epochs_sub_one_epoch_matches_budget_prefix(spark):
    """epochs < 1 degenerates to take_token_budget with the epoch-0
    salted key: a plain budget prefix, delivered <= planned + one doc."""
    from lakeflush_spark.operators.mixing import materialize_epochs, plan_epochs

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    total = sum(r.n_tokens for r in card.collect())
    plan = plan_epochs(card, total // 3, key_col="source")
    out = materialize_epochs(df, plan)
    assert out.where(F.col("epoch") != 0).count() == 0
    got = {r.source: r.t for r in
           out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()}
    planned = {r.key: r.planned_tokens for r in plan.collect()}
    for s, t in got.items():
        assert t >= min(planned[s], 1) - 1
        assert t < planned[s] + 11


def test_materialize_epochs_rejects_epoch_column_clash(spark):
    import pytest

    from lakeflush_spark.operators.mixing import materialize_epochs, plan_epochs

    df = _epoch_corpus(spark).withColumn("epoch", F.lit(0))
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    plan = plan_epochs(card, 100, key_col="source")
    with pytest.raises(ValueError, match="epoch"):
        materialize_epochs(df, plan)


def test_temperature_weights_zero_sum_raises(spark):
    """All-zero weights (counts too small for the scale) raise instead
    of emitting NULL shares; the 2**53 exactness bound also raises."""
    import pytest

    from lakeflush_spark.operators.mixing import temperature_weights

    df = spark.createDataFrame([("a", 0), ("b", 0)], "source string, n long")
    with pytest.raises(Exception, match="weight sum is 0"):
        temperature_weights(df, "n").collect()
    # scale so large that 2*scale*weight blows the exactness bound
    big = spark.createDataFrame([("a", 4), ("b", 9)], "source string, n long")
    with pytest.raises(Exception, match="2\\*\\*53"):
        temperature_weights(big, "n", scale=10**15).collect()


def test_epoch_mix_composition_end_to_end(spark):
    """The full data-constrained mixing story composes: plan ->
    materialize -> per-epoch shuffle order -> budget-bin packing.
    Delivered tokens hit the plan within one doc per source, the
    global md5(seed:epoch:id) order INTERLEAVES epochs rather than
    replaying epoch 0 then epoch 1, and the packed bins are
    budget-bounded."""
    from lakeflush_spark.operators.mixing import (
        epoch_shuffle_key,
        materialize_epochs,
        plan_epochs,
    )

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    total = sum(r.n_tokens for r in card.collect())
    plan = plan_epochs(card, int(2.4 * total), key_col="source")
    out = materialize_epochs(df, plan).withColumn(
        "k", epoch_shuffle_key("epoch", "doc_id")
    )
    rows = sorted(out.collect(), key=lambda r: (r.k, r.doc_id))
    # interleaving: the first quarter of the global order already
    # mixes at least two epochs (a per-epoch-sequential order would
    # hold epoch 0 for the first ~38%)
    head = rows[: len(rows) // 4]
    assert len({r.epoch for r in head}) >= 2
    # packing: greedy running-sum bins over the shuffled order stay
    # within budget + one doc
    budget, max_doc = 97, 11
    acc = bins = 0
    for r in rows:
        if acc >= budget:
            bins += 1
            acc = 0
        acc += r.n_tokens
    assert bins >= 2
    total_out = sum(r.n_tokens for r in rows)
    planned = sum(r.planned_tokens for r in plan.collect())
    assert planned <= total_out < planned + 3 * max_doc


def test_select_training_mix_one_call(spark):
    """The composition sugar delivers the same selection as the
    explicit plan -> materialize chain and returns the plan frame."""
    from lakeflush_spark.operators.mixing import (
        materialize_epochs,
        plan_epochs,
        select_training_mix,
    )

    df = _epoch_corpus(spark)
    selected, plan = select_training_mix(df, target_tokens=5000)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    want = materialize_epochs(df, plan_epochs(card, 5000)).collect()
    got = selected.collect()
    key = lambda r: (r.source, r.doc_id, r.epoch)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert set(plan.columns) == {
        "key", "available_tokens", "epochs", "planned_tokens"
    }


def test_materialize_epochs_heterogeneous_plan(spark):
    """A hand-built plan with DIFFERENT epochs per source (sub-one,
    exact-integer, and fractional-multi) materializes each source
    independently: exact-integer epochs emit no fractional pass, and
    every source delivers planned tokens within one document."""
    from lakeflush_spark.operators.mixing import materialize_epochs

    df = _epoch_corpus(spark)
    avail = {r.source: r.n_tokens for r in
             df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
             .collect()}
    spec = {"a": 0.5, "b": 2.0, "c": 3.3}
    plan = spark.createDataFrame(
        [(s, avail[s], e, int(e * avail[s])) for s, e in spec.items()],
        "key string, available_tokens long, epochs double, planned_tokens long",
    )
    out = materialize_epochs(df, plan)
    rows = out.collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    n_docs = {s: sum(1 for r in df.collect() if r.source == s)
              for s in spec}
    # a: sub-one epoch -> only epoch 0, a strict prefix
    assert {r.epoch for r in by_src["a"]} == {0}
    assert len(by_src["a"]) < n_docs["a"]
    # b: exact 2.0 epochs -> exactly two FULL copies, no fractional
    assert {r.epoch for r in by_src["b"]} == {0, 1}
    assert len(by_src["b"]) == 2 * n_docs["b"]
    # c: 3 full + fractional epoch 3
    assert {r.epoch for r in by_src["c"]} == {0, 1, 2, 3}
    assert sum(1 for r in by_src["c"] if r.epoch < 3) == 3 * n_docs["c"]
    # delivered within one doc of planned, per source
    for s, e in spec.items():
        t = sum(r.n_tokens for r in by_src[s])
        planned = int(e * avail[s])
        assert planned <= t < planned + 12, (s, t, planned)


def test_unimax_allocations_model(spark):
    """UniMax greedy vs hand arithmetic: small sources take their full
    epoch cap, the rest split the remainder equally (within one token,
    deterministic remainder order); sum hits the budget exactly; a
    budget above the total cap allocates every cap (data-constrained)."""
    import pytest

    from lakeflush_spark.operators.mixing import unimax_allocations

    card = spark.createDataFrame(
        [("tiny", 10), ("small", 50), ("mid", 400), ("big", 1000)],
        "source string, n_tokens long",
    )
    # budget 600, cap 2 epochs: walk ascending = tiny(20) small(100)
    # mid(800) big(2000). u=150 -> tiny capped 20; u=(580//3)=193 ->
    # small capped 100; u=480//2=240 < mid cap 800 -> stop: mid/big get
    # 240 each (480 % 2 == 0)
    a = {r.key: r for r in unimax_allocations(card, 600, 2).collect()}
    assert a["tiny"].planned_tokens == 20 and a["small"].planned_tokens == 100
    assert a["mid"].planned_tokens == 240 and a["big"].planned_tokens == 240
    assert sum(r.planned_tokens for r in a.values()) == 600
    assert a["tiny"].epochs == 2.0 and a["big"].epochs == 0.24
    # remainder goes to the earlier of the equal-share sources
    b = {r.key: r.planned_tokens
         for r in unimax_allocations(card, 601, 2).collect()}
    assert b["mid"] == 241 and b["big"] == 240  # mid ranks before big
    # budget above the total cap: everyone capped, short of budget
    c = {r.key: r.planned_tokens
         for r in unimax_allocations(card, 10_000, 2).collect()}
    assert c == {"tiny": 20, "small": 100, "mid": 800, "big": 2000}
    with pytest.raises(ValueError, match="INTEGER"):
        unimax_allocations(card, 100, max_epochs=1.5)
    with pytest.raises(ValueError):
        unimax_allocations(card, 0)


def test_unimax_plan_is_materializable(spark):
    """The UniMax plan frame feeds materialize_epochs directly —
    delivered tokens per source match the allocation within one doc."""
    from lakeflush_spark.operators.mixing import (
        materialize_epochs,
        unimax_allocations,
    )

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    plan = unimax_allocations(card, 500, max_epochs=2)
    out = materialize_epochs(df, plan)
    got = {r.source: r.t for r in
           out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()}
    planned = {r.key: r.planned_tokens for r in plan.collect()}
    for s, p in planned.items():
        if p == 0:
            assert s not in got
            continue
        assert p <= got[s] < p + 12, (s, got[s], p)


def test_epoch_shuffle_key_unambiguous_encoding(spark):
    """Distinct (seed, epoch, id) triples hash APART even with ':' in
    the seed/id and NULL or empty ids — the pathological aliases a
    plain concat_ws(':') would collapse (ADVICE r10)."""
    from lakeflush_spark.operators.mixing import epoch_shuffle_key

    df = spark.createDataFrame(
        [(0, "1:2"), (0, "1"), (0, ""), (0, None), (1, "x"), (11, "x")],
        "epoch long, doc_id string",
    )
    # within one seed: every (epoch, id) pair keys uniquely
    keys = [
        r.k
        for r in df.select(
            epoch_shuffle_key("epoch", "doc_id", "s").alias("k")
        ).collect()
    ]
    assert len(set(keys)) == len(keys)
    # across seeds engineered to alias under ':'-joining:
    # seed='a:1' epoch=2 vs seed='a' with id carrying the rest
    a = spark.createDataFrame([(2, "x")], "epoch long, doc_id string")
    b = spark.createDataFrame([(1, "2:x")], "epoch long, doc_id string")
    ka = a.select(epoch_shuffle_key("epoch", "doc_id", "a:1").alias("k")).first().k
    kb = b.select(epoch_shuffle_key("epoch", "doc_id", "a").alias("k")).first().k
    assert ka != kb


def test_materialize_epochs_strict_mode(spark):
    """strict=True raises on plan/input source mismatch in BOTH
    directions; strict=False keeps the documented inner-join drop."""
    import pytest

    from lakeflush_spark.operators.mixing import materialize_epochs, plan_epochs

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    plan = plan_epochs(card, 300, key_col="source")

    # matched sets: strict passes and equals the default output
    ok = materialize_epochs(df, plan, strict=True)
    assert ok.count() == materialize_epochs(df, plan).count()

    # input source with no plan row
    extra = df.union(
        spark.createDataFrame(
            [(9999, "ghost", 5)], "doc_id long, source string, n_tokens long"
        )
    )
    with pytest.raises(ValueError, match="ghost"):
        materialize_epochs(extra, plan, strict=True)
    # default: silently dropped (documented), row count unchanged
    assert (
        materialize_epochs(extra, plan).where(F.col("source") == "ghost").count()
        == 0
    )

    # plan key absent from the input
    with pytest.raises(ValueError, match="absent from input"):
        materialize_epochs(df.where(F.col("source") != "a"), plan, strict=True)


def test_select_training_mix_unimax_strategy(spark):
    """strategy='unimax' routes the one-call path through the greedy:
    delivered tokens per source match unimax_allocations within one
    doc, and invalid strategies / fractional caps raise."""
    import pytest

    from lakeflush_spark.operators.mixing import (
        select_training_mix,
        unimax_allocations,
    )

    df = _epoch_corpus(spark)
    card = df.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    want = {
        r.key: r.planned_tokens
        for r in unimax_allocations(card, 500, max_epochs=2).collect()
    }
    selected, plan = select_training_mix(
        df, 500, max_epochs=2, strategy="unimax"
    )
    assert {r.key: r.planned_tokens for r in plan.collect()} == want
    got = {
        r.source: r.t
        for r in selected.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    max_doc = 11  # _epoch_corpus token range 5..11
    for s, p in want.items():
        if p == 0:
            assert s not in got
            continue
        assert p <= got[s] <= p + max_doc, (s, got[s], p)

    with pytest.raises(ValueError, match="whole number"):
        select_training_mix(df, 500, max_epochs=2.5, strategy="unimax")
    with pytest.raises(ValueError, match="strategy"):
        select_training_mix(df, 500, strategy="fair")


def test_write_training_shards_fixed_sizes_and_deterministic(spark, tmp_path):
    """r13 exporter: exact shard sizes for any layout, seed-reproducible
    membership, manifest certifying the written files, immutable dest,
    and no Exchange SinglePartition in the ranking plan."""
    import pyspark.sql.functions as F2

    from lakeflush_spark.operators.mixing import write_training_shards

    docs = spark.createDataFrame(
        [(i, f"text {i}", (i % 7) + 1) for i in range(103)],
        "doc_id long, text string, n_tokens long",
    )
    d1 = str(tmp_path / "e1")
    m1 = write_training_shards(
        docs, d1, rows_per_shard=25, seed="s", token_col="n_tokens"
    ).collect()
    # 103 rows @ 25/shard -> 4 full shards + one 3-row tail
    assert [(r.shard, r.rows) for r in m1] == [
        (0, 25), (1, 25), (2, 25), (3, 25), (4, 3)
    ]
    assert sum(r.n_tokens for r in m1) == sum((i % 7) + 1 for i in range(103))
    back = spark.read.parquet(d1)
    assert back.count() == 103
    assert {r.doc_id for r in back.collect()} == set(range(103))
    # one parquet file per shard
    import glob as _glob

    for s in range(5):
        assert len(_glob.glob(f"{d1}/shard={s}/part-*.parquet")) == 1

    # determinism: same seed & different input partitioning -> same
    # membership + manifest; different seed -> different membership
    d2, d3 = str(tmp_path / "e2"), str(tmp_path / "e3")
    m2 = write_training_shards(
        docs.repartition(13), d2, rows_per_shard=25, seed="s",
        token_col="n_tokens",
    ).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]

    def membership(d):
        return {
            (r.shard, r.doc_id)
            for r in spark.read.option("basePath", d).parquet(d)
            .select("shard", "doc_id").collect()
        }

    assert membership(d1) == membership(d2)
    write_training_shards(docs, d3, rows_per_shard=25, seed="other")
    assert membership(d1) != membership(d3)

    # immutable dest + validation
    import pytest as _pytest

    with _pytest.raises(Exception):
        write_training_shards(docs, d1, rows_per_shard=25)
    with _pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "bad"), rows_per_shard=0)

    # scale shape: the ranking plan has no SinglePartition exchange
    from lakeflush_spark.operators.mixing import hex_order_shard, shuffle_key
    from lakeflush_spark.operators.topk import global_row_number

    keyed = docs.withColumn("_tsk", shuffle_key("doc_id", "s")).withColumn(
        "_tss", hex_order_shard(F2.col("_tsk"), 64)
    )
    plan = (
        global_row_number(
            keyed, order_cols=[F2.col("_tsk"), F2.col("doc_id")],
            shard_col="_tss",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly ONE SinglePartition exchange, and it carries the
    # |shards|-row per-shard TOTALS aggregate (the q42-justified
    # sharded-prefix-sum shape) — never the data rows
    assert plan.count("Exchange SinglePartition") == 1
    tail = plan.split("Exchange SinglePartition", 1)[1]
    assert "HashAggregate(keys=[_tss" in tail.split("Exchange", 2)[1] \
        or "HashAggregate(keys=[_tss" in tail[:400]
