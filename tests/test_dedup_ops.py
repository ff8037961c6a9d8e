"""Dedup operator units beyond the oracle queries: the SimHash
pigeonhole chunk join must find EXACTLY the pairs the all-pairs scan
finds (the guarantee is exact, not probabilistic)."""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.dedup import hamming64, simhash, simhash_near_dups


def _all_pairs_hamming(docs, max_hamming):
    sh = docs.select(F.col("doc_id").alias("doc"), simhash("text").alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id1"),
            F.col("b.doc").alias("id2"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def test_pigeonhole_equals_all_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for max_hamming in (2, 6):
        exact = {
            (r.id1, r.id2, r.hamming)
            for r in _all_pairs_hamming(docs, max_hamming).collect()
        }
        chunked = {
            (r.id1, r.id2, r.hamming)
            for r in simhash_near_dups(docs, max_hamming=max_hamming).collect()
        }
        assert chunked == exact
        assert exact  # non-trivial: planted near-dups collide at low distance


def test_pigeonhole_max_hamming_guard(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_near_dups(docs, max_hamming=40)


def _boilerplate_corpus(spark, n_hot=40, n_normal=5):
    """n_hot identical docs (one giant LSH bucket) + a few distinct ones,
    including one genuine near-dup pair among the normal docs."""
    rows = [(i, "the same boilerplate footer text repeated everywhere") for i in range(n_hot)]
    base = 1000
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of previous
        "completely different words about spark and parquet files",
        "numbers one two three four five six seven eight nine",
        "final unrelated document mentioning lakehouse compaction",
    ]
    rows += [(base + i, t) for i, t in enumerate(texts[:n_normal])]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    from lakeflush_spark.operators.dedup import lsh_candidate_pairs, with_minhash

    docs = _boilerplate_corpus(spark)
    prepared = with_minhash(docs)
    uncapped = lsh_candidate_pairs(prepared).count()
    # the 40 identical docs alone produce 40*39/2 = 780 pairs
    assert uncapped >= 780
    capped = lsh_candidate_pairs(prepared, max_bucket_size=10)
    rows = capped.collect()
    # every hot-bucket pair is gone; only normal-doc collisions remain
    assert all(r.id1 >= 1000 and r.id2 >= 1000 for r in rows)
    assert len(rows) < 50
    # the genuine near-dup pair among normal docs survives the cap
    assert any((r.id1, r.id2) == (1000, 1001) for r in rows)


def test_simhash_hot_bucket_cap_bounds_candidates(spark):
    docs = _boilerplate_corpus(spark)
    uncapped = simhash_near_dups(docs, max_hamming=4).count()
    assert uncapped >= 780
    rows = simhash_near_dups(docs, max_hamming=4, max_bucket_size=10).collect()
    assert all(r.id1 >= 1000 and r.id2 >= 1000 for r in rows)
    assert len(rows) < 50


def test_minhash_near_dups_cap_and_no_full_cache(spark):
    from lakeflush_spark.operators.dedup import minhash_near_dups

    docs = _boilerplate_corpus(spark)
    pairs = minhash_near_dups(docs, threshold=0.5, max_bucket_size=10).collect()
    assert all(r.id1 >= 1000 and r.id2 >= 1000 for r in pairs)
    assert any((r.id1, r.id2) == (1000, 1001) for r in pairs)
    # the signature/shingle frame must not be pinned in executor memory:
    # any cached relation in the plan carries only pair ids, never the
    # corpus-sized _sh shingle arrays
    plan = minhash_near_dups(docs, threshold=0.5)._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "InMemoryRelation" in line:
            assert "_sh" not in line


def test_cap_validation(spark):
    import pytest

    from lakeflush_spark.operators.dedup import lsh_candidate_pairs, with_minhash

    docs = _boilerplate_corpus(spark, n_hot=2, n_normal=2)
    with pytest.raises(ValueError):
        lsh_candidate_pairs(with_minhash(docs), max_bucket_size=0).collect()


def _py_components(pairs):
    """Union-find reference implementation."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_near_dup_clusters_matches_union_find(spark):
    from lakeflush_spark.operators.dedup import near_dup_clusters

    # chains, a triangle, a star, and an isolated pair — plus a long
    # chain to force several propagation rounds
    pairs = [
        (1, 2), (2, 3),                     # chain
        (10, 11), (11, 12), (10, 12),       # triangle
        (20, 21), (20, 22), (20, 23),       # star
        (30, 31),                           # pair
    ] + [(100 + i, 101 + i) for i in range(12)]  # 13-node chain
    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    got = {r.id: r.cluster_id for r in near_dup_clusters(df).collect()}
    assert got == _py_components(pairs)


def test_near_dup_clusters_on_real_lsh_pairs(spark, sf_dir):
    from lakeflush_spark.io import load_table
    from lakeflush_spark.operators.dedup import minhash_near_dups, near_dup_clusters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_near_dups(docs, threshold=0.5)
    rows = pairs.collect()
    assert rows  # planted near-dups exist
    got = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert got == _py_components([(r.id1, r.id2) for r in rows])
    # cluster representative is always the component's min id
    for node, rep in got.items():
        assert rep <= node


def test_near_dup_clusters_budget_guard(spark):
    import pytest

    from lakeflush_spark.operators.dedup import near_dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id1 long, id2 long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        near_dup_clusters(chain, max_iters=2)


def test_near_dup_clusters_log_rounds_on_long_chain(spark):
    """Pointer jumping makes convergence logarithmic in diameter: a
    201-node chain (diameter 200) must converge well inside 12 rounds —
    pure one-hop propagation would need ~200."""
    from lakeflush_spark.operators.dedup import near_dup_clusters

    pairs = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    got = {r.id: r.cluster_id for r in near_dup_clusters(df, max_iters=12).collect()}
    assert got == _py_components(pairs)
    assert set(got.values()) == {0}


def test_hot_bucket_sample_mode_bounds_and_keeps_recall(spark):
    """'sample' mode keeps a deterministic cap-row slice of each hot
    bucket: candidate count stays ≤ cap² per bucket, a planted
    hot-bucket dup retains SOME pairs (recall survives, unlike
    'drop'), and the sample is reproducible."""
    import pytest

    from lakeflush_spark.operators.dedup import lsh_candidate_pairs, with_minhash

    cap = 10
    docs = _boilerplate_corpus(spark, n_hot=40)
    prepared = with_minhash(docs)
    sampled = lsh_candidate_pairs(
        prepared, max_bucket_size=cap, hot_bucket_mode="sample"
    )
    rows = sampled.collect()
    hot = [(r.id1, r.id2) for r in rows if r.id1 < 1000 and r.id2 < 1000]
    # recall survives: the identical-doc bucket still yields pairs...
    assert hot
    # ...but bounded: ≤ cap*(cap-1)/2 per band, MINHASH_BANDS bands,
    # deduped across bands — never the uncapped 780
    assert len(hot) <= cap * (cap - 1) // 2
    # the genuine normal-doc near-dup pair is untouched
    assert any((r.id1, r.id2) == (1000, 1001) for r in rows)
    # deterministic: same call, same sample
    rows2 = {(r.id1, r.id2) for r in sampled.collect()}
    assert {(r.id1, r.id2) for r in rows} == rows2
    with pytest.raises(ValueError, match="mode"):
        lsh_candidate_pairs(prepared, max_bucket_size=cap, hot_bucket_mode="nope").collect()


def test_near_dup_clusters_reliable_checkpoint(spark, tmp_path):
    import pytest

    from lakeflush_spark.operators.dedup import near_dup_clusters

    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    # without a checkpoint dir the option fails fast with guidance
    with pytest.raises(ValueError, match="setCheckpointDir"):
        near_dup_clusters(df, use_checkpoint_dir=True)
    ckdir = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ckdir)
    got = {
        r.id: r.cluster_id
        for r in near_dup_clusters(df, use_checkpoint_dir=True).collect()
    }
    assert got == _py_components(pairs)
    # round state actually went to the reliable dir
    import os

    assert any(files for _, _, files in os.walk(ckdir))


def test_exact_dedup_by_hash_min_id_winner(spark):
    """Digest-shuffle dedup keeps exactly the MINIMUM id per content
    key (deterministic, unlike dropDuplicates), preserves all columns,
    and agrees with a plain distinct-on-content accounting."""
    from lakeflush_spark.operators.dedup import exact_dedup_by_hash

    rows = [
        (3, "same text", "a"),
        (1, "same text", "b"),
        (2, "same text", "c"),
        (10, "other", "d"),
        (11, "third", "e"),
        (12, "third", "f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, meta string")
    got = {r.doc_id: (r.text, r.meta) for r in exact_dedup_by_hash(df, ["text"]).collect()}
    assert got == {1: ("same text", "b"), 10: ("other", "d"), 11: ("third", "e")}
    # layout independence: repartitioned input picks the same winners
    got2 = {
        r.doc_id
        for r in exact_dedup_by_hash(df.repartition(7), ["text"]).collect()
    }
    assert got2 == set(got)
    # multi-column keys treat column boundaries exactly (no "ab"+"c"
    # vs "a"+"bc" concat collision thanks to the length-prefixed
    # encoding)
    df2 = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc")], "doc_id long, x string, y string"
    )
    assert exact_dedup_by_hash(df2, ["x", "y"]).count() == 2
    # NULL is a distinct key value, not conflated with empty string
    df3 = spark.createDataFrame(
        [(1, None, "x"), (2, "", "x"), (3, None, "x")],
        "doc_id long, x string, y string",
    )
    kept = sorted(r.doc_id for r in exact_dedup_by_hash(df3, ["x", "y"]).collect())
    assert kept == [1, 2]


def test_minhash_pair_cache_does_not_accumulate(spark):
    """Repeated minhash_near_dups calls hold at most ONE cached pair
    table (each call releases the previous; unpersist_pair_cache
    releases the last)."""
    from lakeflush_spark.operators.dedup import (
        minhash_near_dups,
        unpersist_pair_cache,
    )

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    # unrelated cached RDDs from earlier tests in the shared session may
    # be released asynchronously by the ContextCleaner, so assert on
    # GROWTH bounds, not exact equality with the baseline
    unpersist_pair_cache()
    base = n_cached()
    docs = _boilerplate_corpus(spark, n_hot=4)
    for _ in range(3):
        minhash_near_dups(docs, threshold=0.5).count()
        assert n_cached() <= base + 1
    unpersist_pair_cache()
    assert n_cached() <= base


def test_cluster_representatives_argmax_and_ties(spark):
    from lakeflush_spark.operators.dedup import (
        cluster_representatives,
        near_dup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4), (50, 100)],
        "doc_id long, q long",
    )
    cl = near_dup_clusters(pairs)
    reps = {
        r.cluster_id: (r.doc_id, r.q)
        for r in cluster_representatives(docs, cl, "q").collect()
    }
    # cluster {1,2,3}: max q=9 tied between 2 and 3 -> min id 2
    assert reps[1] == (2, 9)
    # cluster {10,11}: q tied -> min id 10
    assert reps[10] == (10, 4)
    # singleton doc 50 is in no pair, hence in no cluster row
    assert set(reps) == {1, 10}


def test_keep_best_per_cluster(spark):
    from lakeflush_spark.operators.dedup import keep_best_per_cluster

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 8), (10, 4), (11, 7), (50, 1)],
        "doc_id long, q long",
    )
    kept = sorted(
        r.doc_id for r in keep_best_per_cluster(docs, pairs, "q").collect()
    )
    # best of {1,2,3} is 2; best of {10,11} is 11; singleton 50 kept
    assert kept == [2, 11, 50]


def test_curate_documents_cluster_keep_best(spark):
    """Pipeline wiring: cluster_keep_best keeps the argmax member."""
    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    # three near-identical docs (one cluster; pairwise Jaccard ~0.78-
    # 0.89); doc 2 is longest
    base = "spark joins tables quickly and cleanly today " * 30
    docs = spark.createDataFrame(
        [
            (1, base + "end"),
            (2, base + "end extra"),
            (3, base.strip()),
            (9, "a completely different tiny doc " * 40),
        ],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    cfg = CurationConfig(
        near_dup_threshold=0.5,
        cluster_resolution=True,
        cluster_keep_best="n_chars",
    )
    curated, _stats = curate_documents(spark, docs, cfg)
    kept = sorted(r.doc_id for r in curated.select("doc_id").collect())
    assert kept == [2, 9]
    # default (min-id) keeps doc 1 instead
    curated_min, _ = curate_documents(
        spark,
        docs,
        CurationConfig(near_dup_threshold=0.5, cluster_resolution=True),
    )
    kept_min = sorted(r.doc_id for r in curated_min.select("doc_id").collect())
    assert kept_min == [1, 9]


def test_cluster_keep_best_requires_resolution(spark):
    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    docs = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, q long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cluster_keep_best requires"):
        curate_documents(spark, docs, CurationConfig(cluster_keep_best="q"))
    with _pytest.raises(ValueError, match="not on the input frame"):
        curate_documents(
            spark,
            docs,
            CurationConfig(cluster_resolution=True, cluster_keep_best="zzz"),
        )
