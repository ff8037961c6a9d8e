"""r12 — q41 hash determinism (the round-11 flake pin) + the DSIR
integer-grid decision path.

The r11 driver run recorded one hash mismatch (q41, rows/schema OK)
that five independent replays could not reproduce; the suspect was the
per-doc float ``SUM(ln ...)`` in the DSIR labels, whose value depends
on Spark's partial-aggregation order. r12 moved every DSIR decision
onto the 1e-6 integer grid (``functions/grid.py``; the q41-'bm25'
recipe), so the whole q41 frame is order-free BIGINTs. These tests pin
that: one ordered md5 across shuffle-partition configs, exactly equal
to the DuckDB oracle's ordered md5.
"""

import hashlib

import pyspark.sql.functions as F

from lakeflush_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select_e6,
    hashed_gram_counts,
    hashed_gram_counts_split,
)

SF = "/root/testdata/sf0.001"


def _ordered_md5_rows(rows):
    h = hashlib.md5()
    for r in rows:
        h.update(repr(tuple(r)).encode())
    return h.hexdigest()


def test_q41_one_ordered_hash_across_shuffle_configs(spark):
    """q41 collected in ORDER must be byte-identical across
    shuffle.partitions — and identical to the DuckDB oracle. This is
    the multi-config replay the r11 verdict prescribed, in-process
    (parallelism variation comes from the partition count; the
    local[8]/local[32] axis is covered by the driver + bench runs)."""
    import __spark_entry__ as entry
    from lakeflush_spark.plans.relational_ext_queries import _Q41_MEMO
    from lakeflush_spark.testing import duckdb_connection

    qs, osql = entry.queries(), entry.oracle_sql()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    digests = set()
    try:
        for parts in ("5", "64", "200"):
            # force a REAL rebuild of the shared artifacts under this
            # partitioning (the memo would otherwise serve config 1's)
            _Q41_MEMO.clear()
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rows = qs["q41_wordcount_topk"](spark, SF).collect()
            digests.add(_ordered_md5_rows([tuple(r) for r in rows]))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        _Q41_MEMO.clear()
    assert len(digests) == 1, f"q41 hash varies with shuffle config: {digests}"
    con = duckdb_connection(SF)
    try:
        orows = con.execute(osql["q41_wordcount_topk"]).fetchall()
    finally:
        con.close()
    # DuckDB returns plain tuples; normalize ints (BIGINT -> int both
    # sides) and None. repr-tuple equality is the byte-for-byte pin.
    assert _ordered_md5_rows(orows) == digests.pop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_dsir_select_e6_exact_across_repartition(spark):
    """The integer key/decisions must be EXACTLY equal (==, no
    tolerance) regardless of input partitioning — the property the
    float chain lacks by construction."""
    raw = _docs(
        spark,
        [(i, f"w{i % 7} common filler{i % 11} tail", f"s{i % 3}") for i in range(120)],
    )
    target = _docs(spark, [(1000 + i, "w1 common w2", "t") for i in range(15)])
    tc = hashed_gram_counts(target, buckets=256)
    rc = hashed_gram_counts(raw, buckets=256)
    # calibrate a threshold that splits the keys (median, off-grid)
    probe = dsir_select_e6(
        dsir_log_weights(raw, tc, rc, buckets=256), threshold=0.0, seed="s"
    ).collect()
    keys = sorted(r.dsir_key_e6 for r in probe if r.dsir_key_e6 is not None)
    tau = keys[len(keys) // 2] / 1e6 + 1e-7

    def chain(df):
        scored = dsir_log_weights(df, tc, rc, buckets=256)
        out = dsir_select_e6(scored, threshold=tau, seed="s")
        return {
            r.doc_id: (r.dsir_key_e6, r.dsir_masked, r.dsir_selected)
            for r in out.collect()
        }

    base = chain(raw)
    assert base == chain(raw.repartition(13))
    assert base == chain(raw.repartition(1))
    # and the decision actually selects something / excludes something
    sel = {k for k, v in base.items() if v[2]}
    assert sel and sel != set(base)


def test_dsir_select_e6_masked_never_selected(spark):
    raw = _docs(spark, [(i, f"a b{i % 4} c", "s") for i in range(30)])
    target = _docs(spark, [(99, "a c", "t")])
    tc = hashed_gram_counts(target, buckets=64)
    rc = hashed_gram_counts(raw, buckets=64)
    scored = dsir_log_weights(raw, tc, rc, buckets=64)
    rows = dsir_select_e6(scored, threshold=-1e9, seed="0").collect()
    # absurdly low threshold: every UNMASKED doc selects, no masked doc does
    for r in rows:
        if r.dsir_masked:
            assert not r.dsir_selected
        else:
            assert r.dsir_selected == (r.dsir_key_e6 > -(10**15))


def test_dsir_e6_matches_float_weight_on_grid(spark):
    """log_weight_e6 is the snapped rendition of log_weight: within
    half a grid step (1e-6) of round(log_weight * 1e6) for every
    unmasked doc, modulo the per-term-vs-per-sum rounding (bounded by
    n_terms half-steps)."""
    raw = _docs(spark, [(i, f"x{i % 5} y common", "s") for i in range(40)])
    target = _docs(spark, [(99, "x1 common", "t")])
    tc = hashed_gram_counts(target, buckets=128)
    rc = hashed_gram_counts(raw, buckets=128)
    rows = dsir_log_weights(raw, tc, rc, buckets=128).collect()
    for r in rows:
        if r.log_weight is None:
            assert r.log_weight_e6 is None
            continue
        # 2*n_grams per-gram terms + 2 norm terms, each off by <= 0.5
        bound = (2 * r.n_grams + 2) * 0.5 + 0.5
        assert abs(r.log_weight_e6 - r.log_weight * 1e6) <= bound


def test_split_counts_drop_null_condition_rows(spark):
    """r12 NULL semantics: rows whose target_cond is NULL are excluded
    from BOTH count tables — row-identical to the two-pass
    where(cond)/where(~cond) build."""
    docs = _docs(
        spark,
        [(1, "a b", "t"), (2, "a c", "r"), (3, "b c", None)],
    )
    cond = F.col("source") == "t"  # NULL source -> NULL cond
    split = hashed_gram_counts_split(docs, cond, buckets=64)
    t2 = hashed_gram_counts(docs.where(cond), buckets=64)
    r2 = hashed_gram_counts(docs.where(~cond), buckets=64)
    got_t = {(r.h, r.c) for r in split.where(F.col("c_target") > 0)
             .select("h", F.col("c_target").alias("c")).collect()}
    got_r = {(r.h, r.c) for r in split.where(F.col("c_raw") > 0)
             .select("h", F.col("c_raw").alias("c")).collect()}
    assert got_t == {(r.h, r.c) for r in t2.collect()}
    assert got_r == {(r.h, r.c) for r in r2.collect()}
