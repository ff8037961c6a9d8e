"""Property-based cross-checks of the r11 surfaces (SURVEY §5 model
strategy): DSIR weights against a plain-Python bag-of-words model,
layout independence of the scoring shuffle, and the invariants the
xxhash64/md5 hash split must preserve. Spark-per-example is expensive,
so example counts are small — the properties still cover shapes
(empty-ish docs, disjoint vocabularies, duplicate texts) the unit
tests pin only one instance of.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeflush_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    hashed_gram_counts,
)

# short texts over a tiny vocabulary so grams collide across docs
_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_TEXT = st.lists(_WORD, min_size=1, max_size=6).map(" ".join)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_grams(text: str) -> list[str]:
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_logw(doc: str, target: list[str], raw: list[str], b: int) -> float:
    """The paper formula in plain Python — the model the Spark chain
    must reproduce (hash collisions can merge gram counts, so counts
    come from the hashed tables in the Spark run; here the tiny
    vocabulary makes collisions in 2^16 buckets effectively
    impossible, and the test would fail loudly if one occurred)."""
    tc: dict[str, int] = {}
    rc: dict[str, int] = {}
    for t in target:
        for g in _py_grams(t):
            tc[g] = tc.get(g, 0) + 1
    for t in raw:
        for g in _py_grams(t):
            rc[g] = rc.get(g, 0) + 1
    nt, nr = sum(tc.values()), sum(rc.values())
    s = 0.0
    for g in _py_grams(doc):
        s += math.log(tc.get(g, 0) + 1.0) - math.log(rc.get(g, 0) + 1.0)
    return s + len(_py_grams(doc)) * (
        math.log(nr + float(b)) - math.log(nt + float(b))
    )


@given(target=_CORPUS, raw=_CORPUS)
@settings(**_SETTINGS)
def test_log_weights_match_python_model(spark, target, raw):
    b = 1 << 16
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target)], "doc_id bigint, text string"
    )
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id bigint, text string"
    )
    tc = hashed_gram_counts(tdf, buckets=b)
    rc = hashed_gram_counts(rdf, buckets=b)
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(rdf, tc, rc, buckets=b).collect()
    }
    for i, t in enumerate(raw):
        want = _py_logw(t, target, raw, b)
        assert abs(got[i] - want) < 1e-9, (t, got[i], want)


@given(raw=_CORPUS, parts=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_scoring_is_layout_independent(spark, raw, parts):
    tdf = spark.createDataFrame([(0, "aa bb")], "doc_id bigint, text string")
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id bigint, text string"
    )
    tc, rc = hashed_gram_counts(tdf), hashed_gram_counts(rdf)
    base = {
        r.doc_id: (r.n_grams, r.sum_ct, r.sum_cr, round(r.log_weight, 9))
        for r in dsir_log_weights(rdf, tc, rc).collect()
    }
    shuffled = {
        r.doc_id: (r.n_grams, r.sum_ct, r.sum_cr, round(r.log_weight, 9))
        for r in dsir_log_weights(rdf.repartition(parts), tc, rc).collect()
    }
    assert base == shuffled


@given(raw=_CORPUS)
@settings(**_SETTINGS)
def test_hash_modes_agree_on_structure(spark, raw):
    # md5 and xxhash64 bucket DIFFERENTLY, but the structural values a
    # hash cannot move must agree: per-doc gram counts, total model
    # mass, and (collisions aside at 2^16 buckets over a 4-word
    # vocabulary) the matched-count sums
    tdf = spark.createDataFrame([(0, "aa bb cc")], "doc_id bigint, text string")
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id bigint, text string"
    )
    out = {}
    for hf in ("md5", "xxhash64"):
        tc = hashed_gram_counts(tdf, hash_fn=hf)
        rc = hashed_gram_counts(rdf, hash_fn=hf)
        out[hf] = {
            r.doc_id: (r.n_grams, r.sum_ct, r.sum_cr)
            for r in dsir_log_weights(rdf, tc, rc, hash_fn=hf).collect()
        }
        assert tc.agg({"c": "sum"}).collect()[0][0] == sum(
            len(_py_grams("aa bb cc")) for _ in [0]
        )
    assert out["md5"] == out["xxhash64"]


@given(raw=_CORPUS, tau=st.floats(min_value=-50.0, max_value=5.0))
@settings(**_SETTINGS)
def test_select_partitions_rows_exactly(spark, raw, tau):
    # every row is exactly one of selected / banded / rejected, and
    # the split is reproducible
    tdf = spark.createDataFrame([(0, "aa bb")], "doc_id bigint, text string")
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id bigint, text string"
    )
    tc, rc = hashed_gram_counts(tdf), hashed_gram_counts(rdf)
    scored = dsir_log_weights(rdf, tc, rc)
    rows = dsir_select(scored, tau, seed="p").collect()
    assert len(rows) == len(raw)
    for r in rows:
        assert not (r.dsir_selected and r.dsir_banded)
        if r.dsir_key is not None and not r.dsir_banded:
            assert r.dsir_selected == (r.dsir_key > tau)


# ---------------------------------------------------------------------------
# Late-r11 surfaces: BM25 against a plain-Python Okapi model, and the
# integer pHash against its pure-Python twin (random matrices, beyond
# the fixed-seed unit-test instances).
# ---------------------------------------------------------------------------

_QUERY = st.lists(_WORD, min_size=1, max_size=3).map(" ".join)


def _py_bm25_scores(
    corpus: list[str], queries: list[str], k1: float = 1.2, b: float = 0.75
) -> dict:
    n = len(corpus)
    toks = {i: t.split(" ") for i, t in enumerate(corpus)}
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for v in toks.values():
        for term in set(v):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, q in enumerate(queries):
        for did, v in toks.items():
            s, hit = 0.0, False
            for term in dict.fromkeys(q.split(" ")):
                tf = v.count(term)
                if not tf:
                    continue
                hit = True
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(v) / avgdl))
                )
            if hit:
                out[(qid, did)] = s
    return out


@given(corpus=_CORPUS, queries=st.lists(_QUERY, min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_bm25_matches_python_model(spark, corpus, queries):
    from lakeflush_spark.operators.retrieval import bm25_scores, query_frame

    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(
            docs, query_frame(spark, list(enumerate(queries)))
        ).collect()
    }
    want = _py_bm25_scores(corpus, queries)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-9 * max(1.0, abs(v))


@given(
    mat=st.lists(
        st.integers(min_value=0, max_value=255), min_size=256, max_size=256
    )
)
@settings(**_SETTINGS)
def test_phash_jvm_matches_python_on_random_matrices(spark, mat):
    import numpy as np
    import pyspark.sql.functions as F

    from lakeflush_spark.operators.phash import (
        phash_from_gray,
        phash_pooled_numpy,
    )

    df = spark.createDataFrame([(0, mat)], "id long, gray array<bigint>")
    got = df.select(phash_from_gray(F.col("gray")).alias("ph")).collect()[0].ph
    assert got == phash_pooled_numpy(np.array(mat, dtype=np.int64).reshape(16, 16))


@given(
    hashes=st.lists(
        st.integers(min_value=0, max_value=(1 << 63) - 1),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    radius=st.integers(min_value=0, max_value=10),
)
@settings(**_SETTINGS)
def test_phash_near_dups_pigeonhole_complete(spark, hashes, radius):
    """The chunk join finds EXACTLY the brute-force Hamming pairs for
    any radius — the pigeonhole argument, property-checked."""
    import itertools

    from lakeflush_spark.operators.phash import phash_near_dups

    df = spark.createDataFrame(
        list(enumerate(hashes)), "media_id long, phash long"
    )
    got = {
        (r.id1, r.id2, r.hamming)
        for r in phash_near_dups(df, max_hamming=radius).collect()
    }
    want = {
        (a, b, bin(x ^ y).count("1"))
        for (a, x), (b, y) in itertools.combinations(enumerate(hashes), 2)
        if bin(x ^ y).count("1") <= radius
    }
    assert got == want
