"""Property-based cross-checks of the r5 operators (SURVEY §5 model
strategy): plain-Python reference models vs the distributed
implementations on hypothesis-generated adversarial inputs."""

import hashlib
import math

import numpy as np
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeflush_spark.operators.mixing import sharded_prefix_sum
from lakeflush_spark.operators.multimodal import decode_netpbm, encode_netpbm
from lakeflush_spark.operators.topk import grouped_top_k

# ---- sharded prefix sum vs the naive model --------------------------------

_rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", None]),          # part key (incl. NULL)
        st.integers(min_value=0, max_value=999),    # order key
        st.integers(min_value=0, max_value=50),     # value
    ),
    min_size=1,
    max_size=40,
).filter(lambda rows: len({(p, o) for p, o, _ in rows}) == len(rows))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_rows_strategy, shards=st.integers(min_value=1, max_value=5))
def test_sharded_prefix_sum_matches_model(spark, rows, shards):
    # order-preserving shard: a monotone bucketing of the order key
    df = spark.createDataFrame(
        [(p, o, v, min(o // max(1, 1000 // shards), shards - 1))
         for p, o, v in rows],
        "part string, ok long, val long, shard int",
    )
    got = {
        (r.part, r.ok): r.run
        for r in sharded_prefix_sum(
            df, ["part"], [F.col("ok")], "val", "shard", "run"
        ).collect()
    }
    # model: exclusive running sum per part in order-key order
    expect = {}
    for part in {p for p, _, _ in rows}:
        acc = 0
        for p, o, v in sorted((r for r in rows if r[0] == part),
                              key=lambda r: r[1]):
            expect[(p, o)] = acc
            acc += v
    assert got == expect


# ---- grouped top-k vs the naive model -------------------------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]),
                  st.integers(min_value=0, max_value=99)),
        min_size=1, max_size=30, unique=True,
    ),
    k=st.integers(min_value=1, max_value=5),
    shards=st.integers(min_value=1, max_value=4),
)
def test_grouped_top_k_matches_model(spark, rows, k, shards):
    df = spark.createDataFrame(
        [(g, i, i * 7 % 100) for g, i in rows], "grp string, id long, score long"
    )
    got = {
        (r.grp, r.id): r.rank
        for r in grouped_top_k(
            df, ["grp"], [F.desc("score"), F.asc("id")], k,
            salt_cols=["id"], shards=shards,
        ).collect()
    }
    expect = {}
    for grp in {g for g, _ in rows}:
        members = sorted(
            ((i, i * 7 % 100) for g, i in rows if g == grp),
            key=lambda t: (-t[1], t[0]),
        )
        for rank, (i, _) in enumerate(members[:k], start=1):
            expect[(grp, i)] = rank
    assert got == expect


# ---- NetPBM codec round-trip (pure numpy, no Spark) -----------------------


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    gray=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
    comment=st.booleans(),
)
def test_netpbm_roundtrip_property(w, h, gray, seed, comment):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    magic = "P5" if gray else "P6"
    payload = encode_netpbm(magic, 255, arr)
    if comment:
        # inject a header comment per the NetPBM grammar
        head, rest = payload.split(b"\n", 1)
        payload = head + b"\n# fuzz comment\n" + rest
    m2, w2, h2, mx, got = decode_netpbm(payload)
    assert (m2, w2, h2, mx) == (magic, w, h, 255)
    assert got.shape == shape and (got == arr).all()


# ---- bigram LM counts vs the python model (md5 hash mode) -----------------


def _md5_bucket(tok: str, buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % buckets


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "yy", "z3", "w"]), min_size=0, max_size=8),
        min_size=1, max_size=6,
    )
)
def test_bigram_lm_counts_match_model(spark, docs):
    from lakeflush_spark.operators.lm_filter import train_bigram_lm

    B = 1 << 12
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {(r.h1, r.h2): (r.c12, r.c1)
           for r in train_bigram_lm(df, buckets=B, hash_fn="md5").collect()}
    # model — NB: "".split(" ") == [""], matching Spark's split
    counts, ctx = {}, {}
    for toks in docs:
        toks = (" ".join(toks)).split(" ")
        for a, b in zip(toks, toks[1:]):
            k = (_md5_bucket(a, B), _md5_bucket(b, B))
            counts[k] = counts.get(k, 0) + 1
            ctx[k[0]] = ctx.get(k[0], 0) + 1
    expect = {k: (v, ctx[k[0]]) for k, v in counts.items()}
    assert got == expect
