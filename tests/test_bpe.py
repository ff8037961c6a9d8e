"""BPE tokenizer training/encoding (operators/bpe.py): the learned
merges must reproduce the classic algorithm's behavior and the encode
round-trip must be lossless."""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.bpe import (
    EOW,
    bpe_encode,
    train_bpe,
    word_histogram,
)


def test_bpe_learns_frequent_pairs(spark):
    # "low" x10, "lower" x5, "lowest" x3: the first merges must build
    # the shared "low" stem (l+o then lo+w)
    rows = [(i, "low") for i in range(10)]
    rows += [(100 + i, "lower") for i in range(5)]
    rows += [(200 + i, "lowest") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=4)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # encoding uses the learned stem as one symbol
    enc = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs, merges).collect()}
    assert enc[0][0].startswith("low")


def test_bpe_roundtrip_lossless_and_monotone(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(docs, n_merges=64, max_words=5000)
    assert 0 < len(merges) <= 64
    enc = bpe_encode(docs, merges)
    joined = enc.join(docs, "doc_id")
    for r in joined.select("text", "bpe_tokens", "n_bpe").collect():
        # lossless: concatenating tokens re-yields the words (EOW marks
        # word ends)
        rebuilt = "".join(r.bpe_tokens).replace(EOW, " ").strip()
        assert rebuilt == r.text.strip()
        # merges only ever shrink the token stream vs characters
        assert r.n_bpe <= len(r.text) + r.text.count(" ") + 1
        assert r.n_bpe == len(r.bpe_tokens)
    # more merges => no more tokens (monotone compression)
    merges128 = train_bpe(docs, n_merges=128, max_words=5000)
    n64 = bpe_encode(docs, merges).agg(F.sum("n_bpe")).first()[0]
    n128 = bpe_encode(docs, merges128).agg(F.sum("n_bpe")).first()[0]
    assert n128 <= n64


def test_word_histogram_top_k_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b")], "doc_id long, text string"
    )
    hist = dict(word_histogram(docs))
    assert hist == {"a": 4, "b": 3, "c": 1}
    top2 = dict(word_histogram(docs, max_words=2))
    assert top2 == {"a": 4, "b": 3}


def test_bpe_encode_preserves_string_ids(spark):
    """r6: the id column keeps its input type — string doc ids encode
    without the old executor-side int() crash."""
    docs = spark.createDataFrame(
        [("doc-a", "low low lower"), ("doc-b", "lowest low")],
        "doc_id string, text string",
    )
    merges = train_bpe(docs, n_merges=4)
    out = bpe_encode(docs, merges)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    got = {r.doc_id: r.n_bpe for r in out.collect()}
    assert set(got) == {"doc-a", "doc-b"} and all(n > 0 for n in got.values())
