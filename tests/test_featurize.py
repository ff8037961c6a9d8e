"""Hashed-TF/TF-IDF text featurization units: numpy twin, layout
independence, IDF weighting, and feeding the vector operators."""

import hashlib

import pyspark.sql.functions as F
import pytest

from lakeflush_spark.operators.featurize import hashed_tf_embeddings

DOCS = [
    (0, "spark joins scans spark"),
    (1, "rows plans filters rows rows"),
    (2, "spark rows vectors"),
    (3, "joins joins joins scans"),
    (4, "one"),
]


def _numpy_twin(dim=16, idf=False):
    import math

    import numpy as np

    tf = {}
    for i, text in DOCS:
        for tok in text.split(" "):
            b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % dim
            tf.setdefault(i, {})[b] = tf.get(i, {}).get(b, 0) + 1
    if idf:
        dfc = {}
        for i in tf:
            for b in tf[i]:
                dfc[b] = dfc.get(b, 0) + 1
        n = len(DOCS)
        for i in tf:
            for b in tf[i]:
                tf[i][b] *= math.log((n + 1) / (dfc[b] + 1)) + 1
    out = {}
    for i in tf:
        v = np.zeros(dim)
        for b, w in tf[i].items():
            v[b] = w
        nrm = np.sqrt((v * v).sum())
        out[i] = v / nrm if nrm > 0 else v
    return out


@pytest.mark.parametrize("idf", [False, True])
def test_hashed_embeddings_match_numpy_twin(spark, idf):
    import numpy as np

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: np.asarray(r.embedding)
        for r in hashed_tf_embeddings(df, dim=16, idf=idf).collect()
    }
    want = _numpy_twin(16, idf)
    assert set(got) == set(want)
    for i in want:
        assert np.allclose(got[i], want[i], atol=1e-12), i
        assert abs(np.linalg.norm(got[i]) - 1.0) < 1e-12


def test_hashed_embeddings_partitioning_independent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {
        r.doc_id: tuple(r.embedding)
        for r in hashed_tf_embeddings(df, dim=32).collect()
    }
    b = {
        r.doc_id: tuple(r.embedding)
        for r in hashed_tf_embeddings(df.repartition(7), dim=32).collect()
    }
    assert a == b


def test_hashed_embeddings_feed_the_vector_operators(spark):
    """The model-free tier plugs into prepare_vectors + ANN: identical
    texts land at cosine 1.0 ahead of everything else."""
    rows = DOCS + [(5, "spark joins scans spark")]  # dup of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_tf_embeddings(df, dim=32)
    from lakeflush_spark.operators.similarity import (
        brute_force_topk,
        prepare_vectors,
    )

    corpus = prepare_vectors(emb, id_col="doc_id")
    got = brute_force_topk(corpus, corpus.where(F.col("vid") == 0), k=2)
    top = sorted(
        ((r.rank, r.neighbor_id, r.cos_sim) for r in got.collect())
    )
    assert top[0][1] == 5 and top[0][2] == 1.0


def test_hashed_embeddings_null_text_yields_zero_vector(spark):
    """r14 review: a NULL text must not silently drop the doc — it
    comes out as the (normalization-passthrough) zero vector."""
    df = spark.createDataFrame(
        DOCS + [(9, None)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.embedding
        for r in hashed_tf_embeddings(df, dim=16).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 9}
    assert got[9] == [0.0] * 16


def test_hashed_embeddings_dim_guard(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hashed_tf_embeddings(df, dim=0)
    with pytest.raises(ValueError, match="dim"):
        hashed_tf_embeddings(df, dim=100000)
