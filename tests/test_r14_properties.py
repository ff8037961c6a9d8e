"""r14 — token-capped training shards (VERDICT r13 #6) and the
append_ivf_index occupancy/drift guard (VERDICT r13 #5)."""

import warnings

import pyspark.sql.functions as F
import pytest


def _docs(spark, n=103):
    return spark.createDataFrame(
        [(i, f"text {i}", (i % 7) + 1) for i in range(n)],
        "doc_id long, text string, n_tokens long",
    )


def _vecs(spark, ids):
    return spark.createDataFrame(
        [
            (i, [float((i * 5 + d * 3) % 13) - 6.0 for d in range(8)])
            for i in ids
        ],
        "vec_id long, embedding array<double>",
    )


# ---------------------------------------------------------------------------
# tokens_per_shard mode
# ---------------------------------------------------------------------------


def test_token_capped_shards_respect_cap_and_order(spark, tmp_path):
    """Every shard's token sum <= cap (strict greedy fill), and the
    concatenation-in-shard-order document sequence is IDENTICAL to the
    row-capped export's — the two modes only move boundaries."""
    from lakeflush_spark.operators.mixing import (
        shuffle_key,
        write_training_shards,
    )

    docs = _docs(spark)
    cap = 20
    d_tok = str(tmp_path / "tok")
    manifest = write_training_shards(
        docs, d_tok, tokens_per_shard=cap, seed="s",
        token_col="n_tokens", order_shards=4,
    ).collect()
    assert all(r.n_tokens <= cap for r in manifest), [
        (r.shard, r.n_tokens) for r in manifest
    ]
    assert sum(r.rows for r in manifest) == 103
    assert sum(r.n_tokens for r in manifest) == sum(
        (i % 7) + 1 for i in range(103)
    )
    # order_shards=4 segments each start a fresh shard: at most 4
    # underfull shards beyond the sequential-fill count
    seq_min = -(-sum((i % 7) + 1 for i in range(103)) // cap)
    assert len(manifest) <= seq_min + 4

    # shard ids are monotone in the global md5-shuffle order: walking
    # docs by key, the shard sequence never decreases -> concatenating
    # shards in id order IS the global order
    back = spark.read.option("basePath", d_tok).parquet(d_tok)
    rows = (
        back.withColumn("_k", shuffle_key("doc_id", "s"))
        .orderBy("_k", "doc_id")
        .select("shard", "doc_id")
        .collect()
    )
    shard_seq = [r.shard for r in rows]
    assert shard_seq == sorted(shard_seq)

    # identical document sequence to the row-capped export
    d_row = str(tmp_path / "row")
    write_training_shards(
        docs, d_row, rows_per_shard=25, seed="s", token_col="n_tokens"
    )
    back_row = spark.read.option("basePath", d_row).parquet(d_row)
    seq_row = [
        r.doc_id
        for r in back_row.withColumn("_k", shuffle_key("doc_id", "s"))
        .orderBy("_k", "doc_id")
        .select("doc_id")
        .collect()
    ]
    assert [r.doc_id for r in rows] == seq_row


def test_token_capped_shards_deterministic_across_layout(spark, tmp_path):
    from lakeflush_spark.operators.mixing import write_training_shards

    docs = _docs(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(
        docs, d1, tokens_per_shard=30, seed="s", token_col="n_tokens",
        order_shards=4,
    ).collect()
    m2 = write_training_shards(
        docs.repartition(13), d2, tokens_per_shard=30, seed="s",
        token_col="n_tokens", order_shards=4,
    ).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]

    def membership(d):
        return {
            (r.shard, r.doc_id)
            for r in spark.read.option("basePath", d).parquet(d)
            .select("shard", "doc_id").collect()
        }

    assert membership(d1) == membership(d2)


def test_token_capped_shards_validation(spark, tmp_path):
    from lakeflush_spark.operators.mixing import write_training_shards

    docs = _docs(spark)
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(
            docs, str(tmp_path / "x"), rows_per_shard=5, tokens_per_shard=5
        )
    with pytest.raises(ValueError, match="token_col"):
        write_training_shards(docs, str(tmp_path / "x"), tokens_per_shard=5)
    with pytest.raises(ValueError, match="tokens_per_shard must be"):
        write_training_shards(
            docs, str(tmp_path / "x"), tokens_per_shard=0,
            token_col="n_tokens",
        )
    # a doc bigger than the cap can never be placed
    with pytest.raises(ValueError, match="largest"):
        write_training_shards(
            docs, str(tmp_path / "x"), tokens_per_shard=3,
            token_col="n_tokens",
        )


# ---------------------------------------------------------------------------
# append_ivf_index occupancy guard
# ---------------------------------------------------------------------------


def test_append_ivf_occupancy_warns_when_outgrown(spark, tmp_path):
    """Months of appends against a frozen 2-cell quantizer must warn:
    mean occupancy 220 >> 4*sqrt(440) ~ 84."""
    from lakeflush_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        prepare_vectors,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(prepare_vectors(_vecs(spark, range(40))), idx, n_cells=2)
    with pytest.warns(RuntimeWarning, match="too coarse"):
        append_ivf_index(
            spark, prepare_vectors(_vecs(spark, range(100, 500))), idx
        )


def test_append_ivf_no_warning_when_balanced(spark, tmp_path):
    """A proportionate append against a right-sized quantizer stays
    silent: 60 vectors in 8 cells, mean 7.5 < 4*sqrt(60) ~ 31."""
    from lakeflush_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        prepare_vectors,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(prepare_vectors(_vecs(spark, range(40))), idx, n_cells=8)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        append_ivf_index(
            spark, prepare_vectors(_vecs(spark, range(100, 120))), idx
        )


def test_verify_training_shards_detects_tampering(spark, tmp_path):
    """r14 auditor: a clean export verifies all-ok; a deleted shard
    surfaces as ok=False (manifest side present, actual side NULL)."""
    import shutil

    from lakeflush_spark.operators.mixing import (
        verify_training_shards,
        write_training_shards,
    )

    docs = _docs(spark)
    dest = str(tmp_path / "exp")
    write_training_shards(
        docs, dest, rows_per_shard=25, seed="s", token_col="n_tokens"
    )
    v = verify_training_shards(
        spark, dest, id_col="doc_id", token_col="n_tokens"
    ).collect()
    assert len(v) == 5 and all(r.ok for r in v)

    shutil.rmtree(f"{dest}/shard=2")
    res = verify_training_shards(
        spark, dest, id_col="doc_id", token_col="n_tokens"
    )
    v2 = {r.shard: r.ok for r in res.collect()}
    assert v2[2] is False
    assert all(ok for s, ok in v2.items() if s != 2)
    # the DOCUMENTED pass-condition gate (every-row-true) must catch
    # it — and ok is never NULL, so the gate cannot pass vacuously
    import pyspark.sql.functions as F

    assert res.where(~F.col("ok")).count() == 1
    assert res.where(F.col("ok").isNull()).count() == 0


def test_ivf_index_stats_reports_occupancy(spark, tmp_path):
    from lakeflush_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_stats,
        prepare_vectors,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(prepare_vectors(_vecs(spark, range(64))), idx, n_cells=8)
    r = ivf_index_stats(spark, idx).collect()[0]
    assert r.n_vectors == 64 and r.n_cells == 8
    assert 0 < r.nonempty_cells <= 8
    assert abs(r.mean_rows_per_cell - 8.0) < 1e-9
    assert abs(r.balanced_occupancy - 8.0) < 1e-9
    assert abs(r.occupancy_factor - 1.0) < 1e-9
    # grow it far past the quantizer: factor rises above the warn line
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        append_ivf_index(
            spark, prepare_vectors(_vecs(spark, range(100, 1100))), idx
        )
    r2 = ivf_index_stats(spark, idx).collect()[0]
    assert r2.n_vectors == 1064
    assert r2.occupancy_factor > 4.0
