"""Classifier-based quality gate (operators/quality_classifier.py):
train reference-vs-raw, score map-only, filter and Pareto-sample."""

import pyspark.sql.functions as F

from lakeflush_spark.operators.quality_classifier import (
    FEATURE_COLS,
    INTERCEPT_KEY,
    classifier_filter,
    pareto_sample_condition,
    quality_score_col,
    train_quality_classifier,
)


def _corpora(spark):
    # reference: varied clean prose-ish docs; raw: repetitive loops
    # and token soup — separable on the repetition/ratio features
    ref = [
        " ".join(f"word{i:03d} the quick brown fox jumps over".split()
                 + [f"extra{j}" for j in range(i % 7)])
        for i in range(40)
    ]
    raw = [" ".join(["again go"] * (10 + i % 5)) for i in range(40)]
    pos = spark.createDataFrame([(i, t) for i, t in enumerate(ref)],
                                "doc_id long, text string")
    neg = spark.createDataFrame([(100 + i, t) for i, t in enumerate(raw)],
                                "doc_id long, text string")
    return pos, neg


def test_train_score_filter(spark):
    pos, neg = _corpora(spark)
    w = train_quality_classifier(pos, neg)
    assert set(FEATURE_COLS) <= set(w) and INTERCEPT_KEY in w

    # the model separates held-out-like examples of each style
    from lakeflush_spark.operators.quality import text_quality_profile

    test = spark.createDataFrame(
        [(1, "the gentle river winds past quiet villages every evening."),
         (2, " ".join(["loop loop"] * 12))],
        "doc_id long, text string",
    )
    scored = text_quality_profile(test).withColumn(
        "s", quality_score_col(w)).select("doc_id", "s").collect()
    by = {r.doc_id: r.s for r in scored}
    assert by[1] > by[2]
    assert 0.0 <= by[2] <= 1.0 <= by[1] + 1.0

    kept = classifier_filter(test, w, threshold=(by[1] + by[2]) / 2)
    assert [r.doc_id for r in kept.collect()] == [1]
    # keep_score retains the audit column, original columns intact
    audited = classifier_filter(test, w, threshold=0.0, keep_score=True)
    assert {"doc_id", "text", "quality_score"} == set(audited.columns)


def test_pareto_sample_deterministic(spark):
    # high scores always kept; the rule is deterministic given seed
    df = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)], "doc_id long, s double"
    )
    cond = pareto_sample_condition(F.col("s"), alpha=9.0,
                                   seed_col=F.col("doc_id"))
    a = sorted(r.doc_id for r in df.where(cond).collect())
    b = sorted(r.doc_id for r in df.repartition(7).where(cond).collect())
    assert a == b                      # layout-independent
    assert 99 in a                     # score 0.99: pareto > 0.01 a.s.
    kept_low = sum(1 for i in a if i < 50)
    kept_high = sum(1 for i in a if i >= 50)
    assert kept_high > kept_low        # monotone in score
    assert 0 < len(a) < 100            # it actually samples


def test_classifier_gate_in_curation(spark, tmp_path):
    """classifier_weights gates both pipelines through the shared
    predicate: train on reference-vs-raw, then a raw-style arrival is
    dropped at the quality stage in batch AND stream."""
    from lakeflush_spark.pipelines import CurationConfig, curate_documents
    from lakeflush_spark.streaming.curation import (
        CurationStreamConfig,
        curate_stream,
    )

    pos, neg = _corpora(spark)
    w = train_quality_classifier(pos, neg)
    clean = "the gentle river winds past quiet villages every evening."
    loop = " ".join(["loop loop"] * 12)
    docs = spark.createDataFrame(
        [(1, clean), (2, loop)], "doc_id long, text string"
    )
    curated, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=1, max_stopword_ratio=None,
                       classifier_weights=w, near_dup_threshold=0.99),
    )
    assert {r.doc_id for r in curated.collect()} == {1}

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, clean), (2, loop)],
                          "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "stage"))
    import shutil, glob, os
    part = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
    shutil.copy(part, src / "b1.parquet")
    cfg = CurationStreamConfig(
        source_dir=str(src),
        dest_dir=str(tmp_path / "dest"),
        digest_dir=str(tmp_path / "digests"),
        sig_dir=str(tmp_path / "sigs"),
        stats_dir=str(tmp_path / "stats"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        classifier_weights=w,
    )
    curate_stream(spark, cfg).awaitTermination(180)
    assert [r.doc_id for r in
            spark.read.parquet(cfg.dest_dir).collect()] == [1]


def test_classifier_composes_with_curation_output(spark):
    """curate_documents output carries n_tokens/stop_ratio/lang_pred —
    classifier_filter must compose without ambiguous references
    (regression: the featurizer used to re-select profile names)."""
    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    pos, neg = _corpora(spark)
    w = train_quality_classifier(pos, neg)
    docs = spark.createDataFrame(
        [(1, "the gentle river winds past quiet villages every evening.")],
        "doc_id long, text string",
    )
    curated, _ = curate_documents(
        spark, docs, CurationConfig(min_tokens=1, max_stopword_ratio=None)
    )
    assert "n_tokens" in curated.columns
    out = classifier_filter(curated, w, threshold=0.0, keep_score=True)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1]
    assert "n_tokens" in out.columns and "quality_score" in out.columns
