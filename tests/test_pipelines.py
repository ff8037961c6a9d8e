"""Curation pipeline: stage monotonicity, filter/dedup guarantees."""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.dedup import minhash_near_dups
from lakeflush_spark.pipelines import CurationConfig, CurationStats, curate_documents


def _docs_with_known_dirt(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    base = 10_000_000
    # inject an exact duplicate and a tiny (filterable) doc
    dup = docs.limit(1).select(
        (F.col("doc_id") + base).alias("doc_id"), "text", "lang"
    )
    tiny = spark.createDataFrame(
        [(base + 1_000_000, "too short", "en")], "doc_id long, text string, lang string"
    )
    return docs.unionByName(dup).unionByName(tiny)


def test_curation_stages_and_guarantees(spark, sf_dir):
    docs = _docs_with_known_dirt(spark, sf_dir)
    cfg = CurationConfig(min_tokens=5, near_dup_threshold=0.8)
    curated, stats = curate_documents(spark, docs, cfg)
    # the asserts below consume `curated` four times (two counts, the
    # exact-dup groupBy, and a full minhash near-dup verification) —
    # checkpoint once so the pipeline lineage runs once, not four
    # times (r15: suite wall-time; assertions unchanged)
    curated = curated.localCheckpoint()

    assert isinstance(stats, CurationStats)
    n_in = docs.count()
    assert stats.input_docs == n_in
    # monotone shrink, and each injected dirt row removed by its stage
    assert stats.after_filters <= n_in - 1  # tiny doc filtered
    assert stats.after_exact_dedup <= stats.after_filters - 1  # dup removed
    assert stats.after_near_dedup <= stats.after_exact_dedup
    assert curated.count() == stats.after_near_dedup

    # guarantee: no exact duplicates survive
    assert curated.groupBy(F.md5("text")).count().where("count > 1").count() == 0
    # guarantee: no near-dup pair above threshold survives
    remaining = minhash_near_dups(
        curated.select("doc_id", "text"), threshold=cfg.near_dup_threshold
    )
    assert remaining.count() == 0
    # metric columns exposed for downstream packing
    assert {"n_tokens", "stop_ratio", "lang_pred"} <= set(curated.columns)


def test_curation_lang_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    curated, stats = curate_documents(
        spark, docs, CurationConfig(allowed_langs=("en",), near_dup_threshold=0.99)
    )
    assert stats.after_filters < stats.input_docs
    assert curated.where(F.col("lang_pred") != "en").count() == 0


def test_curation_decontam_stage(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # eval set = verbatim copies of two corpus docs (worst-case leak)
    eval_docs = docs.orderBy("doc_id").limit(2).select(
        F.col("doc_id").alias("doc_id"), "text"
    )
    cfg = CurationConfig(min_tokens=1, near_dup_threshold=0.99, decontam_n=5)
    curated, stats = curate_documents(spark, docs, cfg, eval_docs=eval_docs)
    leaked_ids = [r.doc_id for r in eval_docs.collect()]
    assert stats.after_decontam is not None
    assert stats.after_decontam <= stats.after_near_dedup - len(leaked_ids)
    assert curated.where(F.col("doc_id").isin(leaked_ids)).count() == 0
    # without an eval set the stage is a no-op and the count carries over
    _, stats2 = curate_documents(spark, docs, cfg)
    assert stats2.after_decontam == stats2.after_near_dedup


def test_curation_repeated_passage_stage(spark):
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(400)]
    passage = " ".join(rng.choice(vocab) for _ in range(50))
    rows = []
    for i in range(9):
        filler = " ".join(rng.choice(vocab) for _ in range(60))
        if i < 3:
            rows.append((i, f"{filler} {passage}", "en"))
        else:
            rows.append((i, filler, "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cfg = CurationConfig(
        min_tokens=1,
        near_dup_threshold=0.99,
        drop_repeated_passage_window=30,
        repeated_passage_stride=4,
    )
    curated, stats = curate_documents(spark, docs, cfg)
    kept = {r.doc_id for r in curated.collect()}
    assert kept == {3, 4, 5, 6, 7, 8}  # the 3 boilerplate carriers dropped
    assert stats.after_decontam == 6


def test_curation_cluster_resolution(spark):
    """cluster_resolution keeps exactly one doc (min id) per near-dup
    component: a similarity chain A~B~C collapses to A, unlike the
    iterative mode which keeps the chain tail."""
    import pytest

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base + " one", "en"),
        (1, base + " one two", "en"),   # ~0 and ~2
        (2, base + " one two three", "en"),
        (50, "entirely different text about compaction and parquet files", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cfg = CurationConfig(min_tokens=1, near_dup_threshold=0.55, cluster_resolution=True)
    curated, stats = curate_documents(spark, docs, cfg)
    kept = {r.doc_id for r in curated.collect()}
    assert kept == {0, 50}
    with pytest.raises(ValueError, match="mutually exclusive"):
        curate_documents(
            spark,
            docs,
            CurationConfig(min_tokens=1, cluster_resolution=True, cc_iterations=2),
        )


def test_curation_hot_bucket_cap_wired(spark):
    """near_dup_max_bucket reaches the LSH join: a swarm of identical
    docs (one giant band bucket) is NOT pairwise-deduped when capped —
    the repeated-passage stage is the designated catcher instead."""
    rows = [(i, "same boilerplate body repeated in every doc here", "en") for i in range(30)]
    rows += [(100, "one normal document with enough distinct tokens", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    base = CurationConfig(min_tokens=1, near_dup_threshold=0.5)
    # exact dedup already collapses identical docs; make them near-identical
    docs = docs.withColumn(
        "text", F.concat_ws(" ", "text", F.concat(F.lit("tail"), F.col("doc_id")))
    )
    _, uncapped_stats = curate_documents(spark, docs, base)
    capped_cfg = CurationConfig(min_tokens=1, near_dup_threshold=0.5, near_dup_max_bucket=5)
    _, capped_stats = curate_documents(spark, docs, capped_cfg)
    # uncapped: the swarm pairwise-resolves to ~1 survivor; capped: the
    # oversized bucket is dropped pre-join, so the swarm survives intact
    assert uncapped_stats.after_near_dedup < capped_stats.after_near_dedup
    assert capped_stats.after_near_dedup == 31


def test_pii_scrub_redacts_injected(spark):
    from lakeflush_spark.plans.text_queries import _PII_PATTERNS
    import pyspark.sql.functions as F2

    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@example.co.uk or call 555-123-4567 from 10.0.0.1 now")],
        "doc_id long, text string",
    )
    scrubbed = F2.col("text")
    for pat, repl in _PII_PATTERNS:
        scrubbed = F2.regexp_replace(scrubbed, pat, repl)
    out = df.select(scrubbed.alias("t")).first().t
    assert out == "mail me at <EMAIL> or call <PHONE> from <IP> now"


def test_iterative_near_dup_keeps_chain_tail(spark):
    # A~B and B~C are near-dups but A~C is NOT: the greedy single pass
    # over-deletes C (it paired with B, even though B itself died);
    # the iterative independent-set resolution keeps A and C.
    toks = [f"tok{i:02d}" for i in range(1, 51)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(toks[0:40])),   # t1..t40
            (2, " ".join(toks[5:45])),   # t6..t45  (J=0.77 with both ends)
            (3, " ".join(toks[10:50])),  # t11..t50 (J=0.58 with doc 1)
        ],
        "doc_id LONG, text STRING",
    )
    pairs = minhash_near_dups(docs, threshold=0.6)
    assert {(r.id1, r.id2) for r in pairs.collect()} == {(1, 2), (2, 3)}

    greedy, _ = curate_documents(
        spark, docs, CurationConfig(min_tokens=1, near_dup_threshold=0.6)
    )
    assert sorted(r.doc_id for r in greedy.collect()) == [1]

    iterative, stats = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=1, near_dup_threshold=0.6, cc_iterations=3),
    )
    assert sorted(r.doc_id for r in iterative.collect()) == [1, 3]
    assert stats.after_near_dedup == 2


def test_semdedup_stage_drops_semantic_rephrasings(spark):
    # two docs with DIFFERENT texts (no shingle overlap — text dedup
    # keeps both) but near-identical embeddings: the SemDedup stage
    # dedups them to the min id; a third, orthogonal doc survives
    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + rng.uniform(-1e-4, 1e-4) for x in base]
    ortho = [rng.uniform(-1, 1) for _ in range(16)]
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", base),
            (2, "one two three four five six seven", near),
            (3, "red green blue cyan magenta yellow", ortho),
        ],
        "doc_id LONG, text STRING, embedding ARRAY<DOUBLE>",
    )
    off, _ = curate_documents(
        spark, docs, CurationConfig(min_tokens=1)
    )
    assert sorted(r.doc_id for r in off.collect()) == [1, 2, 3]
    on, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=1, embedding_col="embedding",
                       sem_threshold=0.95, sem_n_cells=2),
    )
    assert sorted(r.doc_id for r in on.collect()) == [1, 3]


def test_hashed_embedding_semdedup_without_embedding_col(spark):
    """r14: hashed_embedding_dim derives the semantic-stage vectors
    from the text itself — two docs sharing the same bag of words in
    different ORDER (shingle dedup keeps both; hashed-TF cosine 1.0)
    dedup to the min id, an unrelated doc survives, and the derived
    column does not leak into the returned frame."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "theta eta zeta epsilon delta gamma beta alpha"),
            (3, "red green blue cyan magenta yellow black white"),
        ],
        "doc_id LONG, text STRING",
    )
    off, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=1, near_dup_threshold=0.99),
    )
    assert sorted(r.doc_id for r in off.collect()) == [1, 2, 3]
    on, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=1, near_dup_threshold=0.99,
                       hashed_embedding_dim=32,
                       sem_threshold=0.95, sem_n_cells=2),
    )
    assert sorted(r.doc_id for r in on.collect()) == [1, 3]
    assert "_htf_embedding" not in on.columns
    # explicit embedding_col wins over the derived tier
    import pytest as _pytest

    with _pytest.raises(Exception, match="missing_col"):
        curate_documents(
            spark, docs,
            CurationConfig(min_tokens=1, embedding_col="missing_col"),
        )[0].collect()


def test_lm_filter_stage_drops_gibberish_tail(spark):
    # 20 copies of fluent prose (distinct ids/texts via suffix tokens
    # so dedup keeps them) + 2 token-soup docs: the 10% LM quantile
    # gate removes exactly the gibberish
    sent = "the cat sat on the mat and the dog sat on the rug near the door"
    rows = [(i, f"{sent} tail{i} end{i}") for i in range(20)]
    rows += [(100, "zq xv wk jj qqq lpx mnb ooo ppp rrr sss ttt uuu"),
             (101, "aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk lll")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    base_cfg = CurationConfig(min_tokens=1, near_dup_threshold=0.99)
    off, _ = curate_documents(spark, docs, base_cfg)
    assert off.count() == 22
    on, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=1, near_dup_threshold=0.99,
                       lm_filter_quantile=0.1, lm_buckets=1 << 16),
    )
    kept = sorted(r.doc_id for r in on.collect())
    assert 100 not in kept and 101 not in kept
    assert len(kept) >= 18


def test_repeated_passage_strip_action_keeps_docs(spark):
    import random

    rng = random.Random(31)
    vocab = [f"v{i:03d}" for i in range(300)]
    passage = " ".join(rng.choice(vocab) for _ in range(60))
    rows = []
    for i in range(4):
        filler = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((i, f"{filler} {passage}"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    common = dict(min_tokens=1, near_dup_threshold=0.99,
                  drop_repeated_passage_window=30,
                  repeated_passage_stride=4)
    dropped, _ = curate_documents(spark, docs, CurationConfig(**common))
    assert dropped.count() == 0  # drop mode removes every flagged doc
    stripped, _ = curate_documents(
        spark, docs,
        CurationConfig(**common, repeated_passage_action="strip"),
    )
    rows_out = {r.doc_id: r for r in stripped.collect()}
    assert sorted(rows_out) == [0, 1, 2, 3]  # strip mode keeps them all
    assert all(r.n_stripped > 0 for r in rows_out.values())


def test_curation_provenance_names_the_dropping_stage(spark):
    leak = ("which ancient empire built the longest continuous defensive "
            "wall across northern mountain ranges over centuries")
    toks = [f"tok{i:02d}" for i in range(1, 41)]
    near_a = " ".join(toks)            # near-dup pair (1 keeps, 2 drops)
    near_b = " ".join(toks[1:] + ["zz"])
    docs = spark.createDataFrame(
        [
            (1, near_a),
            (2, near_b),
            (3, "exact duplicate text body here"),
            (4, "exact duplicate text body here"),   # exact dup of 3
            (5, "tiny"),                              # fails min_tokens
            (6, leak),                                # eval contamination
            (7, "completely unrelated standalone clean document body"),
        ],
        "doc_id LONG, text STRING",
    )
    eval_docs = spark.createDataFrame([(100, leak)], "doc_id LONG, text STRING")
    curated, stats, prov = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=5, near_dup_threshold=0.7),
        eval_docs=eval_docs,
        return_provenance=True,
    )
    kept = sorted(r.doc_id for r in curated.collect())
    got = {r.doc_id: r.stage for r in prov.collect()}
    assert got == {
        2: "near_dup",
        4: "exact_dup",
        5: "quality",
        6: "decontaminated",
    }
    # provenance and survivors partition the input exactly
    assert sorted(kept + list(got)) == [1, 2, 3, 4, 5, 6, 7]


def test_curation_hot_bucket_cap_observability(spark):
    """r6: a configured near-dup cap reports how much it trimmed; no
    cap reports None. Planted hot bucket: many near-identical docs
    share band hashes, so a cap of 2 must flag >= 1 hot bucket."""
    common = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, f"{common} tail{i}", "en") for i in range(20)]
    rows += [(100 + i, f"totally unrelated document number {i} with words {i * 7}", "en")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    capped_cfg = CurationConfig(
        min_tokens=1, near_dup_threshold=0.9,
        near_dup_max_bucket=2, near_dup_hot_bucket_mode="sample",
    )
    _, stats = curate_documents(spark, docs, capped_cfg)
    assert stats.near_dup_hot_buckets and stats.near_dup_hot_buckets > 0
    assert stats.near_dup_rows_over_cap > 0
    assert stats.near_dup_hot_rows_in > stats.near_dup_rows_over_cap

    _, stats_nocap = curate_documents(spark, docs, CurationConfig(min_tokens=1))
    assert stats_nocap.near_dup_hot_buckets is None
    assert stats_nocap.near_dup_rows_over_cap is None


def test_curation_gopher_rules_gate(spark):
    """gopher_rules=True drops a bullet-list doc and a stopword-free
    doc through the shared quality gate; the provenance names
    'quality'; gopher_rules=False keeps them."""
    good = (
        "the quick brown fox jumps over that lazy sleeping dog again " * 6
    ).strip()
    bullets = "\n".join(["- " + good.split(" ", 1)[1]] * 19 + [good])
    nostops = " ".join(["quick brown fox jumps over lazy dog"] * 10)
    docs = spark.createDataFrame(
        [(1, good), (2, bullets), (3, nostops)], "doc_id long, text string"
    )
    cfg = CurationConfig(
        min_tokens=5, max_stopword_ratio=None, gopher_rules=True,
        near_dup_threshold=0.99,
    )
    curated, stats = curate_documents(spark, docs, cfg)
    assert {r.doc_id for r in curated.collect()} == {1}
    prov = curate_documents(spark, docs, cfg, return_provenance=True)[2]
    dropped = {r.doc_id: r.stage for r in prov.collect()}
    assert dropped[2] == "quality" and dropped[3] == "quality"

    off, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=5, max_stopword_ratio=None,
                       near_dup_threshold=0.99),
    )
    assert {r.doc_id for r in off.collect()} == {1, 2, 3}


def test_curation_c4_rules_gate(spark):
    """c4_rules=True drops a sentence-poor page through the shared
    quality gate AND rewrites survivors to the C4 line-cleaned text;
    c4_rules=False leaves both alone."""
    line = "the quick brown fox jumps over that lazy sleeping dog."
    good = "\n".join([line] * 4)
    other = "\n".join(
        f"a {w} bird sat on the old garden fence today." .replace("bird", w)
        for w in ("red", "blue", "green", "yellow", "purple")
    )
    chaff = other + "\nclick here\nmenu home about\n" + line
    sparse = "the quick brown fox jumps over the dog again and again"  # no '.'
    docs = spark.createDataFrame(
        [(1, good), (2, chaff), (3, sparse)], "doc_id long, text string"
    )
    cfg = CurationConfig(
        min_tokens=5, max_stopword_ratio=None, c4_rules=True,
        near_dup_threshold=0.99,
    )
    curated, stats = curate_documents(spark, docs, cfg)
    out = {r.doc_id: r.text for r in curated.collect()}
    assert set(out) == {1, 2}
    assert out[2] == other + "\n" + line  # chaff lines stripped
    prov = curate_documents(spark, docs, cfg, return_provenance=True)[2]
    dropped = {r.doc_id: r.stage for r in prov.collect()}
    assert dropped[3] == "quality"

    off, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=5, max_stopword_ratio=None,
                       near_dup_threshold=0.99),
    )
    assert {r.doc_id: r.text for r in off.collect()}[2] == chaff


def test_curation_strip_dup_lines(spark):
    """strip_dup_lines=True scrubs repeated lines before dedup; order
    after the C4 rewrite when both are on."""
    base = "\n".join(
        f"the {w} fox jumps over that lazy sleeping dog again today."
        for w in ("red", "blue", "green")
    )
    doc = base + "\n" + base.split("\n")[0]  # first line repeated
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    curated, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=5, max_stopword_ratio=None,
                       strip_dup_lines=True, near_dup_threshold=0.99),
    )
    assert curated.collect()[0].text == base

    both, _ = curate_documents(
        spark,
        spark.createDataFrame(
            [(1, doc + "\nshort chaff")], "doc_id long, text string"
        ),
        CurationConfig(min_tokens=5, max_stopword_ratio=None,
                       c4_rules=True, strip_dup_lines=True,
                       near_dup_threshold=0.99),
    )
    # c4 drops the chaff line, then the dup-line scrub collapses the
    # repeated first line
    assert both.collect()[0].text == base


def test_curation_mt_repetition_rules_gate(spark):
    """mt_repetition_rules=True drops a top-2-gram-repetitive doc
    through the shared quality gate; off keeps it."""
    clean = " ".join(f"word{i:03d}" for i in range(60)) + " the a of"
    loop = " ".join(["again go"] * 40) + " the a"
    docs = spark.createDataFrame(
        [(1, clean), (2, loop)], "doc_id long, text string"
    )
    on_cfg = CurationConfig(min_tokens=5, max_stopword_ratio=None,
                            mt_repetition_rules=True,
                            near_dup_threshold=0.99)
    curated, _ = curate_documents(spark, docs, on_cfg)
    assert {r.doc_id for r in curated.collect()} == {1}
    off, _ = curate_documents(
        spark, docs,
        CurationConfig(min_tokens=5, max_stopword_ratio=None,
                       near_dup_threshold=0.99),
    )
    assert {r.doc_id for r in off.collect()} == {1, 2}


def test_curation_mt_full_table_gate(spark):
    """mt_full_table=True also drops docs failing only a dup-k-gram
    union rule (no top-k/line rule fires)."""
    # unique 2-grams except one repeated 5-gram block: top-2 coverage
    # low, dup-5 union coverage high
    body = " ".join(f"w{i:03d}" for i in range(20))
    block = " ".join("pqrstuvwxyzabcd")  # 15 single-char tokens
    doc = f"{block} {body} {block} the a"
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    base = dict(min_tokens=5, max_stopword_ratio=None,
                near_dup_threshold=0.99, mt_repetition_rules=True)
    seven, _ = curate_documents(spark, docs, CurationConfig(**base))
    full, _ = curate_documents(
        spark, docs, CurationConfig(**base, mt_full_table=True))
    assert {r.doc_id for r in seven.collect()} == {1}   # 7-rule passes
    assert {r.doc_id for r in full.collect()} == set()  # dup-5 bit drops


def test_quality_gate_inline_direct(spark):
    """The fused gate generator as a first-class API: all gates on
    emit the metric + gate columns from one pass, values matching the
    standalone operators; prefixed metrics compose with inputs that
    already carry n_tokens; re-curating an annotated frame fails with
    guidance instead of AMBIGUOUS_REFERENCE."""
    import pyspark.sql.functions as F
    import pytest

    from lakeflush_spark.operators.quality import c4_flags, gopher_flags
    from lakeflush_spark.pipelines import (
        CurationConfig,
        curate_documents,
        quality_gate_inline,
    )

    good = "the quick brown fox jumps over that lazy sleeping dog again " * 6
    df = spark.createDataFrame(
        [(1, good.strip()), (2, "too short."), (3, "if (x) { y } " + good)],
        "doc_id long, text string",
    )
    w = {"n_tokens": 1.0, "__intercept__": -3.0}
    out = df.select(
        "*",
        F.inline(
            quality_gate_inline(
                "text", c4=True, gopher=True, mt=True, clf_weights=w
            )
        ),
    )
    rows = {r.doc_id: r for r in out.collect()}
    ref = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            gopher_flags("text").alias("gf"),
            c4_flags("text").alias("cf"),
        ).collect()
    }
    for i, r in rows.items():
        assert r._q_gf == ref[i].gf and r._q_cf == ref[i].cf
        assert r.n_tokens >= 1 and r.lang_pred is not None
        assert isinstance(r._q_clf, bool)
    # prefixed metrics: no clash with an existing n_tokens column
    pre = df.withColumn("n_tokens", F.lit(7))
    prefixed = pre.select(
        "*", F.inline(quality_gate_inline("text", metrics_prefix="_q_"))
    )
    assert "_q_n_tokens" in prefixed.columns
    assert prefixed.count() == 3
    # batch pipeline guard: clear error on metric-column clash
    with pytest.raises(ValueError, match="metric column"):
        curate_documents(spark, pre, CurationConfig(min_tokens=1))


def test_gate_clash_guard_covers_internal_columns(spark):
    """The clash guard rejects frames already carrying the gate's
    INTERNAL columns (_c4_clean, GATE_COLS), not just the metric
    names — the aborted-run re-processing failure mode (ADVICE r10)."""
    import pytest

    from lakeflush_spark.pipelines import (
        CurationConfig,
        curate_documents,
        gate_clash_check,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    for bad in ("_c4_clean", "_q_gf", "_q_cf", "_q_mf", "_q_clf"):
        with pytest.raises(ValueError, match="gate/metric"):
            curate_documents(
                spark,
                df.withColumn(bad, F.lit("x")),
                CurationConfig(min_tokens=1),
            )
    # the stream variant reserves the _q_-prefixed metrics + _q_keep
    with pytest.raises(ValueError, match="_q_n_tokens"):
        gate_clash_check(
            "curate_stream", ["text", "_q_n_tokens"], metrics_prefix="_q_"
        )
    with pytest.raises(ValueError, match="_q_keep"):
        gate_clash_check(
            "curate_stream",
            ["text", "_q_keep"],
            metrics_prefix="_q_",
            extra=("_q_keep",),
        )
    # clean frames pass
    gate_clash_check("curate_documents", ["doc_id", "text", "n_tok"])


def test_staged_gate_matches_single_pass(spark):
    """quality_gate_stages (r11): stage-1 direct expressions + the
    stage-2 coverage generator keep EXACTLY the single-pass fused
    gate's rows, for every gate combination incl. the full 13-rule MT
    table and a coverage-reading classifier (clf_in_stage2)."""
    import pyspark.sql.functions as F

    from lakeflush_spark.pipelines import (
        quality_gate_inline,
        quality_gate_stages,
        stage2_keep_condition,
    )

    good = "the quick brown fox jumps over that lazy sleeping dog again " * 6
    repeats = "spam ham " * 40
    df = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, "too short."),
            (3, "if (x) { y } " + good),
            (4, repeats.strip()),
            (5, good.strip() + " lorem ipsum"),
        ],
        "doc_id long, text string",
    )
    cov_w = {"top2_char_ratio": -8.0, "n_tokens": 1.2, "__intercept__": -1.0}
    cheap_w = {"n_tokens": 1.0, "__intercept__": -3.0}
    for kw, expect_stage2, expect_clf2 in (
        (dict(c4=True, gopher=True, mt=True, clf_weights=cheap_w), True, False),
        (dict(mt=True, mt_full=True), True, False),
        (dict(clf_weights=cov_w), True, True),
        (dict(gopher=True, clf_weights=cheap_w), False, False),
        (dict(), False, False),
    ):
        fused = df.select(
            "*", F.inline(quality_gate_inline("text", **kw))
        )
        keep_cols = [
            c for c in ("_q_gf", "_q_cf", "_q_mf", "_q_clf")
            if c in fused.columns
        ]
        cond = F.lit(True)
        for c in ("_q_gf", "_q_cf", "_q_mf"):
            if c in fused.columns:
                cond = cond & (F.col(c) == 0)
        if "_q_clf" in fused.columns:
            cond = cond & F.col("_q_clf")
        want = {r.doc_id for r in fused.where(cond).select("doc_id").collect()}

        cols1, gen2, clf2 = quality_gate_stages("text", **kw)
        assert (gen2 is not None) == expect_stage2, kw
        assert clf2 == expect_clf2, kw
        s1 = df.select("*", *cols1)
        cond1 = F.lit(True)
        for c in ("_q_gf", "_q_cf", "_q_mf"):
            if c in s1.columns:
                cond1 = cond1 & (F.col(c) == 0)
        if "_q_clf" in s1.columns:
            cond1 = cond1 & F.col("_q_clf")
        staged = s1.where(cond1)
        if gen2 is not None:
            staged = staged.select("*", F.inline(gen2)).where(
                stage2_keep_condition(kw.get("mt", False), clf2)
            )
        got = {r.doc_id for r in staged.select("doc_id").collect()}
        assert got == want, (kw, got, want)


def test_curation_dsir_selection_stage(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    target = docs.where(F.col("doc_id") % 10 == 0)
    cfg = CurationConfig(min_tokens=1, dsir_keep_frac=0.5)
    curated, stats, prov = curate_documents(
        spark, docs, cfg, return_provenance=True, dsir_target=target
    )
    n_sel = curated.count()
    # fraction applies to the clean pool; exact-percentile cut keeps <= frac
    assert stats.after_dsir == n_sel
    assert 0 < n_sel <= stats.after_decontam
    assert abs(n_sel / stats.after_decontam - 0.5) < 0.1
    # selected frame keeps the pipeline contract columns, none of the
    # DSIR internals leak
    assert {"n_grams", "sum_ct", "log_weight", "dsir_key"}.isdisjoint(
        curated.columns
    )
    assert {"n_tokens", "stop_ratio", "lang_pred"} <= set(curated.columns)
    # provenance names the stage for every selected-out doc
    dropped = {
        r.doc_id for r in prov.where(F.col("stage") == "dsir_selection").collect()
    }
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    assert dropped and dropped.isdisjoint(kept)
    assert len(dropped) + len(kept) == stats.after_decontam
    # deterministic end to end
    again, stats2 = curate_documents(spark, docs, cfg, dsir_target=target)
    assert {r.doc_id for r in again.select("doc_id").collect()} == kept
    assert stats2.after_dsir == stats.after_dsir
    # misconfiguration fails loudly
    with pytest.raises(ValueError, match="dsir_target"):
        curate_documents(spark, docs, cfg)
    # stage off -> stats field stays None (back-compat)
    _, stats_off = curate_documents(spark, docs, CurationConfig(min_tokens=1))
    assert stats_off.after_dsir is None


def test_curate_documents_cluster_balance(spark):
    """cluster_balance_cap keeps at most cap docs per embedding
    cluster, with provenance naming the stage."""
    import numpy as np

    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    rng = np.random.default_rng(23)
    rows = []
    # two clusters: 20 docs near [10,0], 6 near [0,10]; distinct texts
    for i in range(20):
        rows.append((i, f"alpha doc {i} unique words here number {i}",
                     (np.array([10.0, 0.0]) + rng.normal(0, 1.2, 2)).tolist()))
    for i in range(20, 26):
        rows.append((i, f"beta doc {i} other distinct body text {i}",
                     (np.array([0.0, 10.0]) + rng.normal(0, 1.2, 2)).tolist()))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, emb array<double>"
    )
    cfg = CurationConfig(
        min_tokens=1,
        near_dup_threshold=0.99,
        embedding_col="emb",
        sem_threshold=0.9999,  # effectively no semantic drops
        sem_n_cells=2,
        cluster_balance_cap=5,
    )
    curated, stats, prov = curate_documents(
        spark, docs, cfg, return_provenance=True
    )
    kept = sorted(r.doc_id for r in curated.select("doc_id").collect())
    # each of the two cells keeps at most 5
    assert len([i for i in kept if i < 20]) <= 5
    assert len([i for i in kept if i >= 20]) <= 5
    assert len(kept) >= 2  # both clusters represented
    stages = {r.stage for r in prov.collect()}
    assert "cluster_balance" in stages
    # misconfiguration: cap without embeddings
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires embedding_col"):
        curate_documents(
            spark, docs, CurationConfig(cluster_balance_cap=3)
        )
