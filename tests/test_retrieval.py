"""BM25 / TF-IDF retrieval (operators/retrieval.py) vs a plain-Python model."""

from __future__ import annotations

import math

import pytest

from lakeflush_spark.operators.retrieval import (
    B,
    K1,
    bm25_scores,
    bm25_topk,
    query_frame,
    tfidf_doc_terms,
)

DOCS = [
    (0, "spark joins tables fast spark spark"),
    (1, "slow scans read every row"),
    (2, "joins and scans mix in one plan"),
    (3, "spark joins spark joins spark joins"),
    (4, "a tiny doc"),
    (5, "scans scans scans scans scans scans scans scans"),
]
QUERIES = [(0, "spark joins"), (1, "scans"), (2, "missing terms only")]


def _py_bm25() -> dict[tuple[int, int], float]:
    """Reference model: textbook Okapi BM25 over DOCS x QUERIES."""
    toks = {i: t.split(" ") for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for v in toks.values():
        for term in set(v):
            df[term] = df.get(term, 0) + 1
    out: dict[tuple[int, int], float] = {}
    for qid, q in QUERIES:
        for did, v in toks.items():
            s = 0.0
            hit = False
            for term in dict.fromkeys(q.split(" ")):
                tf = v.count(term)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * (len(v) / avgdl))
                )
            if hit:
                out[(qid, did)] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_scores_match_python_model(spark, docs_df):
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(docs_df, query_frame(spark, QUERIES)).collect()
    }
    want = _py_bm25()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_bm25_witnesses(spark, docs_df):
    rows = {
        (r.query_id, r.doc_id): r
        for r in bm25_scores(docs_df, query_frame(spark, QUERIES)).collect()
    }
    # doc 3 matches both query-0 terms, three times each
    r = rows[(0, 3)]
    assert (r.n_hit, r.sum_tf, r.dl) == (2, 6, 6)
    # repeated query terms must not double-count: query 1 is one term
    r = rows[(1, 5)]
    assert (r.n_hit, r.sum_tf) == (1, 8)
    # no row for a query with no matching terms anywhere
    assert not any(q == 2 for q, _ in rows)


def test_bm25_topk_rank_and_ties(spark, docs_df):
    top = bm25_topk(docs_df, query_frame(spark, QUERIES), k=2).collect()
    by_q: dict[int, list] = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    want = _py_bm25()
    for qid, rows in by_q.items():
        assert [r.rank for r in rows] == [1, 2][: len(rows)]
        # ranking agrees with the python model under (score desc, id asc)
        order = sorted(
            [(d, s) for (q, d), s in want.items() if q == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert [r.doc_id for r in rows] == [d for d, _ in order[: len(rows)]]


def test_bm25_topk_shard_invariance(spark, docs_df):
    a = bm25_topk(docs_df, query_frame(spark, QUERIES), k=3, shards=1).collect()
    b = bm25_topk(docs_df, query_frame(spark, QUERIES), k=3, shards=16).collect()
    key = lambda r: (r.query_id, r.rank, r.doc_id)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_tfidf_doc_terms(spark, docs_df):
    rows = tfidf_doc_terms(docs_df, top_terms=1).collect()
    best = {r.doc_id: r.term for r in rows}
    # every doc gets exactly one top term; distinctive terms win
    assert len(rows) == len(DOCS)
    assert best[5] == "scans"
    assert best[3] in ("spark", "joins")
    # 'a'/'tiny'/'doc' all unique to doc 4 with tf=1 -> tie broken by term asc
    assert best[4] == "a"


def test_bm25_index_search_matches_direct(spark, tmp_path):
    from lakeflush_spark.operators.retrieval import bm25_search, build_bm25_index

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "bm25_idx")
    build_bm25_index(docs, idx)
    got = bm25_search(spark, idx, QUERIES, k=3).collect()
    want = bm25_topk(docs, query_frame(spark, QUERIES), k=3).collect()
    key = lambda r: (r.query_id, r.rank, r.doc_id)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    for g, w in zip(sorted(got, key=key), sorted(want, key=key)):
        assert g.score == pytest.approx(w.score, rel=1e-12)


def test_bm25_index_partition_pruning(spark, tmp_path):
    from lakeflush_spark.operators.retrieval import (
        _term_bucket_py,
        build_bm25_index,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "bm25_idx2")
    build_bm25_index(docs, idx, n_buckets=64)
    all_posts = spark.read.parquet(f"{idx}/postings")
    buckets = sorted({_term_bucket_py(t, 64) for t in ["spark", "joins"]})
    pruned = all_posts.where(F.col("_tb").isin(buckets))

    def files_read(df):
        return df.select(F.input_file_name()).distinct().count()

    # partition elimination: the pruned scan must touch strictly fewer
    # files than the full index (the 100 TB read-cost claim)
    assert 0 < files_read(pruned) < files_read(all_posts)
    # and the pruned read still contains every posting for those terms
    terms_in = {r.term for r in pruned.select("term").distinct().collect()}
    assert {"spark", "joins"} <= terms_in


def test_bm25_search_rejects_empty_queries(spark, tmp_path):
    from lakeflush_spark.operators.retrieval import bm25_search, build_bm25_index

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "bm25_idx3")
    build_bm25_index(docs, idx)
    with pytest.raises(ValueError, match="no terms"):
        bm25_search(spark, idx, [])


def test_reciprocal_rank_fusion_matches_model(spark):
    """RRF vs the plain-Python model: union of lists, 1/(k+r) terms,
    missing side contributes 0; fused order (rrf desc, doc asc)."""
    import pyspark.sql.functions as F

    from lakeflush_spark.operators.retrieval import (
        RRF_K,
        reciprocal_rank_fusion,
    )

    a_rows = [(0, d, r + 1) for r, d in enumerate([10, 11, 12, 13])]
    b_rows = [(0, d, r + 1) for r, d in enumerate([12, 13, 14])] + [
        (1, 20, 1)  # a query only list B saw
    ]
    a = spark.createDataFrame(a_rows, "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(b_rows, "query_id long, doc_id long, rank long")
    got = {
        (r.query_id, r.doc_id): (r.rrf_e9, r.src_mask, r.rank)
        for r in reciprocal_rank_fusion(a, b).collect()
    }
    # python model
    ra = {(q, d): r for q, d, r in a_rows}
    rb = {(q, d): r for q, d, r in b_rows}
    want_scores = {}
    for key in set(ra) | set(rb):
        s = 0.0
        if key in ra:
            s += 1.0 / (RRF_K + ra[key])
        if key in rb:
            s += 1.0 / (RRF_K + rb[key])
        want_scores[key] = (
            int(__import__("math").floor(s * 1e9 + 0.5)),
            (1 if key in ra else 0) + (2 if key in rb else 0),
        )
    assert {k: v[:2] for k, v in got.items()} == want_scores
    # doc 12 (rank 3 + rank 1) must beat doc 10 (rank 1, one list)
    assert got[(0, 12)][2] < got[(0, 10)][2]
    # query 1 exists with its single B-side doc at rank 1
    assert got[(1, 20)] == (want_scores[(1, 20)][0], 2, 1)
    # determinism across partitioning
    again = {
        (r.query_id, r.doc_id): (r.rrf_e9, r.src_mask, r.rank)
        for r in reciprocal_rank_fusion(
            a.repartition(5), b.repartition(3)
        ).collect()
    }
    assert again == got
    # top_k truncation
    assert (
        reciprocal_rank_fusion(a, b, top_k=2)
        .where(F.col("query_id") == 0)
        .count()
        == 2
    )


def test_hybrid_search_composes_the_pieces_exactly(spark, tmp_path):
    """r13 (VERDICT r12 #3): hybrid_search(bm25_dir, ivf_dir, ...) must
    be row-identical to hand-composing bm25_search + ivf_search +
    reciprocal_rank_fusion with the same depths."""
    import pyspark.sql.functions as F

    from lakeflush_spark.operators.retrieval import (
        bm25_search,
        build_bm25_index,
        hybrid_search,
        reciprocal_rank_fusion,
    )
    from lakeflush_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
        prepare_vectors,
    )

    words = ["spark", "joins", "scans", "rows", "plans", "vectors"]
    docs = spark.createDataFrame(
        [
            (i, " ".join(words[(i + j) % len(words)] for j in range(4)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    bm_dir, ivf_dir = str(tmp_path / "bm25"), str(tmp_path / "ivf")
    corpus = prepare_vectors(vecs)
    build_bm25_index(docs, bm_dir)
    build_ivf_index(corpus, ivf_dir, n_cells=4)

    queries = [
        (0, "spark joins", [1.0, -2.0, 3.0, 0.5, -1.0, 2.0, 0.0, 1.5]),
        (1, "scans rows", [-3.0, 1.0, 0.0, 2.0, 1.0, -1.0, 4.0, 0.0]),
    ]
    k, list_k, nprobe = 5, 20, 2
    got = hybrid_search(
        spark, bm_dir, ivf_dir, queries, k=k, list_k=list_k, nprobe=nprobe
    )
    rows = {(r.query_id, r.doc_id): (r.rrf_e9, r.src_mask, r.rank)
            for r in got.collect()}

    kw = bm25_search(
        spark, bm_dir, [(q, t) for q, t, _ in queries], k=list_k
    ).select("query_id", F.col("doc_id").alias("doc_id"), "rank")
    qv = prepare_vectors(
        spark.createDataFrame(
            [(q, v) for q, _, v in queries],
            "vec_id long, embedding array<double>",
        )
    )
    ann = ivf_search(spark, ivf_dir, qv, k=list_k, nprobe=nprobe).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    want = {
        (r.query_id, r.doc_id): (r.rrf_e9, r.src_mask, r.rank)
        for r in reciprocal_rank_fusion(kw, ann, top_k=k).collect()
    }
    assert rows == want
    # top-k honored per query, ranks total and 1-based
    for q in (0, 1):
        ranks = sorted(v[2] for kq, v in rows.items() if kq[0] == q)
        assert ranks == list(range(1, k + 1))
    # both systems contributed somewhere (src_mask 3 = fused hit)
    assert {v[1] for v in rows.values()} & {3}


def test_hybrid_search_over_reranked_pq_index_matches_float(spark, tmp_path):
    """r14: a PQ vectors store routes the ANN leg through ADC search;
    with the float parent as rerank store the hybrid result is
    row-identical to hybrid over the float index."""
    from lakeflush_spark.operators.pq import pq_encode_index
    from lakeflush_spark.operators.retrieval import (
        build_bm25_index,
        hybrid_search,
    )
    from lakeflush_spark.operators.similarity import (
        build_ivf_index,
        prepare_vectors,
    )

    words = ["spark", "joins", "scans", "rows", "plans", "vectors"]
    docs = spark.createDataFrame(
        [
            (i, " ".join(words[(i + j) % len(words)] for j in range(4)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(16)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    bm_dir, ivf_dir = str(tmp_path / "bm25"), str(tmp_path / "ivf")
    pq_dir = str(tmp_path / "pq")
    build_bm25_index(docs, bm_dir)
    build_ivf_index(prepare_vectors(vecs), ivf_dir, n_cells=4)
    pq_encode_index(spark, ivf_dir, pq_dir, m=8, n_codes=32)

    queries = [
        (0, "spark joins", [float((d * 5) % 7) - 3.0 for d in range(16)]),
        (1, "scans rows", [float((d * 3 + 1) % 5) - 2.0 for d in range(16)]),
    ]
    res = lambda d, **kw: {  # noqa: E731
        (r.query_id, r.doc_id): (r.rrf_e9, r.src_mask, r.rank)
        for r in hybrid_search(
            spark, bm_dir, d, queries, k=5, list_k=20, nprobe=4, **kw
        ).collect()
    }
    want = res(ivf_dir)
    got = res(pq_dir, ann_rerank_index_dir=ivf_dir, rerank_factor=8)
    assert got == want


def test_hybrid_search_rejects_empty_queries(spark, tmp_path):
    from lakeflush_spark.operators.retrieval import hybrid_search

    with pytest.raises(ValueError):
        hybrid_search(spark, str(tmp_path), str(tmp_path), [], k=5)


def test_ivf_index_stream_matches_batch_append_all_layouts(spark, tmp_path):
    """r14: vector indexing on arrival — two streamed batches onto a
    built index serve searches identical to batch append_ivf_index of
    the same rows, for the float AND PQ layouts; a checkpointed
    restart with no new input changes nothing; compaction prunes the
    (run, batch) replay columns and stays value-identical; an unbuilt
    index dir raises the actionable error."""
    import glob as _glob
    import shutil as _shutil

    import pyspark.sql.functions as F
    import pytest as _pytest

    from lakeflush_spark.operators.pq import ivfpq_search, pq_encode_index
    from lakeflush_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        ivf_search,
        prepare_vectors,
    )
    from lakeflush_spark.streaming.retrieval import (
        StreamVecIndexConfig,
        ivf_index_stream,
    )

    def vec_rows(lo, hi):
        return [
            (i, [((i * 37 + j * 11) % 97) / 97.0 - 0.5 for j in range(32)])
            for i in range(lo, hi)
        ]

    base_df = spark.createDataFrame(
        vec_rows(0, 200), "vec_id long, embedding array<double>"
    )
    # the deterministic quantizer makes independent builds over the
    # same corpus identical — idx_q is the stream's frozen parent,
    # idx_b the batch-append twin the stream must serve identically to
    idx_q = str(tmp_path / "ivf_parent")
    idx_s = str(tmp_path / "ivf_stream")
    idx_b = str(tmp_path / "ivf_batch")
    build_ivf_index(prepare_vectors(base_df), idx_q, n_cells=8)
    build_ivf_index(prepare_vectors(base_df), idx_b, n_cells=8)

    src = tmp_path / "src"
    src.mkdir()
    cfg = StreamVecIndexConfig(
        source_dir=str(src),
        index_dir=idx_s,
        checkpoint_dir=str(tmp_path / "ck"),
        quantizer_index_dir=idx_q,
    )

    def add_file(name, rows):
        stage = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        _shutil.copy(
            _glob.glob(str(stage / "part-*.parquet"))[0],
            str(src / f"{name}.parquet"),
        )

    add_file("b1", vec_rows(0, 200))  # corpus history arrives too
    assert ivf_index_stream(spark, cfg).awaitTermination(180)
    add_file("b2", vec_rows(200, 260))
    assert ivf_index_stream(spark, cfg).awaitTermination(180)

    extra = spark.createDataFrame(
        vec_rows(200, 260), "vec_id long, embedding array<double>"
    )
    append_ivf_index(spark, prepare_vectors(extra), idx_b)
    queries = prepare_vectors(base_df).where(F.col("vid") < 3)

    def results(d):
        return {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in ivf_search(spark, d, queries, k=8, nprobe=8).collect()
        }

    streamed = results(idx_s)
    assert streamed == results(idx_b)
    assert any(n >= 200 for (_, n, _, _) in streamed)  # arrivals serve

    # checkpointed restart, no new input: unchanged
    assert ivf_index_stream(spark, cfg).awaitTermination(180)
    assert results(idx_s) == streamed

    # compaction prunes the replay columns, results identical
    comp = str(tmp_path / "comp")
    compact_ivf_index(spark, idx_s, comp)
    cols = spark.read.option("basePath", f"{comp}/vectors").parquet(
        f"{comp}/vectors"
    ).columns
    assert "run" not in cols and "batch" not in cols
    assert results(comp) == streamed

    # PQ layout: a PQ parent makes the stream encode arrivals with the
    # frozen codebooks; reranked search against the batch float index
    # must match the float results exactly
    pq_parent = str(tmp_path / "pq_parent")
    pq_s = str(tmp_path / "pq_stream")
    pq_encode_index(spark, idx_q, pq_parent, m=8, n_codes=32)
    cfg_pq = StreamVecIndexConfig(
        source_dir=str(src),
        index_dir=pq_s,
        checkpoint_dir=str(tmp_path / "ck_pq"),
        quantizer_index_dir=pq_parent,
    )
    assert ivf_index_stream(spark, cfg_pq).awaitTermination(180)
    got_pq = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivfpq_search(
            spark, pq_s, queries, k=8, nprobe=8,
            rerank_index_dir=idx_b, rerank_factor=8,
        ).collect()
    }
    assert got_pq == streamed

    # unbuilt quantizer dir: actionable error
    with _pytest.raises(ValueError, match="build_ivf_index"):
        ivf_index_stream(
            spark,
            StreamVecIndexConfig(
                source_dir=str(src),
                index_dir=str(tmp_path / "nope"),
                checkpoint_dir=str(tmp_path / "ck2"),
                quantizer_index_dir=str(tmp_path / "nope_q"),
            ),
        )
    with _pytest.raises(ValueError, match="required"):
        ivf_index_stream(
            spark,
            StreamVecIndexConfig(
                source_dir=str(src),
                index_dir=str(tmp_path / "nope2"),
                checkpoint_dir=str(tmp_path / "ck3"),
            ),
        )


def test_append_bm25_index_equals_full_rebuild(spark, tmp_path):
    """r13: build(A) + append(B) must serve EXACTLY build(A ∪ B) —
    df / n_docs / total_len are summable and bm25_search aggregates
    the increment rows at read time."""
    from lakeflush_spark.operators.retrieval import (
        append_bm25_index,
        bm25_search,
        build_bm25_index,
        compact_bm25_index,
    )

    words = ["spark", "joins", "scans", "rows", "plans", "filters"]
    all_docs = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(5)))
        for i in range(30)
    ]
    df_a = spark.createDataFrame(all_docs[:18], "doc_id long, text string")
    df_b = spark.createDataFrame(all_docs[18:], "doc_id long, text string")
    df_all = spark.createDataFrame(all_docs, "doc_id long, text string")

    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    build_bm25_index(df_a, inc_dir)
    append_bm25_index(df_b, inc_dir)
    build_bm25_index(df_all, full_dir)

    qs = [(0, "spark joins"), (1, "scans filters rows")]

    def results(d):
        return {
            (r.query_id, r.doc_id): (r.rank, round(r.score, 9), r.sum_tf)
            for r in bm25_search(spark, d, qs, k=10).collect()
        }

    assert results(inc_dir) == results(full_dir)

    # compaction: one row per term, identical search results
    comp_dir = str(tmp_path / "comp")
    compact_bm25_index(spark, inc_dir, comp_dir)
    assert results(comp_dir) == results(full_dir)
    terms = spark.read.option("basePath", f"{comp_dir}/terms").parquet(
        f"{comp_dir}/terms"
    )
    dup = terms.groupBy("term").count().where("count > 1").count()
    assert dup == 0
    # stats collapsed to one row
    assert spark.read.parquet(f"{comp_dir}/stats").count() == 1
    # never compact onto a live index
    with pytest.raises(Exception):
        compact_bm25_index(spark, inc_dir, comp_dir)


def test_append_bm25_index_preserves_partition_pruning(spark, tmp_path):
    """Appended postings land in their _tb partitions, so the pruned
    search still lists strictly fewer files than the full index."""
    from lakeflush_spark.operators.retrieval import (
        append_bm25_index,
        bm25_search,
        build_bm25_index,
    )

    docs = spark.createDataFrame(
        [(i, f"term{i % 40} common filler{i % 7}") for i in range(200)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_bm25_index(docs, idx, n_buckets=64)
    append_bm25_index(
        spark.createDataFrame(
            [(1000 + i, f"term{i % 40} extra") for i in range(50)],
            "doc_id long, text string",
        ),
        idx,
        n_buckets=64,
    )
    out = bm25_search(spark, idx, [(0, "term3")], k=5, n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert out.count() > 0
    # appended docs are searchable
    ids = {r.doc_id for r in out.collect()}
    assert any(i >= 1000 for i in ids) or len(ids) == 5


def test_bm25_index_stream_matches_batch_build(spark, tmp_path):
    """r13: the index-on-arrival stream serves scores identical to a
    one-shot build over the same documents, survives a checkpointed
    restart with no change, and keeps serving through bm25_search's
    pruned reads."""
    import glob as _glob
    import shutil as _shutil

    from lakeflush_spark.operators.retrieval import (
        bm25_search,
        build_bm25_index,
    )
    from lakeflush_spark.streaming.retrieval import (
        StreamIndexConfig,
        bm25_index_stream,
    )

    words = ["spark", "joins", "scans", "rows", "plans", "filters"]
    all_docs = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(5)))
        for i in range(30)
    ]
    src = tmp_path / "src"
    src.mkdir()
    cfg = StreamIndexConfig(
        source_dir=str(src),
        index_dir=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ck"),
    )

    def add_file(name, rows):
        stage = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        _shutil.copy(
            _glob.glob(str(stage / "part-*.parquet"))[0],
            str(src / f"{name}.parquet"),
        )

    add_file("b1", all_docs[:18])
    assert bm25_index_stream(spark, cfg).awaitTermination(180)
    add_file("b2", all_docs[18:])
    assert bm25_index_stream(spark, cfg).awaitTermination(180)

    full_dir = str(tmp_path / "full")
    build_bm25_index(
        spark.createDataFrame(all_docs, "doc_id long, text string"), full_dir
    )
    qs = [(0, "spark joins"), (1, "scans filters rows")]

    def results(d):
        return {
            (r.query_id, r.doc_id): (r.rank, round(r.score, 9), r.sum_tf)
            for r in bm25_search(spark, d, qs, k=10).collect()
        }

    streamed = results(cfg.index_dir)
    assert streamed == results(full_dir)

    # checkpointed restart with no new input: index unchanged
    assert bm25_index_stream(spark, cfg).awaitTermination(180)
    assert results(cfg.index_dir) == streamed
    # the per-batch increment layout is on disk ((run, batch) under
    # the leading _tb), and compaction collapses it losslessly
    from lakeflush_spark.operators.retrieval import compact_bm25_index

    stats = spark.read.option(
        "basePath", f"{cfg.index_dir}/stats"
    ).parquet(f"{cfg.index_dir}/stats")
    assert stats.count() == 2  # one increment row per batch
    comp = str(tmp_path / "comp")
    compact_bm25_index(spark, cfg.index_dir, comp)
    assert results(comp) == streamed
