"""Property-based cross-checks of the r9 surfaces (SURVEY §5 model
strategy): fp-store compaction against a plain-Python totals model,
prefix-pruned history reads against the unpruned reference
computation, and the int8 index conversion against the from-scratch
build. Spark-per-example is expensive, so example counts are small —
the properties still cover shapes (empty batches, colliding
fingerprints, single-run/multi-run stores) the unit tests pin only
one instance of.
"""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# 32-hex md5-shaped fingerprints drawn from a SMALL alphabet of
# prefixes so examples collide across batches and prefixes repeat
_FP = st.integers(min_value=0, max_value=9).map(
    lambda i: f"{i:02x}" + f"{i * 7:030x}"[-30:]
)
_STORE_ROWS = st.lists(
    st.tuples(
        _FP,
        st.integers(min_value=1, max_value=5),   # n
        st.integers(min_value=0, max_value=2),   # batch
        st.sampled_from(["r1", "r2"]),           # run
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(rows=_STORE_ROWS, prefixed=st.booleans())
def test_compact_fp_store_totals_model(spark, tmp_path_factory, rows, prefixed):
    """compact_fp_store preserves per-(run, fp) totals exactly (the
    plain-Python dict model), keeps each run's highest batch verbatim,
    merges everything else under batch=-1, and preserves the _fp
    layout when present — for arbitrary small stores."""
    from lakeflush_spark.streaming.substring import (
        compact_fp_store,
        fp_store_frame,
    )

    work = tmp_path_factory.mktemp("fpprop")
    store = str(work / "fps")
    df = spark.createDataFrame(
        [(fp, n, b, r) for fp, n, b, r in rows],
        "fp string, n long, batch int, run string",
    )
    frame, extra = fp_store_frame(df, prefixed)
    frame.write.partitionBy("run", "batch", *extra).parquet(store)

    model: dict = {}
    for fp, n, b, r in rows:
        model[(r, fp)] = model.get((r, fp), 0) + n
    max_batch = {}
    for fp, n, b, r in rows:
        max_batch[r] = max(max_batch.get(r, -1), b)

    dest = str(work / "compacted")
    compact_fp_store(spark, store, dest)
    got = spark.read.option("basePath", dest).parquet(dest)
    got_totals = {
        (r.run, r.fp): r.t
        for r in got.groupBy("run", "fp").agg(F.sum("n").alias("t")).collect()
    }
    assert got_totals == model
    for r in got.collect():
        assert r.batch in (-1, max_batch[r.run])
        if prefixed:
            # a RAW read of an all-numeric prefix dir set infers _fp
            # as int (the engine's pruned reads normalize; a raw read
            # legitimately sees the inferred type) — compare the
            # directory VALUE, zero-padded back to the 2-char form
            assert str(r._fp).zfill(2) == r.fp[:2]
    if prefixed:
        assert "_fp" in got.columns
    else:
        assert "_fp" not in got.columns


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    store_rows=_STORE_ROWS,
    batch_fps=st.lists(_FP, min_size=1, max_size=5, unique=True),
)
def test_pruned_fp_history_equals_unpruned_reference(
    spark, tmp_path_factory, store_rows, batch_fps
):
    """Partition elimination never changes the answer: for arbitrary
    prefix-partitioned stores and batch fingerprint sets, the pruned
    history counts equal the plain semi-join + sum over the full
    store."""
    from lakeflush_spark.streaming.substring import (
        fp_store_frame,
        pruned_fp_history,
    )

    work = tmp_path_factory.mktemp("fpprune")
    store = str(work / "fps")
    df = spark.createDataFrame(
        [(fp, n, b, r) for fp, n, b, r in store_rows],
        "fp string, n long, batch int, run string",
    )
    frame, extra = fp_store_frame(df, True)
    frame.write.partitionBy("run", "batch", *extra).parquet(store)

    hist = spark.read.option("basePath", store).parquet(store)
    batch_counts = spark.createDataFrame(
        [(fp, 1) for fp in batch_fps], "fp string, n long"
    )
    got = {
        r.fp: r._hn
        for r in pruned_fp_history(
            hist, batch_counts, fp_dir=store, fp_prefix_partitions=True
        ).collect()
    }
    want: dict = {}
    wanted = set(batch_fps)
    for fp, n, b, r in store_rows:
        if fp in wanted:
            want[fp] = want.get(fp, 0) + n
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=8, max_value=40),
    dims=st.sampled_from([4, 8]),
    n_cells=st.sampled_from([2, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_quantize_index_equivalence_property(
    spark, tmp_path_factory, n, dims, n_cells, seed
):
    """quantize_index == build_ivf_index(quantize=True) row-for-row on
    arbitrary small corpora — the deterministic-assignment claim the
    cheap conversion rests on, across sizes and cell counts."""
    import random

    from lakeflush_spark.operators.similarity import (
        build_ivf_index,
        prepare_vectors,
        quantize_index,
    )

    rng = random.Random(seed)
    corpus = prepare_vectors(
        spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
    )
    work = tmp_path_factory.mktemp("qidx")
    idx_f, idx_q, idx_c = (str(work / x) for x in ("f", "q", "c"))
    build_ivf_index(corpus, idx_f, n_cells=n_cells)
    build_ivf_index(corpus, idx_q, n_cells=n_cells, quantize=True)
    quantize_index(spark, idx_f, idx_c)

    def rows(d):
        return sorted(
            (r.vid, r.cell_id, r.qv.scale, tuple(r.qv.q), r.nrm, r._cp)
            for r in spark.read.option("basePath", f"{d}/vectors")
            .parquet(f"{d}/vectors").collect()
        )

    assert rows(idx_c) == rows(idx_q)
