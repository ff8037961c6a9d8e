"""Physical-plan regression gates for the declared query surface.

PLANS.md reports the full audit; these tests HARD-FAIL the properties
the 100 TB design depends on, so an innocent-looking query edit cannot
silently turn a broadcast join into a sort-merge or un-push a filter:

- dimension joins broadcast (never shuffle the fact side);
- scan pruning + predicate pushdown reach the parquet reader;
- top-k plans TakeOrderedAndProject (per-partition heaps, no global
  sort);
- no SortMergeJoin anywhere in the contract surface;
- cartesian/nested-loop products appear ONLY in the queries designed
  around them (explicit cross join, documented all-pairs oracles,
  broadcast scoring with non-equi conditions, 1x1 scalar combines).
"""

import io
import re
from contextlib import redirect_stdout

import pytest

from lakeflush_spark.plans import QUERIES

# queries whose plans legitimately contain a BroadcastNestedLoopJoin /
# CartesianProduct: explicit cartesian (q49), all-pairs oracle-bounded
# self-joins (q26), broadcast scoring with a non-equi join condition
# (q29), 1x1 scalar-frame combines (q06, q48), and the broadcast of a
# 1-row doc_id-bounds frame feeding q58's order-preserving shard
# assignment (see plans/text_queries.py)
NLJ_ALLOWED = {
    "q06_semi_anti_join",
    "q26_simhash_neardup",
    "q29_ann_topk",
    "q48_correlated_exists",
    "q49_cross_join",
    "q58_sequence_packing",
    # r6: the 'card' labels ride corpus_report, whose token_share
    # divisor is a ONE-row broadcast total crossed into the per-source
    # frame (same bounded 1-row pattern as q58's doc_id-bounds frame)
    "q60_stratified_sample",
    # r11: q41's 'bm25' label crosses a ONE-row corpus-stats frame
    # (N docs, total length) into the scored postings (same pattern)
    "q41_wordcount_topk",
    # r11: q28's 'bal' label rides _nearest_cells, whose ONE-row
    # broadcast centroid pack crosses into the vector scan (the same
    # bounded pattern q55's IVF labels carry)
    "q28_embedding_neardup",
}

# queries that run driver-side actions or streaming at build time —
# plan text is still obtainable but slow/stateful; the cheap structural
# gates below don't need them
SKIP_HEAVY = {
    "q16_compaction_roundtrip",
    "q35_streaming_tumbling",
    "q55_ann_ivf",
    # r5: q24's builder runs the connected-components loop eagerly
    # (checkpoints + convergence probes) — whole-query plan text costs
    # the full LSH+cluster computation; its scale shape is audited in
    # PLANS.md and tests/test_dedup_ops.py instead
    "q24_neardup_pairs",
}


def _plan(spark, sf_dir, name: str) -> str:
    from lakeflush_spark.plans import PLAN_FRAMES

    build = PLAN_FRAMES.get(name, QUERIES[name].builder)
    buf = io.StringIO()
    with redirect_stdout(buf):
        build(spark, sf_dir).explain("formatted")
    return buf.getvalue()


def _ops(plan: str, pat: str) -> int:
    return len(re.findall(rf"^\(\d+\) {pat}", plan, re.M))


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {
        name: _plan(spark, sf_dir, name)
        for name in QUERIES
        if name not in SKIP_HEAVY
    }


# Spark cannot broadcast a FULL OUTER join; q47's SortMergeJoin over
# two pre-aggregated (already shuffled-by-key) sides is the designed
# plan — the join reuses the aggregation partitioning, no extra
# exchange
SMJ_ALLOWED = {"q47_full_outer_join"}


def test_no_sortmerge_join_except_designed(plans):
    offenders = {
        n for n, p in plans.items() if _ops(p, r"SortMergeJoin") and n not in SMJ_ALLOWED
    }
    assert not offenders, f"SortMergeJoin crept into: {sorted(offenders)}"


def test_nested_loop_only_where_designed(plans):
    offenders = {
        n
        for n, p in plans.items()
        if _ops(p, r"(?:CartesianProduct|BroadcastNestedLoopJoin)")
        and n not in NLJ_ALLOWED
    }
    assert not offenders, f"unplanned nested-loop join in: {sorted(offenders)}"


def test_dimension_joins_broadcast(plans):
    for name in ("q04_broadcast_join", "q05_multiway_join_topk", "q08_window_rank",
                 "q11_rollup", "q37_cube_grouping_sets", "q40_band_join"):
        assert _ops(plans[name], r"BroadcastHashJoin") >= 1, f"{name} lost its broadcast"


def test_filter_pushdown_and_column_pruning(plans):
    p = plans["q02_filter_project"]
    assert re.search(r"PushedFilters: \[[^\]]", p), "q02 filter not pushed to scan"
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and len(m.group(1).split(",")) == 4, "q02 must scan exactly 4 columns"


def test_topk_plans_take_ordered(plans):
    assert _ops(plans["q07_topk"], r"TakeOrderedAndProject") == 1, (
        "q07 must plan TakeOrderedAndProject (per-partition heaps), not a global sort"
    )


def test_partial_aggregation_before_shuffle(plans):
    # TPC-H Q1 shape: map-side partial HashAggregate must exist so the
    # shuffle carries groups, not rows
    assert _ops(plans["q03_hash_agg"], r"HashAggregate") >= 2, (
        "q03 lost its partial (map-side) aggregate"
    )


def test_q14_single_scan_for_both_window_kinds(plans):
    # tumbling is derived from the hour-aligned sliding windows by
    # exploding the aggregated output — one events scan, not two
    n_scans = _ops(plans["q14_time_windows"], r"Scan parquet")
    assert n_scans == 1, f"q14 must scan events once, found {n_scans} scans"


def test_single_partition_exchanges_bounded(plans):
    # Every `Exchange SinglePartition` collapses the job to ONE task.
    # The only legitimate occurrences in this surface are final global
    # aggregates over already-reduced data (counts, scalar combines,
    # the 16-row centroid pull, q58's 1-row doc_id-bounds frame) — at
    # most two per query. A third, or one feeding corpus-sized data,
    # is a driver funnel; PLANS.md's 1P column itemizes the audit.
    offenders = {
        n: len(re.findall(r"Arguments: SinglePartition", p))
        for n, p in plans.items()
        if len(re.findall(r"Arguments: SinglePartition", p)) > 2
    }
    assert not offenders, f"SinglePartition exchange crept in: {offenders}"


def test_python_stages_only_in_python_queries(plans):
    py_queries = {"q32_media_pipeline", "q36_stateful_sessions",
                  "q52_pandas_udf_zscore", "q53_python_udtf", "q54_pandas_udaf"}
    pat = r"(?:ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas|PythonUDTF|FlatMapGroupsInPandasWithState)"
    offenders = {
        n for n, p in plans.items() if re.search(pat, p) and n not in py_queries
    }
    assert not offenders, f"Python stage leaked into JVM-only queries: {sorted(offenders)}"
