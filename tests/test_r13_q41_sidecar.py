"""r13 — q41 observability sidecar (VERDICT r12 #1) + the float-surface
sweep it carries.

Two driver-red rounds with zero local reproductions: q41 now collects
once, logs a per-label sidecar from those exact rows, and returns them
localized. These tests pin (a) the sidecar mechanics (written on every
build, oracle diff empty at contract scale, divergent rows named when
labels differ), and (b) the swept float margins: the bm25/tfidf/dsir
ln band edges and the rrf cosine/fused-grid tie distances all clear
the cross-engine drift scale by orders of magnitude.
"""

import glob
import json
import os

from lakeflush_spark.plans.q41_debug import (
    DEBUG_DIR,
    label_digests,
    rrf_grid_margin_exact,
)

SF = "/root/testdata/sf0.001"

#: cross-engine ln drift is ~1e-9 grid units; any band-edge margin
#: above 1e-7 grid units leaves two orders of safety (the r12 verdict's
#: "thin band" alarm threshold).
MIN_BAND_MARGIN = 1e-7


def test_label_digests_canonicalization():
    rows = [
        ("a", "k", None, 1, None, 2),
        ("a", "k2", "x", 3, 4, 5),
        ("b", "k", "", 0, 0, 0),
    ]
    d = label_digests(rows)
    assert set(d) == {"a", "b"}
    assert d["a"]["rows"] == 2 and d["b"]["rows"] == 1
    # order-insensitive: shuffling rows leaves every digest unchanged
    assert label_digests(list(reversed(rows))) == d
    # value-sensitive: flipping one cell moves exactly that label
    d2 = label_digests([("a", "k", None, 9, None, 2)] + rows[1:])
    assert d2["a"]["md5"] != d["a"]["md5"]
    assert d2["b"]["md5"] == d["b"]["md5"]
    # NULL and the string "None" must not collide
    assert (
        label_digests([("a", None)])["a"]["md5"]
        != label_digests([("a", "None")])["a"]["md5"]
    )


def test_rrf_fused_grid_has_no_tie_for_any_rank_pair():
    """Data-independent proof: no fused RRF score 1/(60+ra)+1/(60+rb)
    (ranks 1..RRF_ANN_K, either list optional) lands within 1e-4 of a
    half-up 1e-9-grid boundary — the snap is unambiguous for EVERY
    possible corpus, not just the test one."""
    assert rrf_grid_margin_exact() > 1e-4


def test_q41_build_writes_sidecar_with_clean_oracle_diff(spark):
    from lakeflush_spark.plans import QUERIES

    before = set(glob.glob(os.path.join(DEBUG_DIR, "q41-*.json")))
    df = QUERIES["q41_wordcount_topk"].builder(spark, SF)
    rows = df.collect()
    assert len(rows) > 0
    new = set(glob.glob(os.path.join(DEBUG_DIR, "q41-*.json"))) - before
    assert new, "q41 build must write a debug sidecar"
    doc = json.load(open(sorted(new)[-1]))
    assert doc["sf_dir"] == SF
    assert doc["spark_total_rows"] == len(rows)
    # the sidecar digests are computed from the same rows the driver
    # receives: recomputing from the returned frame must agree
    assert label_digests([tuple(r) for r in rows]) == doc["spark_labels"]
    # contract scale -> in-process oracle replay ran and found nothing
    assert doc.get("oracle_error") is None
    assert doc["oracle_total_rows"] == len(rows)
    assert doc["diverged_labels"] == {}
    assert doc["session"]["spark_version"]
    assert doc["session"]["duckdb_version"]
    # float-surface sweep: every band margin clears the alarm line
    m = doc["float_margins"]
    assert m["bm25_band_margin"] > MIN_BAND_MARGIN
    assert m["tfidf_band_margin"] > MIN_BAND_MARGIN
    assert m["dsir_gumbel_band_margin"] > MIN_BAND_MARGIN
    # a tie margin of 0 would mean an exact 4dp rounding tie
    assert m["rrf_cos_tie_margin"] > 0.0
    assert m["rrf_fused_grid_margin"] > 1e-4


def test_sidecar_names_divergent_label_and_rows(tmp_path, spark, monkeypatch):
    """When the Spark rows and the oracle disagree, the sidecar must
    name the label and list the divergent rows from both sides — the
    property the next driver failure depends on."""
    import lakeflush_spark.plans.q41_debug as q41_debug

    monkeypatch.setattr(q41_debug, "DEBUG_DIR", str(tmp_path))
    monkeypatch.setenv("LAKEFLUSH_Q41_ORACLE", "1")
    spark_rows = [("word", "the", "", 11, None, None)]
    monkeypatch.setattr(
        q41_debug,
        "_oracle_rows",
        lambda sf_dir: [
            ("word", "the", "", 10, None, None),
            ("lm", "1", "2", 3, 4, None),
        ],
    )
    path = q41_debug.write_sidecar(
        spark, SF, spark_rows, ["method", "k1", "k2", "n1", "n2", "n3"]
    )
    doc = json.load(open(path))
    div = doc["diverged_labels"]
    assert set(div) == {"word", "lm"}
    assert div["word"]["spark_only"] == ["word\tthe\t\t11\t\\N\t\\N"]
    assert div["word"]["oracle_only"] == ["word\tthe\t\t10\t\\N\t\\N"]
    assert div["lm"]["spark_only"] == []
    assert div["lm"]["oracle_only"] == ["lm\t1\t2\t3\t4\t\\N"]


def test_sidecar_disabled_oracle_still_logs_labels(tmp_path, spark, monkeypatch):
    import lakeflush_spark.plans.q41_debug as q41_debug

    monkeypatch.setattr(q41_debug, "DEBUG_DIR", str(tmp_path))
    monkeypatch.setenv("LAKEFLUSH_Q41_ORACLE", "0")
    path = q41_debug.write_sidecar(
        spark, SF, [("word", "a", "", 1, None, None)], ["method"]
    )
    doc = json.load(open(path))
    assert doc["spark_labels"]["word"]["rows"] == 1
    assert "oracle_labels" not in doc and "diverged_labels" not in doc
    assert "float_margins" not in doc


def test_q41_builder_rows_equal_lazy_suite_frame(spark):
    """The declared builder returns the collected rows of the LAZY
    suite plan (plans.PLAN_FRAMES) localized — the two surfaces must
    never drift (plan audits and label attribution read the lazy one,
    the driver hashes the localized one)."""
    from lakeflush_spark.plans import PLAN_FRAMES, QUERIES

    rows_b = QUERIES["q41_wordcount_topk"].builder(spark, SF).collect()
    rows_s = PLAN_FRAMES["q41_wordcount_topk"](spark, SF).collect()
    assert [tuple(r) for r in rows_b] == [tuple(r) for r in rows_s]


def test_q62_stream_memo_keys_on_sf_dir(spark):
    """q62's streaming-run artifact memo must key on (session, sf_dir):
    two sf dirs in one session produce distinct dest dirs and builds
    stay deterministic within a key."""
    from lakeflush_spark.plans import QUERIES
    from lakeflush_spark.plans.dedup_queries import _Q62_STREAM_MEMO

    b = QUERIES["q62_repeated_passage"].builder
    r1 = {tuple(r) for r in b(spark, SF).collect()}
    app = spark.sparkContext.applicationId
    assert (app, SF) in _Q62_STREAM_MEMO
    # warm rebuild: identical rows, no new memo entry
    n_keys = len(_Q62_STREAM_MEMO)
    r2 = {tuple(r) for r in b(spark, SF).collect()}
    assert r1 == r2 and len(_Q62_STREAM_MEMO) == n_keys


def test_sidecar_embeds_recoverable_rows(tmp_path, spark, monkeypatch):
    """The sidecar carries the full canonical row list (gzip+base64) so
    a driver-side divergence is diffable offline even when the oracle
    replay could not run there."""
    import base64
    import gzip

    import lakeflush_spark.plans.q41_debug as q41_debug

    monkeypatch.setattr(q41_debug, "DEBUG_DIR", str(tmp_path))
    monkeypatch.setenv("LAKEFLUSH_Q41_ORACLE", "0")
    rows = [("word", "a", "", 1, None, None), ("lm", "b", "c", 2, 3, 4)]
    path = q41_debug.write_sidecar(spark, SF, rows, ["method"])
    doc = json.load(open(path))
    decoded = gzip.decompress(
        base64.b64decode(doc["rows_gz_b64"])
    ).decode().split("\n")
    assert sorted(decoded) == sorted(
        "\t".join(q41_debug._canon_cell(c) for c in r) for r in rows
    )


def test_sidecar_carries_representation_evidence(tmp_path, spark, monkeypatch):
    """r14 (VERDICT r13 #3): the sidecar records the Spark result's
    df.dtypes and the BOUND DuckDB oracle types + safe-set violations,
    so a future dtype-level divergence (the q41 HUGEINT class) names
    itself instead of hiding behind matching value md5s. Filenames now
    carry ms + a sequence so sub-second builds never collide."""
    import lakeflush_spark.plans.q41_debug as q41_debug

    monkeypatch.setattr(q41_debug, "DEBUG_DIR", str(tmp_path))
    monkeypatch.setenv("LAKEFLUSH_Q41_ORACLE", "0")
    rows = [("word", "a", "", 1, None, None)]
    names = ["method", "k1", "k2", "n1", "n2", "n3"]
    dtypes = [("method", "string"), ("k1", "string"), ("k2", "string"),
              ("n1", "bigint"), ("n2", "bigint"), ("n3", "bigint")]
    p1 = q41_debug.write_sidecar(spark, SF, rows, names, spark_dtypes=dtypes)
    p2 = q41_debug.write_sidecar(spark, SF, rows, names, spark_dtypes=dtypes)
    assert p1 != p2  # ADVICE r13: no same-second overwrite
    with open(p1) as fh:
        doc = json.load(fh)
    assert doc["spark_dtypes"] == [list(t) for t in dtypes]
    ot = doc["oracle_types"]
    assert ot["type_problems"] == []
    assert ot["duck_types"]["n1"] == "BIGINT"
    assert ot["duck_types"]["n2"] == "BIGINT"
    assert ot["duck_types"]["n3"] == "BIGINT"
