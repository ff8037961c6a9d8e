#!/usr/bin/env python
"""Measure the r11 STAGED quality gate against the r10 single-pass
fused gate on a heavy config (gopher + c4 + full-table MT + a
coverage-reading classifier) over the sf documents table.

Reports per-variant wall seconds for annotate+filter+count, the
kept-set size (must match exactly), and the stage-1 survivor fraction
— the knob the staged win scales with (stage 2's coverage folds run
only on stage-1 survivors).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> int:
    import pyspark.sql.functions as F

    from lakeflush_spark import get_spark
    from lakeflush_spark.io import load_table
    from lakeflush_spark.pipelines import (
        quality_gate_inline,
        quality_gate_stages,
        quality_keep_condition,
        stage2_keep_condition,
    )

    spark = get_spark("staged-gate-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # a coverage-reading classifier (top2_char_ratio weight nonzero)
    # forces clf into stage 2 — the heavy case
    clf_w = {
        "n_tokens": 1.2,
        "stop_ratio": -4.0,
        "top2_char_ratio": -8.0,
        "__intercept__": -1.0,
    }
    import json as _json

    cfg_name = os.environ.get("GATE_CFG", "all")
    kw = dict(
        c4=cfg_name != "mtclf", gopher=cfg_name == "all", mt=True,
        mt_full=True, clf_weights=clf_w, clf_threshold=0.3,
    )
    gates = dict(
        min_tokens=5, max_tokens=100_000, max_stopword_ratio=0.9,
        allowed_langs=None,
    )

    def run_fused() -> int:
        ann = docs.select("*", F.inline(quality_gate_inline("text", **kw)))
        keep = quality_keep_condition(
            F.col("n_tokens"), F.col("stop_ratio"), F.col("lang_pred"),
            gates["min_tokens"], gates["max_tokens"],
            gates["max_stopword_ratio"], gates["allowed_langs"],
            gopher_flags_col=F.col("_q_gf") if kw["gopher"] else None,
            c4_flags_col=F.col("_q_cf") if kw["c4"] else None,
            mt_rep_flags_col=F.col("_q_mf"),
            classifier_pass_col=F.col("_q_clf"),
        )
        return ann.where(keep).count()

    def run_staged() -> int:
        cols1, gen2, clf2 = quality_gate_stages("text", **kw)
        s1 = docs.select("*", *cols1)
        keep1 = quality_keep_condition(
            F.col("n_tokens"), F.col("stop_ratio"), F.col("lang_pred"),
            gates["min_tokens"], gates["max_tokens"],
            gates["max_stopword_ratio"], gates["allowed_langs"],
            gopher_flags_col=F.col("_q_gf") if kw["gopher"] else None,
            c4_flags_col=F.col("_q_cf") if kw["c4"] else None,
            mt_rep_flags_col=F.col("_q_mf"),
            classifier_pass_col=None if clf2 else F.col("_q_clf"),
        )
        s2 = s1.where(keep1).select("*", F.inline(gen2))
        return s2.where(stage2_keep_condition(True, clf2)).count()

    # survivor fraction of stage 1 alone
    cols1, _, _ = quality_gate_stages("text", **kw)
    s1 = docs.select("*", *cols1)
    keep1 = quality_keep_condition(
        F.col("n_tokens"), F.col("stop_ratio"), F.col("lang_pred"),
        gates["min_tokens"], gates["max_tokens"],
        gates["max_stopword_ratio"], gates["allowed_langs"],
        gopher_flags_col=F.col("_q_gf") if kw["gopher"] else None,
        c4_flags_col=F.col("_q_cf") if kw["c4"] else None,
        mt_rep_flags_col=F.col("_q_mf"),
    )
    n_s1 = s1.where(keep1).count()

    out = {
        "n_docs": n_docs,
        "stage1_survivors": n_s1,
        "survivor_frac": round(n_s1 / n_docs, 4),
    }
    for name, fn in (("fused", run_fused), ("staged", run_staged)):
        kept = fn()  # warm
        times = []
        for _ in range(REPS):
            t0 = time.time()
            kept = fn()
            times.append(round(time.time() - t0, 2))
        out[name] = {"kept": kept, "secs": times,
                     "docs_s": round(n_docs / min(times), 1)}
    out["kept_match"] = out["fused"]["kept"] == out["staged"]["kept"]
    out["cfg"] = cfg_name
    print("STAGED_GATE_AB " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
