"""Always-on q41 observability sidecar (VERDICT r12 #1).

q41_wordcount_topk went driver-red twice (r11, r12) with zero local
reproductions across 10+ replays and two judging sessions. Blind grid
fixes are exhausted; this module makes the NEXT divergence diagnosable
in the environment where it happens:

- :func:`write_sidecar` runs on EVERY q41 build, from the exact
  collected row list the caller returns to the driver (q41 localizes
  its result so the rows the driver hashes ARE the rows logged here —
  no recomputation window between the log and the hash). It records,
  under ``spark-warehouse/_q41_debug/``: per-label row counts and
  order-insensitive md5s, the total md5, and the session fingerprint
  (Spark/DuckDB/Python versions, master, shuffle partitions, AQE).
- When the corpus is contract-sized (documents.parquet ≤
  ``_ORACLE_MAX_BYTES``, i.e. sf ≤ 0.01 — the driver's correctness
  scale) it ALSO replays the registered DuckDB oracle in-process and
  diffs per label, naming the divergent label and the exact divergent
  rows from both engines. Env override: ``LAKEFLUSH_Q41_ORACLE=1``
  forces the replay at any scale, ``=0`` disables it (bench.py sets 0
  so sf0.1 timings stay honest).
- :func:`float_margins` sweeps the two float surfaces the r12 verdict
  left open: the bm25/tfidf ln grid band margin (minimum observed
  distance of any pre-snap value to the 1e-3-grid-unit band EDGE — if
  an engine pair can disagree on masking, this is where) and the rrf
  ANN side's ``round(cos, 4)`` tie margin (distance of ``cos·1e4`` to
  a half-up boundary) plus the fused-score 1e-9 grid margin. Margins
  ride in the sidecar whenever the oracle replay runs, and
  tests/test_r13_q41_sidecar.py asserts they clear the safety
  thresholds at the contract scales.

Every entry point is exception-proof: observability must never fail
the query.

Reference parity: none — /root/reference exposes no analytics; this is
infrastructure for the oracle contract.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

#: sidecar directory — anchored at the REPO root (two levels above
#: this file), not the CWD, so a driver launched from elsewhere still
#: drops its sidecars where the next session looks for them.
DEBUG_DIR = os.environ.get(
    "LAKEFLUSH_Q41_DEBUG_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "_q41_debug",
    ),
)

#: in-process oracle replay runs when documents.parquet is at most
#: this many bytes (sf0.01 is ~65 KB; sf0.1 is ~580 KB and only ever
#: driven by bench, which wants pure Spark timings).
_ORACLE_MAX_BYTES = 200_000

#: divergent-row cap per side per label in the sidecar.
_DIFF_CAP = 50

#: embed the full canonical row list only up to this many rows (the
#: contract result is ~1k; a pathological blow-up must not write MBs).
_EMBED_ROWS_CAP = 20_000

#: per-process sidecar sequence (ADVICE r13: sub-second builds in one
#: process must get distinct filenames).
import itertools as _itertools

_SIDECAR_SEQ = _itertools.count()


def _canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def label_digests(rows) -> dict[str, dict]:
    """Per-label (column 0) row count + order-insensitive md5 over a
    canonical serialization shared by the Spark and DuckDB sides."""
    by: dict[str, list[str]] = {}
    for r in rows:
        by.setdefault(str(r[0]), []).append(
            "\t".join(_canon_cell(c) for c in r)
        )
    return {
        m: {
            "rows": len(lines),
            "md5": hashlib.md5(
                "\n".join(sorted(lines)).encode()
            ).hexdigest(),
        }
        for m, lines in by.items()
    }


def _label_lines(rows) -> dict[str, set[str]]:
    by: dict[str, set[str]] = {}
    for r in rows:
        by.setdefault(str(r[0]), set()).add(
            "\t".join(_canon_cell(c) for c in r)
        )
    return by


def _session_fingerprint(spark: SparkSession) -> dict:
    conf = spark.conf

    def _get(k: str) -> str | None:
        try:
            return conf.get(k)
        except Exception:
            return None

    try:
        import duckdb

        duck = duckdb.__version__
    except Exception:
        duck = None
    return {
        "spark_version": spark.version,
        "duckdb_version": duck,
        "python": sys.version.split()[0],
        "app_id": spark.sparkContext.applicationId,
        "master": spark.sparkContext.master,
        "shuffle_partitions": _get("spark.sql.shuffle.partitions"),
        "aqe": _get("spark.sql.adaptive.enabled"),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "session_timezone": _get("spark.sql.session.timeZone"),
    }


def _oracle_rows(sf_dir: str):
    """Replay q41's registered DuckDB oracle on sf_dir's parquet."""
    from lakeflush_spark.plans import QUERIES
    from lakeflush_spark.testing import duckdb_connection

    sql = QUERIES["q41_wordcount_topk"].oracle
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _oracle_enabled(sf_dir: str) -> bool:
    env = os.environ.get("LAKEFLUSH_Q41_ORACLE", "").strip()
    if env == "1":
        return True
    if env == "0":
        return False
    try:
        from lakeflush_spark.io import table_path

        return os.path.getsize(table_path(sf_dir, "documents")) <= _ORACLE_MAX_BYTES
    except OSError:
        return False


def float_margins(spark: SparkSession, sf_dir: str) -> dict:
    """Minimum safety margins of every q41 float surface, in the
    units that matter for cross-engine agreement (see module doc).

    - ``bm25_band_margin`` / ``tfidf_band_margin``: min |dist − band|
      where dist = |s6 − floor(s6) − 0.5| of a pre-snap 1e-6-grid
      score and band = the 1e-3-grid-unit edge band. Engines disagree
      on a row's masked bit only if their dists straddle the band —
      impossible while the margin ≫ the ~1e-9-grid-unit ln drift.
    - ``dsir_gumbel_band_margin``: same metric for the Gumbel term's
      1e-6 grid (functions/grid.py edge band).
    - ``rrf_cos_tie_margin``: min |c4 − floor(c4) − 0.5| over every
      scored pair, c4 = cos·1e4 pre-round — 0 would mean an exact
      4dp rounding tie where HALF_UP semantics could differ.
    - ``rrf_fused_grid_margin``: min distance of the fused RRF score
      ·1e9 to a half-up boundary (exact-IEEE surface, belt+braces).
    """
    from lakeflush_spark.functions.grid import GRID
    from lakeflush_spark.functions.text import token_hash
    from lakeflush_spark.io import load_table
    from lakeflush_spark.operators.retrieval import (
        bm25_term_scores,
        query_frame,
        tfidf_term_scores,
    )
    from lakeflush_spark.operators.similarity import prepare_vectors
    from lakeflush_spark.plans.retrieval_queries import (
        EDGE_BAND,
        QUERIES as BM25_QUERIES,
        RRF_N_QUERIES,
        TFIDF_DOC_LIM,
    )

    def _band_margin(s6_col) -> F.Column:
        dist = F.abs(s6_col - F.floor(s6_col) - F.lit(0.5))
        return F.min(F.abs(dist - F.lit(EDGE_BAND)))

    docs = load_table(spark, sf_dir, "documents")
    out: dict = {"edge_band": EDGE_BAND}

    bm = bm25_term_scores(docs, query_frame(spark, BM25_QUERIES))
    out["bm25_band_margin"] = bm.agg(
        _band_margin(F.col("s") * F.lit(GRID)).alias("m")
    ).collect()[0][0]

    tf = tfidf_term_scores(docs).where(F.col("doc_id") < TFIDF_DOC_LIM)
    out["tfidf_band_margin"] = tf.agg(
        _band_margin(F.col("tfidf") * F.lit(GRID)).alias("m")
    ).collect()[0][0]

    # DSIR Gumbel term: the same deterministic md5 uniform as
    # operators/dsir.dsir_select_e6 (seed "0"), over every non-target
    # doc id — the one per-row transcendental in the decision chain.
    from lakeflush_spark.plans.relational_ext_queries import _DSIR_TARGET

    u = (
        token_hash(F.concat(F.lit("0:"), F.col("doc_id").cast("string")))
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    g6 = -F.log(-F.log(u)) * F.lit(GRID)
    out["dsir_gumbel_band_margin"] = docs.where(
        ~F.col("source").isin(*_DSIR_TARGET)
    ).agg(_band_margin(g6).alias("m")).collect()[0][0]

    # rrf ANN side: pre-round cosine over every scored pair (the same
    # broadcast-join shape brute_force_topk scores, minus top-k).
    from lakeflush_spark.functions.vectors import dot_product

    corpus = prepare_vectors(load_table(spark, sf_dir, "embeddings"))
    q = corpus.where(F.col("vid") < RRF_N_QUERIES).select(
        F.col("vid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    c4 = (
        dot_product(F.col("qv"), F.col("v"))
        / (F.col("qnrm") * F.col("nrm"))
    ) * F.lit(10000.0)
    out["rrf_cos_tie_margin"] = (
        corpus.join(F.broadcast(q), F.col("vid") != F.col("qid"))
        .agg(F.min(F.abs(c4 - F.floor(c4) - F.lit(0.5))).alias("m"))
        .collect()[0][0]
    )
    out["rrf_fused_grid_margin"] = rrf_grid_margin_exact()
    return out


def rrf_grid_margin_exact(
    k: int = 60, max_rank: int | None = None
) -> float:
    """Exact, data-independent proof margin for the rrf 1e-9 grid:
    the minimum distance of ``1/(k+ra) + 1/(k+rb)`` (and the
    single-list terms) to a half-up 1e-9 boundary, enumerated over
    EVERY possible 1-based rank pair up to ``max_rank`` — the fused
    score's domain is finite, so this covers all corpora, not just
    the one under test. Pure driver-side Python; ~10k IEEE ops."""
    import math

    from lakeflush_spark.plans.retrieval_queries import RRF_ANN_K

    mr = int(max_rank if max_rank is not None else RRF_ANN_K)
    vals = [1.0 / (k + r) for r in range(1, mr + 1)]
    margin = math.inf
    for i, a in enumerate(vals):
        for b in vals[i:]:
            s9 = (a + b) * 1e9
            margin = min(margin, abs(s9 - math.floor(s9) - 0.5))
        s9 = a * 1e9
        margin = min(margin, abs(s9 - math.floor(s9) - 0.5))
    return margin


def _oracle_bound_types(sf_dir: str) -> dict:
    """Bind (planner-only, never executes) q41's registered oracle and
    return its per-column DuckDB types plus any columns outside the
    driver-safe set. r14 (VERDICT r13 #3): the r13 sidecar proved the
    VALUES matched but could not see the HUGEINT n1 — representation
    evidence now rides in every sidecar so the next dtype-level
    divergence names itself."""
    from lakeflush_spark.plans import QUERIES
    from lakeflush_spark.testing import (
        duckdb_connection,
        oracle_type_problems,
    )

    sql = QUERIES["q41_wordcount_topk"].oracle
    con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(sql)
        return {
            "duck_types": dict(
                zip(rel.columns, (str(t) for t in rel.types))
            ),
            "type_problems": oracle_type_problems(con, sql),
        }
    finally:
        con.close()


def write_sidecar(
    spark: SparkSession, sf_dir: str, rows, schema_names, spark_dtypes=None
) -> str | None:
    """Write the q41 debug sidecar; returns the path (None on any
    failure — never raises)."""
    try:
        t0 = time.time()
        doc = {
            "sf_dir": sf_dir,
            "unix_ts": t0,
            "schema": list(schema_names),
            # Spark-side result representation (df.dtypes of the frame
            # whose collected rows the driver hashes)
            "spark_dtypes": (
                [list(p) for p in spark_dtypes] if spark_dtypes else None
            ),
            "session": _session_fingerprint(spark),
            "spark_total_rows": len(rows),
            "spark_labels": label_digests(rows),
            "spark_total_md5": hashlib.md5(
                "\n".join(
                    sorted(
                        "\t".join(_canon_cell(c) for c in r) for r in rows
                    )
                ).encode()
            ).hexdigest(),
        }
        # oracle representation evidence is binding-only (no execution),
        # so it runs at EVERY scale, including bench's oracle-off runs
        try:
            doc["oracle_types"] = _oracle_bound_types(sf_dir)
        except Exception as exc:  # noqa: BLE001
            doc["oracle_types_error"] = repr(exc)
        if _oracle_enabled(sf_dir):
            try:
                orows = _oracle_rows(sf_dir)
                doc["oracle_labels"] = label_digests(orows)
                doc["oracle_total_rows"] = len(orows)
                s_lines, o_lines = _label_lines(rows), _label_lines(orows)
                diverged = {}
                for lab in sorted(set(s_lines) | set(o_lines)):
                    s, o = s_lines.get(lab, set()), o_lines.get(lab, set())
                    if s != o:
                        diverged[lab] = {
                            "spark_only": sorted(s - o)[:_DIFF_CAP],
                            "oracle_only": sorted(o - s)[:_DIFF_CAP],
                        }
                doc["diverged_labels"] = diverged
            except Exception as exc:  # noqa: BLE001
                doc["oracle_error"] = repr(exc)
            try:
                doc["float_margins"] = float_margins(spark, sf_dir)
            except Exception as exc:  # noqa: BLE001
                doc["float_margins_error"] = repr(exc)
        # the FULL canonical row list rides along (gzip+base64, ~10 KB
        # at contract scale) so a red driver row is diffable offline
        # even when the in-process oracle replay could not run there
        if len(rows) <= _EMBED_ROWS_CAP:
            import base64
            import gzip

            payload = "\n".join(
                sorted("\t".join(_canon_cell(c) for c in r) for r in rows)
            ).encode()
            doc["rows_gz_b64"] = base64.b64encode(
                gzip.compress(payload)
            ).decode("ascii")
        doc["sidecar_sec"] = round(time.time() - t0, 3)
        os.makedirs(DEBUG_DIR, exist_ok=True)
        # ADVICE r13: ms precision + per-process seq — two sub-second
        # builds in one process must not overwrite each other's record
        path = os.path.join(
            DEBUG_DIR,
            f"q41-{t0:.3f}-{os.getpid()}-{next(_SIDECAR_SEQ)}.json",
        )
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1, default=str)
        # keep the newest 20 sidecars; this directory must not grow
        # unboundedly under bench loops
        snaps = sorted(
            f for f in os.listdir(DEBUG_DIR)
            if f.startswith("q41-") and f.endswith(".json")
        )
        for old in snaps[:-20]:
            try:
                os.remove(os.path.join(DEBUG_DIR, old))
            except OSError:
                pass
        return path
    except Exception as exc:  # noqa: BLE001
        print(f"q41 sidecar write failed: {exc!r}", file=sys.stderr)
        return None
