"""Cross-document repeated-substring (passage) detection.

The dedup suite's other modalities (``operators/dedup.py``) compare
WHOLE documents (set Jaccard / SimHash); this operator finds verbatim
PASSAGES shared across documents — boilerplate headers, license
blocks, templated spam — the substring-level duplication described in
the published "deduplicating training data" line of work, which
whole-doc similarity misses when the surrounding text differs.

Spark-first design (no suffix arrays, which need global order):

- **Content-defined anchors.** A window of ``window`` tokens is
  fingerprinted only where it starts at an *anchor* token
  (``token_hash(tok) % stride == 0``). Anchors depend on content
  alone, so the same passage anchors at the same interior tokens in
  EVERY document regardless of its offset — the winnowing/CDC trick
  that makes a strided scheme alignment-free. A shared run of length
  L >= window contains an anchor-started full window unless all
  ``L - window + 1`` of its start tokens miss the 1/stride anchor
  condition (deterministic per content; vanishing for L >> window).
- **Map-only probe.** Per doc: bound token array -> anchor positions
  -> md5 fingerprint per anchored window (distinct-ed within doc).
  Explode yields ~n/stride rows per doc; the ONE shuffle is the
  groupBy on the 16-byte fingerprint. At 100 TB this is the same
  shape as exact dedup — no pairwise work anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lakeflush_spark.functions.text import TOKEN_SEP, bind, token_hash, tokens


def _anchor_starts(tk: Column, window: int, stride: int) -> Column:
    """1-based start positions of content-anchored windows — THE anchor
    rule, shared by the probe (:func:`anchored_span_fps`), the report
    (:func:`repeated_span_texts`), and the rewrite
    (:func:`strip_repeated_spans`): a single definition, because the
    strip operator's covered-starts MUST agree with the probe's hot
    fingerprints position-for-position."""
    n = F.size(tk)
    starts = F.when(
        n >= window, F.sequence(F.lit(1), n - (window - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.filter(
        starts, lambda i: token_hash(F.element_at(tk, i)) % stride == 0
    )


def anchored_span_fps(
    text: Column | str, window: int = 50, stride: int = 8
) -> Column:
    """Distinct md5 fingerprints of content-anchored token windows."""

    def build(tk: Column) -> Column:
        return F.array_distinct(
            F.transform(
                _anchor_starts(tk, window, stride),
                lambda i: F.md5(F.concat_ws(TOKEN_SEP, F.slice(tk, i, window))),
            )
        )

    return bind(tokens(text), build)


def repeated_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """(fp, n_docs, min_doc, max_doc) per passage shared by >= min_docs docs.

    ``n_docs`` counts distinct documents containing the anchored
    window (within-doc repeats were distinct-ed away map-side).
    """
    spans = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(anchored_span_fps(text_col, window, stride)).alias("fp"),
    )
    return (
        spans.groupBy("fp")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.min("_id").alias("min_doc"),
            F.max("_id").alias("max_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def repeated_span_texts(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """(fp, n_docs, span_text) — repeated passages WITH their text.

    Same one-shuffle shape as :func:`repeated_spans`, but the exploded
    rows carry the anchored window's text alongside its fingerprint so
    the report is human-readable (which license block? which footer?).
    ``min`` over the carried text is deterministic and — since every
    row of a fingerprint group holds the identical window — exact.
    The shuffle carries one ~window-token string per anchor instead of
    a 16-byte fp; use :func:`repeated_spans` when only ids/counts are
    needed at full scale and this only on the (already rare) flagged
    fingerprints or for debugging samples.
    """

    def build(tk: Column) -> Column:
        spans_txt = F.transform(
            _anchor_starts(tk, window, stride),
            lambda i: F.concat_ws(TOKEN_SEP, F.slice(tk, i, window)),
        )
        return F.array_distinct(spans_txt)

    spans = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(bind(tokens(text_col), build)).alias("span_text"),
    ).withColumn("fp", F.md5("span_text"))
    return (
        spans.groupBy("fp")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.min("span_text").alias("span_text"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def strip_repeated_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """REWRITE documents with their cross-doc repeated passages removed
    (``docs_with_repeated_spans`` drops whole documents; this keeps the
    document and strips the boilerplate — the right call when the
    shared block is a header/footer/license wrapped around unique
    content).

    A token is removed iff some anchored window covering it has a
    fingerprint repeated in >= ``min_docs`` documents. Coverage is the
    union of FULLY-shared windows, so up to ~``stride`` leading and
    trailing tokens of a shared passage can survive (windows must
    start at a content anchor and lie wholly inside the shared run) —
    the standard winnowing edge-effect trade. Output text is rebuilt
    by joining kept tokens with single spaces (whitespace normalizes);
    an ``n_stripped`` column counts removed tokens.

    Scale: the probe is :func:`repeated_spans` (one fp shuffle); the
    covered-anchor pass groups (doc, start) pairs by doc (ids only);
    the rewrite joins that tiny starts frame back to the corpus on id
    — bodies move through exactly one join, and the per-token coverage
    test is a JVM ``exists`` over the doc's (few) covered starts.
    """
    hot = repeated_spans(
        docs,
        id_col=id_col,
        text_col=text_col,
        window=window,
        stride=stride,
        min_docs=min_docs,
    ).select("fp")
    return strip_spans_against(
        docs, hot, id_col=id_col, text_col=text_col, window=window, stride=stride
    )


def strip_spans_against(
    docs: DataFrame,
    hot: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 8,
) -> DataFrame:
    """The rewrite half of :func:`strip_repeated_spans` against a
    CALLER-SUPPLIED hot-fingerprint frame (one ``fp`` column) — the
    extension point the streaming boilerplate path needs (its hot set
    combines batch counts with a persisted occurrence store, r7).
    Same coverage rule, same single body-moving join."""
    hot = hot.select("fp")

    def anchored_fp_structs(tk: Column) -> Column:
        return F.transform(
            _anchor_starts(tk, window, stride),
            lambda i: F.struct(
                i.alias("s"),
                F.md5(F.concat_ws(TOKEN_SEP, F.slice(tk, i, window))).alias("fp"),
            ),
        )

    covered_starts = (
        docs.select(
            F.col(id_col).alias("_sid"),
            F.explode(bind(tokens(text_col), anchored_fp_structs)).alias("_a"),
        )
        .select("_sid", F.col("_a.s").alias("_s"), F.col("_a.fp").alias("fp"))
        .join(hot, "fp", "left_semi")
        .groupBy("_sid")
        .agg(F.collect_set("_s").alias("_starts"))
    )
    joined = docs.join(
        covered_starts, docs[id_col] == covered_starts["_sid"], "left"
    ).drop("_sid")
    starts = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))

    def rebuild(tk: Column) -> Column:
        kept = F.filter(
            F.transform(
                tk,
                lambda t, idx: F.when(
                    ~F.exists(
                        starts, lambda s: (s <= idx + 1) & (idx + 1 < s + window)
                    ),
                    t,
                ),
            ),
            lambda x: x.isNotNull(),
        )
        return F.struct(
            F.concat_ws(" ", kept).alias("txt"),
            (F.size(tk) - F.size(kept)).cast("bigint").alias("n_stripped"),
        )

    out_cols = [c for c in docs.columns if c != text_col]
    return joined.withColumn("_rb", bind(tokens(text_col), rebuild)).select(
        *out_cols,
        F.col("_rb.txt").alias(text_col),
        F.col("_rb.n_stripped").alias("n_stripped"),
    )


def docs_with_repeated_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Distinct ids of documents containing a cross-doc repeated passage.

    Two passes over the corpus (probe + membership), both map-only;
    the join keys are fingerprints, never text.
    """
    hot = repeated_spans(
        docs,
        id_col=id_col,
        text_col=text_col,
        window=window,
        stride=stride,
        min_docs=min_docs,
    ).select("fp")
    spans = docs.select(
        F.col(id_col).alias(id_col),
        F.explode(anchored_span_fps(text_col, window, stride)).alias("fp"),
    )
    return spans.join(hot, "fp", "left_semi").select(id_col).distinct()
