"""Gopher-rule document filter (Rae et al. 2021, appendix A1.1).

The reference has no text-quality operators (its records are opaque
strings — `lakeflush/core/collector.py:97-103`); this is the published
heuristic-filter stage every large text-curation pipeline ships a
variant of (Gopher, MassiveText, RefinedWeb, Dolma). Seven rules:

  bit 0  word count outside [50, 100_000]
  bit 1  mean word length outside [3, 10]
  bit 2  symbol-to-word ratio ('#' + '...') > 0.1
  bit 3  > 90% of lines start with a bullet (-, *, •)
  bit 4  > 30% of lines end with an ellipsis ('...', …)
  bit 5  < 80% of words contain an ASCII letter
  bit 6  fewer than 2 distinct Gopher stop words present

"Words" are whitespace-run splits (functions/text.words) — the
paper's word notion — NOT the corpus single-space ``tokens``: words
adjacent across a newline separate, and a stop word at end-of-line
still counts. ``gopher_flags`` returns the failed-rule bitmask (0 ==
document passes); ``gopher_filter`` keeps passing documents. Every
threshold is an integer comparison on exact BIGINT counters
(10*sym > n, not sym/n > 0.1) so the DuckDB oracle twin in
plans/text_queries.py agrees bit-for-bit.

Scale stance: map-only JVM Column expressions — no shuffle, no
Python, no UDF. At 100 TB the filter runs at scan speed and composes
with predicate pushdown (the flags projection prunes to the text
column only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lakeflush_spark.functions.text import (
    _total_word_len,
    alpha_word_hits,
    bullet_line_hits,
    doc_lines,
    ellipsis_line_hits,
    gopher_stopword_hits,
    symbol_hits,
    word_count,
)

MIN_WORDS = 50
MAX_WORDS = 100_000


def gopher_flags(text: Column | str = "text") -> Column:
    """BIGINT bitmask of failed Gopher rules (0 == document passes)."""
    n = word_count(text)
    total_len = _total_word_len(text)
    sym = symbol_hits(text)
    nlines = F.size(doc_lines(text)).cast("bigint")
    bullets = bullet_line_hits(text)
    ell = ellipsis_line_hits(text)
    alpha = alpha_word_hits(text)
    stops = gopher_stopword_hits(text)

    def bit(i: int, failed: Column) -> Column:
        return F.when(failed, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint")

    return (
        bit(0, (n < MIN_WORDS) | (n > MAX_WORDS))
        # mean word length in [3, 10]  <=>  3n <= L <= 10n
        + bit(1, (total_len < 3 * n) | (total_len > 10 * n))
        # sym/n > 0.1  <=>  10*sym > n (strict, per Rae et al. A1.1)
        + bit(2, 10 * sym > n)
        # bullets/nlines > 0.9  <=>  10*bullets > 9*nlines
        + bit(3, 10 * bullets > 9 * nlines)
        # ell/nlines > 0.3  <=>  10*ell > 3*nlines
        + bit(4, 10 * ell > 3 * nlines)
        # alpha/n < 0.8  <=>  5*alpha < 4*n
        + bit(5, 5 * alpha < 4 * n)
        + bit(6, stops < 2)
    )


def _c4_flags_from(clean: Column, raw: Column) -> Column:
    """c4_flags given a cleaned-text Column — the gate+rewrite paths
    define the C4 line filter ONCE (single source of the expression).
    Note Catalyst still inlines the shared alias through filter
    pushdown, so the physical plan evaluates the line filter twice for
    surviving docs (once in the gate's Filter, once in the rewrite
    Project) — that is the floor without a materialization barrier,
    and identical to the pre-refactor cost; what this buys is that the
    predicate cannot drift between the flag bit and the rewrite."""
    from lakeflush_spark.functions.text import sentence_terminator_count

    def bit(i: int, failed: Column) -> Column:
        return F.when(failed, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint")

    return (
        bit(0, sentence_terminator_count(clean) < 3)
        + bit(1, F.lower(raw).contains("lorem ipsum"))
        + bit(2, raw.contains("{"))
    )


def c4_flags(text: Column | str = "text") -> Column:
    """BIGINT bitmask of failed C4 page rules (Raffel et al. 2020,
    §2.2), applied AFTER the line filter where the paper does:

      bit 0  cleaned text has fewer than 3 sentence terminators
             (the >= 3-sentences page rule, on C4-retained lines)
      bit 1  raw text contains 'lorem ipsum' (case-insensitive)
      bit 2  raw text contains '{' (code page)

    The paper's bad-words-list rule is deliberately out of scope —
    the list is a deployment policy choice; plug it in as an extra
    predicate on the same cleaned column. 0 == page passes. Exact
    integer/substring tests only, so the DuckDB twin in
    plans/text_queries.py agrees bit-for-bit. Map-only, no Python.
    When the caller also needs the cleaned text (gate + rewrite),
    precompute it as a column and use ``_c4_flags_from`` to avoid a
    second line-filter pass.
    """
    from lakeflush_spark.functions.text import c4_clean

    raw = F.col(text) if isinstance(text, str) else text
    return _c4_flags_from(c4_clean(text), raw)


#: dup-k-gram char-fraction thresholds x100 (Rae et al. 2021 A1.1):
#: 5-gram 0.15 ... 10-gram 0.10
MT_DUP_KGRAM_PCT = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def massivetext_repetition_flags(
    text: Column | str = "text",
    structured: Column | str | None = None,
    full_table: bool = False,
) -> Column:
    """BIGINT bitmask of failed MassiveText repetition rules (Rae et
    al. 2021, A1.1 repetition table), 0 == document passes:

      bit 0  duplicate line fraction        > 0.30
      bit 1  duplicate paragraph fraction   > 0.30
      bit 2  duplicate line char fraction   > 0.20
      bit 3  duplicate paragraph char frac  > 0.20
      bit 4  top 2-gram char fraction       > 0.20
      bit 5  top 3-gram char fraction       > 0.18
      bit 6  top 4-gram char fraction       > 0.16

    With ``full_table=True`` the remaining six published rules join —
    the positional-UNION duplicate-n-gram char fractions
    (functions/text.dup_kgram_char_coverage; overlapping duplicate
    occurrences count each character once):

      bit 7..12  dup {5..10}-gram char fraction > {0.15..0.10}

    Off by default because each k adds a per-doc gram pass (~6x the
    bitmask's cost) — the 7-rule mask is the cheap gate; run the full
    table for data-card audits. Every threshold is an integer
    comparison on exact BIGINT counters (10*dup > 3*n, not dup/n >
    0.3), so the DuckDB twin agrees bit-for-bit. ``structured``
    optionally supplies a different column for the line/paragraph bits
    (a derived line-structured view when the corpus is single-line, as
    q18 does); the gram bits always read ``text``. Map-only JVM HOFs —
    scan speed at any scale.
    """
    from lakeflush_spark.functions.text import (
        bind,
        doc_lines,
        doc_paragraphs,
        dup_kgram_char_coverage,
        dup_unit_char_count,
        dup_unit_count,
        top_kgram_coverage,
        unit_char_total,
    )

    struct_src = text if structured is None else structured
    raw = F.col(text) if isinstance(text, str) else text
    nch = F.length(raw).cast("bigint")
    cov2 = top_kgram_coverage(text, 2)
    cov3 = top_kgram_coverage(text, 3)
    cov4 = top_kgram_coverage(text, 4)

    def bit(i: int, failed: Column) -> Column:
        return F.when(failed, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint")

    def unit_bits(units: Column, frac_bit: int, char_bit: int) -> Column:
        def build(us: Column) -> Column:
            n = F.size(us).cast("bigint")
            dup = dup_unit_count(us)
            tot = unit_char_total(us)
            dupch = dup_unit_char_count(us)
            # dup/n > 0.3 <=> 10*dup > 3*n ; dupch/tot > 0.2 <=> 5*dupch > tot
            return bit(frac_bit, 10 * dup > 3 * n) + bit(
                char_bit, 5 * dupch > tot
            )

        return bind(units, build)

    flags = (
        unit_bits(doc_lines(struct_src), 0, 2)
        + unit_bits(doc_paragraphs(struct_src), 1, 3)
        # cov2/nch > 0.20 <=> 5*cov2 > nch
        + bit(4, 5 * cov2 > nch)
        # cov3/nch > 0.18 <=> 50*cov3 > 9*nch
        + bit(5, 50 * cov3 > 9 * nch)
        # cov4/nch > 0.16 <=> 25*cov4 > 4*nch
        + bit(6, 25 * cov4 > 4 * nch)
    )
    if full_table:
        for i, (k, pct) in enumerate(sorted(MT_DUP_KGRAM_PCT.items())):
            # dupcov/nch > pct/100 <=> 100*dupcov > pct*nch
            flags = flags + bit(
                7 + i, 100 * dup_kgram_char_coverage(text, k) > pct * nch
            )
    return flags


def repetition_filter(
    docs: DataFrame,
    text_col: str = "text",
    keep_flags: bool = False,
    full_table: bool = False,
) -> DataFrame:
    """Drop documents failing any MassiveText repetition rule (the
    7-rule mask by default; ``full_table=True`` applies all 13)."""
    flagged = docs.withColumn(
        "mt_rep_flags",
        massivetext_repetition_flags(text_col, full_table=full_table),
    )
    kept = flagged.where(F.col("mt_rep_flags") == 0)
    return kept if keep_flags else kept.drop("mt_rep_flags")


def c4_filter(
    docs: DataFrame, text_col: str = "text", keep_flags: bool = False
) -> DataFrame:
    """C4 cleanup: rewrite each doc to its line-filtered form, then
    drop pages failing any C4 page rule. The surviving ``text_col``
    holds the CLEANED text (what C4 publishes); flags of dropped docs
    are what an audit wants — project ``c4_flags`` before filtering
    for that.
    """
    from lakeflush_spark.functions.text import c4_clean

    flagged = docs.withColumn("_c4_clean", c4_clean(text_col)).withColumn(
        "c4_flags", _c4_flags_from(F.col("_c4_clean"), F.col(text_col))
    )
    kept = (
        flagged.where(F.col("c4_flags") == 0)
        .withColumn(text_col, F.col("_c4_clean"))
        .drop("_c4_clean")
    )
    return kept if keep_flags else kept.drop("c4_flags")


def gopher_filter(
    docs: DataFrame, text_col: str = "text", keep_flags: bool = False
) -> DataFrame:
    """Drop documents failing any Gopher rule.

    With ``keep_flags`` the surviving rows carry their (all-zero)
    ``gopher_flags`` column — useful when a downstream audit wants the
    column present; the flags of DROPPED docs are what a quality
    report wants, so audits should project ``gopher_flags`` before
    filtering instead.
    """
    flagged = docs.withColumn("gopher_flags", gopher_flags(text_col))
    kept = flagged.where(F.col("gopher_flags") == 0)
    return kept if keep_flags else kept.drop("gopher_flags")


def _bit(i: int, failed: Column) -> Column:
    return F.when(failed, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint")


def _gopher_flags_from(raw: Column, ws: Column, ls: Column) -> Column:
    """``gopher_flags`` over BOUND word/line arrays (fused-panel core;
    same counters and integer thresholds)."""
    from lakeflush_spark.functions.text import (
        BULLET_RE,
        ELLIPSIS_RE,
        GOPHER_STOPWORDS,
        arr_len_sum,
        symbol_hits,
    )

    n = F.size(ws).cast("bigint")
    total_len = arr_len_sum(ws)
    sym = symbol_hits(raw)
    nlines = F.size(ls).cast("bigint")
    bullets = F.size(F.filter(ls, lambda l: F.ltrim(l).rlike(BULLET_RE))).cast(
        "bigint"
    )
    ell = F.size(F.filter(ls, lambda l: F.rtrim(l).rlike(ELLIPSIS_RE))).cast(
        "bigint"
    )
    alpha = F.size(F.filter(ws, lambda t: t.rlike("[A-Za-z]"))).cast("bigint")
    stops = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(ws, w),
        )
    ).cast("bigint")
    return (
        _bit(0, (n < MIN_WORDS) | (n > MAX_WORDS))
        + _bit(1, (total_len < 3 * n) | (total_len > 10 * n))
        + _bit(2, 10 * sym > n)
        + _bit(3, 10 * bullets > 9 * nlines)
        + _bit(4, 10 * ell > 3 * nlines)
        + _bit(5, 5 * alpha < 4 * n)
        + _bit(6, stops < 2)
    )


def _c4_flags_from_lines(ls: Column, raw: Column) -> Column:
    """``c4_flags`` over a BOUND line array (fused-panel core)."""
    from lakeflush_spark.functions.text import c4_keep_line

    clean = F.concat_ws("\n", F.filter(ls, c4_keep_line))
    return _c4_flags_from(clean, raw)


def _mt_unit_bits_from(ls: Column, ps: Column) -> Column:
    """The CHEAP half of ``massivetext_repetition_flags`` — bits 0-3
    (duplicate line/paragraph fractions and char fractions) over bound
    line/paragraph arrays. No gram arrays, no coverage folds: one
    dup-count + char-sum fold per unit array. Combined with
    :func:`_mt_cov_bits_from` the sum is exactly ``_mt_flags_from``;
    splitting lets the staged curation gate test these bits BEFORE
    paying the coverage folds (pipelines.quality_gate_stages)."""
    from lakeflush_spark.functions.text import (
        dup_unit_char_count,
        dup_unit_count,
        unit_char_total,
    )

    def unit_bits(us: Column, frac_bit: int, char_bit: int) -> Column:
        n = F.size(us).cast("bigint")
        return _bit(frac_bit, 10 * dup_unit_count(us) > 3 * n) + _bit(
            char_bit, 5 * dup_unit_char_count(us) > unit_char_total(us)
        )

    return unit_bits(ls, 0, 2) + unit_bits(ps, 1, 3)


def _mt_cov_bits_from(
    raw: Column,
    tk: Column,
    cov2: Column,
    cov3: Column,
    cov4: Column,
    full_table: bool = False,
) -> Column:
    """The EXPENSIVE half of ``massivetext_repetition_flags`` — bits
    4-6 (top 2/3/4-gram char fractions, from PRE-BUILT coverages) and,
    with ``full_table``, bits 7-12 (dup 5..10-gram positional-union
    char fractions — a per-doc gram pass each). The staged gate
    evaluates this only on documents that survived every cheap rule."""
    from lakeflush_spark.functions.text import bind, dup_kgram_cov_from, grams_from

    nch = F.length(raw).cast("bigint")
    flags = (
        _bit(4, 5 * cov2 > nch)
        + _bit(5, 50 * cov3 > 9 * nch)
        + _bit(6, 25 * cov4 > 4 * nch)
    )
    if full_table:
        # factory, NOT a `k=k` default on the lambda: pyspark derives
        # the HOF lambda's ARITY from the Python signature, and a
        # 2-param lambda gets the (element, index) variant — the index
        # (0) would silently shadow k
        def cov_for(k: int) -> Column:
            return bind(
                grams_from(tk, k), lambda g: dup_kgram_cov_from(tk, g, k)
            )

        for i, (k, pct) in enumerate(sorted(MT_DUP_KGRAM_PCT.items())):
            flags = flags + _bit(7 + i, 100 * cov_for(k) > pct * nch)
    return flags


def _mt_flags_from(
    raw: Column,
    tk: Column,
    ls: Column,
    ps: Column,
    cov2: Column,
    cov3: Column,
    cov4: Column,
    full_table: bool = False,
) -> Column:
    """``massivetext_repetition_flags`` over BOUND arrays and PRE-BUILT
    top-k-gram coverages (fused-panel core — the covs are shared with
    the top2/3/4_char_ratio columns instead of recomputed). Sum of the
    cheap unit bits and the coverage bits — the staged gate tests the
    two halves separately (same bitmask by construction)."""
    return _mt_unit_bits_from(ls, ps) + _mt_cov_bits_from(
        raw, tk, cov2, cov3, cov4, full_table=full_table
    )


def quality_views_inline(build, text_col: str = "text", covs: bool = True):
    """array<struct> for ``F.inline()``: binds the shared text views
    ONCE per row — raw text, tokens, Gopher words, lines, paragraphs,
    and (with ``covs``) the 2/3/4-gram arrays plus their top-k-gram
    union coverages — then calls ``build(v)`` with the bound values to
    produce the output struct. ``v`` maps: raw, tk, ws, ls, ps (+
    g2/g3/g4, c2/c3/c4 when ``covs``).

    The fusion primitive behind corpus_report's annotation scan and
    q60's flag scan: Spark's interpreted HOF path has no cross-column
    CSE, so any multi-column projection over these views pays each
    split/fold once per COLUMN unless routed through one generator.
    """
    from lakeflush_spark.functions.text import (
        bind,
        doc_lines,
        doc_paragraphs,
        grams_from,
        tokens,
        top_kgram_cov_from,
        words,
    )

    tc = text_col
    src = F.struct(
        (F.col(tc) if isinstance(tc, str) else tc).alias("raw"),
        tokens(tc).alias("tk"),
        words(tc).alias("ws"),
        doc_lines(tc).alias("ls"),
        doc_paragraphs(tc).alias("ps"),
    )

    def panel(s: Column) -> Column:
        v = {k: s[k] for k in ("raw", "tk", "ws", "ls", "ps")}
        if not covs:
            return build(v)
        gsrc = F.struct(
            grams_from(v["tk"], 2).alias("g2"),
            grams_from(v["tk"], 3).alias("g3"),
            grams_from(v["tk"], 4).alias("g4"),
        )

        def with_g(g: Column) -> Column:
            csrc = F.struct(
                top_kgram_cov_from(v["tk"], g["g2"], 2).alias("c2"),
                top_kgram_cov_from(v["tk"], g["g3"], 3).alias("c3"),
                top_kgram_cov_from(v["tk"], g["g4"], 4).alias("c4"),
            )

            def with_c(c: Column) -> Column:
                return build(
                    {
                        **v,
                        "g2": g["g2"],
                        "g3": g["g3"],
                        "g4": g["g4"],
                        "c2": c["c2"],
                        "c3": c["c3"],
                        "c4": c["c4"],
                    }
                )

            return bind(csrc, with_c)

        return bind(gsrc, with_g)

    return F.transform(F.array(src), panel)


def _mt_flags_from_views(v: dict, full_table: bool = False) -> Column:
    """``massivetext_repetition_flags`` (default structured view) from
    a ``quality_views_inline`` dict — covs shared, nothing re-split."""
    return _mt_flags_from(
        v["raw"], v["tk"], v["ls"], v["ps"], v["c2"], v["c3"], v["c4"],
        full_table=full_table,
    )


#: memoized text_quality_profile generator Columns, keyed by
#: (text_col, full_table) for string column names (r11, VERDICT r10
#: #5): the generator is a large pure expression tree — py4j assembly
#: measured ~2 s per build — and an unresolved Column is valid for any
#: frame in the same JVM, so repeat builds (bench warmup/timed/label
#: passes, interactive reuse) reuse the first tree
_PROFILE_GEN_MEMO: dict = {}

#: the columns text_quality_profile appends
PROFILE_COLUMNS: tuple[str, ...] = (
    "n_tokens", "n_bpe_tokens", "n_chars", "avg_tok_len",
    "stop_ratio", "distinct_ratio", "dup3_ratio", "dup_line_ratio",
    "dup_line_char_ratio", "dup_para_ratio", "dup_para_char_ratio",
    "top2_char_ratio", "top3_char_ratio", "top4_char_ratio",
    "lang_pred", "gopher_flags", "c4_flags", "mt_rep_flags",
)


def text_quality_profile(
    docs: DataFrame,
    text_col: str = "text",
    full_table: bool = False,
) -> DataFrame:
    """Annotate each document with the engine's full per-doc quality
    panel — the product-facing face of the q18 metric family, on the
    REAL text (no oracle structured views):

    counts (n_tokens, n_bpe_tokens, n_chars), ratios (avg_tok_len,
    stop_ratio, distinct_ratio, dup3_ratio, dup_line_ratio,
    dup_line_char_ratio, dup_para_ratio, dup_para_char_ratio,
    top2/3/4_char_ratio), lang_pred, and the three published-filter
    bitmasks (gopher_flags, c4_flags, mt_rep_flags — the latter the
    full 13-rule table with ``full_table=True``).

    FUSED evaluation (r10): the whole panel is ONE ``inline()``
    generator whose child materializes the shared token/word/line/
    paragraph arrays, the 2/3/4-gram arrays, and the three top-k-gram
    coverages exactly once per row and feeds every column from the
    bound values — Spark's interpreted HOF path has no common-
    subexpression elimination across output columns, so the naive
    18-column projection re-split the text ~20× and ran the expensive
    coverage folds twice (once for the ratio columns, once inside the
    mt bitmask). Same arithmetic, bit-identical values (the generator
    evaluates its child once per row). Measured ≥1.5× at sf0.1.

    Still map-only JVM (no Python, no shuffle) — scan speed at any
    scale. Feed it to a quality-classifier trainer, a data-card audit,
    or threshold it directly (the curation gates apply the same
    bitmasks).
    """
    from lakeflush_spark.functions.text import (
        avg_token_len_4dp_from,
        bind,
        bpe_token_count,
        distinct_token_ratio_4dp_from,
        doc_lines,
        doc_paragraphs,
        dup_gram_ratio_4dp_from,
        dup_unit_char_ratio_4dp_from,
        dup_unit_ratio_4dp_from,
        grams_from,
        lang_id_from,
        stopword_ratio_4dp_from,
        tokens,
        top_kgram_char_ratio_4dp_from,
        top_kgram_cov_from,
        words,
    )

    tc = text_col
    clash = set(PROFILE_COLUMNS) & set(docs.columns)
    if clash:
        # select("*", inline) would create duplicate names that later
        # F.col() references cannot resolve — fail with guidance
        # instead of a downstream AMBIGUOUS_REFERENCE
        raise ValueError(
            "text_quality_profile: input already has profile column(s) "
            f"{sorted(clash)} — drop or rename them first"
        )
    memo_key = (tc, full_table) if isinstance(tc, str) else None
    if memo_key is not None and memo_key in _PROFILE_GEN_MEMO:
        return docs.select("*", F.inline(_PROFILE_GEN_MEMO[memo_key]))
    src = F.struct(
        (F.col(tc) if isinstance(tc, str) else tc).alias("raw"),
        tokens(tc).alias("tk"),
        words(tc).alias("ws"),
        doc_lines(tc).alias("ls"),
        doc_paragraphs(tc).alias("ps"),
    )

    def panel(s: Column) -> Column:
        raw, tk, ws, ls, ps = s["raw"], s["tk"], s["ws"], s["ls"], s["ps"]
        gsrc = F.struct(
            grams_from(tk, 2).alias("g2"),
            grams_from(tk, 3).alias("g3"),
            grams_from(tk, 4).alias("g4"),
        )

        def with_grams(g: Column) -> Column:
            csrc = F.struct(
                top_kgram_cov_from(tk, g["g2"], 2).alias("c2"),
                top_kgram_cov_from(tk, g["g3"], 3).alias("c3"),
                top_kgram_cov_from(tk, g["g4"], 4).alias("c4"),
                dup_gram_ratio_4dp_from(g["g3"]).alias("d3"),
            )

            def with_covs(c: Column) -> Column:
                nch = F.length(raw).cast("bigint")
                return F.struct(
                    F.size(tk).cast("bigint").alias("n_tokens"),
                    bpe_token_count(raw).alias("n_bpe_tokens"),
                    nch.alias("n_chars"),
                    avg_token_len_4dp_from(tk).alias("avg_tok_len"),
                    stopword_ratio_4dp_from(tk).alias("stop_ratio"),
                    distinct_token_ratio_4dp_from(tk).alias("distinct_ratio"),
                    c["d3"].alias("dup3_ratio"),
                    dup_unit_ratio_4dp_from(ls).alias("dup_line_ratio"),
                    dup_unit_char_ratio_4dp_from(ls).alias(
                        "dup_line_char_ratio"
                    ),
                    dup_unit_ratio_4dp_from(ps).alias("dup_para_ratio"),
                    dup_unit_char_ratio_4dp_from(ps).alias(
                        "dup_para_char_ratio"
                    ),
                    top_kgram_char_ratio_4dp_from(c["c2"], nch).alias(
                        "top2_char_ratio"
                    ),
                    top_kgram_char_ratio_4dp_from(c["c3"], nch).alias(
                        "top3_char_ratio"
                    ),
                    top_kgram_char_ratio_4dp_from(c["c4"], nch).alias(
                        "top4_char_ratio"
                    ),
                    lang_id_from(tk).alias("lang_pred"),
                    _gopher_flags_from(raw, ws, ls).alias("gopher_flags"),
                    _c4_flags_from_lines(ls, raw).alias("c4_flags"),
                    _mt_flags_from(
                        raw, tk, ls, ps, c["c2"], c["c3"], c["c4"],
                        full_table=full_table,
                    ).alias("mt_rep_flags"),
                )

            return bind(csrc, with_covs)

        return bind(gsrc, with_grams)

    gen = F.transform(F.array(src), panel)
    if memo_key is not None:
        _PROFILE_GEN_MEMO[memo_key] = gen
    return docs.select("*", F.inline(gen))


def compression_ratio(text_col: "Column | str" = "text") -> "Column":
    """zlib-compressed-size / raw-byte-size per document — the
    compressibility quality signal (RedPajama-v2/Dolma-style):
    degenerate or highly repetitive text compresses far below prose
    (ratio << typical ~0.4-0.7), while random noise barely compresses
    (ratio near or above 1 including the zlib header).

    DELIBERATELY a Python surface: zlib has no JVM expression analog,
    so this is an Arrow-batched pandas UDF — keep it out of hot
    curation gates (which stay 0-PY) and use it for corpus audits or
    as an opt-in extra predicate. Empty documents return NULL (no
    bytes to characterize, and 0-length division is undefined).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ratio_series(s):
        import zlib

        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(one)

    _ratio = pandas_udf(_ratio_series, DoubleType())
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _ratio(c)
