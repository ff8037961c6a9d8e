"""Gopher-rule filter units (operators/quality.py): each of the 7
rules triggered in isolation by a crafted document the synthetic
corpus can't produce (bullet lists, ellipsis lines, symbol soup,
non-alpha tokens), plus a passing document and the filter wrapper."""

import pyspark.sql.functions as F

from lakeflush_spark.operators.quality import gopher_filter, gopher_flags

# a clean passing document: 60 words, mean length ~4.5, two Gopher
# stop words, no symbols/bullets/ellipses, all-alpha
_GOOD = "the quick brown fox jumps over that lazy sleeping dog again " * 6
_GOOD = _GOOD.strip()


def _flags(spark, text: str) -> int:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_flags("text").alias("f")).collect()[0].f


def test_good_doc_passes(spark):
    assert _flags(spark, _GOOD) == 0


def test_word_count_rule(spark):
    assert _flags(spark, "the cat sat with that") & 1  # 5 words < 50


def test_mean_word_length_rule(spark):
    short = " ".join(["a b c d the of with that"] * 10)  # mean < 3
    f = _flags(spark, short)
    assert f & 2
    long_words = " ".join(["extraordinarily incomprehensible"] * 30) + " the with"
    assert _flags(spark, long_words) & 2  # mean > 10


def test_symbol_ratio_rule(spark):
    # 60 words, 8 '#' and 2 '...' => 10 symbols, 10*10 >= 60
    doc = _GOOD + " " + "#word " * 8 + "tail... end..."
    assert _flags(spark, doc) & 4


def test_bullet_line_rule(spark):
    lines = ["- item %d yes" % i for i in range(19)] + ["plain closing line"]
    doc = "\n".join(lines) + "\n" + _GOOD.replace(" ", "\n")[:0]
    # 19/20 bulleted lines > 90%; pad words to clear the count rule
    doc = "\n".join(["- " + _GOOD.split(" ", 1)[1]] * 19 + [_GOOD])
    assert _flags(spark, doc) & 8


def test_ellipsis_line_rule(spark):
    doc = "\n".join([_GOOD + "..."] * 4 + [_GOOD] * 6)  # 40% > 30%
    assert _flags(spark, doc) & 16
    uni = "\n".join([_GOOD + "…"] * 4 + [_GOOD] * 6)
    assert _flags(spark, uni) & 16


def test_alpha_word_rule(spark):
    doc = _GOOD + " " + "123 456 789 000 111 222 333 444 555 666 " * 3
    assert _flags(spark, doc) & 32  # 30/90 non-alpha > 20%


def test_stopword_rule(spark):
    doc = " ".join(["quick brown fox jumps over lazy dog"] * 10)
    assert _flags(spark, doc) & 64  # zero Gopher stop words
    one = doc + " the"
    assert _flags(spark, one) & 64  # one is still < 2


def test_rules_independent(spark):
    # the bullet doc fails ONLY the bullet rule
    doc = "\n".join(["- " + _GOOD.split(" ", 1)[1]] * 19 + [_GOOD])
    assert _flags(spark, doc) == 8


def test_gopher_filter_wrapper(spark):
    df = spark.createDataFrame(
        [(1, _GOOD), (2, "too short doc"), (3, _GOOD + " extra")],
        "doc_id long, text string",
    )
    kept = gopher_filter(df)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    assert "gopher_flags" not in kept.columns
    with_flags = gopher_filter(df, keep_flags=True)
    rows = with_flags.collect()
    assert all(r.gopher_flags == 0 for r in rows)


def test_flags_match_oracle_arithmetic(spark):
    """Cross-check the Spark bitmask against a plain-Python model on a
    batch of adversarial docs (same integer thresholds)."""
    from lakeflush_spark.functions.text import GOPHER_STOPWORDS

    docs = [
        _GOOD,
        "short one",
        "\n".join(["- bullet %d" % i for i in range(10)]),
        _GOOD + " ############",
        "\n".join([_GOOD + "..."] * 9 + [_GOOD]),
        " ".join(["12345"] * 60) + " the with",
    ]

    def model(text: str) -> int:
        import re

        # word-based counters split on WHITESPACE RUNS (the Gopher
        # paper's word notion — functions/text.words), bit 2 is STRICT
        # > 0.1 per Rae et al. A1.1; boundary empties dropped like
        # Python str.split()
        ws = [w for w in re.split(r"[ \t\n\r]+", text) if w]
        n = len(ws)
        total = sum(len(t) for t in ws)
        sym = text.count("#") + _nonoverlap(text, "...")
        lines = text.split("\n")
        nl = len(lines)
        bullets = sum(bool(l.lstrip()[:1] in ("-", "*", "•")) and bool(l.lstrip()) for l in lines)
        ell = sum(l.rstrip().endswith(("...", "…")) for l in lines)
        alpha = sum(any(c.isascii() and c.isalpha() for c in t) for t in ws)
        stops = sum(w in ws for w in GOPHER_STOPWORDS)
        f = 0
        f |= (n < 50 or n > 100_000) and 1
        f |= (total < 3 * n or total > 10 * n) and 2
        f |= (10 * sym > n) and 4
        f |= (10 * bullets > 9 * nl) and 8
        f |= (10 * ell > 3 * nl) and 16
        f |= (5 * alpha < 4 * n) and 32
        f |= (stops < 2) and 64
        return f

    def _nonoverlap(s: str, sub: str) -> int:
        i = c = 0
        while (i := s.find(sub, i)) != -1:
            c += 1
            i += len(sub)
        return c

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "i long, text string")
    got = {r.i: r.f for r in
           df.select("i", gopher_flags("text").alias("f")).collect()}
    for i, d in enumerate(docs):
        assert got[i] == model(d), f"doc {i}: spark={got[i]} model={model(d)}"


def test_dup_line_metrics_and_strip(spark):
    """MassiveText duplicate-line signals: ratio counts repeat lines,
    char ratio counts chars in occurrences after the first; strip
    keeps first occurrences in order."""
    from lakeflush_spark.functions.text import (
        dup_line_char_ratio_4dp,
        dup_line_ratio_4dp,
        strip_duplicate_lines,
    )

    doc = "aaaa\nbb\naaaa\ncc\naaaa"  # 5 lines, 'aaaa' x3
    df = spark.createDataFrame([(doc,), ("no newlines here",), ("",)],
                               "text string")
    rows = df.select(
        "text",
        dup_line_ratio_4dp("text").alias("dlr"),
        dup_line_char_ratio_4dp("text").alias("dlcr"),
        strip_duplicate_lines("text").alias("stripped"),
    ).collect()
    by = {r.text: r for r in rows}
    # 2 repeated occurrences / 5 lines
    assert by[doc].dlr == 0.4
    # chars: total 4+2+4+2+4=16, first-occurrence 4+2+2=8 -> 8/16
    assert by[doc].dlcr == 0.5
    assert by[doc].stripped == "aaaa\nbb\ncc"
    assert by["no newlines here"].dlr == 0.0
    assert by["no newlines here"].dlcr == 0.0
    assert by["no newlines here"].stripped == "no newlines here"
    assert by[""].dlcr == 0.0  # zero-char guard


def test_c4_line_filter_and_flags(spark):
    """C4 §2.2: keep lines with >=5 words ending in terminal punct and
    no 'javascript'; page flags = <3 sentences / lorem ipsum / brace."""
    import pyspark.sql.functions as F

    from lakeflush_spark.functions.text import (
        c4_clean,
        c4_kept_line_ratio_4dp,
    )
    from lakeflush_spark.operators.quality import c4_filter, c4_flags

    good = "one two three four five.\nsix seven eight nine ten!\na b c d e?"
    docs = [
        good,                                   # 3 kept lines, 3 sentences
        "short line.\nthis line has five words.",  # 1 kept -> <3 sentences
        "enable JavaScript to view this page.\n" + good,  # js line dropped
        good + "\nlorem ipsum dolor sit amet.",  # lorem ipsum page flag
        "if (x) { return y; } one two.\n" + good,  # brace page flag
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "i int, text string")
    rows = {r.i: r for r in df.select(
        "i",
        c4_clean("text").alias("clean"),
        c4_kept_line_ratio_4dp("text").alias("ratio"),
        c4_flags("text").alias("flags"),
    ).collect()}
    assert rows[0].clean == good and rows[0].flags == 0
    assert rows[0].ratio == 1.0
    assert rows[1].clean == "this line has five words." and rows[1].flags == 1
    assert rows[2].clean == good and rows[2].flags == 0
    assert rows[2].ratio == 0.75
    assert rows[3].flags == 2  # enough sentences, but lorem ipsum
    assert rows[4].flags == 4  # brace page (the js-free lines still kept)

    kept = c4_filter(df, "text")
    out = {r.i: r.text for r in kept.collect()}
    assert set(out) == {0, 2}           # pages 1,3,4 dropped
    assert out[2] == good               # and text is the CLEANED rewrite
    audit = c4_filter(df, "text", keep_flags=True)
    assert "c4_flags" in audit.columns
    assert {r.c4_flags for r in audit.collect()} == {0}


def test_top_2gram_char_ratio(spark):
    """MassiveText top-n-gram coverage: most frequent 2-gram's chars /
    doc chars, ties broken toward larger coverage."""
    from lakeflush_spark.functions.text import top_2gram_char_ratio_4dp

    # "a b" occurs 2x at positions 1,3 -> union covers tokens 1..4:
    # 4 chars + 3 separators = 7; text len 11 ("a b a b c d")
    doc = "a b a b c d"
    # tie on count=1: grams "xx yy"(5), "yy z"(4) -> max coverage 5, len 7
    tie = "xx yy z"
    df = spark.createDataFrame([(0, doc), (1, tie), (2, "solo"), (3, "")],
                               "i int, text string")
    got = {r.i: r.r for r in df.select(
        "i", top_2gram_char_ratio_4dp("text").alias("r")).collect()}
    # exact half-up checks
    assert got[0] == 0.6364   # 70000/11 = 6363.63 -> 6364
    assert got[1] == 0.7143   # 50000/7 = 7142.85 -> 7143
    assert got[2] == 0.0      # < 2 tokens
    assert got[3] == 0.0      # empty text


def test_massivetext_repetition_flags(spark):
    """Each of the 7 repetition rules fires on a constructed doc and
    stays quiet on a clean one; thresholds are exact integer math."""
    from lakeflush_spark.operators.quality import (
        massivetext_repetition_flags,
        repetition_filter,
    )

    # long enough that the top (count=1) gram's chars stay under every
    # coverage threshold — short docs legitimately fail the top-k rules
    clean = " ".join(f"word{i:03d}" for i in range(40))
    # 2-gram "x y" repeated: 4 occurrences x 3 chars = 12 of 15 chars
    top2 = "x y x y x y x y"
    # lines: a/b/a/a -> dup 2/4 = 0.5 > 0.3 (bit 0); dup chars 2/4 > 0.2
    # (bit 2); paragraphs aa\n\naa -> dup 1/2 (bit 1), chars 2/4 (bit 3)
    lines = "a\nb\na\na"
    paras = "aa\n\naa"
    df = spark.createDataFrame(
        [(0, clean), (1, top2), (2, lines), (3, paras)],
        "i int, text string",
    )
    got = {r.i: r.f for r in df.select(
        "i", massivetext_repetition_flags("text").alias("f")).collect()}
    assert got[0] == 0
    # top2: cov2=12 > 15/5; cov3 ("x y x" 2x5=10) 50*10 > 9*15; cov4
    # ("x y x y" 2x7=14) 25*14 > 4*15 -> bits 4+5+6
    assert got[1] == 16 + 32 + 64
    assert got[2] & 0b101 == 0b101  # bits 0 and 2
    assert got[3] & 0b1010 == 0b1010  # bits 1 and 3

    kept = repetition_filter(df, "text")
    assert {r.i for r in kept.collect()} == {0}


def test_dup_para_and_topk_ratios(spark):
    """Paragraph dup ratios and generalized top-k coverage, hand
    computed."""
    from lakeflush_spark.functions.text import (
        dup_para_char_ratio_4dp,
        dup_para_ratio_4dp,
        top_kgram_char_ratio_4dp,
    )

    doc = "aa bb\n\ncc\n\naa bb"  # 3 paras, 'aa bb' x2
    df = spark.createDataFrame([(doc,)], "text string")
    r = df.select(
        dup_para_ratio_4dp("text").alias("pr"),
        dup_para_char_ratio_4dp("text").alias("pcr"),
        top_kgram_char_ratio_4dp("text", 3).alias("t3"),
    ).first()
    assert r.pr == 0.3333       # 1/3 half-up
    assert r.pcr == round(5 / 12, 4)  # 5 dup chars of 12 (4167)
    # tokens: aa bb\n\ncc cc\n\naa bb -> whitespace split on ' ' gives
    # ["aa","bb\n\ncc\n\naa","bb"]; top 3-gram = whole string len 15 of 15
    assert r.t3 == 1.0


def test_c4_kept_ratio_and_terminal_quote(spark):
    """Closing-quote terminal punctuation retains a line; ratio is
    exact 4dp."""
    from lakeflush_spark.functions.text import c4_kept_line_ratio_4dp

    doc = 'he said "one two three four five."\nshort.\nsix seven eight nine ten."'
    df = spark.createDataFrame([(doc,)], "text string")
    # 3 lines, kept: line 1 (ends '."' -> '"'), line 3 (ends '"');
    # 'short.' has < 5 words
    assert df.select(
        c4_kept_line_ratio_4dp("text").alias("r")).first().r == 0.6667


def test_mt_full_table_dup_kgram_bits(spark):
    """full_table=True adds the dup-5..10-gram positional-union bits
    with the published thresholds; overlapping occurrences count each
    char once."""
    from lakeflush_spark.functions.text import (
        dup_kgram_char_coverage,
        dup_kgram_char_ratio_4dp,
    )
    from lakeflush_spark.operators.quality import (
        massivetext_repetition_flags,
    )

    # "a b c d e X a b c d e": dup 5-gram 'a b c d e' covers tokens
    # 1-5 and 7-11 -> 18 of 21 chars (0.857 > 0.15 -> bit 7); no
    # 6..10-gram repeats
    doc = "a b c d e X a b c d e"
    # long unique doc: no bits at all under the full table
    clean = " ".join(f"w{i:04d}" for i in range(60))
    df = spark.createDataFrame([(0, doc), (1, clean)], "i int, text string")
    got = {r.i: r for r in df.select(
        "i",
        massivetext_repetition_flags("text", full_table=True).alias("f"),
        dup_kgram_char_coverage("text", 5).alias("c5"),
        dup_kgram_char_ratio_4dp("text", 5).alias("r5"),
    ).collect()}
    assert got[0].c5 == 18 and got[0].r5 == 0.8571
    assert got[0].f & (1 << 7)          # dup-5-gram bit
    assert not got[0].f & (0b111110 << 7)  # no 6..10 bits
    assert got[1].f == 0
    # overlap-union: 6 identical tokens, k=5 -> whole text covered once
    tri = spark.createDataFrame([("a a a a a a",)], "text string")
    assert tri.select(
        dup_kgram_char_coverage("text", 5).alias("c")).first().c == 11

    # the operator wrapper honors full_table: a doc failing ONLY a
    # dup-5..10-gram rule passes the 7-rule filter but not the full one
    from lakeflush_spark.operators.quality import repetition_filter

    body = " ".join(f"w{i:03d}" for i in range(20))
    block = " ".join("pqrstuvwxyzabcd")
    only5 = spark.createDataFrame(
        [(0, f"{block} {body} {block} the a")], "i int, text string"
    )
    assert {r.i for r in repetition_filter(only5, "text").collect()} == {0}
    assert {r.i for r in
            repetition_filter(only5, "text", full_table=True).collect()}         == set()


def test_strip_duplicate_paragraphs(spark):
    from lakeflush_spark.functions.text import strip_duplicate_paragraphs

    doc = "aa bb\n\ncc\n\naa bb\n\ndd"
    df = spark.createDataFrame([(doc,)], "text string")
    assert df.select(
        strip_duplicate_paragraphs("text").alias("s")).first().s == \
        "aa bb\n\ncc\n\ndd"


def test_text_quality_profile(spark):
    """The product-facing per-doc panel: one map-only projection with
    all counts/ratios/bitmasks; full_table widens mt_rep_flags."""
    from lakeflush_spark.operators.quality import text_quality_profile

    body = " ".join(f"w{i:03d}" for i in range(20))
    block = " ".join("pqrstuvwxyzabcd")
    df = spark.createDataFrame(
        [(1, f"{block} {body} {block} the a")], "doc_id long, text string"
    )
    r = text_quality_profile(df).collect()[0]
    assert r.n_tokens == 52 and r.n_chars == len(r.text)
    assert 0.0 <= r.top2_char_ratio <= 1.0
    assert r.mt_rep_flags == 0  # 7-rule passes
    rf = text_quality_profile(df, full_table=True).collect()[0]
    assert rf.mt_rep_flags & (1 << 7)  # dup-5 union rule fires
    # all expected columns present
    cols = set(text_quality_profile(df).columns)
    assert {"gopher_flags", "c4_flags", "dup_para_char_ratio",
            "lang_pred", "n_bpe_tokens"} <= cols


def test_text_quality_profile_name_clash_raises(spark):
    """A frame already carrying a profile column name fails fast with
    guidance instead of a downstream ambiguous-reference error."""
    import pytest

    from lakeflush_spark.operators.quality import text_quality_profile

    df = spark.createDataFrame([(1, "a b c", 3)],
                               "doc_id long, text string, n_tokens long")
    with pytest.raises(ValueError, match="n_tokens"):
        text_quality_profile(df)


def test_fused_panel_matches_legacy_columns(spark):
    """The r10 fused inline() panel must stay bit-identical to the
    un-fused per-column functions — on adversarial shapes too (empty
    text, sub-k-token docs, newlines/bullets, repeated blocks)."""
    import pyspark.sql.functions as F

    from lakeflush_spark.functions.text import (
        avg_token_len_4dp,
        bpe_token_count,
        distinct_token_ratio_4dp,
        dup_3gram_ratio_4dp,
        dup_line_char_ratio_4dp,
        dup_line_ratio_4dp,
        dup_para_char_ratio_4dp,
        dup_para_ratio_4dp,
        lang_id,
        stopword_ratio_4dp,
        token_count,
        top_kgram_char_ratio_4dp,
    )
    from lakeflush_spark.operators.quality import (
        c4_flags,
        massivetext_repetition_flags,
        text_quality_profile,
    )

    docs = [
        "",
        "a",
        "a b",
        "the quick brown fox jumps over that lazy dog " * 8,
        "loop loop loop loop loop loop",
        "- bullet one\n- bullet two\nplain...\n\npara\n\npara",
        "x y " * 3 + "x y",
        "the\na of\n\nand",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    tc = "text"
    legacy = df.select(
        "doc_id",
        token_count(tc).alias("n_tokens"),
        bpe_token_count(tc).alias("n_bpe_tokens"),
        F.length(tc).cast("bigint").alias("n_chars"),
        avg_token_len_4dp(tc).alias("avg_tok_len"),
        stopword_ratio_4dp(tc).alias("stop_ratio"),
        distinct_token_ratio_4dp(tc).alias("distinct_ratio"),
        dup_3gram_ratio_4dp(tc).alias("dup3_ratio"),
        dup_line_ratio_4dp(tc).alias("dup_line_ratio"),
        dup_line_char_ratio_4dp(tc).alias("dup_line_char_ratio"),
        dup_para_ratio_4dp(tc).alias("dup_para_ratio"),
        dup_para_char_ratio_4dp(tc).alias("dup_para_char_ratio"),
        top_kgram_char_ratio_4dp(tc, 2).alias("top2_char_ratio"),
        top_kgram_char_ratio_4dp(tc, 3).alias("top3_char_ratio"),
        top_kgram_char_ratio_4dp(tc, 4).alias("top4_char_ratio"),
        lang_id(tc).alias("lang_pred"),
        gopher_flags(tc).alias("gopher_flags"),
        c4_flags(tc).alias("c4_flags"),
        massivetext_repetition_flags(tc, full_table=True).alias("mt_rep_flags"),
    )
    fused = text_quality_profile(df, full_table=True).select(*legacy.columns)
    lrows = {r.doc_id: r.asDict() for r in legacy.collect()}
    frows = {r.doc_id: r.asDict() for r in fused.collect()}
    for i in lrows:
        assert frows[i] == lrows[i], (
            f"doc {i} ({docs[i]!r}): fused {frows[i]} != legacy {lrows[i]}"
        )


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below prose; noise barely
    compresses; empty -> NULL (operators/quality.compression_ratio)."""
    import random
    import string
    import zlib

    from lakeflush_spark.operators.quality import compression_ratio

    rng = random.Random(5)
    noise = "".join(rng.choices(string.ascii_letters + string.digits, k=4000))
    words = ("river town mild quick brown lazy quiet bridge stone "
             "meadow harbor lantern copper signal".split())
    prose = " ".join(
        f"{words[rng.randrange(len(words))]} {words[rng.randrange(len(words))]}"
        f" number {rng.randrange(10_000)}"
        for _ in range(400)
    )
    degenerate = "spam " * 800
    rows = [(0, degenerate), (1, prose), (2, noise), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cr
        for r in df.select(
            "doc_id", compression_ratio("text").alias("cr")
        ).collect()
    }
    # exact agreement with driver-side zlib at the same level
    for i, t in rows[:3]:
        raw = t.encode()
        assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
    assert got[0] < 0.05 < got[1] < got[2]
    assert got[3] is None
