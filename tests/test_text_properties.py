"""Property-based cross-check of the JVM text expressions.

Every Spark-side text function is re-implemented here as a tiny plain-
Python model; hypothesis generates adversarial corpora (empty tokens,
unicode, punctuation-only, stopword-heavy) and the two implementations
must agree exactly on every row. This is the same model-based strategy
the oracle SQL uses, but with a THIRD independent implementation and
generated rather than fixed inputs — knife-edge rounding and empty-
array guards are exactly the bugs this catches.
"""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeflush_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    FP_BASE,
    FP_MOD,
    PUNCT_CLASS,
    STOPWORDS,
    avg_token_len_4dp,
    bpe_token_count,
    distinct_token_ratio_4dp,
    doc_fingerprint,
    dup_3gram_ratio_4dp,
    punct_count,
    quality_score_4dp,
    shingles,
    arr_fingerprint,
    stopword_ratio_4dp,
    token_count,
)
from lakeflush_spark.operators.dedup import SIMHASH_BITS, simhash

# ---- plain-Python models --------------------------------------------------


def _h(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def _fp(arr: list[str]) -> int:
    acc = 0
    for s in arr:
        acc = (acc * FP_BASE + _h(s)) % FP_MOD
    return acc


def _shingles(toks: list[str], k: int = 3) -> list[str]:
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _rhu(num: int, den: int) -> int:
    return (2 * num + den) // (2 * den)


def _simhash(toks: list[str]) -> int:
    hs = [_h(t) for t in toks]
    out = 0
    for b in range(SIMHASH_BITS):
        if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
            out |= 1 << b
    return out


def _model(text: str) -> dict:
    toks = text.split(" ")
    n = len(toks)
    total = sum(len(t) for t in toks)
    s = sum(1 for t in toks if t in STOPWORDS)
    qnum = 40 * min(n, 100) * n + 3000 * (n - s) + 375 * min(8 * n, total)
    return {
        "n_tokens": n,
        "n_bpe": len(re.findall(BPE_TOKEN_PATTERN, text)),
        "punct": len(re.findall(PUNCT_CLASS, text)),
        "doc_fp": _fp(toks),
        "shingle_fp": _fp(_shingles(toks)),
        "avg4": _rhu(10000 * total, n) / 10000.0,
        "stop4": _rhu(10000 * s, n) / 10000.0,
        "quality4": _rhu(qnum, n) / 10000.0,
        "dtr4": _rhu(10000 * len(set(toks)), n) / 10000.0,
        "dup3_4": (
            _rhu(
                10000 * (len(_shingles(toks)) - len(set(_shingles(toks)))),
                len(_shingles(toks)),
            )
            / 10000.0
            if _shingles(toks)
            else 0.0
        ),
        "simhash": _simhash(toks),
    }


# ---- generated corpora ----------------------------------------------------

_token = st.text(
    alphabet=list("abcdef.,;:!?é0 ")[:-1] + ["é"],  # no spaces inside tokens
    min_size=0,
    max_size=8,
).filter(lambda t: " " not in t)
_doc = st.lists(
    st.one_of(_token, st.sampled_from(STOPWORDS)), min_size=1, max_size=25
).map(" ".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=12))
def test_spark_text_functions_match_python_model(spark, docs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i LONG, text STRING")
    rows = df.select(
        "i",
        "text",
        token_count("text").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe"),
        punct_count("text").alias("punct"),
        doc_fingerprint("text").alias("doc_fp"),
        arr_fingerprint(shingles("text", 3)).alias("shingle_fp"),
        avg_token_len_4dp("text").alias("avg4"),
        stopword_ratio_4dp("text").alias("stop4"),
        quality_score_4dp("text").alias("quality4"),
        distinct_token_ratio_4dp("text").alias("dtr4"),
        dup_3gram_ratio_4dp("text").alias("dup3_4"),
        simhash("text").alias("simhash"),
    ).collect()
    assert len(rows) == len(docs)
    for r in rows:
        m = _model(r.text)
        got = {k: r[k] for k in m}
        assert got == m, f"mismatch for text={r.text!r}: {got} != {m}"


def test_document_chunks_match_model(spark):
    from lakeflush_spark.functions.text import document_chunks
    import pyspark.sql.functions as F

    W, S = 10, 7
    docs = [
        "",  # splits to one empty token
        "a",
        " ".join(f"t{i}" for i in range(9)),   # < window
        " ".join(f"t{i}" for i in range(10)),  # == window
        " ".join(f"t{i}" for i in range(11)),  # window + 1
        " ".join(f"t{i}" for i in range(100)),
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", F.explode(document_chunks("text", W, S)).alias("c")
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append((r.c.chunk_idx, r.c.n_toks, r.c.chunk_text))
    for i, d in enumerate(docs):
        toks = d.split(" ")
        n = len(toks)
        exp = []
        for c in range((n - 1) // S + 1):
            piece = toks[c * S : c * S + W]
            exp.append((c, len(piece), " ".join(piece)))
        assert got[i] == exp, f"doc {i}: {got[i]} != {exp}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**31),
    offsets=st.lists(st.integers(0, 40), min_size=2, max_size=4),
    window=st.sampled_from([5, 8]),
)
def test_repeated_spans_alignment_free(spark, seed, offsets, window):
    """The winnowing property: a passage of >= 2*window tokens embedded
    at ARBITRARY offsets in otherwise-random documents is detected —
    anchors depend only on content, so alignment cannot hide it."""
    import random

    from lakeflush_spark.operators.substring_dedup import repeated_spans

    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(500)]
    # 2*window guarantees an anchored full window exists for stride 2
    # with overwhelming probability per content draw; use stride 2 and
    # retry the draw deterministically if the passage itself anchors
    # nowhere (possible but ~2^-window rare)
    passage = [rng.choice(vocab) for _ in range(2 * window)]
    rows = []
    for i, off in enumerate(offsets):
        prefix = [rng.choice(vocab) for _ in range(off)]
        suffix = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        rows.append((i, " ".join(prefix + passage + suffix)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_spans(docs, window=window, stride=2, min_docs=len(rows))
    hits = spans.collect()
    # every document carries the passage, so at least one fingerprint
    # must be shared by ALL docs (unless the passage has no anchor at
    # stride 2 — check that digest-side, not by weakening the assert)
    from lakeflush_spark.functions.text import token_hash
    import pyspark.sql.functions as F

    anchor_exists = (
        spark.createDataFrame([(p,) for p in passage[: window + 1]], "t string")
        .where(token_hash(F.col("t")) % 2 == 0)
        .count()
        > 0
    )
    if anchor_exists:
        assert hits, f"shared passage missed at offsets {offsets}"
        assert all(r.n_docs == len(rows) for r in hits)


# ---- Gopher flags model (operators/quality.py) ----------------------------

_gopher_unit = st.one_of(
    st.sampled_from(
        ["the", "be", "with", "fox", "#", "...", "....", "12345", "-", "…",
         "", "a#b...", "mixed123"]
    ),
    st.sampled_from(["x\n- y", "end...\nnext", "p\n…", "\n", "-lead", "*s"]),
)
_gopher_doc = st.lists(_gopher_unit, min_size=1, max_size=40).map(" ".join)


def _count_nonoverlap(s: str, sub: str) -> int:
    i = c = 0
    while (i := s.find(sub, i)) != -1:
        c += 1
        i += len(sub)
    return c


def _gopher_model(text: str) -> int:
    import re

    from lakeflush_spark.functions.text import GOPHER_STOPWORDS

    # word counters: WHITESPACE-RUN split (functions/text.words — the
    # Gopher paper's word notion); bit 2 strict > per Rae et al. A1.1;
    # boundary empties dropped like Python str.split()
    ws = [w for w in re.split(r"[ \t\n\r]+", text) if w]
    n = len(ws)
    total = sum(len(t) for t in ws)
    sym = text.count("#") + _count_nonoverlap(text, "...")
    lines = text.split("\n")
    nl = len(lines)
    bullets = sum(
        l.lstrip(" ").startswith(("-", "*", "•")) for l in lines
    )
    ell = sum(l.rstrip(" ").endswith(("...", "…")) for l in lines)
    alpha = sum(any(c.isascii() and c.isalpha() for c in t) for t in ws)
    stops = sum(w in ws for w in GOPHER_STOPWORDS)
    f = 0
    f |= 1 if (n < 50 or n > 100_000) else 0
    f |= 2 if (total < 3 * n or total > 10 * n) else 0
    f |= 4 if 10 * sym > n else 0
    f |= 8 if 10 * bullets > 9 * nl else 0
    f |= 16 if 10 * ell > 3 * nl else 0
    f |= 32 if 5 * alpha < 4 * n else 0
    f |= 64 if stops < 2 else 0
    return f


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_gopher_doc, min_size=1, max_size=10))
def test_gopher_flags_match_python_model(spark, docs):
    """The 7-rule bitmask agrees with an independent Python model on
    generated text with embedded newlines, bullets, ellipses (ASCII
    and unicode), symbol runs, and empty tokens."""
    from lakeflush_spark.operators.quality import gopher_flags

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i LONG, text STRING"
    )
    rows = df.select("i", "text", gopher_flags("text").alias("f")).collect()
    for r in rows:
        assert r.f == _gopher_model(r.text), (
            f"mismatch for text={r.text!r}: spark={r.f} "
            f"model={_gopher_model(r.text)}"
        )


# ---- MassiveText repetition bitmask (operators/quality.
# massivetext_repetition_flags) vs an independent Python model -------------

_rep_unit = st.one_of(
    st.sampled_from(["x y", "x y x y", "aa", "bb", "aa\naa", "p\n\np",
                     "a\nb\na", "", "loop loop loop", "word123"]),
    st.text(alphabet=list("ab\n "), min_size=0, max_size=6)
    .filter(lambda t: " " not in t),
)
_rep_doc = st.lists(_rep_unit, min_size=1, max_size=20).map(" ".join)


def _rep_model(text: str) -> int:
    toks = text.split(" ")

    def grams(k: int) -> list[str]:
        if len(toks) < k:
            return []
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    def cov(k: int) -> int:
        # positional-union coverage of the most frequent k-gram
        gs = grams(k)
        if not gs:
            return 0
        counts = {}
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
        maxc = max(counts.values())
        if maxc <= 1:
            return max(len(g) for g in gs)
        best = 0
        for cand, c in counts.items():
            if c != maxc:
                continue
            covered = set()
            for i, g in enumerate(gs):
                if g == cand:
                    covered.update(range(i, i + k))
            chars = sum(len(toks[j]) for j in covered)
            seps = sum(1 for j in covered if j + 1 in covered)
            best = max(best, chars + seps)
        return best

    def unit_bits(units: list[str], fb: int, cb: int) -> int:
        n = len(units)
        dup = n - len(set(units))
        tot = sum(len(u) for u in units)
        dupch = tot - sum(len(u) for u in set(units))
        f = 0
        f |= (1 << fb) if 10 * dup > 3 * n else 0
        f |= (1 << cb) if 5 * dupch > tot else 0
        return f

    nch = len(text)
    f = unit_bits(text.split("\n"), 0, 2)
    f |= unit_bits(text.split("\n\n"), 1, 3)
    f |= 16 if 5 * cov(2) > nch else 0
    f |= 32 if 50 * cov(3) > 9 * nch else 0
    f |= 64 if 25 * cov(4) > 4 * nch else 0
    return f


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_rep_doc, min_size=1, max_size=10))
def test_mt_repetition_flags_match_python_model(spark, docs):
    """The repetition bitmask (and its top-k tie-break toward largest
    coverage) agrees with an independent Python model on generated
    text with embedded newlines, blank lines, repeated grams, and
    empty tokens."""
    from lakeflush_spark.operators.quality import (
        massivetext_repetition_flags,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i LONG, text STRING"
    )
    rows = df.select(
        "i", "text", massivetext_repetition_flags("text").alias("f")
    ).collect()
    for r in rows:
        assert r.f == _rep_model(r.text), (
            f"mismatch for text={r.text!r}: spark={r.f} "
            f"model={_rep_model(r.text)}"
        )


def _dup_union_cov(toks: list[str], k: int) -> int:
    if len(toks) < k:
        return 0
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    counts = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    covered = set()
    for i, g in enumerate(grams):
        if counts[g] > 1:
            covered.update(range(i, i + k))
    chars = sum(len(toks[j]) for j in covered)
    seps = sum(1 for j in covered if j + 1 in covered)
    return chars + seps


def _rep_model_full(text: str) -> int:
    from lakeflush_spark.operators.quality import MT_DUP_KGRAM_PCT

    f = _rep_model(text)
    toks = text.split(" ")
    nch = len(text)
    for i, (k, pct) in enumerate(sorted(MT_DUP_KGRAM_PCT.items())):
        if 100 * _dup_union_cov(toks, k) > pct * nch:
            f |= 1 << (7 + i)
    return f


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_rep_doc, min_size=1, max_size=8))
def test_mt_full_table_matches_python_model(spark, docs):
    """The 13-rule full-table bitmask (incl. positional-union dup-k
    coverage) agrees with an independent Python model; repetitive
    generated docs exercise the overlap-union path."""
    from lakeflush_spark.operators.quality import (
        massivetext_repetition_flags,
    )

    # append a repeated tail so dup-5..10-gram bits actually fire
    docs = [d + " " + " ".join((d.split(" ") * 3)[:12]) for d in docs]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i LONG, text STRING"
    )
    rows = df.select(
        "i", "text",
        massivetext_repetition_flags("text", full_table=True).alias("f"),
    ).collect()
    for r in rows:
        assert r.f == _rep_model_full(r.text), (
            f"mismatch for text={r.text!r}: spark={r.f} "
            f"model={_rep_model_full(r.text)}"
        )


# ---- C4 line/page rules (operators/quality.c4_flags, functions/text.
# c4_clean) vs an independent Python model ---------------------------------

_c4_unit = st.one_of(
    st.sampled_from([
        "one two three four five.", "short.", "a b c d e?",
        'quoted "words here now yes."', "enable javascript please now ok.",
        "lorem ipsum dolor sit amet.", "if (x) { y; } one two.",
        "no terminal punct here", "six seven eight nine ten!",
    ]),
    st.text(alphabet=list("ab .!?\n{\"”"), min_size=0, max_size=12),
)
_c4_doc = st.lists(_c4_unit, min_size=1, max_size=8).map("\n".join)


def _c4_model(text: str) -> tuple[str, int]:
    import re as _re

    def keep(line: str) -> bool:
        return (
            len(line.split(" ")) >= 5
            and bool(_re.search(r'[.!?"”]$', line.rstrip(" ")))
            and "javascript" not in line.lower()
        )

    clean = "\n".join(l for l in text.split("\n") if keep(l))
    sent = len(_re.findall(r"[.!?]", clean))
    f = 0
    f |= 1 if sent < 3 else 0
    f |= 2 if "lorem ipsum" in text.lower() else 0
    f |= 4 if "{" in text else 0
    return clean, f


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_c4_doc, min_size=1, max_size=10))
def test_c4_clean_and_flags_match_python_model(spark, docs):
    """The C4 line filter (word count, terminal punct incl. closing
    quote, javascript) and page flags agree with an independent
    Python model on generated multi-line text."""
    from lakeflush_spark.functions.text import c4_clean
    from lakeflush_spark.operators.quality import c4_flags

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i LONG, text STRING"
    )
    rows = df.select(
        "i", "text", c4_clean("text").alias("clean"),
        c4_flags("text").alias("f"),
    ).collect()
    for r in rows:
        clean, f = _c4_model(r.text)
        assert r.clean == clean, f"clean mismatch for {r.text!r}"
        assert r.f == f, f"flags mismatch for {r.text!r}: {r.f} vs {f}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_rep_doc, min_size=1, max_size=8))
def test_coverage_values_match_python_model(spark, docs):
    """Direct VALUE check (not just threshold bits) of the union
    top-k-gram coverage and dup-k-gram union coverage folds."""
    from lakeflush_spark.functions.text import (
        dup_kgram_char_coverage,
        top_kgram_coverage,
    )

    docs = [d + " " + " ".join((d.split(" ") * 3)[:10]) for d in docs]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i LONG, text STRING"
    )
    rows = df.select(
        "i", "text",
        top_kgram_coverage("text", 2).alias("t2"),
        top_kgram_coverage("text", 3).alias("t3"),
        dup_kgram_char_coverage("text", 5).alias("d5"),
        dup_kgram_char_coverage("text", 6).alias("d6"),
    ).collect()
    for r in rows:
        toks = r.text.split(" ")

        def grams(k):
            if len(toks) < k:
                return []
            return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]

        def topcov(k):
            gs = grams(k)
            if not gs:
                return 0
            counts = {}
            for g in gs:
                counts[g] = counts.get(g, 0) + 1
            maxc = max(counts.values())
            if maxc <= 1:
                return max(len(g) for g in gs)
            best = 0
            for cand, c in counts.items():
                if c != maxc:
                    continue
                cov = set()
                for i, g in enumerate(gs):
                    if g == cand:
                        cov.update(range(i, i + k))
                best = max(best, sum(len(toks[j]) for j in cov)
                           + sum(1 for j in cov if j + 1 in cov))
            return best

        assert r.t2 == topcov(2), f"t2 {r.text!r}"
        assert r.t3 == topcov(3), f"t3 {r.text!r}"
        assert r.d5 == _dup_union_cov(toks, 5), f"d5 {r.text!r}"
        assert r.d6 == _dup_union_cov(toks, 6), f"d6 {r.text!r}"


# ---- r10 fused panel vs legacy per-column functions -----------------------

_panel_unit = st.one_of(
    st.sampled_from(
        ["the", "of", "loop loop", "a\nb", "p\n\np", "", "x y x y",
         "- lead", "end...", "…", "12345", "mixed#sym"]
    ),
    st.text(alphabet=list("ab- \n."), min_size=0, max_size=8)
    .filter(lambda t: " " not in t),
)
_panel_doc = st.lists(_panel_unit, min_size=1, max_size=25).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_panel_doc, min_size=1, max_size=6))
def test_fused_panel_property_matches_legacy(spark, docs):
    """text_quality_profile's fused inline() generator stays
    bit-identical to the un-fused per-column functions on generated
    text with embedded newlines, paragraph breaks, bullets, symbols,
    empty tokens, and sub-k-token docs."""
    import pyspark.sql.functions as F

    from lakeflush_spark.functions.text import (
        distinct_token_ratio_4dp,
        dup_3gram_ratio_4dp,
        dup_line_char_ratio_4dp,
        dup_para_ratio_4dp,
        lang_id,
        top_kgram_char_ratio_4dp,
    )
    from lakeflush_spark.operators.quality import (
        c4_flags,
        gopher_flags,
        massivetext_repetition_flags,
        text_quality_profile,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    legacy = df.select(
        "doc_id",
        distinct_token_ratio_4dp("text").alias("distinct_ratio"),
        dup_3gram_ratio_4dp("text").alias("dup3_ratio"),
        dup_line_char_ratio_4dp("text").alias("dup_line_char_ratio"),
        dup_para_ratio_4dp("text").alias("dup_para_ratio"),
        top_kgram_char_ratio_4dp("text", 2).alias("top2_char_ratio"),
        top_kgram_char_ratio_4dp("text", 4).alias("top4_char_ratio"),
        lang_id("text").alias("lang_pred"),
        gopher_flags("text").alias("gopher_flags"),
        c4_flags("text").alias("c4_flags"),
        massivetext_repetition_flags("text").alias("mt_rep_flags"),
    )
    fused = text_quality_profile(df).select(*legacy.columns)
    lrows = {r.doc_id: r.asDict() for r in legacy.collect()}
    frows = {r.doc_id: r.asDict() for r in fused.collect()}
    for i, want in lrows.items():
        assert frows[i] == want, f"doc {docs[i]!r}: {frows[i]} != {want}"


def test_words_drops_boundary_empties(spark):
    """words() matches Python str.split(): a trailing newline or
    leading spaces must not add phantom empty-string words that skew
    the Gopher word counters (ADVICE r10)."""
    from lakeflush_spark.functions.text import word_count, words

    df = spark.createDataFrame(
        [
            (1, "one two three\n"),
            (2, "  lead and trail  "),
            (3, ""),
            (4, "\n\t \n"),
            (5, "solo"),
        ],
        "i long, text string",
    )
    got = {
        r.i: (r.n, r.ws)
        for r in df.select(
            "i",
            word_count("text").alias("n"),
            words("text").alias("ws"),
        ).collect()
    }
    for i, text in [(1, "one two three\n"), (2, "  lead and trail  "),
                    (3, ""), (4, "\n\t \n"), (5, "solo")]:
        assert got[i][0] == len(text.split()), (i, got[i])
        assert got[i][1] == text.split(), (i, got[i])
