"""HTML -> text extraction (functions/html.py) — behavior + the
Java/RE2 twin's cross-engine agreement on adversarial cases."""

from __future__ import annotations

import duckdb
import pytest

from lakeflush_spark.functions.html import html_to_text, html_to_text_sql

CASES = [
    # full page: blocks stripped, entities decoded, whitespace normal
    (
        '<html><head><title>t</title><script>var x = 1 < 2;</script>'
        '<style>p{color:red}</style></head><body><!-- hidden -->'
        '<h1>Title &amp; more</h1><p>hello   world</p>'
        '<div>tail&nbsp;bit</div></body></html>',
        "t\nTitle & more\n\nhello world\n\ntail bit",
    ),
    # empty paragraphs never produce >2 newlines
    ("<p>a</p><p>b</p><p></p><p></p><p>c</p>", "a\n\nb\n\nc"),
    # plain text is untouched
    ("no markup at all", "no markup at all"),
    # encoded markup stays TEXT after decode
    ("<ul><li>one</li><li>two &lt;tag&gt;</li></ul>", "one\n\ntwo <tag>"),
    # malformed input: still no tags in the output
    ("<div>unclosed <b>bold", "unclosed bold"),
    # double-encoded entity decodes exactly one level
    ("&amp;lt; stays literal", "&lt; stays literal"),
    # multi-line script bodies vanish whole
    ("<script>\nif (a < b) {\n  go();\n}\n</script>after", "after"),
    ("", ""),
]


@pytest.mark.parametrize("html,want", CASES)
def test_html_to_text_cases(spark, html, want):
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(html_to_text("html").alias("t")).collect()[0].t
    assert got == want


def test_html_sql_twin_agrees(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(CASES)], "id long, html string"
    )
    got = {
        r.id: r.t for r in df.select("id", html_to_text("html").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, (c, _) in enumerate(CASES):
        con.execute("CREATE OR REPLACE TABLE h AS SELECT ? AS html", [c])
        want = con.execute(f"SELECT {html_to_text_sql('html')} FROM h").fetchone()[0]
        assert got[i] == want, i


def test_curate_documents_html_input(spark):
    """html_input=True extracts text before metrics/gates/dedup, so
    two pages with identical CONTENT but different markup dedup."""
    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, f"<html><body><p>{body}</p></body></html>"),
            (2, f"<div><script>x()</script><h1>{body}</h1></div>"),
            (3, "<p>a completely different page body with other words</p>"),
        ],
        "doc_id long, text string",
    )
    cfg = CurationConfig(min_tokens=1, html_input=True)
    curated, stats = curate_documents(spark, docs, cfg)
    rows = {r.doc_id: r.text for r in curated.collect()}
    # markup variants of the same content collapse to the min id
    assert sorted(rows) == [1, 3]
    assert rows[1] == body  # the stored text is the EXTRACTED text
    assert "<" not in rows[3]


def test_curate_stream_html_input(spark, tmp_path):
    """The streaming twin extracts HTML before its gates/dedup too."""
    import glob
    import shutil

    from lakeflush_spark.streaming.curation import (
        CurationStreamConfig,
        curate_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    body = "the quick brown fox jumps over the lazy dog again and again"
    stage = tmp_path / "_stage"
    spark.createDataFrame(
        [
            (1, f"<html><body><p>{body}</p></body></html>"),
            (2, f"<div><script>x()</script><h1>{body}</h1></div>"),
            (3, "<p>another page body entirely with different words</p>"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(stage))
    shutil.copy(
        glob.glob(str(stage / "part-*.parquet"))[0], str(src / "b1.parquet")
    )
    cfg = CurationStreamConfig(
        source_dir=str(src),
        dest_dir=str(tmp_path / "dest"),
        digest_dir=str(tmp_path / "digests"),
        sig_dir=str(tmp_path / "sigs"),
        stats_dir=str(tmp_path / "stats"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        min_tokens=1,
        html_input=True,
    )
    curate_stream(spark, cfg).awaitTermination(180)
    rows = {r.doc_id: r.text for r in spark.read.parquet(cfg.dest_dir).collect()}
    assert sorted(rows) == [1, 3]
    assert rows[1] == body


def test_html_fixed_point_on_plain_text(spark):
    """Markup-free, entity-free text is a fixed point (modulo the
    whitespace normalization, which is itself idempotent)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    plain = st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        min_size=0,
        max_size=40,
    )

    @given(words=st.lists(plain, min_size=0, max_size=8))
    @settings(max_examples=10, deadline=None)
    def prop(words):
        t = " ".join(w for w in words if w)
        df = spark.createDataFrame([(t,)], "html string")
        got = df.select(html_to_text("html").alias("t")).collect()[0].t
        assert got == t.strip()

    prop()


def test_html_random_tag_soup_leaves_no_tags(spark):
    """Whatever tag soup comes in, no '<elem ...>' survives and no
    script/style content leaks into the output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["alpha", "beta", "gamma", "delta"])
    tag = st.sampled_from(
        ["<p>", "</p>", "<div class='x'>", "</div>", "<b>", "</b>",
         "<script>SECRET()</script>", "<style>SECRET{}</style>",
         "<!-- SECRET -->", "<br/>", "<span >", "</span>"]
    )
    piece = st.one_of(word, tag)

    @given(pieces=st.lists(piece, min_size=0, max_size=20))
    @settings(max_examples=10, deadline=None)
    def prop(pieces):
        html = " ".join(pieces)
        df = spark.createDataFrame([(html,)], "html string")
        got = df.select(html_to_text("html").alias("t")).collect()[0].t
        assert "SECRET" not in got
        import re

        assert not re.search(r"<[a-zA-Z!/][^>]*>", got)

    prop()
