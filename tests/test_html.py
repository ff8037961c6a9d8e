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
