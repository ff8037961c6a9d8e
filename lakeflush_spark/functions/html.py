"""Library-free HTML → text extraction (JVM regex chain).

Step 0 of every web-scale training-data pipeline: crawled pages
arrive as HTML and the curation operators want prose. Real extractors
(trafilatura, readability) are DOM-based and not in this container;
this is the regex tier — strip the non-content blocks
(comments/script/style/noscript), turn block-level tags into
newlines, drop remaining tags, decode the frequent entities, and
normalize whitespace. Good enough to feed the quality/dedup stages;
deliberately conservative (never invents text, only removes).

Engine portability: one ordered pattern table drives BOTH the Spark
Column chain (:func:`html_to_text`, Java regex) and the DuckDB twin
(:func:`html_to_text_sql`, RE2) — patterns restrict themselves to the
common dialect (inline ``(?is)`` flags, lazy ``.*?``, char classes;
explicit ``[ \\t\\n\\r]`` instead of ``\\s``, whose Java/RE2 meanings
differ — the functions/text.py precedent). The q59 'html' column
hash-verifies the whole chain end to end.

Scale: a fixed chain of ``regexp_replace`` — map-only, scan speed,
whole-stage codegen, no Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: non-content blocks removed whole (order matters: comments can
#: contain markup, script bodies can contain '<').
_BLOCK_STRIP: list[str] = [
    r"(?s)<!--.*?-->",
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<noscript[^>]*>.*?</noscript>",
]

#: block-level elements whose boundaries become newlines.
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|article"
    "|header|footer|pre|hr"
)

#: (pattern, replacement) pairs applied IN ORDER after block stripping.
HTML_PATTERNS: list[tuple[str, str]] = (
    [(pat, "") for pat in _BLOCK_STRIP]
    + [
        (rf"(?i)</?(?:{_BLOCK_TAGS})[^>]*>", "\n"),
        (r"<[^>]+>", ""),
        # frequent entities (decode AFTER tag strip, never before);
        # all entity strings are regex-literal-safe
        (r"&nbsp;", " "),
        (r"&lt;", "<"),
        (r"&gt;", ">"),
        (r"&quot;", '"'),
        (r"&#39;", "'"),
        (r"&amp;", "&"),  # last, so &amp;lt; decodes to the LITERAL '&lt;'
        # whitespace normalization: runs of spaces/tabs -> one space,
        # spaces hugging newlines drop, 3+ newlines -> paragraph break,
        # trim both ends (explicit class, not \s — Java/RE2 differ)
        (r"[ \t]+", " "),
        (r" ?\n ?", "\n"),
        (r"\n{3,}", "\n\n"),
        (r"^[ \t\n\r]+", ""),
        (r"[ \t\n\r]+$", ""),
    ]
)


def html_to_text(col: Column | str) -> Column:
    """Extracted text from an HTML column — the JVM regex chain."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def _sql_lit(s: str) -> str:
    """A DuckDB string literal for ``s``. Plain ``'...'`` literals do
    NOT process backslash escapes (so regex patterns pass through
    verbatim); strings containing REAL newline characters use the
    ``E'...'`` escape form instead (patterns never do — their ``\\n``
    is two characters the regex engine interprets)."""
    esc = s.replace("'", "''")
    if "\n" in s:
        return "E'" + esc.replace("\\", "\\\\").replace("\n", "\\n") + "'"
    return "'" + esc + "'"


def html_to_text_sql(expr: str) -> str:
    """The identical chain as a DuckDB expression over ``expr``.

    Every pattern uses inline flags and the common Java/RE2 dialect;
    replacements are passed with the 'g' (global) option since DuckDB
    replaces only the first match by default (Spark replaces all).
    """
    out = expr
    for pat, rep in HTML_PATTERNS:
        out = f"regexp_replace({out}, {_sql_lit(pat)}, {_sql_lit(rep)}, 'g')"
    return out
