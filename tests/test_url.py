"""URL curation ops (operators/url.py): canonicalization contract,
domain extraction, per-domain caps, and Spark<->DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from lakeflush_spark.operators.url import (
    canonicalize_url,
    domain_cap_sample,
    parse_url,
    registrable_domain,
    sql_canonicalize_url,
    sql_registrable_domain,
)

CASES = [
    # (raw, canonical)
    ("http://Example.COM/a", "http://example.com/a"),
    ("HTTPS://WWW.Example.com:443/Path/X", "https://www.example.com/Path/X"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&b=2&a=1", "http://example.com/a?a=1&b=2"),
    (
        "http://example.com/a?fbclid=zzz&gclid=q&keep=1",
        "http://example.com/a?keep=1",
    ),
    ("http://example.com/a?utm_medium=m", "http://example.com/a"),
    ("http://user:pw@example.com/a", "http://example.com/a"),
    ("http://example.com/a?z=9&ref=tw&y=8#x", "http://example.com/a?y=8&z=9"),
    ("ftp://Files.Example.ORG:21/pub", "ftp://files.example.org:21/pub"),
    ("not a url at all", ""),
    ("", ""),
]

DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.c.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("deep.sub.example.org", "example.org"),
    ("example.com", "example.com"),
    ("localhost", "localhost"),
    ("news.example.com.au", "example.com.au"),
]


def test_canonicalize_contract(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {r.i: r.c for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_registrable_domain_contract(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(DOMAIN_CASES)], "i long, h string"
    )
    got = {r.i: r.d for r in df.select("i", registrable_domain("h").alias("d")).collect()}
    for i, (host, want) in enumerate(DOMAIN_CASES):
        assert got[i] == want, f"{host!r}: {got[i]!r} != {want!r}"


def test_sql_twins_agree_with_spark(spark):
    """The DuckDB renditions must produce byte-identical strings — the
    q59 contract stands on this."""
    con = duckdb.connect()
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {sql_canonicalize_url('u')} FROM (SELECT CAST(? AS VARCHAR) AS u)",
            [raw],
        ).fetchone()[0]
        assert got == want, f"duckdb canon {raw!r}: {got!r} != {want!r}"
    for host, want in DOMAIN_CASES:
        got = con.execute(
            f"SELECT {sql_registrable_domain('h')} FROM (SELECT CAST(? AS VARCHAR) AS h)",
            [host],
        ).fetchone()[0]
        assert got == want, f"duckdb domain {host!r}: {got!r} != {want!r}"
    con.close()


def test_parse_url_fields(spark):
    df = spark.createDataFrame(
        [("https://u@Host.Ex.com:8443/p/q?x=1&y=2#frag",)], "url string"
    )
    p = df.select(parse_url("url").alias("p")).collect()[0].p
    assert p.scheme == "https"
    assert p.host == "host.ex.com"
    assert p.port == "8443"
    assert p.path == "/p/q"
    assert p.query == "x=1&y=2"
    assert p.fragment == "frag"


def test_domain_cap_sample_quota_and_determinism(spark):
    rows = [
        (i, f"http://{'big' if i < 40 else f'site{i}'}.example.com/p{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = domain_cap_sample(df, max_per_domain=5, seed="s")
    out = kept.collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r.url_domain, []).append(r.doc_id)
    # every row here shares the registrable domain example.com
    assert set(by_dom) == {"example.com"}
    assert len(out) == 5
    # deterministic across repartition
    again = {
        r.doc_id
        for r in domain_cap_sample(
            df.repartition(7), max_per_domain=5, seed="s"
        ).collect()
    }
    assert again == {r.doc_id for r in out}
    # different seed -> (almost surely) different pick, same quota
    other = domain_cap_sample(df, max_per_domain=5, seed="t").collect()
    assert len(other) == 5
    # no cap binding when quota exceeds group size
    assert domain_cap_sample(df, max_per_domain=100).count() == 60
    with pytest.raises(ValueError, match="max_per_domain"):
        domain_cap_sample(df, max_per_domain=0)


def test_domain_cap_sample_separate_domains(spark):
    rows = [(i, f"http://d{i % 3}.example.co.uk/x{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    # all three hosts share the registrable domain example.co.uk
    assert domain_cap_sample(df, max_per_domain=4).count() == 4
    # capping on the full host instead: pass a precomputed domain col
    with_host = df.withColumn("h", parse_url(F.col("url"))["host"])
    per_host = domain_cap_sample(
        with_host, max_per_domain=4, domain_col="h"
    )
    assert per_host.count() == 12  # 3 hosts x 4


def test_curation_pipeline_url_stages(spark):
    """url_blocklist drops before anything else; url_domain_cap caps
    the clean pool; provenance + stats name both stages."""
    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    rows = []
    for i in range(40):
        dom = "spamfarm.example.com" if i < 10 else "good.example.org"
        rows.append(
            (
                i,
                f"unique document body number {i} with plenty of words "
                f"to pass the gates {i * 7} and some trailing text",
                f"https://{dom}/page-{i}",
            )
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    cfg = CurationConfig(
        min_tokens=1,
        url_col="url",
        url_blocklist=("example.com",),
        url_domain_cap=12,
    )
    curated, stats, prov = curate_documents(
        spark, docs, cfg, return_provenance=True
    )
    out = curated.collect()
    # all 10 spamfarm docs blocked (registrable domain example.com);
    # the 30 good docs cap at 12 for example.org
    assert stats.url_blocked == 10
    assert stats.input_docs == 30
    assert stats.after_domain_cap == 12
    assert len(out) == 12
    assert all(r.url_domain == "example.org" for r in out)
    stages = {
        r.stage for r in prov.select("stage").distinct().collect()
    }
    assert {"url_blocked", "domain_capped"} <= stages
    blocked = {
        r.doc_id
        for r in prov.where(F.col("stage") == "url_blocked").collect()
    }
    assert blocked == set(range(10))
    # determinism: same cfg -> same kept set
    again, _ = curate_documents(spark, docs, cfg)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in out}
    # url options without url_col fail fast
    with pytest.raises(ValueError, match="url_col"):
        curate_documents(
            spark, docs, CurationConfig(url_domain_cap=5)
        )
    # pre-existing url_domain column fails fast
    with pytest.raises(ValueError, match="url_domain"):
        curate_documents(
            spark,
            docs.withColumn("url_domain", F.lit("x")),
            CurationConfig(url_col="url"),
        )


def test_curation_pipeline_url_exact_dedup(spark):
    """Same canonical URL (different tracking params / casing)
    collapses to the min id before text dedup; unparseable URLs are
    exempt; provenance names the stage."""
    from lakeflush_spark.pipelines import CurationConfig, curate_documents

    def body(i):
        return (
            f"document body {i} is long enough to pass the quality "
            f"gates with distinct words {i * 17} trailing here"
        )

    rows = [
        # 0/1/2: one page, three spellings -> keep 0
        (0, body(0), "http://Example.org/a?utm_source=x"),
        (1, body(1), "HTTP://example.ORG/a"),
        (2, body(2), "http://example.org:80/a#frag"),
        # 3: different page, kept
        (3, body(3), "http://example.org/b"),
        # 4/5: unparseable URLs — exempt, both kept
        (4, body(4), "no scheme here"),
        (5, body(5), ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    cfg = CurationConfig(min_tokens=1, url_col="url", url_exact_dedup=True)
    curated, stats, prov = curate_documents(
        spark, docs, cfg, return_provenance=True
    )
    kept = sorted(r.doc_id for r in curated.collect())
    assert kept == [0, 3, 4, 5]
    assert stats.url_dups == 2
    dups = {
        r.doc_id for r in prov.where(F.col("stage") == "url_dup").collect()
    }
    assert dups == {1, 2}
    with pytest.raises(ValueError, match="url_col"):
        curate_documents(
            spark, docs, CurationConfig(url_exact_dedup=True)
        )
