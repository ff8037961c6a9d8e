"""URL curation — canonicalization, domain extraction, per-domain caps.

The URL-filtering stage every crawl-derived training pipeline runs
before text ever matters (C4's blocklist filtering, RefinedWeb §3.1
"URL filtering", Gopher's domain heuristics): normalize raw crawl
URLs so byte-different spellings of the same resource collide,
extract the registrable domain for per-domain policies, and cap the
number of documents any one domain contributes.

Spark-first shapes (100 TB stance):

- :func:`canonicalize_url` / :func:`registrable_domain` are pure JVM
  ``Column`` expression chains (regexp + array ops inside whole-stage
  codegen) — map-only, scan-speed, pushdown-friendly.
- :func:`domain_cap_sample` is ONE shuffle on the registrable domain
  with a deterministic md5 order — reproducible across runs, engines,
  retries, and cluster sizes (the q60 sampling stance: never
  ``rand()``). A mega-domain (the crawl's long-tail inverse: a few
  domains hold a large corpus share) makes that domain's partition
  hot; the operator documents the two-pass proportional alternative
  (count → broadcast keep-fraction map-side filter, the q24 'blocked'
  cap recipe) for that regime.

Canonicalization contract (ASCII URLs; IDN/punycode out of scope):

1. scheme and host lowercase; userinfo dropped;
2. default ports stripped (http:80, https:443), others kept;
3. fragment dropped;
4. tracking params removed — names starting ``utm_`` or in
   :data:`TRACKING_PARAMS` — remaining params sorted bytewise;
5. empty path becomes ``/``.

Every rule has a DuckDB SQL twin (``sql_canonicalize_url`` /
``sql_registrable_domain``) built from the same tables, so the q59
contract hash-verifies the whole chain cross-engine.

The reference has no URL handling at all (opaque records end-to-end);
this is a declared engine capability — the oracle contract is the
spec. Suffix handling uses a built-in subset of the public-suffix
list (:data:`MULTI_PART_SUFFIXES`) — the full PSL is external data a
deployment can swap in; the OPERATOR shape (last-3-labels on a
multi-part suffix, last-2 otherwise) is what's verified.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: exact tracking-param names dropped by canonicalization (besides the
#: ``utm_`` prefix family)
TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref", "ref_src",
)

#: common multi-part registrable suffixes (public-suffix-list subset;
#: swap in the full PSL as deployment data — the operator shape is
#: what the contract verifies)
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za",
)

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_HOST_RE = r"^(?:[^@]*@)?([^:]*)"
_PORT_RE = r":([0-9]+)$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def parse_url(url: Column | str) -> Column:
    """``struct(scheme, host, port, path, query, fragment)`` — the
    lowercased-scheme/host decomposition every other operator builds
    on. Unparseable rows (no ``scheme://``) get empty-string fields."""
    u = _col(url)
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    return F.struct(
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(auth, _HOST_RE, 1)).alias("host"),
        F.regexp_extract(auth, _PORT_RE, 1).alias("port"),
        F.regexp_extract(u, _PATH_RE, 1).alias("path"),
        F.regexp_extract(u, _QUERY_RE, 1).alias("query"),
        F.regexp_extract(u, r"#(.*)$", 1).alias("fragment"),
    )


def _kept_params(query: Column) -> Column:
    """Query params minus the tracking family, bytewise-sorted."""
    names = F.array(*[F.lit(t) for t in TRACKING_PARAMS])
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.element_at(F.split(p, "="), 1).startswith("utm_")
        & ~F.array_contains(names, F.element_at(F.split(p, "="), 1)),
    )
    return F.array_sort(params)


def canonicalize_url(url: Column | str) -> Column:
    """The canonical spelling per the module contract — '' for rows
    with no parseable ``scheme://``."""
    u = _col(url)
    p = parse_url(u)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    kept = _kept_params(p["query"])
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(
                F.size(kept) > 0,
                F.concat(F.lit("?"), F.array_join(kept, "&")),
            ).otherwise(F.lit("")),
        )
    )


def registrable_domain(host: Column | str) -> Column:
    """Last two host labels — three when the last two form a known
    multi-part suffix (``example.co.uk`` → ``example.co.uk``, not
    ``co.uk``). Bare/1-label hosts pass through unchanged."""
    h = F.lower(_col(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    suffixes = F.array(*[F.lit(s) for s in MULTI_PART_SUFFIXES])
    take = F.when(
        (n >= 3) & F.array_contains(suffixes, last2), F.lit(3)
    ).otherwise(F.lit(2))
    return F.when(n <= 2, h).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), ".")
    )


def domain_cap_sample(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 1000,
    seed: str = "0",
    domain_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain,
    chosen by deterministic md5 order (same doc set on any engine /
    retry / cluster size). Adds ``url_domain``; rows whose URL has no
    parseable host all share the '' domain and are capped together.

    One shuffle on the domain. For crawl-scale mega-domains (a hot
    partition), switch to the two-pass proportional recipe: count per
    domain, broadcast the keep-fractions, and filter map-side on the
    md5 bucket (exact keep-all below the cap) — q24's 'blocked' cap
    shape; this window form is exact and is the right default below
    that regime.
    """
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    from pyspark.sql import Window

    dom = (
        F.col(domain_col)
        if domain_col
        else registrable_domain(parse_url(F.col(url_col))["host"])
    )
    w = Window.partitionBy("url_domain").orderBy("_ucs_key", id_col)
    return (
        df.withColumn("url_domain", dom)
        .withColumn(
            "_ucs_key",
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        )
        .withColumn("_ucs_rn", F.row_number().over(w))
        .where(F.col("_ucs_rn") <= max_per_domain)
        .drop("_ucs_key", "_ucs_rn")
    )


# ---- DuckDB oracle twins (spliced into contract SQL) ----------------------


def _sql_params(query_expr: str) -> str:
    names = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    return (
        f"list_sort(list_filter(string_split({query_expr}, '&'), "
        f"p -> p <> '' AND NOT starts_with(string_split(p, '=')[1], 'utm_') "
        f"AND NOT list_contains([{names}], string_split(p, '=')[1])))"
    )


def sql_canonicalize_url(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` over URL SQL ``expr``.
    Emitted as a self-contained scalar expression (one nested CTE-free
    chain) so it splices anywhere."""
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME_RE}', 1))"
    auth = f"regexp_extract({expr}, '{_AUTH_RE}', 1)"
    host = f"lower(regexp_extract({auth}, '{_HOST_RE}', 1))"
    port = f"regexp_extract({auth}, '{_PORT_RE}', 1)"
    path_raw = f"regexp_extract({expr}, '{_PATH_RE}', 1)"
    path = f"(CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END)"
    query = f"regexp_extract({expr}, '\\?([^#]*)', 1)"
    kept = _sql_params(query)
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    return (
        f"(CASE WHEN {scheme} = '' THEN '' ELSE "
        f"{scheme} || '://' || {host} "
        f"|| (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) "
        f"|| {path} "
        f"|| (CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END) END)"
    )


def sql_registrable_domain(host_expr: str) -> str:
    """DuckDB twin of :func:`registrable_domain` over host ``expr``."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    h = f"lower({host_expr})"
    labels = f"string_split({h}, '.')"
    n = f"len({labels})"
    last2 = f"array_to_string({labels}[{n} - 1:], '.')"
    take = (
        f"(CASE WHEN {n} >= 3 AND list_contains([{suffixes}], {last2}) "
        f"THEN 3 ELSE 2 END)"
    )
    return (
        f"(CASE WHEN {n} <= 2 THEN {h} "
        f"ELSE array_to_string({labels}[{n} - {take} + 1:], '.') END)"
    )
