"""URL canonicalization and decomposition — pure Catalyst.

The reference library's home use case (bitly) is URL-keyed membership:
"have we seen this link before?" only works if equivalent spellings of
a URL hash identically. This module provides the deterministic
normalizer that feeds the bloom/sketch key paths, plus host /
registered-domain extraction for per-site rollups and the skew-salted
aggregations (web host frequency is Zipf: a handful of hosts carry a
double-digit share of a crawl).

Everything is regexp / array Catalyst expressions — whole-stage
codegen, no Python workers, map-only at any scale — and every rule is
written with the SAME regex/array semantics DuckDB exposes, so each
operator has an exact SQL oracle.

Canonicalization rules (documented, deterministic):
  * scheme and host lowercased
  * userinfo (``user:pass@``) dropped
  * default ports stripped (http:80, https:443); other ports kept
  * empty path becomes "/"
  * query parameters: split on "&", empty params and ``utm_``-prefixed
    tracking params dropped, remainder sorted lexicographically
  * fragment dropped

Reference parity note: public dablooms hashes whatever bytes the
caller supplies (src/dablooms.c hashing is key-agnostic); this
normalizer is the Spark-side key-preparation stage a crawl pipeline
needs in front of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# the '?' must precede any '#': a '?' inside the fragment is NOT a
# query ('https://ex.com/a#/route?tab=1' has no query)
_QUERY_RE = r"^[^#?]*\?([^#]*)"
_HOST_IN_AUTH_RE = r"^(?:[^@]*@)?([^:]*)"
_PORT_IN_AUTH_RE = r":([0-9]+)$"
_REG_DOMAIN_RE = r"([^.]+\.[^.]+)$"

DEFAULT_PORTS = {"http": "80", "https": "443"}


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(url: str | Column) -> Column:
    return F.lower(F.regexp_extract(_col(url), _SCHEME_RE, 1))


def url_host(url: str | Column) -> Column:
    auth = F.regexp_extract(_col(url), _AUTHORITY_RE, 1)
    return F.lower(F.regexp_extract(auth, _HOST_IN_AUTH_RE, 1))


def url_port(url: str | Column) -> Column:
    auth = F.regexp_extract(_col(url), _AUTHORITY_RE, 1)
    return F.regexp_extract(auth, _PORT_IN_AUTH_RE, 1)


def url_path(url: str | Column) -> Column:
    p = F.regexp_extract(_col(url), _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_registered_domain(url: str | Column) -> Column:
    """Last two dot-labels of the host — the NAIVE twin, kept for the
    no-data path (no suffix table in reach) and as the differential
    baseline. co.uk-style suffixes fold wrong here by design; use
    url_registered_domain_psl (the with_url_parts default) for
    PSL-aware folding."""
    return F.regexp_extract(url_host(url), _REG_DOMAIN_RE, 1)


# Vendored subset of the Public Suffix List (publicsuffix.org — public
# data, MPL 2.0): the multi-label ccTLD suffixes a web crawl most
# commonly hits. The full list (wildcard *.ck-style rules, 3+-label
# entries, exceptions) is pluggable via the multi_suffixes argument —
# this subset covers the co.uk/com.au class where the naive
# last-two-labels rule folds unrelated registrants together.
PSL_MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "res.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "co.th", "in.th", "or.th", "ac.th", "go.th",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
)


def url_registered_domain_psl(
    url: str | Column,
    multi_suffixes: tuple[str, ...] | list[str] | None = None,
) -> Column:
    """Registered domain with Public-Suffix-List-aware folding: one
    label more than the longest matching public suffix. The vendored
    2-label subset handles the co.uk/com.au class; pass the full PSL's
    multi-label entries via multi_suffixes for complete coverage.
    Still a pure Catalyst expression — the suffix set compiles to an
    IN list, map-only at any scale (the full PSL as a broadcast join
    is the alternative when the set is too large to inline)."""
    suffixes = list(multi_suffixes or PSL_MULTI_LABEL_SUFFIXES)
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))  # NULL in, NULL out — matches the naive twin
        .when((n >= 3) & last2.isin(suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(F.lit(""))
    )


def _canonical_query(url: Column) -> Column:
    q = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & (F.substring(p, 1, 4) != "utm_"),
        )
    )
    joined = F.array_join(params, "&")
    return F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))


def canonicalize_url(url: str | Column) -> Column:
    """Canonical form per the module rules. Non-null strings that do
    not parse as scheme://... URLs return '' (so the result is safe to
    feed straight to the hash kernels); NULL input propagates NULL,
    matching the probe paths' explicit null masking."""
    u = _col(url)
    scheme = url_scheme(u)
    host = url_host(u)
    port = url_port(u)
    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == DEFAULT_PORTS["http"]))
        | ((scheme == "https") & (port == DEFAULT_PORTS["https"])),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(
        scheme, F.lit("://"), host, keep_port, url_path(u), _canonical_query(u)
    )
    return F.when(scheme == "", F.lit("")).otherwise(canon)


def with_url_parts(
    df: DataFrame, url_col: str = "url", prefix: str = "", psl: bool = True
) -> DataFrame:
    """Adds canonical_url, host, registered_domain, path columns
    (optionally prefixed). One map-only projection. psl=True (default)
    folds registered_domain with the vendored Public-Suffix-List
    subset (co.uk-aware); psl=False keeps the naive last-two-labels
    twin."""
    u = F.col(url_col)
    regdom = url_registered_domain_psl(u) if psl else url_registered_domain(u)
    return (
        df.withColumn(prefix + "canonical_url", canonicalize_url(u))
        .withColumn(prefix + "host", url_host(u))
        .withColumn(prefix + "registered_domain", regdom)
        .withColumn(prefix + "path", url_path(u))
    )


def host_counts(
    df: DataFrame,
    url_col: str = "url",
    salt_buckets: int = 0,
) -> DataFrame:
    """Documents per host. Web host frequency is heavily skewed, so
    for large corpora pass salt_buckets > 0 to route through the
    two-level salted aggregation (partial counts on (host, salt), then
    de-salt) — the same pattern as operators.skew, inline here because
    count is trivially associative."""
    hosts = df.select(url_host(url_col).alias("host"), F.col(url_col).alias("_u"))
    if salt_buckets <= 0:
        return hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    # Salt derived from row CONTENT (the url), never from
    # monotonically_increasing_id(): a nondeterministic expression
    # feeding a shuffle key breaks exactly-once under task retry /
    # speculation (a recomputed map task would assign different salts
    # than the attempt some reducers already fetched). Distinct urls
    # under one hot host still spread across all buckets.
    salted = hosts.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("_u")), F.lit(salt_buckets))
    )
    partial = salted.groupBy("host", "_salt").agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy("host").agg(F.sum("c").cast("long").alias("n_docs"))
