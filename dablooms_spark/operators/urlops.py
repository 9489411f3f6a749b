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
    """Last two dot-labels of the host. Deliberately naive (no public
    suffix list — co.uk-style suffixes fold wrong); documented and
    identical in the SQL oracle. A PSL join is a broadcast lookup a
    production deployment would add."""
    return F.regexp_extract(url_host(url), _REG_DOMAIN_RE, 1)


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
    df: DataFrame, url_col: str = "url", prefix: str = ""
) -> DataFrame:
    """Adds canonical_url, host, registered_domain, path columns
    (optionally prefixed). One map-only projection."""
    u = F.col(url_col)
    return (
        df.withColumn(prefix + "canonical_url", canonicalize_url(u))
        .withColumn(prefix + "host", url_host(u))
        .withColumn(prefix + "registered_domain", url_registered_domain(u))
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
