"""URL canonicalization / decomposition + repetition scores."""

from pyspark.sql import functions as F

from dablooms_spark.operators.urlops import (
    canonicalize_url,
    host_counts,
    with_url_parts,
)
from dablooms_spark.operators.textops import with_repetition_scores


CASES = [
    # (raw, canonical, host, registered_domain, path)
    (
        "HTTPS://User:Pw@Example.COM:443/Path/To?b=2&utm_source=x&a=1#frag",
        "https://example.com/Path/To?a=1&b=2",
        "example.com",
        "example.com",
        "/Path/To",
    ),
    ("http://example.com:80", "http://example.com/", "example.com", "example.com", "/"),
    (
        "http://example.com:8080/x?z=1&y=2",
        "http://example.com:8080/x?y=2&z=1",
        "example.com",
        "example.com",
        "/x",
    ),
    (
        "https://sub.Host-3.Example.COM/p/abc?utm_campaign=c",
        "https://sub.host-3.example.com/p/abc",
        "sub.host-3.example.com",
        "example.com",
        "/p/abc",
    ),
    (
        "ftp://Files.Example.org:21/pub/",
        "ftp://files.example.org:21/pub/",
        "files.example.org",
        "example.org",
        "/pub/",
    ),
    ("not a url", "", "", "", "/"),
    ("https://example.com/?&&a=1", "https://example.com/?a=1", "example.com", "example.com", "/"),
    (
        "http://example.com/a/b/c#only-frag",
        "http://example.com/a/b/c",
        "example.com",
        "example.com",
        "/a/b/c",
    ),
    # a '?' INSIDE the fragment is not a query (SPA-style routes)
    (
        "https://example.com/a#/route?tab=1",
        "https://example.com/a",
        "example.com",
        "example.com",
        "/a",
    ),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["url"])
    rows = {
        r["url"]: r
        for r in with_url_parts(df)
        .select("url", "canonical_url", "host", "registered_domain", "path")
        .collect()
    }
    for raw, canon, host, dom, path in CASES:
        r = rows[raw]
        assert r["canonical_url"] == canon, raw
        assert r["host"] == host, raw
        assert r["registered_domain"] == dom, raw
        assert r["path"] == path, raw


def test_canonicalize_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — required for
    a key normalizer feeding membership filters."""
    df = spark.createDataFrame(
        [(c[0],) for c in CASES if c[1]], ["url"]
    ).withColumn("c1", canonicalize_url("url"))
    twice = df.withColumn("c2", canonicalize_url("c1"))
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_url_parts_map_only(spark):
    """The projection adds no Exchange: at 100 TB this must stay a
    map-only stage over the scan."""
    df = spark.range(100).withColumn(
        "url", F.concat(F.lit("https://h-"), (F.col("id") % 7).cast("string"),
                        F.lit(".example.com/p/"), F.col("id").cast("string"))
    )
    plan = with_url_parts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_counts_salted_equals_plain(spark):
    df = spark.range(2000).withColumn(
        "url",
        F.concat(
            F.lit("https://h-"),
            # skew: ~half the rows land on host h-0
            F.when(F.col("id") % 2 == 0, F.lit("0"))
            .otherwise((F.col("id") % 13).cast("string")),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ),
    )
    plain = {r["host"]: r["n_docs"] for r in host_counts(df).collect()}
    salted = {r["host"]: r["n_docs"] for r in host_counts(df, salt_buckets=8).collect()}
    assert plain == salted
    # 1000 even ids + the 77 odd ids divisible by 13 (13, 39, ..., 1989)
    assert plain["h-0.example.com"] == 1077
    assert sum(plain.values()) == 2000


def _py_canonicalize(url: str) -> str:
    """Pure-python twin of canonicalize_url's documented rules, used
    as a differential oracle on random inputs."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    if not m:
        return ""
    scheme = m.group(1).lower()
    auth_m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", url)
    auth = auth_m.group(1) if auth_m else ""
    host_m = re.match(r"^(?:[^@]*@)?([^:]*)", auth)
    host = host_m.group(1).lower() if host_m else ""
    port_m = re.search(r":([0-9]+)$", auth)
    port = port_m.group(1) if port_m else ""
    path_m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = path_m.group(1) if path_m else ""
    if path == "":
        path = "/"
    q_m = re.match(r"^[^#?]*\?([^#]*)", url)
    q = q_m.group(1) if q_m else ""
    params = sorted(p for p in q.split("&") if p and p[:4] != "utm_")
    keep_port = ""
    if port and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        keep_port = ":" + port
    out = scheme + "://" + host + keep_port + path
    if params:
        out += "?" + "&".join(params)
    return out


def test_canonicalize_differential_random(spark):
    """Differential test vs the pure-python twin on 400 seeded random
    URL-ish strings (nasty chars, missing parts, multiple ?/#)."""
    import random

    rng = random.Random(20260817)
    frags = ["http", "https", "ftp", "://", ":", "//", "@", "#", "?", "&",
             "=", ".", "/", "example", "EXAMPLE", "Com", "a", "b", "1",
             "80", "443", "8080", "utm_x", "utm", " ", "%20", "~", "-"]
    urls = set()
    while len(urls) < 400:
        n = rng.randint(1, 12)
        urls.add("".join(rng.choice(frags) for _ in range(n)))
    urls = sorted(urls)
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["c"]
        for r in df.withColumn("c", canonicalize_url("url")).collect()
    }
    for u in urls:
        assert got[u] == _py_canonicalize(u), repr(u)
    # idempotence on every parseable random url
    canon = [(c,) for c in got.values() if c]
    if canon:
        df2 = spark.createDataFrame(canon, ["url"])
        twice = {
            r["url"]: r["c"]
            for r in df2.withColumn("c", canonicalize_url("url")).collect()
        }
        for c1, c2 in twice.items():
            assert c1 == c2, repr(c1)


def test_repetition_scores_values(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "x"), (2, "one two three"), (3, "z z z z")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in with_repetition_scores(df)
        .select("doc_id", "n_tokens", "dup_token_frac",
                "top_bigram_count", "top_bigram_frac")
        .collect()
    }
    # doc 0: bigrams [a b, b a, a b, b a, a c] -> top 2/5
    assert rows[0]["n_tokens"] == 6
    assert rows[0]["dup_token_frac"] == 0.5
    assert rows[0]["top_bigram_count"] == 2
    assert rows[0]["top_bigram_frac"] == 0.4
    # single token: no bigrams
    assert rows[1]["top_bigram_count"] == 0
    assert rows[1]["top_bigram_frac"] == 0.0
    # all-unique
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["top_bigram_count"] == 1
    # degenerate repetition
    assert rows[3]["dup_token_frac"] == 0.75
    assert rows[3]["top_bigram_frac"] == 1.0


def test_repetition_scores_map_only(spark):
    df = spark.createDataFrame([(0, "a b c a b")], ["doc_id", "text"])
    plan = with_repetition_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_registered_domain_psl(spark):
    """PSL-aware folding: co.uk/com.au-class suffixes keep the
    registrant label; the naive twin stays available for the no-data
    path and returns just the suffix there."""
    from dablooms_spark.operators.urlops import (
        url_registered_domain,
        url_registered_domain_psl,
    )

    cases = [
        ("https://shop.example.co.uk/x", "example.co.uk", "co.uk"),
        ("http://a.b.news.com.au/p?q=1", "news.com.au", "com.au"),
        ("https://example.com/a", "example.com", "example.com"),
        ("https://deep.sub.example.com", "example.com", "example.com"),
        ("http://localhost/x", "", ""),
        ("not a url", "", ""),
        ("https://go.jp", "go.jp", "go.jp"),  # bare suffix: nothing to fold
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    rows = {
        r["url"]: (r["psl"], r["naive"])
        for r in df.select(
            "url",
            url_registered_domain_psl("url").alias("psl"),
            url_registered_domain("url").alias("naive"),
        ).collect()
    }
    for u, psl_want, naive_want in cases:
        assert rows[u] == (psl_want, naive_want), u
    # with_url_parts defaults to PSL; psl=False restores the twin
    parts = with_url_parts(df).select("url", "registered_domain").collect()
    assert {r["url"]: r["registered_domain"] for r in parts}[
        "https://shop.example.co.uk/x"
    ] == "example.co.uk"
    naive = with_url_parts(df, psl=False).select("url", "registered_domain")
    assert {r["url"]: r["registered_domain"] for r in naive.collect()}[
        "https://shop.example.co.uk/x"
    ] == "co.uk"
