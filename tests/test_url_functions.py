"""The reference's 17 pure unit tests ported verbatim (same inputs/expected),
run against BOTH the Spark column expressions and their Python twins.

Sources of the vectors:
  extraction   — /root/reference/shared/src/crawler.rs:66-113 (6 tests)
  normalization— /root/reference/shared/src/url_normalize.rs:28-68 (6 tests)
  DNS candidates — /root/reference/shared/src/dns.rs:68-96 (5 pure tests;
                   the 2 live-network tests are covered by the simulator suite)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions.urls import (
    dns_candidates_col,
    dns_candidates_py,
    extract_links_col,
    extract_links_py,
    normalize_cols,
    normalize_url_py,
)

EXTRACT_CASES = [
    # (html, expected) — crawler.rs:66-113
    ('<a href="https://google.com">link</a> and http://example.org too',
     ["https://google.com", "http://example.org"]),
    ("Visit https://example.com/path/to/page for more", ["https://example.com"]),
    ("no urls here", []),
    ("https://a.com https://b.com http://c.org https://a.com",
     ["https://a.com", "https://b.com", "http://c.org", "https://a.com"]),
    ("https://my-site.co.uk and http://sub.example-domain.com",
     ["https://my-site.co.uk", "http://sub.example-domain.com"]),
    ("Visit https://example.com:8080/path and http://localhost:3000 for more",
     ["https://example.com:8080", "http://localhost:3000"]),
]

NORMALIZE_CASES = [
    # (url, name, proto) — url_normalize.rs:28-68
    ("https://www.Google.com", "GOOGLE.COM", "HTTPS://"),
    ("http://example.org", "EXAMPLE.ORG", "HTTP://"),
    ("https://google.com", "GOOGLE.COM", "HTTPS://"),
    ("https://api.sub.example.com", "API.SUB.EXAMPLE.COM", "HTTPS://"),
    ("http://www.example.com", "EXAMPLE.COM", "HTTP://"),
    ("https://subdomain.www.example.com", "SUBDOMAIN.WWW.EXAMPLE.COM", "HTTPS://"),
]

DNS_CASES = [
    # (name, max_depth, candidates) — dns.rs:68-96
    ("GOOGLE.COM", 5, ["GOOGLE.COM"]),
    ("API.GOOGLE.COM", 5, ["GOOGLE.COM", "API.GOOGLE.COM"]),
    ("A.B.C.COM", 5, ["C.COM", "B.C.COM", "A.B.C.COM"]),
    ("A.B.C.D.COM", 3, ["D.COM", "C.D.COM"]),
    ("LOCALHOST", 5, []),
]


@pytest.mark.parametrize("html,expected", EXTRACT_CASES)
def test_extract_py(html, expected):
    assert extract_links_py(html) == expected


def test_extract_spark(spark):
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(EXTRACT_CASES)], ["i", "html"])
    rows = df.select("i", extract_links_col(F.col("html")).alias("links")).collect()
    got = {r["i"]: r["links"] for r in rows}
    for i, (_, expected) in enumerate(EXTRACT_CASES):
        assert got[i] == expected


@pytest.mark.parametrize("url,name,proto", NORMALIZE_CASES)
def test_normalize_py(url, name, proto):
    assert normalize_url_py(url) == (name, proto)


def test_normalize_spark(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in NORMALIZE_CASES], ["url"])
    n, p = normalize_cols(F.col("url"))
    rows = df.select("url", n.alias("name"), p.alias("proto")).collect()
    got = {r["url"]: (r["name"], r["proto"]) for r in rows}
    for url, name, proto in NORMALIZE_CASES:
        assert got[url] == (name, proto)


@pytest.mark.parametrize("name,depth,expected", DNS_CASES)
def test_dns_candidates_py(name, depth, expected):
    assert dns_candidates_py(name, depth) == expected


def test_dns_candidates_spark(spark):
    df = spark.createDataFrame([(n, d) for n, d, _ in DNS_CASES], ["name", "depth"])
    # per-row max_depth differs; run one select per distinct depth
    for name, depth, expected in DNS_CASES:
        row = (
            df.filter(F.col("name") == name)
            .select(dns_candidates_col(F.col("name"), depth).alias("c"))
            .collect()[0]
        )
        assert row["c"] == expected
