"""URL hygiene operators (operators/web.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.web import (
    canonicalize_url,
    domain_filter,
    per_domain_cap,
    registrable_domain,
    url_host,
)
from pandera_forge_spark.plans.inspect import has_python_udf


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")).collect()[0].c


@pytest.mark.parametrize(
    "url,expect",
    [
        # case, default port, fragment, tracking strip, param sort
        (
            "HTTPS://Example.COM:443/Path?b=2&utm_source=x&a=1#frag",
            "https://example.com/Path?a=1&b=2",
        ),
        ("http://example.com:80", "http://example.com/"),
        # non-default port survives
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # path case preserved; empty query dropped entirely
        ("https://A.B/P?utm_campaign=z", "https://a.b/P"),
        # every param tracking -> no '?'
        ("https://x.com/?gclid=1&fbclid=2&ref=3", "https://x.com/?"),
        # non-URL passes through unchanged
        ("not a url", "not a url"),
        # a '?' INSIDE the fragment is not a query: both fragments drop
        # to the same canonical form (regression: a bare \? regex
        # leaked fragment content into the canonical URL)
        ("https://example.com/path#frag?x=1", "https://example.com/path"),
        ("https://example.com/path#other", "https://example.com/path"),
    ],
)
def test_canonicalize_url(spark, url, expect):
    got = _canon(spark, url)
    # "https://x.com/?" case: the path regex keeps '/' and the query
    # empties; assert the meaningful form
    assert got.rstrip("?") == expect.rstrip("?")


def test_idempotent(spark):
    u = "HTTPS://Example.COM:443/Path?b=2&utm_source=x&a=1#frag"
    once = _canon(spark, u)
    assert _canon(spark, once) == once


@pytest.mark.parametrize(
    "host,expect",
    [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("sub.shop.com.au", "shop.com.au"),
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("CO.UK", "co.uk"),  # bare multi-part suffix: only 2 labels
    ],
)
def test_registrable_domain(spark, host, expect):
    df = spark.createDataFrame([(host,)], "h string")
    got = df.select(registrable_domain(F.col("h")).alias("d")).collect()[0].d
    assert got == expect


def test_registrable_domain_extra_suffixes(spark):
    df = spark.createDataFrame([("a.b.github.io",)], "h string")
    base = df.select(registrable_domain(F.col("h")).alias("d")).collect()[0].d
    assert base == "github.io"
    ext = df.select(
        registrable_domain(F.col("h"), ["github.io"]).alias("d")
    ).collect()[0].d
    assert ext == "b.github.io"


def test_domain_filter_block_and_keep(spark):
    df = spark.createDataFrame(
        [
            (1, "https://news.bbc.co.uk/story"),
            (2, "https://example.com/x"),
            (3, "http://spam.example.com/y"),
        ],
        "id bigint, url string",
    )
    assert {r.id for r in domain_filter(df, "url", ["example.com"]).collect()} == {1}
    assert {
        r.id for r in domain_filter(df, "url", ["example.com"], keep=True).collect()
    } == {2, 3}
    # empty blocklist blocks nothing
    assert domain_filter(df, "url", []).count() == 3
    # a NULL url is "not blocked": blocklist mode keeps it (regression:
    # ~NULL is NULL, which silently dropped every null-URL row)
    withnull = spark.createDataFrame(
        [(1, "https://spam.com/x"), (2, None)], "id bigint, url string"
    )
    assert {r.id for r in domain_filter(withnull, "url", ["spam.com"]).collect()} == {2}
    assert domain_filter(withnull, "url", ["spam.com"], keep=True).count() == 1


def test_per_domain_cap_bounds_and_determinism(spark):
    rows = [
        (i, f"https://{'big' if i % 4 else 'small'}.example{i % 3}.com/d/{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id bigint, url string")
    capped = per_domain_cap(df, "url", 5, "id")
    counts = {
        r["__domain"]: r["n"]
        for r in capped.groupBy("__domain").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["d"]: r["n"]
        for r in df.groupBy(
            registrable_domain(url_host(F.col("url"))).alias("d")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert counts == {d: min(5, n) for d, n in full.items()}
    # deterministic selection: same ids either run
    again = {r.id for r in per_domain_cap(df, "url", 5, "id").collect()}
    assert again == {r.id for r in capped.collect()}


def test_no_python_udf(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "id bigint, url string")
    assert not has_python_udf(
        domain_filter(df, "url", ["b.com"]).select(
            canonicalize_url(F.col("url"))
        )
    )
