"""URL canonicalization expressions: golden cases, idempotence, plan
purity (no Python stage), and composition with the dedup/sampling keys."""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.functions.urls import (
    url_host,
    url_normalize,
    url_path,
    url_registered_domain,
)

CASES = [
    # (input, host, registered_domain, path, normalized)
    (
        "http://Example.com/a?utm_source=x&b=2&a=1#frag",
        "example.com",
        "example.com",
        "/a",
        "https://example.com/a?a=1&b=2",
    ),
    (
        "https://example.com:443/a/",
        "example.com",
        "example.com",
        "/a",
        "https://example.com/a",
    ),
    (
        "http://news.example.com:80/",
        "news.example.com",
        "example.com",
        "/",
        "https://news.example.com/",
    ),
    (
        "https://user:pw@Sub.Site.ORG/p/q?fbclid=zzz",
        "sub.site.org",
        "site.org",
        "/p/q",
        "https://sub.site.org/p/q",
    ),
    (
        "https://example.com",
        "example.com",
        "example.com",
        "/",
        "https://example.com/",
    ),
    (
        "ftp://Files.example.com/data",
        "files.example.com",
        "example.com",
        "/data",
        "ftp://files.example.com/data",
    ),
    (
        # NON-default port = a different origin: kept
        "http://example.com:8080/app",
        "example.com",
        "example.com",
        "/app",
        "https://example.com:8080/app",
    ),
    (
        # trailing root-dot FQDN form collapses to the plain host
        "http://example.com./x",
        "example.com",
        "example.com",
        "/x",
        "https://example.com/x",
    ),
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame([(u,) for u, *_ in CASES], ["url"])


def test_url_goldens(spark, url_df):
    rows = url_df.select(
        "url",
        url_host("url").alias("h"),
        url_registered_domain("url").alias("d"),
        url_path("url").alias("p"),
        url_normalize("url").alias("n"),
    ).collect()
    want = {u: (h, d, p, n) for u, h, d, p, n in CASES}
    for r in rows:
        assert (r["h"], r["d"], r["p"], r["n"]) == want[r["url"]], r["url"]


def test_url_normalize_idempotent(spark, url_df):
    once = url_df.select(url_normalize("url").alias("n"))
    twice = once.select(url_normalize("n").alias("n2"), "n").collect()
    for r in twice:
        assert r["n2"] == r["n"]


def test_url_normalize_collapses_variants_for_dedup(spark):
    variants = [
        "http://Example.com/a?utm_source=x&b=2&a=1#frag",
        "https://example.com:443/a/?a=1&b=2",
        "https://example.com/a?b=2&a=1&gclid=123",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    got = df.select(url_normalize("url").alias("n")).distinct().collect()
    assert len(got) == 1 and got[0]["n"] == "https://example.com/a?a=1&b=2"


def test_url_expressions_stay_in_codegen(spark, url_df):
    plan = (
        url_df.select(url_normalize("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
