"""URL normalization tests: host extraction, fragment/tracking-param
stripping, canonical composition, pathological inputs."""

from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import urls


def _vals(spark, rows, expr):
    df = spark.createDataFrame([(r,) for r in rows], "url string")
    return [r["v"] for r in df.select(expr.alias("v")).collect()]


def test_url_host(spark):
    got = _vals(
        spark,
        [
            "https://WWW.Example.COM/path",
            "http://user:pw@Host.org:8080/x?q=1",
            "ftp://files.example.net",
            "not a url at all",
        ],
        urls.url_host(F.col("url")),
    )
    assert got == ["www.example.com", "host.org", "files.example.net", ""]


def test_strip_tracking_params(spark):
    got = _vals(
        spark,
        [
            "https://a.com/p?utm_source=x&id=7&utm_medium=y&ref=keep",
            "https://a.com/p?utm_source=x&utm_medium=y",
            "https://a.com/p?id=7",
            "https://a.com/p",
            "https://a.com/p?fbclid=abc#frag",
            # '?' INSIDE the fragment is not a query
            "https://a.com/p#sec?keep=1",
        ],
        urls.strip_tracking_params(F.col("url")),
    )
    assert got == [
        "https://a.com/p?id=7&ref=keep",
        "https://a.com/p",
        "https://a.com/p?id=7",
        "https://a.com/p",
        "https://a.com/p#frag",
        "https://a.com/p#sec?keep=1",
    ]


def test_normalize_url(spark):
    got = _vals(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Path/Page?utm_source=x&ID=7#section",
            "http://a.com/CaseSensitivePath",
            "https://a.com/p?gclid=z&q=spark+joins",
        ],
        urls.normalize_url(F.col("url")),
    )
    assert got == [
        # scheme+authority lowercased, path case kept, utm gone, frag gone
        "https://www.example.com:443/Path/Page?ID=7",
        "http://a.com/CaseSensitivePath",
        "https://a.com/p?q=spark+joins",
    ]


def test_normalize_is_idempotent(spark):
    raw = "HTTPS://A.com/x?utm_source=1&k=v#f"
    once = _vals(spark, [raw], urls.normalize_url(F.col("url")))[0]
    twice = _vals(spark, [once], urls.normalize_url(F.col("url")))[0]
    assert once == twice == "https://a.com/x?k=v"
