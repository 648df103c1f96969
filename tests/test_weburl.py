"""URL canonicalization + canonical-URL dedup (functions/weburl.py).

The canonicalizer must merge exactly the spellings a crawler can emit
for one fetch (case, www, default port, tracking params, param order,
fragment, trailing slash) and must NOT merge anything a server could
distinguish (scheme, real params, percent-encoding).
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import weburl


@pytest.fixture(scope="module")
def spark():
    from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.session import get_spark

    s = get_spark(cpus=4)
    yield s


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", weburl.canonicalize_url(F.col("url")).alias("c")).collect()
    return {r["url"]: r["c"] for r in rows}


CANON = "https://example.com/a/b?k=1&z=2"


class TestCanonicalizeUrl:
    def test_merging_spellings(self, spark):
        merged = [
            "https://example.com/a/b?k=1&z=2",
            "HTTPS://Example.COM/a/b?k=1&z=2",
            "https://www.example.com/a/b?k=1&z=2",
            "https://example.com:443/a/b?k=1&z=2",
            "https://example.com/a/b/?k=1&z=2",
            "https://example.com/a/b?z=2&k=1",
            "https://example.com/a/b?k=1&z=2#section-3",
            "https://example.com/a/b?utm_source=x&k=1&utm_campaign=y&z=2",
            "https://example.com/a/b?gclid=abc&k=1&z=2&fbclid=def",
        ]
        got = _canon(spark, merged)
        assert set(got.values()) == {CANON}

    def test_distinguishing_spellings(self, spark):
        distinct = [
            "http://example.com/a/b?k=1&z=2",  # scheme
            "https://example.com:8443/a/b?k=1&z=2",  # non-default port
            "https://example.com/a/b?k=1&z=2&q=3",  # extra real param
            "https://example.com/a/b?k=1",  # param subset
            "https://example.com/a/c?k=1&z=2",  # path
            "https://example.com/a/b%2Fc?k=1&z=2",  # percent-encoding kept
            "https://sub.example.com/a/b?k=1&z=2",  # subdomain (not www)
        ]
        got = _canon(spark, distinct + [CANON])
        assert len(set(got.values())) == len(distinct) + 1

    def test_http_default_port_and_refparam(self, spark):
        got = _canon(spark, ["http://www.Example.com:80/x/?ref=rss"])
        assert got["http://www.Example.com:80/x/?ref=rss"] == "http://example.com/x"

    def test_root_and_bare_host(self, spark):
        got = _canon(spark, ["https://example.com/", "https://example.com"])
        assert set(got.values()) == {"https://example.com"}

    def test_refsrc_is_not_a_tracking_param(self, spark):
        # TRACKING_PARAM_RE anchors on (=|$): 'refresh=1' and
        # 'reference=x' must survive even though they start with 'ref'
        got = _canon(spark, ["https://example.com/p?refresh=1&reference=x"])
        assert got["https://example.com/p?refresh=1&reference=x"] == (
            "https://example.com/p?reference=x&refresh=1"
        )

    def test_non_url_is_empty(self, spark):
        got = _canon(spark, ["not a url", "/relative/path"])
        assert set(got.values()) == {""}


class TestDedupByCanonicalUrl:
    def _ts(self, s):
        return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)

    def test_latest_crawl_wins_and_counts(self, spark):
        rows = [
            ("https://example.com/a?utm_source=x", self._ts("2025-01-01T00:00:00"), "old"),
            ("https://www.example.com/a", self._ts("2025-01-02T00:00:00"), "new"),
            ("https://example.com/b", self._ts("2025-01-01T00:00:00"), "only"),
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, body string")
        got = {
            r["canonical_url"]: (r["n_dups"], r["body"])
            for r in weburl.dedup_by_canonical_url(df).collect()
        }
        assert got == {
            "https://example.com/a": (2, "new"),
            "https://example.com/b": (1, "only"),
        }

    def test_ts_tie_breaks_on_raw_url(self, spark):
        t = self._ts("2025-01-01T00:00:00")
        df = spark.createDataFrame(
            [("https://example.com/a", t, "lo"), ("https://example.com/a/", t, "hi")],
            "url string, warc_ts timestamp, body string",
        )
        out = weburl.dedup_by_canonical_url(df).collect()
        assert len(out) == 1
        # 'https://example.com/a/' > 'https://example.com/a' bytewise
        assert out[0]["body"] == "hi"

    def test_exact_winner_key_ties_yield_one_row(self, spark):
        # re-exported crawl dumps: same (url, ts) twice, payloads differ
        t = self._ts("2025-01-01T00:00:00")
        df = spark.createDataFrame(
            [
                ("https://example.com/a", t, "payload-1"),
                ("https://example.com/a", t, "payload-2"),
            ],
            "url string, warc_ts timestamp, body string",
        )
        a = weburl.dedup_by_canonical_url(df.repartition(1)).collect()
        b = weburl.dedup_by_canonical_url(df.repartition(8)).collect()
        assert len(a) == len(b) == 1 and a[0]["n_dups"] == 2
        # deterministic tie-break: same survivor at any partitioning
        assert a[0]["body"] == b[0]["body"]

    def test_all_null_ts_group_survives(self, spark):
        df = spark.createDataFrame(
            [("https://example.com/a", None, "x"), ("https://www.example.com/a", None, "y")],
            "url string, warc_ts timestamp, body string",
        )
        out = weburl.dedup_by_canonical_url(df).collect()
        assert len(out) == 1 and out[0]["n_dups"] == 2
        # url tie-break still applies: bytewise-greatest raw url wins
        assert out[0]["body"] == "y"

    def test_partitioning_independent(self, spark):
        rows = [
            (f"https://example.com/p/{i % 5}?utm_source={i}", self._ts("2025-01-01T00:00:00"))
            for i in range(40)
        ]
        rows = [(u, t.replace(minute=i % 60)) for i, (u, t) in enumerate(rows)]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
        a = sorted(
            map(tuple, weburl.dedup_by_canonical_url(df.repartition(1)).collect())
        )
        b = sorted(
            map(tuple, weburl.dedup_by_canonical_url(df.repartition(16)).collect())
        )
        assert a == b and len(a) == 5


class TestUrlQuality:
    def _score(self, spark, urls):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.functions import weburl

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return {r["url"]: r.asDict() for r in weburl.url_quality(df).collect()}

    def test_rule_classes(self, spark):
        clean = "https://news.example.org/articles/tech/42"
        blocked = "https://best-casino-bonus.example.com/win/3"
        digits = "https://spam.example.net/p/123456789012345678901234567890123"
        params = "https://shop.example.com/item?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9&j=10&k=11&l=12"
        deep = "https://trap.example.com/cal/2020/01/01/x/y/z/w/v/u/t/s/r/q"
        got = self._score(spark, [clean, blocked, digits, params, deep])
        assert got[clean]["keep"] is True
        assert got[blocked]["keep"] is False and got[blocked]["blocklist_hits"] == 1
        assert got[digits]["keep"] is False and got[digits]["frac_digits"] > 0.3
        assert got[params]["keep"] is False and got[params]["n_params"] == 12
        assert got[deep]["keep"] is False and got[deep]["path_depth"] >= 13

    def test_feature_accounting(self, spark):
        u = "https://ex.com/a/b?x=1&y=2"
        r = self._score(spark, [u])[u]
        assert r["n_params"] == 2
        assert r["path_depth"] == 2  # /a/b
        assert r["url_len"] == len(u)
        digs = sum(c.isdigit() for c in u)
        assert abs(r["frac_digits"] - digs / len(u)) < 1e-6

    def test_no_query_no_params(self, spark):
        r = self._score(spark, ["https://ex.com/a"])["https://ex.com/a"]
        assert r["n_params"] == 0 and r["blocklist_hits"] == 0
