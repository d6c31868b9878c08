"""URL/domain/HTML web-corpus expression builders (functions/web.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.web import (
    domain_blocklist_filter,
    registrable_domain,
    strip_html_tags,
    url_host,
    url_path,
)


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )


def test_url_host_and_path(spark):
    df = _urls(
        spark,
        [
            "https://WWW.Example.COM:8080/a/b?q=1#frag",
            "http://sub.domain.org/path/",
            "not a url at all",
            None,
        ],
    )
    rows = df.select(
        url_host("url").alias("h"), url_path("url").alias("p")
    ).collect()
    assert (rows[0].h, rows[0].p) == ("www.example.com", "/a/b")
    assert (rows[1].h, rows[1].p) == ("sub.domain.org", "/path/")
    assert rows[2].h is None and rows[3].h is None


def test_registrable_domain(spark):
    cases = {
        "https://www.example.com/x": "example.com",
        "https://a.b.news.example.co.uk/": "example.co.uk",
        "http://blog.example.org": "example.org",
        "http://example.com": "example.com",
        "http://192.168.0.1/path": "192.168.0.1",
        "http://localhost/x": "localhost",
        "https://go.jp.weird.ne.jp/": "weird.ne.jp",
    }
    df = _urls(spark, list(cases))
    got = [r.d for r in df.select(registrable_domain("url").alias("d")).collect()]
    assert got == list(cases.values())


def test_domain_blocklist_inline_and_broadcast(spark):
    urls = [
        "https://spam.example.com/a",      # blocked by example.com suffix
        "https://example.com/b",           # blocked exactly
        "https://examplexcom.net/c",       # NOT blocked (no dot boundary)
        "https://good.org/d",
        "http://tracker.ads.co.uk/e",      # blocked via ads.co.uk
        "bad input",                       # unparseable -> kept
    ]
    df = _urls(spark, urls)
    kept = domain_blocklist_filter(df, "url", blocked=["example.com", "ads.co.uk"])
    assert sorted(r.id for r in kept.collect()) == [2, 3, 5]

    bl = spark.createDataFrame([("example.com",), ("ads.co.uk",)], "d string")
    kept2 = domain_blocklist_filter(df, "url", blocked_df=bl)
    assert sorted(r.id for r in kept2.collect()) == [2, 3, 5]

    with pytest.raises(ValueError):
        domain_blocklist_filter(df, "url")
    with pytest.raises(ValueError):
        domain_blocklist_filter(df, "url", blocked=["x.com"], blocked_df=bl)


def test_blocklist_broadcast_plan(spark):
    df = _urls(spark, ["https://a.com/x"])
    bl = spark.createDataFrame([("b.com",)], "d string")
    plan = (
        domain_blocklist_filter(df, "url", blocked_df=bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_strip_html_tags(spark):
    html = (
        "<html><head><style>body { color: red }</style>"
        "<script type='text/js'>var x = '<b>not text</b>';</script></head>"
        "<body><!-- a comment --><h1>Title</h1>"
        "<p>Hello &amp; welcome to &quot;the&quot; test&nbsp;page.</p>"
        "<p>literal &amp;lt; stays escaped</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "payload string")
    out = df.select(strip_html_tags("payload").alias("t")).collect()[0].t
    assert out == (
        'Title Hello & welcome to "the" test page. literal &lt; stays escaped'
    )
    # garbage/NULL safe
    rows = spark.createDataFrame(
        [("plain text",), ("<unclosed",), (None,)], "payload string"
    ).select(strip_html_tags("payload").alias("t")).collect()
    assert rows[0].t == "plain text"
    assert rows[1].t == "<unclosed"  # not a tag: never closed, left as-is
    assert rows[2].t is None


def test_web_functions_are_narrow(spark):
    df = _urls(spark, ["https://a.com/x"])
    plan = (
        df.select(
            url_host("url"), registrable_domain("url"), strip_html_tags("url")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_registrable_domain_invariants(spark):
    """For any parseable URL: the registrable domain is non-null, is a
    dot-boundary suffix of the host, and spans at most 3 labels."""
    import random

    rnd = random.Random(3)
    tlds = ["com", "org", "io", "uk", "jp", "de"]
    urls = []
    for _ in range(60):
        n_extra = rnd.randint(0, 3)
        labels = [f"l{rnd.randint(0, 9)}{i}" for i in range(n_extra)]
        if rnd.random() < 0.4:
            labels.append(rnd.choice(["co", "ac", "gov", "zz"]))
        labels.append(rnd.choice(tlds))
        urls.append("https://" + ".".join(labels) + "/p?q=1")
    df = _urls(spark, urls)
    rows = df.select(
        url_host("url").alias("h"), registrable_domain("url").alias("d")
    ).collect()
    for r in rows:
        assert r.d is not None
        assert r.h == r.d or r.h.endswith("." + r.d), (r.h, r.d)
        assert 1 <= len(r.d.split(".")) <= 3
