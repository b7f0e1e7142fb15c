"""URL functions (functions/url.py) and web-corpus operators
(operators/web.py): host/domain parsing, canonicalization, URL dedup,
domain stats."""

from pyspark.sql import functions as F

from ecokg_spark.functions.url import (
    url_canonicalize,
    url_host,
    url_path,
    url_path_depth,
    url_registered_domain,
    url_scheme,
)
from ecokg_spark.operators.web import domain_stats, url_dedup

URLS = [
    (1, "https://www.Example.COM/a/b/c?x=1&utm_source=tw#frag"),
    (2, "HTTP://user:pw@news.bbc.co.uk:8080/story?id=2"),
    (3, "https://cdn.example.com:443/"),
    (4, "http://example.com:80"),
    (5, "not a url at all"),
    (6, "ftp://files.example.org/pub/file.txt"),
]


def _df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def _col(spark, expr):
    rows = _df(spark).select("doc_id", expr.alias("v")).collect()
    return {r["doc_id"]: r["v"] for r in rows}


def test_url_scheme_host(spark):
    sch = _col(spark, url_scheme("url"))
    assert sch[1] == "https" and sch[2] == "http" and sch[6] == "ftp"
    assert sch[5] == ""
    host = _col(spark, url_host("url"))
    assert host[1] == "www.example.com"      # lowercased
    assert host[2] == "news.bbc.co.uk"       # userinfo + port stripped
    assert host[3] == "cdn.example.com"
    assert host[5] == ""


def test_url_path_depth(spark):
    path = _col(spark, url_path("url"))
    assert path[1] == "/a/b/c" and path[3] == "/" and path[4] == ""
    depth = _col(spark, url_path_depth("url"))
    assert depth[1] == 3 and depth[3] == 0 and depth[6] == 2


def test_url_registered_domain(spark):
    dom = _col(spark, url_registered_domain("url"))
    assert dom[1] == "example.com"
    assert dom[2] == "bbc.co.uk"             # public-suffix-aware
    assert dom[3] == "example.com"
    assert dom[6] == "example.org"


def test_url_canonicalize(spark):
    canon = _col(spark, url_canonicalize("url"))
    # utm stripped, other params kept, fragment dropped, host lowercased
    assert canon[1] == "https://www.example.com/a/b/c?x=1"
    # non-default port survives; scheme lowercased; userinfo dropped
    # (credentialed URLs are noise in a web corpus — same resource)
    assert canon[2] == "http://news.bbc.co.uk:8080/story?id=2"
    # default ports dropped; bare "/" root path dropped
    assert canon[3] == "https://cdn.example.com"
    assert canon[4] == "http://example.com"
    # non-URLs canonicalize to themselves
    assert canon[5] == "not a url at all"


def test_url_dedup_collapses_variants(spark):
    rows = [
        (1, "https://Example.com/p?utm_source=a"),
        (2, "https://example.com:443/p#frag"),
        (3, "https://example.com/p"),
        (4, "https://example.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert out["https://example.com/p"]["doc_id"] == 1
    assert out["https://example.com/p"]["n_dups"] == 3
    assert out["https://example.com/q"]["n_dups"] == 1


def test_domain_stats(spark):
    rows = [
        (1, "https://a.example.com/x", 10),
        (2, "https://b.example.com/y", 20),
        (3, "https://shop.bbc.co.uk/z", 30),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n long")
    out = {r["domain"]: r for r in
           domain_stats(df, "url", "doc_id", chars_col="n").collect()}
    assert out["example.com"]["n_docs"] == 2
    assert out["example.com"]["n_chars"] == 30
    assert out["example.com"]["avg_chars"] == 15.0
    assert out["bbc.co.uk"]["n_docs"] == 1


def test_url_blocklist_filter(spark):
    from ecokg_spark.operators.web import url_blocklist_filter

    rows = [
        (1, "https://www.bad.example.net/home"),
        (2, "https://sub.bad.example.net/x"),      # same registered domain
        (3, "https://good.example.org/casino/slots"),
        (4, "https://good.example.org/news"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("example.net", "malware")],
                               "domain string, category string")
    out = {r["doc_id"]: r for r in
           url_blocklist_filter(df, bl, path_pattern="/casino/").collect()}
    assert out[1]["block_reason"] == "domain"
    assert out[1]["block_category"] == "malware"
    assert out[2]["block_reason"] == "domain"   # subdomain collapses
    assert out[3]["block_reason"] == "path"
    assert out[3]["block_category"] is None
    assert out[4]["block_reason"] is None


def test_url_blocklist_is_broadcast(spark):
    from ecokg_spark.operators.web import url_blocklist_filter

    df = spark.createDataFrame([(1, "https://a.example.com/x")],
                               "doc_id long, url string")
    bl = spark.createDataFrame([("b.com", "c")], "domain string, category string")
    plan = url_blocklist_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


# --------------------------------------------------------------------------
# host-level link graph (operators/web.py host_link_graph)
# --------------------------------------------------------------------------

def test_host_link_graph_resolution_and_counts(spark):
    from ecokg_spark.operators.web import host_link_graph

    pages = spark.createDataFrame([
        ("https://a.org/p1",
         '<a href="https://b.net/x">1</a><a href="/rel">2</a>'
         '<a href="https://b.net/y">3</a>'),
        ("https://a.org/p2",
         '<a href="//c.io/z">4</a><a href="#frag">5</a>'
         '<a href="mailto:x@y.z">6</a><a href="">7</a>'),
        ("https://b.net/q",
         '<a href="sub/page.html">8</a>'),
    ], "url string, html string")
    got = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"])
           for r in host_link_graph(pages).collect()}
    assert got[("a.org", "b.net")] == (2, 1)     # two anchors, one page
    assert got[("a.org", "a.org")] == (1, 1)     # relative -> own host
    assert got[("a.org", "c.io")] == (1, 1)      # protocol-relative
    assert got[("b.net", "b.net")] == (1, 1)     # relative w/o slash
    # fragment / mailto / empty dropped
    assert sum(v[0] for v in got.values()) == 5


def test_host_link_graph_binary_html_and_port_strip(spark):
    from ecokg_spark.operators.web import host_link_graph

    pages = spark.createDataFrame(
        [("https://www.x.com:8080/a",
          b'<a href="https://USER@Y.com:443/p?q=1#f">l</a>')],
        "url string, html binary")
    rows = host_link_graph(pages).collect()
    assert len(rows) == 1
    r = rows[0]
    # host extraction lowercases, strips port/userinfo on both sides
    assert (r["src_host"], r["dst_host"]) == ("www.x.com", "y.com")


def test_anchor_texts(spark):
    from ecokg_spark.operators.web import anchor_texts

    pages = spark.createDataFrame(
        [
            ("https://a.com/1",
             '<a href="https://wiki.org/Ada">Ada  Lovelace</a>'
             '<a href="https://wiki.org/Ada">Ada Lovelace</a>'
             '<a href="/about" class="nav">About</a>'
             '<a href="mailto:x@y.z">mail me</a>'),
            ("https://b.com/2",
             '<a href="https://wiki.org/Ada">countess</a>'
             '<a href="//wiki.org/Babbage">Charles</a>'
             '<a href="#top">top</a>'
             '<a href="https://wiki.org/Ada"></a>'),
        ],
        "url string, html string",
    )
    pages = pages.withColumn("html", F.encode("html", "UTF-8"))
    out = anchor_texts(pages, k=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["dst_host"], []).append(
            (r["rank"], r["anchor"], r["n"]))
    # whitespace collapses, so both Ada anchors from page 1 merge
    assert sorted(by_host["wiki.org"]) == [
        (1, "Ada Lovelace", 2), (2, "Charles", 1)]
    # page-relative /about resolves to the page's own host
    assert by_host["a.com"] == [(1, "About", 1)]
    # mailto / fragment / empty anchors never surface
    all_anchors = {r["anchor"] for r in out}
    assert "mail me" not in all_anchors and "top" not in all_anchors


def test_anchor_texts_topk_ties(spark):
    from ecokg_spark.operators.web import anchor_texts

    html = ''.join(f'<a href="https://t.org/x">w{i}</a>' for i in range(5))
    pages = spark.createDataFrame(
        [("https://s.com/p", html)], "url string, html string"
    ).withColumn("html", F.encode("html", "UTF-8"))
    out = anchor_texts(pages, k=3).where(F.col("dst_host") == "t.org")
    got = [(r["rank"], r["anchor"]) for r in out.collect()]
    # deterministic alphabetical tie-break at equal counts, exactly k rows
    assert got == [(1, "w0"), (2, "w1"), (3, "w2")]


def test_canonical_meta(spark):
    from ecokg_spark.operators.web import canonical_meta

    pages = spark.createDataFrame(
        [
            ("https://a.com/page?x=1",
             '<head><link rel="canonical" href="https://a.com/page"/>'
             '<meta name="robots" content="noindex, nofollow"></head>'),
            ("https://b.com/p",
             '<head><meta name="robots" content="index, follow"></head>'),
            ("https://c.com/q", "<html><body>nothing</body></html>"),
            ("https://d.com/r",
             '<head><meta name="robots" content="NOINDEX"></head>'),
        ],
        "url string, html string",
    ).withColumn("html", F.encode("html", "UTF-8"))
    got = {r["url"]: r for r in canonical_meta(pages).collect()}
    a = got["https://a.com/page?x=1"]
    assert a["canonical_url"] == "https://a.com/page"
    assert a["canonical_final"] == "https://a.com/page"
    assert a["noindex"] and a["nofollow"]
    b = got["https://b.com/p"]
    assert b["canonical_url"] == "" and b["canonical_final"] == "https://b.com/p"
    assert not b["noindex"] and not b["nofollow"]
    c = got["https://c.com/q"]
    assert c["canonical_final"] == "https://c.com/q" and not c["noindex"]
    # directives are case-insensitive
    assert got["https://d.com/r"]["noindex"]


ROBOTS_TXT = """# example robots
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: ecobot
User-agent: otherbot
Disallow: /eco-only
Disallow:
Allow: /

User-agent: greedy
Disallow: /
"""


def test_parse_robots_groups(spark):
    from ecokg_spark.operators.web import parse_robots

    df = spark.createDataFrame([("a.com", ROBOTS_TXT)],
                               "host string, robots_txt string")
    got = sorted(tuple(r) for r in parse_robots(df).collect())
    assert got == [
        ("a.com", "*", "allow", "/private/ok"),
        ("a.com", "*", "disallow", "/private"),
        # the contiguous UA run shares its rules; empty Disallow dropped
        ("a.com", "ecobot", "allow", "/"),
        ("a.com", "ecobot", "disallow", "/eco-only"),
        ("a.com", "greedy", "disallow", "/"),
        ("a.com", "otherbot", "allow", "/"),
        ("a.com", "otherbot", "disallow", "/eco-only"),
    ]


def test_robots_allowed_precedence(spark):
    from ecokg_spark.operators.web import parse_robots, robots_allowed

    rules = parse_robots(spark.createDataFrame(
        [("a.com", ROBOTS_TXT)], "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("https://a.com/private/x",),       # * disallow /private
         ("https://a.com/private/ok/y",),    # longer allow wins
         ("https://a.com/public",),          # no rule -> allowed
         ("https://b.com/anything",)],       # unknown host -> allowed
        "url string")
    star = {r["url"]: (r["allowed"], r["matched_path"])
            for r in robots_allowed(urls, rules, agent="randombot").collect()}
    assert star["https://a.com/private/x"] == (False, "/private")
    assert star["https://a.com/private/ok/y"] == (True, "/private/ok")
    assert star["https://a.com/public"] == (True, None)
    assert star["https://b.com/anything"] == (True, None)

    # exact-agent group shadows '*' entirely: /private is fine for ecobot
    eco = {r["url"]: (r["allowed"], r["matched_path"])
           for r in robots_allowed(urls, rules, agent="EcoBot").collect()}
    assert eco["https://a.com/private/x"] == (True, "/")
    # greedy is fully blocked
    greedy = {r["url"]: r["allowed"]
              for r in robots_allowed(urls, rules, agent="greedy").collect()}
    assert greedy["https://a.com/public"] is False
    assert greedy["https://b.com/anything"] is True


def test_url_surt(spark):
    from ecokg_spark.functions.url import url_surt

    df = spark.createDataFrame(
        [(1, "https://www.News.Example.co.uk/a/B?x=1"),
         (2, "http://example.com"),
         (3, "not a url")],
        "id long, url string")
    got = {r["id"]: r["s"] for r in df.select(
        "id", url_surt("url").alias("s")).collect()}
    assert got[1] == "uk,co,example,news)/a/b"
    assert got[2] == "com,example)/"
    assert got[3] == ""
    # the point of SURT: one domain's subtree is lexicographically
    # contiguous — a sibling host of example.co.uk sorts adjacent
    sib = df.sparkSession.createDataFrame(
        [(4, "https://blog.example.co.uk/z")], "id long, url string")
    s4 = sib.select(url_surt("url").alias("s")).collect()[0]["s"]
    assert s4.startswith("uk,co,example,")


def test_crawl_frontier(spark):
    from ecokg_spark.operators.web import crawl_frontier

    pages = spark.createDataFrame(
        [("https://a.com/1",
          '<a href="https://popular.com/x">l</a>'
          '<a href="https://popular.com/y">l</a>'),
         ("https://b.com/1", '<a href="https://popular.com/z">l</a>'
                             '<a href="https://rare.com/q">l</a>')],
        "url string, html string",
    ).withColumn("html", F.encode("html", "UTF-8"))
    candidates = spark.createDataFrame(
        [("https://popular.com/new1",), ("https://popular.com/new2",),
         ("https://rare.com/new",), ("https://unknown.org/new",),
         ("https://a.com/1",)],       # already crawled -> excluded
        "url string")
    out = {r["url"]: (r["authority"], r["rank"])
           for r in crawl_frontier(pages, candidates, per_host=1).collect()}
    assert "https://a.com/1" not in out
    # popular.com linked from 2 distinct pages, rare from 1, unknown 0
    pop = [u for u in out if "popular" in u]
    assert len(pop) == 1 and out[pop[0]][0] == 2   # per-host cap applied
    assert out["https://rare.com/new"][0] == 1
    assert out["https://unknown.org/new"][0] == 0


def test_host_boilerplate_lines(spark):
    from ecokg_spark.operators.web import host_boilerplate_lines

    pages = spark.createDataFrame(
        [("https://a.com/1", "COOKIE BANNER\nunique content one\nFOOTER"),
         ("https://a.com/2", "COOKIE BANNER\nother article text\nFOOTER"),
         ("https://a.com/3", "COOKIE BANNER\nthird thing entirely"),
         ("https://b.com/1", "COOKIE BANNER\nb content")],
        "url string, text string")
    out = host_boilerplate_lines(pages, min_ratio=0.5, min_pages=2)
    got = {(r["host"], r["line"]): (r["n_pages"], r["host_pages"])
           for r in out.collect()}
    assert got[("a.com", "COOKIE BANNER")] == (3, 3)
    assert got[("a.com", "FOOTER")] == (2, 3)
    # content lines never flagged; b.com has 1 page < min_pages
    assert not any(h == "b.com" for h, _ in got)
    assert ("a.com", "unique content one") not in got


def test_sitemap_urls(spark):
    from ecokg_spark.operators.web import sitemap_urls

    xml = ("<?xml version='1.0'?><urlset>"
           "<url><loc> https://a.com/p1 </loc>"
           "<lastmod>2024-01-02</lastmod></url>"
           "<url><loc>https://a.com/p2</loc></url>"
           "<url><lastmod>2024-05-05</lastmod></url>"   # no loc: dropped
           "</urlset>")
    df = spark.createDataFrame([("a.com", xml)],
                               "host string, sitemap_xml string")
    got = sorted(tuple(r) for r in sitemap_urls(df).collect())
    assert got == [
        ("a.com", "https://a.com/p1", "2024-01-02"),
        ("a.com", "https://a.com/p2", None)]


def test_anchor_texts_attr_order_free(spark):
    from ecokg_spark.operators.web import anchor_texts

    pages = spark.createDataFrame(
        [("https://a.com/1",
          '<a class="nav" href="https://t.org/x">Before Href</a>'
          '<a name="no-href-anchor">Skip Me</a>')],
        "url string, html string",
    ).withColumn("html", F.encode("html", "UTF-8"))
    got = {(r["dst_host"], r["anchor"]) for r in
           anchor_texts(pages, k=5).collect()}
    assert ("t.org", "Before Href") in got
    assert not any(a == "Skip Me" for _, a in got)


def test_canonical_meta_attr_order_free(spark):
    from ecokg_spark.operators.web import canonical_meta

    pages = spark.createDataFrame(
        [("https://a.com/p",
          '<link href="https://a.com/canon" rel="canonical"/>'
          '<meta content="noindex" name="robots">')],
        "url string, html string",
    ).withColumn("html", F.encode("html", "UTF-8"))
    r = canonical_meta(pages).collect()[0]
    assert r["canonical_url"] == "https://a.com/canon"
    assert r["noindex"]


def test_strip_host_boilerplate(spark):
    from ecokg_spark.operators.web import strip_host_boilerplate

    pages = spark.createDataFrame(
        [("https://a.com/1", "BANNER\ncontent one\nFOOTER"),
         ("https://a.com/2", "BANNER\ncontent two\nFOOTER"),
         ("https://a.com/3", "BANNER\nthird content"),
         ("https://b.com/1", "BANNER\nb keeps its banner")],
        "url string, text string")
    got = {r["url"]: r["text"]
           for r in strip_host_boilerplate(pages).collect()}
    assert got["https://a.com/1"] == "content one"
    assert got["https://a.com/2"] == "content two"
    assert got["https://a.com/3"] == "third content"
    # b.com has one page: nothing reaches min_pages, text intact
    assert got["https://b.com/1"] == "BANNER\nb keeps its banner"


def test_strip_host_boilerplate_fully_boilerplate_page(spark):
    from ecokg_spark.operators.web import strip_host_boilerplate

    pages = spark.createDataFrame(
        [("https://a.com/1", "SAME"), ("https://a.com/2", "SAME"),
         ("https://a.com/3", "SAME\nreal content")],
        "url string, text string")
    got = {r["url"]: r["text"]
           for r in strip_host_boilerplate(pages).collect()}
    # pages that were pure boilerplate survive with EMPTY text
    assert got["https://a.com/1"] == "" and got["https://a.com/2"] == ""
    assert got["https://a.com/3"] == "real content"


def test_robots_crawl_delay(spark):
    from ecokg_spark.operators.web import robots_crawl_delay

    txt = ("User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
           "User-agent: ecobot\nUser-agent: otherbot\nCrawl-delay: 0.5\n\n"
           "User-agent: bad\nCrawl-delay: soon")
    df = spark.createDataFrame([("a.com", txt)],
                               "host string, robots_txt string")
    got = sorted(tuple(r) for r in robots_crawl_delay(df).collect())
    assert got == [("a.com", "*", 2.0), ("a.com", "ecobot", 0.5),
                   ("a.com", "otherbot", 0.5)]


def test_robots_allowed_duplicate_rows_preserved(spark):
    """Byte-identical duplicate input rows each keep their verdict —
    output cardinality is exactly the input's (ADVICE r4, web.py
    robots_allowed _rowtag window key)."""
    from ecokg_spark.operators.web import parse_robots, robots_allowed

    rules = parse_robots(spark.createDataFrame(
        [("a.com", ROBOTS_TXT)], "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("https://a.com/private/x",),
         ("https://a.com/private/x",),       # exact duplicate row
         ("https://a.com/public",)],
        "url string")
    out = robots_allowed(urls, rules, agent="randombot").collect()
    assert len(out) == 3
    dup = [r for r in out if r["url"] == "https://a.com/private/x"]
    assert len(dup) == 2
    assert all(r["allowed"] is False and r["matched_path"] == "/private"
               for r in dup)
    assert "_rowtag" not in out[0].asDict()
