"""Sixteenth batch of independent pure-Python cross-checks: the web-graph
extraction family — host link graph, anchor-text mining, canonical URL
dedup, per-domain census, and UT1-style blocklist verdicts."""

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

_RE_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

_SLS = ["co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
        "co.kr", "co.nz"]


def _url_host(u):
    m = re.search(_RE_HOST, u)
    return m.group(1).lower() if m else ""


def _regdom(u):
    host = _url_host(u)
    labels = host.split(".")
    if len(labels) < 2:
        return host
    if ".".join(labels[-2:]) in _SLS and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def _dst_host(link, src_host):
    if re.search("^https?://", link):
        return _url_host(link)
    if link.startswith("//"):
        m = re.search("^//(?:[^/?#@]*@)?([^/?#:]+)", link)
        return m.group(1).lower() if m else ""
    if link == "" or link.startswith("#") or \
            re.search("^(mailto|javascript|data):", link):
        return ""
    return src_host


_LINK = st.sampled_from([
    "http://Other.Example.com/x", "https://news.co.uk/y", "//cdn.Site.org/z",
    "/relative/path", "page.html", "#frag", "mailto:x@y.z",
    "javascript:void(0)", "", "data:text/plain,x",
])
_ANCH = st.sampled_from([
    "Home", "read   more", "Click here", "", "the  site",
])


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.lists(st.tuples(_LINK, _ANCH), max_size=5)),
                min_size=1, max_size=8),
       st.integers(1, 3))
def test_link_graph_and_anchors_match_python(spark, raw, k):
    from ecokg_spark.operators.web import anchor_texts, host_link_graph

    pages = []
    for i, (h, links) in enumerate(raw):
        html = "".join(f'<a class="l" href="{l}">{a}</a><p>x</p>'
                       for l, a in links)
        pages.append((f"http://h{h}.com/p{i}", html))
    df = spark.createDataFrame(pages, "url string, html string")

    got_edges = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"])
                 for r in host_link_graph(df).collect()}
    links_per_edge = Counter()
    pages_per_edge: dict[tuple, set] = {}
    for url, html in pages:
        src = _url_host(url)
        for l in re.findall('href="([^"]*)"', html):
            d = _dst_host(l, src)
            if d and src:
                links_per_edge[(src, d)] += 1
                pages_per_edge.setdefault((src, d), set()).add(url)
    exp_edges = {e: (n, len(pages_per_edge[e]))
                 for e, n in links_per_edge.items()}
    assert got_edges == exp_edges

    got_anchors = {(r["dst_host"], r["anchor"], r["rank"]): r["n"]
                   for r in anchor_texts(df, k=k).collect()}
    counts = Counter()
    for url, html in pages:
        src = _url_host(url)
        for tag in re.findall("(<a [^>]*>[^<]*</a>)", html):
            lm = re.search('href="([^"]*)"', tag)
            link = lm.group(1) if lm else ""
            tm = re.search(">([^<]*)</a>", tag)
            text = re.sub(r"\s+", " ", tm.group(1) if tm else "").strip(" ")
            d = _dst_host(link, src)
            if d and text:
                counts[(d, text)] += 1
    exp_anchors = {}
    for host in {h for h, _ in counts}:
        ranked = sorted(((n, a) for (h, a), n in counts.items()
                         if h == host), key=lambda t: (-t[0], t[1]))
        for rk, (n, a) in enumerate(ranked[:k], start=1):
            exp_anchors[(host, a, rk)] = n
    assert got_anchors == exp_anchors


# ---------------------------------------------------------------------------
# url_dedup — canonical-form collapse with min-id survivor
# ---------------------------------------------------------------------------

_URLS = st.sampled_from([
    "http://WWW.Example.COM:80/A/b?utm_x=1&q=2#frag",
    "http://www.example.com/A/b?q=2",
    "https://Host.co.uk/", "https://host.co.uk",
    "http://a.b.c/?utm_source=x", "http://a.b.c/",
    "notaurl", "http://solo/p",
])


def _canon_py(u):
    m = re.search("^([a-zA-Z][a-zA-Z0-9+.-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    if scheme == "":
        return u
    hp = re.search("^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", u)
    hostport = hp.group(1).lower() if hp else ""
    if scheme == "http":
        hostport = re.sub(":80$", "", hostport)
    if scheme == "https":
        hostport = re.sub(":443$", "", hostport)
    pm = re.search("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = pm.group(1) if pm else ""
    if path == "/":
        path = ""
    qm = re.search(r"\?([^#]*)", u)
    q = "&".join(p for p in (qm.group(1) if qm else "").split("&")
                 if p != "" and not p.startswith("utm_"))
    return f"{scheme}://{hostport}{path}" + (f"?{q}" if q else "")


@settings(max_examples=10, **_S)
@given(st.lists(_URLS, min_size=1, max_size=12))
def test_url_dedup_matches_python_reference(spark, urls):
    from ecokg_spark.operators.web import url_dedup

    rows = [(f"d{i:02d}", u) for i, u in enumerate(urls)]
    df = spark.createDataFrame(rows, "doc_id string, url string")
    got = {r["canonical_url"]: (r["doc_id"], r["n_dups"])
           for r in url_dedup(df).collect()}
    groups: dict[str, list] = {}
    for d, u in rows:
        groups.setdefault(_canon_py(u), []).append(d)
    exp = {c: (min(ds), len(ds)) for c, ds in groups.items()}
    assert got == exp


# ---------------------------------------------------------------------------
# domain_stats + url_blocklist_filter
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_URLS, st.integers(0, 500)),
                min_size=1, max_size=12),
       st.lists(st.sampled_from(["example.com", "a.b.c", "host.co.uk"]),
                max_size=2))
def test_domain_stats_and_blocklist_match_python(spark, rows_in, blocked):
    from ecokg_spark.operators.web import domain_stats, url_blocklist_filter

    rows = [(f"d{i}", u, c) for i, (u, c) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "doc_id string, url string, chars long")
    got = {r["domain"]: (r["n_docs"], r["n_chars"], r["avg_chars"])
           for r in domain_stats(df, chars_col="chars").collect()}
    groups: dict[str, list] = {}
    for _, u, c in rows:
        groups.setdefault(_regdom(u), []).append(c)
    exp = {d: (len(cs), sum(cs), sum(cs) / len(cs))
           for d, cs in groups.items()}
    assert set(got) == set(exp)
    for d, (n, s, a) in exp.items():
        assert got[d][0] == n and got[d][1] == s
        assert abs(got[d][2] - a) < 1e-9

    bdf = spark.createDataFrame([(b, "cat") for b in set(blocked)] or
                                [("none.invalid", "cat")],
                                "domain string, category string")
    out = url_blocklist_filter(df, bdf, path_pattern="/A").collect()
    assert len(out) == len(rows)
    bset = set(blocked) or {"none.invalid"}
    for r in out:
        dom = _regdom(r["url"])
        assert r["domain"] == dom
        pm = re.search("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)",
                       r["url"])
        path = pm.group(1) if pm else ""
        if dom in bset:
            expect = "domain"
        elif re.search("/A", path):
            expect = "path"
        else:
            expect = None
        assert r["block_reason"] == expect, r["url"]
