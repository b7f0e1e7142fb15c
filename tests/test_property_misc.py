"""Seventeenth batch of independent pure-Python cross-checks: multimodal
header metadata (planted-dims arithmetic + hashlib sha256), canonical-URL/
robots-meta extraction, sitemap parsing, crawl-delay group walk, and the
CURIE expression family (reference transform_utils semantics)."""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# extract_media_meta — header parse must recover the planted dimensions
# ---------------------------------------------------------------------------

def test_media_meta_matches_planted_arithmetic(spark):
    from ecokg_spark.operators.multimodal import (extract_media_meta,
                                                  synth_image_payload,
                                                  with_synth_image_payload)

    ids = list(range(0, 200, 7)) + [1, 2, 3]
    df = with_synth_image_payload(
        spark.createDataFrame([(i, "image") for i in ids],
                              "media_id long, kind string"))
    got = {r["media_id"]: (r["byte_len"], r["sha256"], r["width"],
                           r["height"], r["n_channels"])
           for r in extract_media_meta(df).collect()}
    for i in ids:
        payload = synth_image_payload(i)
        if i % 3 == 0:
            w, h, ch = i % 64 + 1, (i * 7) % 64 + 1, 3
        elif i % 3 == 1:
            w, h, ch = i % 64 + 5, i % 32 + 2, 3
        else:
            w, h, ch = (i * 3) % 64 + 1, i % 64 + 9, 3
        assert got[i] == (len(payload),
                          hashlib.sha256(payload).hexdigest(), w, h, ch)


# ---------------------------------------------------------------------------
# canonical_meta — tag capture with free attribute order
# ---------------------------------------------------------------------------

_CANON = st.sampled_from([
    '<link rel="canonical" href="http://x.com/c">',
    '<link href="http://y.com/first" rel="canonical">',
    '<link rel="stylesheet" href="http://z.com/s.css">', "",
])
_ROBOTS = st.sampled_from([
    '<meta name="robots" content="noindex, nofollow">',
    '<meta content="INDEX, FOLLOW" name="robots">',
    '<meta name="robots" content="noindexx">',
    '<meta name="viewport" content="width=1">', "",
])


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(_CANON, _ROBOTS), min_size=1, max_size=8))
def test_canonical_meta_matches_python_reference(spark, pieces):
    from ecokg_spark.operators.web import canonical_meta

    pages = [(f"http://h.com/p{i}", f"<html>{c}{r}</html>")
             for i, (c, r) in enumerate(pieces)]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {r["url"]: (r["canonical_url"], r["canonical_final"],
                      r["noindex"], r["nofollow"])
           for r in canonical_meta(df).collect()}
    for url, html in pages:
        tag = re.search('(<link[^>]*rel="canonical"[^>]*>)', html)
        canon = ""
        if tag:
            hm = re.search('href="([^"]*)"', tag.group(1))
            canon = hm.group(1) if hm else ""
        rtag = re.search('(<meta[^>]*name="robots"[^>]*>)', html)
        robots = ""
        if rtag:
            cm = re.search('content="([^"]*)"', rtag.group(1))
            robots = (cm.group(1) if cm else "").lower()
        noindex = bool(re.search("(^|[ ,])noindex([ ,]|$)", robots))
        nofollow = bool(re.search("(^|[ ,])nofollow([ ,]|$)", robots))
        final = canon if canon != "" else url
        assert got[url] == (canon, final, noindex, nofollow)


# ---------------------------------------------------------------------------
# sitemap_urls — <url> block extraction, optional lastmod
# ---------------------------------------------------------------------------

_SMENTRY = st.sampled_from([
    "<url><loc>http://s.com/a</loc></url>",
    "<url><loc> http://s.com/b </loc><lastmod>2024-01-02</lastmod></url>",
    "<url><loc>http://s.com/c</loc>\n<lastmod>\n2023-12-31\n</lastmod></url>",
    "<url><lastmod>2024-05-05</lastmod></url>",
    "<url><loc></loc></url>", "<junk/>",
])


@settings(max_examples=12, **_S)
@given(st.lists(_SMENTRY, min_size=0, max_size=6))
def test_sitemap_urls_match_python_reference(spark, entries):
    from collections import Counter

    from ecokg_spark.operators.web import sitemap_urls

    xml = "<urlset>" + "\n".join(entries) + "</urlset>"
    df = spark.createDataFrame([("h.com", xml)],
                               "host string, sitemap_xml string")
    got = Counter((r["host"], r["url"], r["lastmod"])
                  for r in sitemap_urls(df).collect())
    exp = Counter()
    for block in re.findall("(?s)(<url>.*?</url>)", xml):
        lm = re.search(r"<loc>\s*([^<]*?)\s*</loc>", block)
        loc = lm.group(1) if lm else ""
        mm = re.search(r"<lastmod>\s*([^<]*?)\s*</lastmod>", block)
        lastmod = mm.group(1) if mm and mm.group(1) != "" else None
        if loc != "":
            exp[("h.com", loc, lastmod)] += 1
    assert got == exp


# ---------------------------------------------------------------------------
# robots_crawl_delay — UA-group walk with try_cast numeric gate
# ---------------------------------------------------------------------------

_CDLINE = st.sampled_from([
    "User-agent: *", "User-agent: EcoBot", "Crawl-delay: 5",
    "Crawl-delay: 2.5", "Crawl-delay: soon", "Disallow: /a",
    "# comment", "", "crawl-DELAY: 10 # inline",
])


@settings(max_examples=12, **_S)
@given(st.lists(_CDLINE, min_size=0, max_size=10))
def test_robots_crawl_delay_matches_python_reference(spark, lines):
    from collections import Counter

    from ecokg_spark.operators.web import robots_crawl_delay

    txt = "\n".join(lines)
    df = spark.createDataFrame([("h.com", txt)],
                               "host string, robots_txt string")
    got = Counter((r["host"], r["agent"], r["delay_s"])
                  for r in robots_crawl_delay(df).collect())

    entries = []
    for raw in txt.split("\n"):
        line = re.sub(r"#.*$", "", raw).strip()
        m = re.match(r"^([A-Za-z-]+)\s*:", line)
        key = m.group(1).lower() if m else ""
        if key not in ("user-agent", "crawl-delay"):
            continue
        mv = re.match(r"^[A-Za-z-]+\s*:\s*(.*)$", line)
        entries.append((key, mv.group(1).strip()))
    exp = Counter()
    grp, prev_ua = 0, False
    agents: dict[int, list] = {}
    delays: dict[int, list] = {}
    for key, val in entries:
        is_ua = key == "user-agent"
        if is_ua and not prev_ua:
            grp += 1
        if is_ua:
            agents.setdefault(grp, []).append(val.lower())
        else:
            try:
                delays.setdefault(grp, []).append(float(val))
            except ValueError:
                pass
        prev_ua = is_ua
    for g, ags in agents.items():
        for a in ags:
            for d in delays.get(g, []):
                exp[("h.com", a, d)] += 1
    assert got == exp


# ---------------------------------------------------------------------------
# CURIE family — reference transform_utils semantics
# ---------------------------------------------------------------------------

_CURIES = st.sampled_from([
    "GO:0001", "UniProtKB:P12345-2", "uniprotkb:Q9-10", "ComplexPortal:C1",
    "noprefix", "A:b:c", "UniProtKB:P1", "X:-1", ":", "",
])


@settings(max_examples=12, **_S)
@given(st.lists(_CURIES, min_size=1, max_size=10))
def test_curie_family_matches_python_reference(spark, ids):
    from ecokg_spark.functions.curie import (collapse_uniprot_curie,
                                             curie_local, curie_prefix,
                                             guess_bl_category)

    rows = [(f"r{i}", c) for i, c in enumerate(ids)]
    df = spark.createDataFrame(rows, "rid string, curie string")
    got = {r["rid"]: (r["p"], r["l"], r["cat"], r["coll"])
           for r in df.select(
               "rid",
               curie_prefix("curie").alias("p"),
               curie_local("curie").alias("l"),
               guess_bl_category("curie").alias("cat"),
               collapse_uniprot_curie("curie").alias("coll")).collect()}
    for rid, c in rows:
        prefix = c.split(":")[0] if ":" in c else c
        local = re.sub("^[^:]*:", "", c)
        if prefix in ("UniProtKB", "ComplexPortal"):
            cat = "biolink:Protein"
        elif prefix == "GO":
            cat = "biolink:OntologyClass"
        else:
            cat = "biolink:NamedThing"
        coll = re.sub(r"-\d+$", "", c) if re.match("(?i)^uniprotkb:", c) \
            else c
        assert got[rid] == (prefix, local, cat, coll), c
