"""Web-graph and crawl rows: host graph, anchors, redirects, robots, sitemaps, frontier, boilerplate, canonical dedup."""

from __future__ import annotations

from pyspark.sql import functions as F
from ecokg_spark.contract._shared import (
    _SQL_CANONICAL,
    _SQL_REG_DOMAIN,
    _SQL_URL_PARTS,
    _SYNTH_URL_RICH_SQL,
    _synth_url_rich,
    t,
)


def q_url_parse(spark, sf):
    """URL parsing as pure Catalyst expressions (functions/url.py): scheme,
    host, registered domain (public-suffix-aware), path depth, and the
    canonical dedup key — every branch oracle-recomputed in DuckDB with
    the identical RE2-safe regexes."""
    from ecokg_spark.functions.url import (
        url_canonicalize,
        url_host,
        url_path,
        url_path_depth,
        url_registered_domain,
        url_scheme,
    )

    d = t(spark, sf, "documents").withColumn("url", _synth_url_rich())
    return d.select(
        "doc_id",
        "url",
        url_scheme("url").alias("scheme"),
        url_host("url").alias("host"),
        url_registered_domain("url").alias("domain"),
        url_path("url").alias("path"),
        url_path_depth("url").alias("depth"),
        url_canonicalize("url").alias("canonical"),
    )


SQL_URL_PARSE = f"""
WITH u AS (
  SELECT doc_id, {_SYNTH_URL_RICH_SQL} AS url FROM documents
),
p AS (SELECT doc_id, url, {_SQL_URL_PARTS} FROM u)
SELECT doc_id, url, scheme, host,
       {_SQL_REG_DOMAIN} AS domain,
       path,
       CAST(len(list_filter(string_split(path, '/'), s -> s <> ''))
            AS BIGINT) AS depth,
       {_SQL_CANONICAL} AS canonical
FROM p
"""


def q_url_blocklist(spark, sf):
    """UT1-style URL blocklist filtering (operators/web.py
    url_blocklist_filter): broadcast domain blocklist + path keyword regex
    over the rich synthesized URLs; emits the per-document verdict."""
    from ecokg_spark.operators.web import url_blocklist_filter

    d = t(spark, sf, "documents").select("doc_id", "source")
    urls = d.select("doc_id", _synth_url_rich().alias("url"))
    bl = spark.createDataFrame(
        [("src3.co.uk", "adult"), ("src15.co.uk", "gambling"),
         ("unused.example.net", "malware")],
        "domain string, category string",
    )
    out = url_blocklist_filter(urls, bl, "url", path_pattern="/sec1/")
    return out.select("doc_id", "domain", "block_category", "block_reason")


SQL_URL_BLOCKLIST = f"""
WITH u AS (
  SELECT doc_id, {_SYNTH_URL_RICH_SQL} AS url FROM documents
),
p AS (SELECT doc_id, url, {_SQL_URL_PARTS} FROM u),
d AS (
  SELECT doc_id, url, path, {_SQL_REG_DOMAIN} AS domain FROM p
),
bl AS (
  SELECT * FROM (VALUES ('src3.co.uk', 'adult'), ('src15.co.uk', 'gambling'),
                        ('unused.example.net', 'malware'))
       AS t(bl_domain, category)
)
SELECT d.doc_id, d.domain,
       bl.category AS block_category,
       CASE WHEN bl.bl_domain IS NOT NULL THEN 'domain'
            WHEN regexp_matches(d.path, '/sec1/') THEN 'path'
       END AS block_reason
FROM d LEFT JOIN bl ON d.domain = bl.bl_domain
"""


def q_host_graph(spark, sf):
    """Host-level hyperlink graph (operators/web.py host_link_graph):
    pages synthesized from documents with one absolute link, one
    page-relative link, and one mailto (dropped); the oracle recomputes
    the expected host-pair aggregate straight from the generator
    columns — what the href extraction MUST recover."""
    from ecokg_spark.operators.web import host_link_graph

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    html = F.concat(
        F.lit('<html><body><p>'), F.col("text"),
        F.lit('</p><a href="https://site'), F.col("doc_id") % 7,
        F.lit('.example.com/x">abs</a><a href="/local/'), F.col("doc_id"),
        F.lit('">rel</a><a href="mailto:a@b.c">m</a></body></html>'),
    )
    pages = d.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    return host_link_graph(pages, url_col="url", html_col="html")


SQL_HOST_GRAPH = """
WITH l AS (
  SELECT doc_id, source || '.example.org' AS src_host,
         'site' || (doc_id % 7) || '.example.com' AS dst_host
  FROM documents
  UNION ALL
  SELECT doc_id, source || '.example.org', source || '.example.org'
  FROM documents)
SELECT src_host, dst_host,
       COUNT(*) AS n_links,
       COUNT(DISTINCT doc_id) AS n_pages
FROM l GROUP BY src_host, dst_host
"""


def q_anchor_topk(spark, sf):
    """Anchor-text alias mining (operators/web.py anchor_texts): pages
    synthesized from documents with one absolute link (text varies on
    doc_id % 3), one page-relative link with collapsible whitespace, and
    one mailto (dropped); the oracle recomputes the per-destination-host
    top-2 anchors straight from the generator columns."""
    from ecokg_spark.operators.web import anchor_texts

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    html = F.concat(
        F.lit('<html><body><a href="https://site'), F.col("doc_id") % 5,
        F.lit('.example.com/x">Site  '), F.col("doc_id") % 3,
        F.lit('</a><a href="/local/'), F.col("doc_id"),
        F.lit('" class="nav">Local Page</a>'
              '<a href="mailto:a@b.c">mail</a></body></html>'),
    )
    pages = d.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    return anchor_texts(pages, url_col="url", html_col="html", k=2)


SQL_ANCHOR_TOPK = """
WITH a AS (
  SELECT 'site' || (doc_id % 5) || '.example.com' AS dst_host,
         'Site ' || (doc_id % 3) AS anchor
  FROM documents
  UNION ALL
  SELECT source || '.example.org', 'Local Page' FROM documents),
c AS (SELECT dst_host, anchor, COUNT(*) AS n FROM a GROUP BY 1, 2),
r AS (SELECT dst_host, anchor, n,
             ROW_NUMBER() OVER (PARTITION BY dst_host
                                ORDER BY n DESC, anchor ASC) AS rank
      FROM c)
SELECT dst_host, anchor, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 2
"""


def q_redirect_resolve(spark, sf):
    """Redirect-chain resolution by pointer doubling (operators/web.py
    resolve_redirects): hop edges u<id> -> u<id-1> within 20-wide blocks
    (chains up to 19 hops, block heads terminal) plus a planted 2-cycle
    per 500 ids; the oracle walks chains with a set-semantics recursive
    CTE, so cycle members come back unresolved in both engines."""
    from ecokg_spark.operators.web import resolve_redirects

    e = t(spark, sf, "events")
    chain = e.where(F.col("event_id") % 20 != 0).select(
        F.concat(F.lit("u"), F.col("event_id")).alias("src"),
        F.concat(F.lit("u"), F.col("event_id") - 1).alias("dst"),
    )
    cyc_ids = e.where(F.col("event_id") % 500 == 0).select("event_id")
    cycles = cyc_ids.select(
        F.concat(F.lit("c"), F.col("event_id")).alias("src"),
        F.concat(F.lit("d"), F.col("event_id")).alias("dst"),
    ).unionByName(cyc_ids.select(
        F.concat(F.lit("d"), F.col("event_id")).alias("src"),
        F.concat(F.lit("c"), F.col("event_id")).alias("dst"),
    ))
    return resolve_redirects(chain.unionByName(cycles))


SQL_REDIRECT_RESOLVE = """
WITH RECURSIVE m AS (
  SELECT src, MIN(dst) AS dst FROM (
    SELECT 'u' || event_id AS src, 'u' || (event_id - 1) AS dst
    FROM events WHERE event_id % 20 <> 0
    UNION ALL
    SELECT 'c' || event_id, 'd' || event_id FROM events
    WHERE event_id % 500 = 0
    UNION ALL
    SELECT 'd' || event_id, 'c' || event_id FROM events
    WHERE event_id % 500 = 0)
  WHERE src <> dst GROUP BY src),
walk(x, cur) AS (
  SELECT src, dst FROM m
  UNION
  SELECT w.x, m.dst FROM walk w JOIN m ON w.cur = m.src),
term AS (
  SELECT DISTINCT w.x, w.cur FROM walk w
  LEFT JOIN m ON w.cur = m.src WHERE m.src IS NULL)
SELECT m.src, t.cur AS final_url, t.cur IS NOT NULL AS resolved
FROM m LEFT JOIN term t ON m.src = t.x
"""


def q_canonical_meta(spark, sf):
    """Canonical-URL + robots-directive extraction (operators/web.py
    canonical_meta): every third document declares a canonical target,
    every fifth a noindex robots meta; the oracle recomputes the
    verdict columns straight from the generator arithmetic."""
    from ecokg_spark.operators.web import canonical_meta

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    canon_tag = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit('<link rel="canonical" href="https://'),
                 F.col("source"), F.lit(".example.org/c/"),
                 F.col("doc_id") % 100, F.lit('"/>')),
    ).otherwise(F.lit(""))
    robots_tag = (
        F.when(F.col("doc_id") % 5 == 0,
               F.lit('<meta name="robots" content="noindex, follow">'))
        .when(F.col("doc_id") % 2 == 0,
              F.lit('<meta name="robots" content="index, nofollow">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(F.lit("<head>"), canon_tag, robots_tag,
                    F.lit("</head><body>"), F.col("text"),
                    F.lit("</body>"))
    pages = d.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    return canonical_meta(pages).select(
        "url", "canonical_url", "canonical_final", "noindex", "nofollow")


SQL_CANONICAL_META = """
WITH d AS (
  SELECT 'https://' || source || '.example.org/d/' || doc_id AS url,
         CASE WHEN doc_id % 3 = 0
              THEN 'https://' || source || '.example.org/c/' || (doc_id % 100)
              ELSE '' END AS canonical_url,
         doc_id FROM documents)
SELECT url, canonical_url,
       CASE WHEN canonical_url <> '' THEN canonical_url ELSE url END
         AS canonical_final,
       doc_id % 5 = 0 AS noindex,
       doc_id % 5 <> 0 AND doc_id % 2 = 0 AS nofollow
FROM d
"""


def _synth_robots(spark, sf):
    """Per-nation robots.txt corpus: a '*' group (disallow + longer
    allow), a blank line, and an ecobot group whose Disallow is EMPTY for
    even keys (no-restriction rule, must vanish) and a real path for odd
    keys. Shared by robots_rules / robots_check."""
    n = t(spark, sf, "nation")
    k = F.col("n_nationkey")
    txt = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nDisallow: /n"), k,
        F.lit("\nAllow: /n"), k, F.lit("/ok\n\nUser-agent: ecobot\n"),
        F.when(k % 2 == 1, F.concat(F.lit("Disallow: /eco"), k))
         .otherwise(F.lit("Disallow:")),
    )
    return n.select(
        F.concat(F.lit("h"), k, F.lit(".example.org")).alias("host"),
        txt.alias("robots_txt"))


def q_robots_rules(spark, sf):
    """robots.txt parsing (operators/web.py parse_robots): group
    formation, comment stripping, empty-Disallow drop; the oracle
    recomputes the expected rule table straight from the generator
    arithmetic."""
    from ecokg_spark.operators.web import parse_robots

    return parse_robots(_synth_robots(spark, sf))


SQL_ROBOTS_RULES = """
SELECT 'h' || n_nationkey || '.example.org' AS host, '*' AS agent,
       'disallow' AS rule, '/n' || n_nationkey AS path FROM nation
UNION ALL
SELECT 'h' || n_nationkey || '.example.org', '*', 'allow',
       '/n' || n_nationkey || '/ok' FROM nation
UNION ALL
SELECT 'h' || n_nationkey || '.example.org', 'ecobot', 'disallow',
       '/eco' || n_nationkey
FROM nation WHERE n_nationkey % 2 = 1
"""


def q_robots_check(spark, sf):
    """robots permission evaluation (operators/web.py robots_allowed,
    agent without an exact group -> '*' rules): four URL shapes per host
    exercise block, longer-allow override, no-match default, and the
    prefix (no-boundary) matching rule."""
    from ecokg_spark.operators.web import parse_robots, robots_allowed

    rules = parse_robots(_synth_robots(spark, sf))
    d = t(spark, sf, "documents")
    k = F.col("doc_id") % 25
    path = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/n"), k))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("/n"), k, F.lit("/ok/page")))
        .when(F.col("doc_id") % 4 == 2, F.lit("/other"))
        .otherwise(F.concat(F.lit("/n"), k, F.lit("x")))
    )
    urls = d.select(
        "doc_id",
        F.concat(F.lit("https://h"), k, F.lit(".example.org"), path)
         .alias("url"))
    out = robots_allowed(urls, rules, agent="randombot")
    return out.select("doc_id", "url", "allowed", "matched_rule",
                      "matched_path")


SQL_ROBOTS_CHECK = """
WITH u AS (
  SELECT doc_id, doc_id % 25 AS k, doc_id % 4 AS m FROM documents)
SELECT doc_id,
       'https://h' || k || '.example.org' ||
         CASE m WHEN 0 THEN '/n' || k
                WHEN 1 THEN '/n' || k || '/ok/page'
                WHEN 2 THEN '/other'
                ELSE '/n' || k || 'x' END AS url,
       CASE m WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN TRUE
              ELSE FALSE END AS allowed,
       CASE m WHEN 0 THEN 'disallow' WHEN 1 THEN 'allow'
              WHEN 3 THEN 'disallow' END AS matched_rule,
       CASE m WHEN 0 THEN '/n' || k WHEN 1 THEN '/n' || k || '/ok'
              WHEN 3 THEN '/n' || k END AS matched_path
FROM u
"""


def q_web_canonical_dedup(spark, sf):
    """Composed crawl-normalization chain: canonical_meta verdicts ->
    noindex drop -> redirect resolution over the declared canonical
    edges (pointer doubling collapses canonical-of-canonical chains) ->
    exact dedup on the final landing URL with min-doc_id survivor and
    collapse counts. Each stage is individually certified
    (canonical_meta / redirect_resolve / exact-dedup family); this row
    certifies the composition. Canonical targets point at OTHER
    documents' URLs (doc_id -> doc_id div 10 * 10), so chains are 2
    hops deep and every block of 10 docs collapses onto its head."""
    from ecokg_spark.operators.web import canonical_meta, resolve_redirects

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://w"), F.col("doc_id") % 7,
                   F.lit(".example.org/d/"), F.col("doc_id"))
    canon_target = F.concat(
        F.lit("https://w"), (F.expr("doc_id div 10 * 10")) % 7,
        F.lit(".example.org/d/"), F.expr("doc_id div 10 * 10"))
    canon_tag = F.when(
        F.col("doc_id") % 10 != 0,
        F.concat(F.lit('<link rel="canonical" href="'), canon_target,
                 F.lit('"/>')),
    ).otherwise(F.lit(""))
    robots_tag = F.when(
        F.col("doc_id") % 50 == 3,
        F.lit('<meta name="robots" content="noindex">')).otherwise(F.lit(""))
    html = F.concat(F.lit("<head>"), canon_tag, robots_tag,
                    F.lit("</head>"))
    pages = d.select(F.col("doc_id"), url.alias("url"),
                     F.encode(html, "UTF-8").alias("html"))
    meta = canonical_meta(pages)
    kept = meta.where(~F.col("noindex"))
    edges = kept.where(F.col("canonical_url") != "").select(
        F.col("url").alias("src"), F.col("canonical_url").alias("dst"))
    resolved = resolve_redirects(edges)
    final = (
        kept.join(resolved, kept["url"] == resolved["src"], "left")
        .select(
            "doc_id",
            F.coalesce("final_url", F.col("canonical_final"))
            .alias("landing_url"),
        )
    )
    return final.groupBy("landing_url").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_collapsed"),
    )


SQL_WEB_CANONICAL_DEDUP = """
WITH d AS (
  SELECT doc_id,
         'https://w' || (doc_id % 7) || '.example.org/d/' || doc_id AS url,
         'https://w' || ((doc_id // 10 * 10) % 7) || '.example.org/d/'
           || (doc_id // 10 * 10) AS canon,
         doc_id % 10 <> 0 AS has_canon,
         doc_id % 50 = 3 AS noindex
  FROM documents),
kept AS (SELECT * FROM d WHERE NOT noindex),
-- every declared canonical points at the block head (doc_id div 10*10),
-- whose own page declares NO canonical -> chains resolve in one hop
landed AS (
  SELECT doc_id, CASE WHEN has_canon THEN canon ELSE url END AS landing_url
  FROM kept)
SELECT landing_url, MIN(doc_id) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_collapsed
FROM landed GROUP BY landing_url
"""


def q_surt_keys(spark, sf):
    """SURT web-archive keys (functions/url.py url_surt): reversed
    comma-joined host labels + lowercased path, www-stripped — the CDX
    index key; the oracle recomputes it from the generator columns."""
    from ecokg_spark.functions.url import url_surt

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://www."), F.col("source"),
                   F.lit(".example.org/D/"), F.col("doc_id"),
                   F.lit("?utm_source=x"))
    u = d.select("doc_id", url.alias("url"))
    return u.select("doc_id", "url", url_surt("url").alias("surt"))


SQL_SURT_KEYS = """
SELECT doc_id,
       'https://www.' || source || '.example.org/D/' || doc_id
         || '?utm_source=x' AS url,
       'org,example,' || source || ')/d/' || doc_id AS surt
FROM documents
"""


def q_crawl_frontier(spark, sf):
    """Politeness-capped frontier selection (operators/web.py
    crawl_frontier): authority = weighted in-degree of the crawled-set
    host graph; crawled candidates anti-joined away; per-host cap 3 by
    md5 order. The oracle recomputes every stage from the generator
    arithmetic."""
    from ecokg_spark.operators.web import crawl_frontier

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://s"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    html = F.concat(
        F.lit('<a href="https://site'), F.col("doc_id") % 7,
        F.lit('.example.com/x">l</a><a href="/local/'), F.col("doc_id"),
        F.lit('">r</a>'))
    pages = d.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    cand_new = d.where(F.col("doc_id") % 3 == 0).select(
        F.concat(F.lit("https://site"), F.col("doc_id") % 7,
                 F.lit(".example.com/new/"), F.col("doc_id")).alias("url"))
    cand_dup = d.where(F.col("doc_id") % 9 == 0).select(url.alias("url"))
    return crawl_frontier(pages, cand_new.unionByName(cand_dup),
                          per_host=3)


SQL_CRAWL_FRONTIER = """
WITH crawled AS (
  SELECT 'https://s' || source || '.example.org/d/' || doc_id AS url,
         doc_id, source
  FROM documents),
auth AS (
  SELECT 'site' || (doc_id % 7) || '.example.com' AS host,
         COUNT(DISTINCT doc_id) AS a
  FROM documents GROUP BY 1
  UNION ALL
  SELECT 's' || source || '.example.org', COUNT(DISTINCT doc_id)
  FROM documents GROUP BY source),
cand AS (
  SELECT 'https://site' || (doc_id % 7) || '.example.com/new/' || doc_id
           AS url,
         'site' || (doc_id % 7) || '.example.com' AS host
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT url, 's' || source || '.example.org' FROM crawled
  WHERE doc_id % 9 = 0),
uncrawled AS (
  SELECT c.url, c.host FROM cand c
  WHERE c.url NOT IN (SELECT url FROM crawled)),
ranked AS (
  SELECT u.url, u.host, COALESCE(a.a, 0) AS authority,
         ROW_NUMBER() OVER (PARTITION BY u.host
                            ORDER BY md5(u.url), u.url) AS rank
  FROM uncrawled u LEFT JOIN auth a ON a.host = u.host)
SELECT url, host, CAST(authority AS BIGINT) AS authority,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_host_boilerplate(spark, sf):
    """Per-host boilerplate lines (operators/web.py
    host_boilerplate_lines): pages synthesized per source host with a
    host-wide banner on every page, a footer on even pages, and the
    document text as the unique line; the oracle recomputes the flagged
    set from the generator arithmetic."""
    from ecokg_spark.operators.web import host_boilerplate_lines

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    text = F.concat(
        F.lit("BANNER "), F.col("source"), F.lit("\n"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("FOOTER "), F.col("source"), F.lit("\n")))
         .otherwise(F.lit("")),
        F.col("text"))
    pages = d.select(url.alias("url"), text.alias("text"))
    return host_boilerplate_lines(pages, min_ratio=0.4, min_pages=2)


SQL_HOST_BOILERPLATE = """
WITH hp AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS host_pages,
         CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS even_pages
  FROM documents GROUP BY source),
cand AS (
  SELECT source || '.example.org' AS host, 'BANNER ' || source AS line,
         host_pages AS n_pages, host_pages FROM hp
  UNION ALL
  SELECT source || '.example.org', 'FOOTER ' || source,
         even_pages, host_pages FROM hp)
SELECT host, line, n_pages, host_pages,
       ROUND(CAST(n_pages AS DOUBLE) / host_pages, 6) AS ratio
FROM cand
WHERE n_pages >= 2
  AND ROUND(CAST(n_pages AS DOUBLE) / host_pages, 6) >= 0.4
"""


def q_sitemap_urls(spark, sf):
    """Sitemap extraction (operators/web.py sitemap_urls): one sitemap
    per source host listing each document, lastmod present on every
    third entry; the oracle recomputes the (host, url, lastmod) table
    from the generator columns."""
    from ecokg_spark.operators.web import sitemap_urls

    d = t(spark, sf, "documents")
    entry = F.concat(
        F.lit("<url><loc>https://"), F.col("source"),
        F.lit(".example.org/d/"), F.col("doc_id"), F.lit("</loc>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("<lastmod>2024-01-"),
                        F.lpad((F.col("doc_id") % 28 + 1).cast("string"),
                               2, "0"),
                        F.lit("</lastmod>"))).otherwise(F.lit("")),
        F.lit("</url>"))
    maps = (
        d.groupBy("source")
        .agg(F.concat(F.lit("<urlset>"),
                      F.array_join(F.array_sort(F.collect_list(entry)), ""),
                      F.lit("</urlset>")).alias("sitemap_xml"))
        .select(F.concat(F.col("source"), F.lit(".example.org"))
                .alias("host"), "sitemap_xml")
    )
    return sitemap_urls(maps)


SQL_SITEMAP_URLS = """
SELECT source || '.example.org' AS host,
       'https://' || source || '.example.org/d/' || doc_id AS url,
       CASE WHEN doc_id % 3 = 0
            THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
       END AS lastmod
FROM documents
"""


def q_strip_boilerplate(spark, sf):
    """Boilerplate stripping end to end (operators/web.py
    strip_host_boilerplate over the host_boilerplate fixture): banners
    and even-page footers vanish, document content survives; the oracle
    replays the threshold rule INCLUDING the document-text lines (a
    same-source exact-duplicate text that clears the threshold must
    strip in both engines)."""
    from ecokg_spark.operators.web import strip_host_boilerplate

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    text = F.concat(
        F.lit("BANNER "), F.col("source"), F.lit("\n"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("FOOTER "), F.col("source"), F.lit("\n")))
         .otherwise(F.lit("")),
        F.col("text"))
    pages = d.select(url.alias("url"), text.alias("text"))
    return strip_host_boilerplate(pages, min_ratio=0.4, min_pages=2)


SQL_STRIP_BOILERPLATE = """
WITH hp AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
  GROUP BY source),
docline AS (
  SELECT source, trim(text) AS line, COUNT(DISTINCT doc_id) AS np
  FROM documents GROUP BY 1, 2),
flagged_doc AS (
  SELECT d.source, d.line FROM docline d JOIN hp USING (source)
  WHERE d.np >= 2 AND ROUND(CAST(d.np AS DOUBLE) / hp.n, 6) >= 0.4)
SELECT 'https://' || d.source || '.example.org/d/' || d.doc_id AS url,
       CASE WHEN EXISTS (SELECT 1 FROM flagged_doc f
                         WHERE f.source = d.source
                           AND f.line = trim(d.text))
            THEN '' ELSE d.text END AS text
FROM documents d
"""


def q_recrawl_priority(spark, sf):
    """Cho-Garcia-Molina recrawl scheduling (operators/temporal.py
    recrawl_priority): per-user event history as the observation log,
    clicks as the change signal, a FIXED scheduling instant (the job is
    replayable — no clock reads); lambda and priority rounded before
    comparison."""
    from ecokg_spark.operators.temporal import recrawl_priority

    e = t(spark, sf, "events")
    h = e.select(
        "user_id", "ts",
        (F.col("event_type") == "click").alias("changed"))
    return recrawl_priority(h, "user_id", "ts", "changed",
                            "2024-12-31 00:00:00")


SQL_RECRAWL_PRIORITY = """
WITH agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_changes,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 86400000000.0 AS span,
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id),
lam AS (
  SELECT user_id, n_obs, n_changes,
         ROUND(CASE WHEN span > 0 THEN n_changes / span ELSE 1.0 END, 6)
           AS lambda_per_day,
         (epoch_us(TIMESTAMP '2024-12-31 00:00:00') - epoch_us(last_ts))
           / 86400000000.0 AS age
  FROM agg)
SELECT user_id, n_obs, n_changes, lambda_per_day,
       ROUND(1.0 - exp(-lambda_per_day * age), 6) AS priority
FROM lam
"""


def q_crawl_lifecycle(spark, sf):
    """Capstone crawl-lifecycle composition: sitemap seeds ->
    robots gate ('*' group, Disallow /d/3 prefix) -> already-crawled
    anti-join + authority-ranked politeness-capped frontier. Every
    stage is individually certified (sitemap_urls / robots_rules /
    robots_check / crawl_frontier); this row certifies the chain. The
    oracle replays the whole lifecycle as generator arithmetic (the
    /d/3 prefix rule becomes doc_id LIKE '3%')."""
    from ecokg_spark.operators.web import (
        crawl_frontier,
        parse_robots,
        robots_allowed,
        sitemap_urls,
    )

    d = t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/d/"), F.col("doc_id"))
    # 1. sitemap seeds, one sitemap per source host
    entry = F.concat(F.lit("<url><loc>"), url, F.lit("</loc></url>"))
    maps = (d.groupBy("source")
            .agg(F.concat(F.lit("<urlset>"),
                          F.array_join(F.array_sort(F.collect_list(entry)),
                                       ""),
                          F.lit("</urlset>")).alias("sitemap_xml"))
            .select(F.concat(F.col("source"), F.lit(".example.org"))
                    .alias("host"), "sitemap_xml"))
    seeds = sitemap_urls(maps).select("url")
    # 2. robots gate
    robots = d.select("source").distinct().select(
        F.concat(F.col("source"), F.lit(".example.org")).alias("host"),
        F.lit("User-agent: *\nDisallow: /d/3").alias("robots_txt"))
    rules = parse_robots(robots)
    allowed = (robots_allowed(seeds, rules, agent="ecocrawler")
               .where(F.col("allowed")).select("url"))
    # 3. crawled set (every 5th doc) with one outbound link each
    html = F.concat(F.lit('<a href="https://src'),
                    (F.col("doc_id") * 7) % 20,
                    F.lit('.example.org/x">l</a>'))
    crawled = d.where(F.col("doc_id") % 5 == 0).select(
        url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    # 4. frontier: authority-ranked, per-host cap 3
    return crawl_frontier(crawled, allowed, per_host=3)


SQL_CRAWL_LIFECYCLE = """
WITH seeds AS (
  SELECT doc_id, source,
         'https://' || source || '.example.org/d/' || doc_id AS url
  FROM documents),
allowed AS (
  SELECT * FROM seeds
  WHERE CAST(doc_id AS VARCHAR) NOT LIKE '3%'),
uncrawled AS (
  SELECT * FROM allowed WHERE doc_id % 5 <> 0),
auth AS (
  SELECT 'src' || ((doc_id * 7) % 20) || '.example.org' AS host,
         COUNT(DISTINCT doc_id) AS a
  FROM documents WHERE doc_id % 5 = 0 GROUP BY 1),
ranked AS (
  SELECT u.url, u.source || '.example.org' AS host,
         COALESCE(a.a, 0) AS authority,
         ROW_NUMBER() OVER (PARTITION BY u.source
                            ORDER BY md5(u.url), u.url) AS rank
  FROM uncrawled u
  LEFT JOIN auth a ON a.host = u.source || '.example.org')
SELECT url, host, CAST(authority AS BIGINT) AS authority,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_robots_delay(spark, sf):
    """Crawl-delay extraction (operators/web.py robots_crawl_delay):
    a '*' group with delay n_nationkey % 5 + 1 and an ecobot group with
    a fractional delay on odd keys / a non-numeric value on even keys
    (dropped via try_cast); the oracle recomputes the table from the
    generator arithmetic."""
    from ecokg_spark.operators.web import robots_crawl_delay

    n = t(spark, sf, "nation")
    k = F.col("n_nationkey")
    txt = F.concat(
        F.lit("User-agent: *\nCrawl-delay: "), (k % 5 + 1),
        F.lit("\nDisallow: /x\n\nUser-agent: ecobot\nCrawl-delay: "),
        F.when(k % 2 == 1, F.lit("0.5")).otherwise(F.lit("soon")),
    )
    robots = n.select(
        F.concat(F.lit("h"), k, F.lit(".example.org")).alias("host"),
        txt.alias("robots_txt"))
    return robots_crawl_delay(robots)


SQL_ROBOTS_DELAY = """
SELECT 'h' || n_nationkey || '.example.org' AS host, '*' AS agent,
       CAST(n_nationkey % 5 + 1 AS DOUBLE) AS delay_s
FROM nation
UNION ALL
SELECT 'h' || n_nationkey || '.example.org', 'ecobot', 0.5
FROM nation WHERE n_nationkey % 2 = 1
"""
