"""Web-corpus operators: exact URL dedup and per-domain aggregation.

Beyond-reference surface (the reference ingests curated dumps and never
sees URLs); these are the standard first passes of a CommonCrawl-scale
training-data pipeline. Both are single hash aggregates on keys that are
uniform by construction (canonical URL / registered domain), so they hold
at 100 TB: the map-side partial collapses duplicate URLs where they are
read, and domain skew (a giant site) is bounded because every aggregate
here is algebraic (count/sum/avg) — no collect_list, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecokg_spark.functions.url import (
    url_canonicalize,
    url_host,
    url_registered_domain,
)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact URL dedup on the canonical form (fragment/utm/default-port
    stripped, host lowercased): one survivor per canonical URL with a
    deterministic min-id pick, plus the collapse count.

    Returns (canonical_url, id_col = min id, n_dups).
    """
    return (
        df.select(
            url_canonicalize(url_col).alias("canonical_url"), F.col(id_col)
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    chars_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain corpus census: document count and (when a
    length column is given) total/mean characters — the table a domain
    blocklist or a per-site sampling policy is built from.

    Returns (domain, n_docs[, n_chars, avg_chars]).
    """
    keyed = df.select(
        url_registered_domain(url_col).alias("domain"),
        F.col(id_col),
        *([F.col(chars_col)] if chars_col else []),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    if chars_col:
        aggs += [
            F.sum(chars_col).cast("long").alias("n_chars"),
            F.avg(chars_col).alias("avg_chars"),
        ]
    return keyed.groupBy("domain").agg(*aggs)


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    path_pattern: str | None = None,
) -> DataFrame:
    """UT1-style URL filtering (the Université Toulouse 1 blocklist is the
    standard seed list in published web-curation pipelines, e.g. RefinedWeb):
    a document is blocked when its REGISTERED DOMAIN appears in the
    blocklist, or (optionally) when its path matches ``path_pattern``
    (an RE2-safe regex for keyword lists like adult/gambling slugs).

    ``blocklist`` is a (domain, category) DataFrame — list-sized, so it is
    broadcast: the domain check is a map-side left join, no corpus shuffle.
    Path matching is a pure Catalyst ``rlike`` on the parsed path.

    Returns ``df`` plus (domain, block_category, block_reason) where
    block_reason ∈ {'domain', 'path', NULL}; filter ``block_reason IS
    NULL`` to keep. Emitting the verdict instead of dropping keeps the
    audit trail (why a page was removed) — the same pattern as pii_redact.
    """
    bl = F.broadcast(
        blocklist.select(
            F.col("domain").alias("_bl_domain"),
            F.col("category").alias("block_category"),
        ).dropDuplicates(["_bl_domain"])
    )
    keyed = df.withColumn("domain", url_registered_domain(url_col))
    joined = keyed.join(bl, keyed["domain"] == bl["_bl_domain"], "left")
    reason = F.when(F.col("_bl_domain").isNotNull(), F.lit("domain"))
    if path_pattern:
        from ecokg_spark.functions.url import url_path

        reason = reason.when(
            url_path(url_col).rlike(path_pattern), F.lit("path")
        )
    return joined.withColumn("block_reason", reason).drop("_bl_domain")


def _resolve_dst_host(link, src_host):
    """Destination HOST for one extracted link (RFC 3986, host granularity
    only): absolute http(s) links use their own host; protocol-relative
    ``//host/path`` links the embedded host; empty / fragment / mailto: /
    javascript: / data: targets resolve to '' (dropped by callers); any
    other link is page-relative and resolves to the page's own host.
    Shared by host_link_graph and anchor_texts so both agree on the graph.
    """
    return (
        F.when(link.rlike("^https?://"), url_host(link))
        .when(
            link.startswith("//"),
            F.lower(F.regexp_extract(link, "^//(?:[^/?#@]*@)?([^/?#:]+)", 1)),
        )
        .when(
            (link == "")
            | link.startswith("#")
            | link.rlike("^(mailto|javascript|data):"),
            F.lit(""),
        )
        .otherwise(src_host)
    )


def host_link_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Host-level hyperlink graph — the CommonCrawl-webgraph artifact a
    web-scale KG build starts from (host ranking, seed selection, spam
    neighborhoods). Extracts double-quoted ``href="..."`` targets from
    the raw HTML, resolves each to a destination HOST, and aggregates to
    one edge per (src_host, dst_host).

    Resolution (RFC 3986, host granularity only):
    absolute http(s) links use their own host; protocol-relative
    ``//host/path`` links use the embedded host; any other non-empty
    link that is not a fragment / mailto: / javascript: / data: target
    is page-relative and resolves to the page's own host. Links are
    NOT deduplicated within a page — n_links is total anchor count,
    n_pages the distinct linking pages.

    Everything is pure Catalyst (regexp_extract_all + explode + one
    aggregate), so at corpus scale the anchor fanout pipelines with the
    scan and the only shuffle is the (src_host, dst_host) aggregate —
    map-side partials absorb the Zipf head (a hot host pair is still one
    reducer key, but its input is pre-combined per task). n_pages is a
    distinct-count; Spark's two-phase partial aggregation keeps the
    per-page distinct on the map side.

    Returns (src_host, dst_host, n_links, n_pages).
    """
    h = F.col(html_col).cast("string")
    links = F.regexp_extract_all(h, F.lit('href="([^"]*)"'), 1)
    exploded = pages.select(
        url_host(url_col).alias("src_host"),
        F.col(url_col).alias("_page"),
        F.explode(links).alias("_link"),
    )
    dst = _resolve_dst_host(F.col("_link"), F.col("src_host"))
    resolved = exploded.select(
        "src_host", "_page", dst.alias("dst_host")
    ).where((F.col("dst_host") != "") & (F.col("src_host") != ""))
    return resolved.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("_page").cast("long").alias("n_pages"),
    )


def anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    k: int = 3,
) -> DataFrame:
    """Top-k anchor strings per destination HOST — the classic web-KG
    alias-mining pass: the texts other pages use when linking to a site
    are high-precision surface forms for the entity behind it (the same
    signal search engines and entity linkers mine from anchor logs; the
    output feeds build_termlist as an extra alias source).

    Extraction is pure Catalyst: regexp_extract_all pulls whole
    ``<a ...>text</a>`` elements (double-quoted href anywhere in the
    attribute list, no nested markup inside the anchor — the
    host_link_graph extraction contract), then per-element
    regexp_extract splits href and text, whitespace is collapsed, and
    the destination host resolves via the shared _resolve_dst_host rule.
    Empty anchors, href-less anchors, and dropped schemes vanish before
    the aggregate.

    Scale shape: anchor fanout pipelines with the scan (no shuffle until
    the aggregate); one (dst_host, anchor) count aggregate with map-side
    partials, then a per-host row_number over (n DESC, anchor ASC) whose
    rank<=k filter hits Spark's WindowGroupLimit partial top-k — no
    full-host sort materializes. Hot hosts (everyone links to the same
    homepage with "home") are single reducer keys, but their inputs are
    pre-combined per task by the count partial.

    Returns (dst_host, anchor, n, rank), rank 1..k per host.
    """
    h = F.col(html_col).cast("string")
    anchors = F.regexp_extract_all(
        h, F.lit('(<a [^>]*>[^<]*</a>)'), 1)
    exploded = pages.select(
        url_host(url_col).alias("src_host"),
        F.explode(anchors).alias("_a"),
    )
    # href extracted from the captured tag, so attribute ORDER is free
    # (<a class="x" href="..."> works); anchors with no href at all
    # yield link='' which _resolve_dst_host maps to '' -> dropped
    link = F.regexp_extract(F.col("_a"), 'href="([^"]*)"', 1)
    text = F.trim(F.regexp_replace(
        F.regexp_extract(F.col("_a"), '>([^<]*)</a>', 1), r"\s+", " "))
    resolved = exploded.select(
        _resolve_dst_host(link, F.col("src_host")).alias("dst_host"),
        text.alias("anchor"),
    ).where((F.col("dst_host") != "") & (F.col("anchor") != ""))
    counts = resolved.groupBy("dst_host", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n").desc(), F.col("anchor").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Resolve URL redirect chains to their final target — the crawl-
    frontier normalization pass (a CommonCrawl-scale corpus carries
    millions of 301/302 hops; dedup and link-graph construction must key
    on the FINAL landing URL, not the hop). Returns one row per distinct
    redirect source: (src_col, final_url, resolved). Chains ending at a
    non-redirecting URL resolve to it; sources whose chain enters a cycle
    get final_url NULL and resolved false (there IS no landing page).

    Conflicting multi-target sources collapse deterministically to the
    MIN destination before resolution; exact self-redirects are dropped
    (a URL that 301s to itself is a terminal, not a hop).

    Scale shape: POINTER DOUBLING — each round left-joins the compressed
    map with itself, so round r jumps 2^r hops and ``max_rounds`` = 16
    covers 65k-hop chains (real redirect chains are < 10; browsers cap at
    ~20). Each round is ONE self-equi-join shuffle, localCheckpoint'ed to
    keep the plan a leaf; the loop exits as soon as no row still points
    at a redirecting URL, so acyclic inputs stop after ~log2(max chain)
    rounds. Rows stuck in cycles keep the loop alive to the cap — the
    cap is the cycle detector, not a correctness bound.
    """
    m = (
        redirects.select(F.col(src_col).alias("x"), F.col(dst_col).alias("cur"))
        .where(F.col("x") != F.col("cur"))
        .groupBy("x")
        .agg(F.min("cur").alias("cur"))
        .localCheckpoint()
    )
    p = m
    for _ in range(max_rounds):
        hop = p.select(F.col("x").alias("_k"), F.col("cur").alias("_v"))
        stepped = (
            p.join(hop, p["cur"] == hop["_k"], "left")
            .select(
                "x",
                F.coalesce("_v", "cur").alias("cur"),
                F.col("_v").isNotNull().alias("_active"),
            )
        )
        active = stepped.where("_active").count()
        p = stepped.drop("_active").localCheckpoint()
        if active == 0:
            break
    keys = m.select(F.col("x").alias("_k"))
    return (
        p.join(keys, p["cur"] == keys["_k"], "left")
        .select(
            F.col("x").alias(src_col),
            F.when(F.col("_k").isNull(), F.col("cur")).alias("final_url"),
            F.col("_k").isNull().alias("resolved"),
        )
    )


def canonical_meta(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Per-page canonical-URL and robots-directive extraction — the
    dedup-before-dedup pass of a crawl pipeline: pages that declare a
    canonical URL collapse onto it BEFORE any content hashing (the CMS
    told us they are duplicates), and noindex pages are excluded from
    derived corpora the way a polite crawler excludes them from an index.

    Extraction contract (same as host_link_graph): double-quoted
    attributes; the identifying attribute (rel="canonical" /
    name="robots") anchors the tag and href/content are pulled from the
    captured tag, so attribute ORDER is free; first matching tag wins.
    Pure Catalyst regexp_extract — no shuffle at all, the verdict
    columns ride along with the scan.

    Returns df plus (canonical_url, canonical_final, noindex, nofollow):
    canonical_url is the raw declared target ('' when absent),
    canonical_final coalesces to the page's own URL — the column to
    group dedup on; noindex/nofollow are booleans from the robots meta
    content list.
    """
    h = F.col(html_col).cast("string")
    # capture the whole tag first, then the attribute — href/content may
    # precede rel/name in real markup (attribute order is free)
    canon = F.regexp_extract(
        F.regexp_extract(h, '(<link[^>]*rel="canonical"[^>]*>)', 1),
        'href="([^"]*)"', 1)
    robots = F.lower(F.regexp_extract(
        F.regexp_extract(h, '(<meta[^>]*name="robots"[^>]*>)', 1),
        'content="([^"]*)"', 1))
    return pages.select(
        "*",
        canon.alias("canonical_url"),
        F.when(canon != "", canon).otherwise(F.col(url_col))
         .alias("canonical_final"),
        robots.rlike("(^|[ ,])noindex([ ,]|$)").alias("noindex"),
        robots.rlike("(^|[ ,])nofollow([ ,]|$)").alias("nofollow"),
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse a robots.txt corpus into per-(host, agent) path rules — the
    politeness layer of a crawl pipeline (RFC 9309). Handles the core
    grammar: comment stripping (#...), case-insensitive directive keys,
    User-agent group formation (a contiguous RUN of User-agent lines
    opens a group; following Allow/Disallow rules attach to every agent
    in the run), empty Disallow values dropped (an empty pattern imposes
    no restriction). Wildcard patterns (*, $) are NOT expanded — rules
    are path PREFIXES, the original-REP subset; robots_allowed matches
    accordingly.

    Scale shape: one posexplode per file (files are KB-sized), then the
    group-island numbering is a lag + running-sum window over ONE shuffle
    on the host, and the agent x rule attach is an equi-join on
    (host, group). Returns (host, agent, rule, path) with rule in
    {'allow', 'disallow'}.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_raw"),
    )
    line = F.trim(F.regexp_replace(F.col("_raw"), "#.*$", ""))
    key = F.lower(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1))
    val = F.trim(F.regexp_extract(line, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    parsed = (
        lines.select("host", "_ln", key.alias("_key"), val.alias("_val"))
        .where(F.col("_key").isin("user-agent", "allow", "disallow"))
    )
    w = Window.partitionBy("host").orderBy("_ln")
    is_ua = F.col("_key") == "user-agent"
    prev_ua = F.lag(is_ua).over(w)
    opens = (is_ua & (prev_ua.isNull() | ~prev_ua)).cast("int")
    grouped = parsed.withColumn(
        "_grp", F.sum(opens).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = grouped.where(is_ua).select(
        "host", "_grp", F.lower(F.col("_val")).alias("agent"))
    rules = grouped.where(~is_ua & (F.col("_val") != "")).select(
        "host", "_grp", F.col("_key").alias("rule"),
        F.col("_val").alias("path"))
    return agents.join(rules, ["host", "_grp"]).select(
        "host", "agent", "rule", "path")


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Evaluate crawl permission per URL against parse_robots output,
    with RFC 9309 precedence: the most specific matching GROUP wins
    (exact-agent rules, when any exist for the host, shadow '*' rules
    entirely), then the longest matching path prefix wins, with Allow
    beating Disallow on equal length; no matching rule means allowed.

    Scale shape: rules tables are site-metadata-sized (broadcast); the
    per-URL longest-match is a row_number over (prefix-length DESC,
    rule ASC) window keyed by a per-input-row tag (so duplicate input
    rows — even byte-identical ones — each keep their own verdict and
    output cardinality is exactly the input's) — one shuffle of the
    matched subset. Returns urls plus (allowed, matched_rule,
    matched_path).
    """
    from ecokg_spark.functions.url import url_host, url_path

    a = agent.lower()
    r = rules.where(F.col("agent").isin(a, "*"))
    wh = Window.partitionBy("host")
    r = (r.withColumn("_exact", (F.col("agent") == a).cast("int"))
         .withColumn("_has_exact", F.max("_exact").over(wh))
         .where(F.col("_exact") == F.col("_has_exact"))
         .select("host", "rule", "path"))
    u = urls.select(
        "*", F.monotonically_increasing_id().alias("_rowtag"),
        url_host(url_col).alias("_uhost"),
        F.when(url_path(url_col) == "", "/")
         .otherwise(url_path(url_col)).alias("_upath"))
    j = u.join(F.broadcast(r), u["_uhost"] == r["host"], "left")
    m = j.withColumn(
        "_match", F.col("path").isNotNull()
        & F.col("_upath").startswith(F.col("path")))
    wu = Window.partitionBy("_rowtag").orderBy(
        F.when(F.col("_match"), F.length("path")).otherwise(-1).desc(),
        F.col("rule").asc_nulls_last())
    best = (m.withColumn("_rn", F.row_number().over(wu))
            .where(F.col("_rn") == 1))
    return best.select(
        *[c for c in urls.columns],
        (~(F.col("_match") & (F.col("rule") == "disallow")))
        .alias("allowed"),
        F.when(F.col("_match"), F.col("rule")).alias("matched_rule"),
        F.when(F.col("_match"), F.col("path")).alias("matched_path"),
    )


def crawl_frontier(
    pages: DataFrame,
    candidates: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    cand_url_col: str = "url",
    per_host: int = 5,
) -> DataFrame:
    """Politeness-capped crawl-frontier selection: rank UNCRAWLED
    candidate URLs by the authority of their host in the link graph of
    the pages already crawled, keeping at most `per_host` candidates per
    host (the politeness budget). Authority here is weighted in-degree
    (distinct linking pages summed over in-edges) — the
    degree-prioritized frontier baseline; swap in pagerank() over the
    same host_link_graph edges for the eigenvector variant.

    Stages, each individually certified elsewhere: host_link_graph on
    the crawled set -> per-destination-host authority aggregate ->
    LEFT ANTI join removes already-crawled canonical URLs -> per-host
    md5-ordered cap (the group_fixed_sample rule, nested and
    layout-independent). One corpus shuffle for the anti-join, one for
    the cap window; the authority table is host-cardinality and
    broadcasts. Returns (cand_url_col, host, authority, rank) with
    rank 1..per_host by (md5 order) within host.
    """
    from ecokg_spark.functions.url import url_canonicalize, url_host

    hg = host_link_graph(pages, url_col=url_col, html_col=html_col)
    auth = hg.groupBy("dst_host").agg(
        F.sum("n_pages").cast("long").alias("authority"))
    crawled = pages.select(
        url_canonicalize(url_col).alias("_c")).distinct()
    cand = (
        candidates.select(F.col(cand_url_col))
        .withColumn("_c", url_canonicalize(cand_url_col))
        .join(crawled, "_c", "left_anti")
        .withColumn("host", url_host(cand_url_col))
    )
    w = Window.partitionBy("host").orderBy(
        F.md5(F.col(cand_url_col)).asc(), F.col(cand_url_col).asc())
    return (
        cand.join(F.broadcast(auth),
                  cand["host"] == auth["dst_host"], "left")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_host)
        .select(
            cand_url_col, "host",
            F.coalesce("authority", F.lit(0)).cast("long")
            .alias("authority"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def host_boilerplate_lines(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_ratio: float = 0.5,
    min_pages: int = 2,
) -> DataFrame:
    """Per-host boilerplate detection: a LINE that appears on at least
    `min_ratio` of a host's pages (and at least `min_pages` of them) is
    site template, not content — nav bars, cookie banners, footers. The
    host-scoped refinement of CCNet's corpus-level line dedup: "about us"
    is boilerplate on the site that repeats it, content in a corpus that
    quotes it once.

    Shape: explode lines -> per (host, line) DISTINCT-page count (two-
    phase partial aggregation keeps the per-page distinct map-side) ->
    broadcast-size per-host page totals joined back -> ratio gate. Two
    aggregates on keys that include the host, so a giant site is spread
    over its distinct lines, not one reducer. Returns
    (host, line, n_pages, host_pages, ratio) for flagged lines; join
    back on (host, line) to strip them from the corpus.
    """
    from ecokg_spark.functions.url import url_host

    lines = pages.select(
        url_host(url_col).alias("host"),
        F.col(url_col).alias("_page"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).withColumn("line", F.trim("line")).where(F.col("line") != "")
    per_line = lines.groupBy("host", "line").agg(
        F.countDistinct("_page").cast("long").alias("n_pages"))
    host_pages = pages.select(
        url_host(url_col).alias("host"), F.col(url_col).alias("_page")
    ).groupBy("host").agg(
        F.countDistinct("_page").cast("long").alias("host_pages"))
    return (
        per_line.join(host_pages, "host")
        .withColumn("ratio", F.round(
            F.col("n_pages") / F.col("host_pages"), 6))
        .where((F.col("n_pages") >= min_pages)
               & (F.col("ratio") >= min_ratio))
    )


def sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap.xml extraction — the crawl-seeding complement of
    parse_robots: pull every <url><loc>...</loc>[<lastmod>...</lastmod>]
    </url> entry into (host, url, lastmod), lastmod NULL when absent.
    Pure Catalyst: regexp_extract_all over whole <url> blocks, then
    per-block field extraction — the host_link_graph extraction
    discipline (no XML parser dependency, the 99% well-formed-sitemap
    case; a full parser would be a mapInPandas stage with the same
    output schema).
    """
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit("(?s)(<url>.*?</url>)"), 1)
    exploded = sitemaps.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("_b"))
    loc = F.regexp_extract(F.col("_b"), "<loc>\\s*([^<]*?)\\s*</loc>", 1)
    lastmod = F.regexp_extract(
        F.col("_b"), "<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1)
    return (
        exploded.select(
            "host", loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"))
        .where(F.col("url") != "")
    )


def strip_host_boilerplate(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_ratio: float = 0.5,
    min_pages: int = 2,
) -> DataFrame:
    """Remove per-host boilerplate lines from page text: detect with
    host_boilerplate_lines, anti-join the flagged (host, line) pairs out
    of the exploded line table, and rebuild each page's text in original
    line order — the cleanup the detector exists for (CCNet-style, but
    host-scoped so one site's banner never deletes another site's
    content).

    Shape: detection's two host-keyed aggregates, then one posexplode +
    left-anti on (host, line) + one (page) rebuild aggregate over
    sort_array'd (pos, line) structs — deterministic rebuild without a
    window sort. Pages whose every line was boilerplate come back with
    empty text (kept, so downstream length gates decide their fate).
    Returns (url_col, text) with text rebuilt.
    """
    from ecokg_spark.functions.url import url_host

    flagged = host_boilerplate_lines(
        pages, url_col=url_col, text_col=text_col,
        min_ratio=min_ratio, min_pages=min_pages,
    ).select("host", F.col("line").alias("_bl"))
    lines = pages.select(
        F.col(url_col),
        url_host(url_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_t", F.trim("line"))
    kept = lines.join(
        flagged,
        (lines["host"] == flagged["host"]) & (lines["_t"] == flagged["_bl"]),
        "left_anti")
    rebuilt = (
        kept.groupBy(url_col)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"]),
            "\n").alias("text"))
    )
    # a page whose EVERY line was boilerplate has no kept rows — restore
    # it with empty text from the page key set (left join), per contract
    return (
        pages.select(url_col).distinct()
        .join(rebuilt, url_col, "left")
        .select(url_col, F.coalesce("text", F.lit("")).alias("text"))
    )


def robots_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Crawl-delay extraction from a robots.txt corpus — the de-facto
    politeness-rate directive (not in RFC 9309 but honored by most
    crawlers): per (host, agent group), the delay in seconds, parsed
    with the same group-formation walk as parse_robots (a contiguous
    User-agent run owns the following Crawl-delay). Non-numeric values
    are dropped via try_cast (ANSI-safe). Returns
    (host, agent, delay_s double); join on (host, matched agent) after
    the parse_robots precedence pick to rate-limit the fetcher.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_raw"),
    )
    line = F.trim(F.regexp_replace(F.col("_raw"), "#.*$", ""))
    key = F.lower(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1))
    val = F.trim(F.regexp_extract(line, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    parsed = (
        lines.select("host", "_ln", key.alias("_key"), val.alias("_val"))
        .where(F.col("_key").isin("user-agent", "crawl-delay"))
    )
    w = Window.partitionBy("host").orderBy("_ln")
    is_ua = F.col("_key") == "user-agent"
    prev_ua = F.lag(is_ua).over(w)
    opens = (is_ua & (prev_ua.isNull() | ~prev_ua)).cast("int")
    grouped = parsed.withColumn(
        "_grp", F.sum(opens).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = grouped.where(is_ua).select(
        "host", "_grp", F.lower(F.col("_val")).alias("agent"))
    delays = grouped.where(~is_ua).select(
        "host", "_grp",
        F.col("_val").try_cast("double").alias("delay_s"),
    ).where(F.col("delay_s").isNotNull())
    return agents.join(delays, ["host", "_grp"]).select(
        "host", "agent", "delay_s")
