"""Relational kernel rows (SURVEY.md §2.2-2.5): scans, filters, joins, windows, aggregates over the TPC-H-style tables."""

from __future__ import annotations

from ecokg_spark.functions.curie import (
    collapse_uniprot_curie,
    curie_prefix,
    guess_bl_category,
    make_curie,
    priority_coalesce,
)
from ecokg_spark.functions.text import doc_fingerprint, normalize_ws, token_count
from ecokg_spark.operators.multimodal import extract_media_meta
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ecokg_spark.contract._shared import (
    _LOWTOK_SQL,
    _NORM_SQL,
    _SHINGLE_SQL,
    _SQL_CANONICAL,
    _SQL_REG_DOMAIN,
    _SYNTH_URL_RICH_SQL,
    _synth_url_rich,
    dec_sum,
    t,
)


def q_pricing_summary(spark, sf):
    """A-agg family: multi-aggregate scan with pushed filter (TPC-H Q1)."""
    li = t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project(spark, sf):
    """P1/P2: IN-list + range predicates pushed to the scan."""
    c = t(spark, sf, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY") & (F.col("c_acctbal") > 1000.0)
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_FILTER_PROJECT = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_mktsegment IN ('BUILDING','MACHINERY') AND c_acctbal > 1000.0
"""


def q_broadcast_join_agg(spark, sf):
    """J1: broadcast-dim equi-join + aggregate (lineitem x part)."""
    li, p = t(spark, sf, "lineitem"), t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(dec_sum("l_quantity").alias("sum_qty"),
             F.count(F.lit(1)).cast("long").alias("n_items"))
    )


SQL_BROADCAST_JOIN_AGG = """
SELECT p_brand, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand
"""


def q_multi_join(spark, sf):
    """J3 family: 4-way join, revenue per region."""
    r, n = t(spark, sf, "region"), t(spark, sf, "nation")
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(dec_sum("o_totalprice").alias("revenue"),
             F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


SQL_MULTI_JOIN = """
SELECT r_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_explode_tokens(spark, sf):
    """J6/J7 explode fanout: split + explode + count."""
    p = t(spark, sf, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


SQL_EXPLODE_TOKENS = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT unnest(string_split(p_type, ' ')) AS token FROM part
) GROUP BY token
"""


def q_window_topk(spark, sf):
    """Window top-k: 3 priciest orders per customer."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rank").cast("int").alias("rank"))
    )


SQL_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_topk_limit(spark, sf):
    """Global deterministic top-k (sort + limit)."""
    o = t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


SQL_TOPK_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_case_chain(spark, sf):
    """F7 conditional chain: account-balance banding."""
    c = t(spark, sf, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return c.groupBy(band.alias("band")).agg(F.count(F.lit(1)).cast("long").alias("n"))


SQL_CASE_CHAIN = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer GROUP BY band
"""


def q_string_funcs(spark, sf):
    """F1-F6 string family on part rows (row-level value check)."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.substring_index("p_type", " ", 1).alias("first_type_word"),
        F.regexp_replace("p_brand", "#", "-").alias("brand_norm"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.lower("p_name")).alias("lower_trim"),
    )


SQL_STRING_FUNCS = """
SELECT p_partkey, upper(p_name) AS upper_name,
       split_part(p_type, ' ', 1) AS first_type_word,
       regexp_replace(p_brand, '#', '-', 'g') AS brand_norm,
       p_brand || '|' || p_type AS brand_type,
       trim(lower(p_name)) AS lower_trim
FROM part
"""


def q_curie_ops(spark, sf):
    """CURIE build + prefix-based category guess + isoform collapse."""
    n = t(spark, sf, "nation")
    ids = n.select(
        make_curie("NAT", "n_name").alias("curie"),
        F.when(F.col("n_nationkey") % 3 == 0,
               F.concat(F.lit("UniProtKB:P"), F.col("n_nationkey"), F.lit("-2")))
        .when(F.col("n_nationkey") % 3 == 1, F.concat(F.lit("GO:"), F.col("n_nationkey")))
        .otherwise(F.concat(F.lit("X:"), F.col("n_nationkey"))).alias("xid"),
    )
    return ids.select(
        "curie",
        curie_prefix("curie").alias("prefix"),
        guess_bl_category("xid").alias("category"),
        collapse_uniprot_curie("xid").alias("collapsed"),
    )


SQL_CURIE_OPS = """
WITH ids AS (
  SELECT 'NAT:' || n_name AS curie,
         CASE WHEN n_nationkey % 3 = 0 THEN 'UniProtKB:P' || CAST(n_nationkey AS VARCHAR) || '-2'
              WHEN n_nationkey % 3 = 1 THEN 'GO:' || CAST(n_nationkey AS VARCHAR)
              ELSE 'X:' || CAST(n_nationkey AS VARCHAR) END AS xid
  FROM nation
)
SELECT curie, split_part(curie, ':', 1) AS prefix,
       CASE WHEN split_part(xid, ':', 1) IN ('UniProtKB','ComplexPortal') THEN 'biolink:Protein'
            WHEN split_part(xid, ':', 1) = 'GO' THEN 'biolink:OntologyClass'
            ELSE 'biolink:NamedThing' END AS category,
       CASE WHEN regexp_matches(xid, '^(?i)uniprotkb:')
            THEN regexp_replace(xid, '-\\d+$', '')
            ELSE xid END AS collapsed
FROM ids
"""


def q_priority_coalesce(spark, sf):
    """get_item_by_priority semantics: first non-empty by priority."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        priority_coalesce("props", "event_type").alias("picked"),
    )


SQL_PRIORITY_COALESCE = """
SELECT event_id, COALESCE(NULLIF(props, ''), NULLIF(event_type, '')) AS picked FROM events
"""


def q_json_extract(spark, sf):
    """F10 JSON value extraction (eol_traits.py:337-339 dict traversal as
    get_json_object) — row-level parity."""
    e = t(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
"""


def q_repetition_ratio(spark, sf):
    """Gopher-style repetition signal: duplicate-token fraction per doc."""
    from ecokg_spark.functions.text import repetition_ratio

    d = t(spark, sf, "documents")
    return d.select("doc_id", repetition_ratio("text").alias("rep_ratio"))


SQL_REPETITION_RATIO = f"""
SELECT doc_id,
       CAST(1.0 - len(list_distinct({_LOWTOK_SQL}))
                  / len({_LOWTOK_SQL}) AS DOUBLE) AS rep_ratio
FROM documents
"""


def q_dup_ngram_ratio(spark, sf):
    """Gopher duplicate-3-gram fraction per document; the token array is
    staged as a real column (no per-shingle re-tokenization)."""
    from ecokg_spark.functions.text import dup_ngram_ratio, normalize_ws

    d = t(spark, sf, "documents").withColumn(
        "_toks", F.split(F.lower(normalize_ws("text")), " "))
    return d.select(
        "doc_id", dup_ngram_ratio(F.col("_toks"), 3).alias("dup3_ratio"))


SQL_DUP_NGRAM_RATIO = f"""
WITH t AS (
  SELECT doc_id,
         string_split(lower({_NORM_SQL.format(c='text')}), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks) - 1),
                        i -> array_to_string(list_slice(toks, i, i + 2),
                                             ' ')) AS sh
  FROM t
)
SELECT doc_id,
       CASE WHEN len(toks) <= 3 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(1 AS DOUBLE)
                 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) END
           AS dup3_ratio
FROM s
"""


def q_bpe_token_count(spark, sf):
    """Subword-ish (BPE-style pre-tokenizer) vs whitespace token counts —
    the LLM-cost-proxy counter the training-data brief asks for; pure
    Catalyst regexp pass, pattern shared verbatim with the oracle."""
    from ecokg_spark.functions.text import bpe_token_count

    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
    )


SQL_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(CASE WHEN length(norm) = 0 THEN 0
                 ELSE len(string_split(norm, ' ')) END AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(norm, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))
            AS BIGINT) AS bpe_tokens
FROM (SELECT doc_id, {_NORM_SQL.format(c='text')} AS norm FROM documents)
"""


def q_fingerprint(spark, sf):
    """Row-level md5 fingerprint parity."""
    d = t(spark, sf, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


SQL_FINGERPRINT = f"""
SELECT doc_id, md5(lower({_NORM_SQL.format(c='text')})) AS fingerprint FROM documents
"""


def q_dup_spans(spark, sf):
    """Inter-document duplicated-span stats (operators/dedup.py
    dup_span_stats — the posting-list form of Lee et al. 2022 ExactSubstr
    dedup): per document, the count and fraction of its distinct word
    3-grams that occur in at least one other document."""
    from ecokg_spark.operators.dedup import dup_span_stats

    return dup_span_stats(t(spark, sf, "documents"), "text", "doc_id", n=3)


SQL_DUP_SPANS = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLE_SQL})) AS s FROM documents
),
nd AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS ndocs FROM sh GROUP BY s)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_frac
FROM sh JOIN nd USING (s) GROUP BY doc_id
"""


def q_decontam(spark, sf):
    """Benchmark decontamination (operators/dedup.py decontaminate): the
    eval set is every 97th document of the corpus itself (deterministic),
    so each eval text trivially contaminates its own source row plus any
    true near-copies; pairs sharing >= 2 distinct word 3-grams."""
    from ecokg_spark.operators.dedup import decontaminate

    d = t(spark, sf, "documents")
    ev = d.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "text")
    return decontaminate(d, ev, n=3, min_shared=2)


SQL_DECONTAM = f"""
WITH ev AS (SELECT doc_id AS eval_id, text FROM documents
            WHERE doc_id % 97 = 0),
dsh AS (SELECT doc_id, unnest(list_distinct({_SHINGLE_SQL})) AS s
        FROM documents),
esh AS (SELECT eval_id, unnest(list_distinct({_SHINGLE_SQL})) AS s FROM ev)
SELECT doc_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM dsh JOIN esh USING (s)
GROUP BY doc_id, eval_id
HAVING COUNT(*) >= 2
"""


def q_url_dedup(spark, sf):
    """Exact URL dedup on the canonical form (operators/web.py url_dedup):
    the synthesized corpus hides each logical URL behind case-varied
    hosts, default ports, utm params and fragments; dedup keeps the min
    doc_id per canonical URL with the collapse count."""
    from ecokg_spark.operators.web import url_dedup

    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("www.")),
        F.col("source"),
        F.lit(".example.com"),
        F.when(d % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), (d % 5).cast("string"),
        F.when(d % 2 == 1, F.lit("?utm_medium=social")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    docs = t(spark, sf, "documents").withColumn("url", url)
    return url_dedup(docs, "url", "doc_id")


SQL_URL_DEDUP = """
WITH u AS (
  SELECT doc_id,
         'https://' || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END)
         || source || '.example.com'
         || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
         || '/p/' || CAST(doc_id % 5 AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 1 THEN '?utm_medium=social' ELSE '' END)
         || (CASE WHEN doc_id % 4 = 0 THEN '#top' ELSE '' END) AS url
  FROM documents
),
p AS (SELECT doc_id, url,
  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
  lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1)) AS hostport,
  regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
  regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u)
SELECT
""" + _SQL_CANONICAL + """ AS canonical_url,
  CAST(min(doc_id) AS BIGINT) AS doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_dups
FROM p GROUP BY 1
"""


def q_domain_stats(spark, sf):
    """Per-registered-domain census (operators/web.py domain_stats):
    document count and char totals keyed by the public-suffix-aware
    domain — the table a blocklist / per-site sampling policy reads."""
    from ecokg_spark.operators.web import domain_stats

    docs = t(spark, sf, "documents").withColumn("url", _synth_url_rich())
    return domain_stats(docs, "url", "doc_id", chars_col="n_chars")


SQL_DOMAIN_STATS = f"""
WITH u AS (
  SELECT doc_id, n_chars, {_SYNTH_URL_RICH_SQL} AS url FROM documents
),
p AS (SELECT doc_id, n_chars,
  lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host
  FROM u)
SELECT {_SQL_REG_DOMAIN} AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       AVG(n_chars) AS avg_chars
FROM p GROUP BY 1
"""


def q_domain_quota(spark, sf):
    """Per-domain quota sampling (operators/sample.py
    domain_quota_sample): cap every registered domain at 3 documents,
    picked by md5 order. The salted two-phase top-k equals the plain
    per-domain row_number the oracle computes (stage 1's per-salt top-q
    is a superset of the overall top-q)."""
    from ecokg_spark.operators.sample import domain_quota_sample

    docs = t(spark, sf, "documents").withColumn("url", _synth_url_rich())
    out = domain_quota_sample(docs, "url", "doc_id", quota=3)
    return out.select("doc_id", "domain", "rank")


SQL_DOMAIN_QUOTA = f"""
WITH u AS (
  SELECT doc_id, {_SYNTH_URL_RICH_SQL} AS url FROM documents
),
p AS (SELECT doc_id,
  lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host
  FROM u),
d AS (SELECT doc_id, {_SQL_REG_DOMAIN} AS domain FROM p),
r AS (SELECT doc_id, domain,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS rank
      FROM d)
SELECT doc_id, domain, rank FROM r WHERE rank <= 3
"""


def q_graph_two_hop(spark, sf):
    """EP3 graph-pattern query (SPARQL 2-hop -> edges self-join): customer
    -placed-> order -contains-> part, part count per customer band.
    The reference runs such patterns against an external SPARQL endpoint
    (query.py:7-13); here they compile to joins on the edges table."""
    o, li = t(spark, sf, "orders"), t(spark, sf, "lineitem")
    placed = o.select(
        make_curie("C", "o_custkey").alias("subject"),
        F.lit("placed").alias("predicate"),
        make_curie("O", "o_orderkey").alias("object"),
    )
    contains = li.select(
        make_curie("O", "l_orderkey").alias("subject"),
        F.lit("contains").alias("predicate"),
        make_curie("P", "l_partkey").alias("object"),
    )
    edges = placed.unionByName(contains)
    a = edges.where(F.col("predicate") == "placed").select(
        F.col("subject").alias("customer"), F.col("object").alias("mid"))
    b = edges.where(F.col("predicate") == "contains").select(
        F.col("subject").alias("mid"), F.col("object").alias("part"))
    two_hop = a.join(b, "mid").select("customer", "part")
    return two_hop.groupBy("customer").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.countDistinct("part").cast("long").alias("n_parts"),
    )


SQL_GRAPH_TWO_HOP = """
WITH placed AS (
  SELECT 'C:' || CAST(o_custkey AS VARCHAR) AS subject,
         'O:' || CAST(o_orderkey AS VARCHAR) AS object FROM orders
),
contains AS (
  SELECT 'O:' || CAST(l_orderkey AS VARCHAR) AS subject,
         'P:' || CAST(l_partkey AS VARCHAR) AS object FROM lineitem
)
SELECT p.subject AS customer, CAST(COUNT(*) AS BIGINT) AS n_paths,
       CAST(COUNT(DISTINCT c.object) AS BIGINT) AS n_parts
FROM placed p JOIN contains c ON p.object = c.subject
GROUP BY p.subject
"""


def q_multimodal_meta(spark, sf):
    """Binary-payload plumbing via mapInPandas (byte length + sha256)."""
    d = t(spark, sf, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text").alias("kind"),
    )
    return extract_media_meta(media).select("media_id", "byte_len", "sha256")


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
"""


def q_multimodal_dims(spark, sf):
    """Real stdlib media decode (multimodal.decode_image_real): PNG/GIF/JPEG
    payloads synthesized with dims planted arithmetically from the id, then
    header-parsed back out by the mapInPandas meta extractor — the oracle
    recomputes the dims from the id alone, so a green row proves the parser
    recovers exactly what the containers encode."""
    from ecokg_spark.operators.multimodal import with_synth_image_payload

    n = t(spark, sf, "nation")
    media = with_synth_image_payload(
        n.select(F.col("n_nationkey").cast("long").alias("media_id")))
    media = media.withColumn(
        "kind",
        F.when(F.col("media_id") % 3 == 0, "png")
        .when(F.col("media_id") % 3 == 1, "gif").otherwise("jpeg"))
    return extract_media_meta(media).select(
        "media_id", "kind", "width", "height", "n_channels")


SQL_MULTIMODAL_DIMS = """
SELECT CAST(n_nationkey AS BIGINT) AS media_id,
       CASE CAST(n_nationkey % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
            ELSE 'jpeg' END AS kind,
       CAST(CASE CAST(n_nationkey % 3 AS INT)
            WHEN 0 THEN n_nationkey % 64 + 1
            WHEN 1 THEN n_nationkey % 64 + 5
            ELSE (n_nationkey * 3) % 64 + 1 END AS INT) AS width,
       CAST(CASE CAST(n_nationkey % 3 AS INT)
            WHEN 0 THEN (n_nationkey * 7) % 64 + 1
            WHEN 1 THEN n_nationkey % 32 + 2
            ELSE n_nationkey % 64 + 9 END AS INT) AS height,
       CAST(3 AS INT) AS n_channels
FROM nation
"""


def q_media_resize_plan(spark, sf):
    """Aspect-preserving resize planning (multimodal 'resize' stage) over
    header-decoded dims: payloads synthesized with id-derived dimensions,
    parsed back by the stdlib header reader, then the target box computed
    as Catalyst arithmetic the oracle repeats from the id alone."""
    from ecokg_spark.operators.multimodal import (
        resize_plan, with_synth_image_payload)

    n = t(spark, sf, "nation")
    media = with_synth_image_payload(
        n.select(F.col("n_nationkey").cast("long").alias("media_id")))
    meta = extract_media_meta(
        media.withColumn("kind", F.lit("image")))
    out = resize_plan(meta, max_side=48)
    return out.select("media_id", "width", "height", "out_w", "out_h",
                      F.col("resized").cast("int").alias("resized"))


SQL_MEDIA_RESIZE_PLAN = """
WITH d AS (
  SELECT CAST(n_nationkey AS BIGINT) AS media_id,
         CAST(CASE CAST(n_nationkey % 3 AS INT)
              WHEN 0 THEN n_nationkey % 64 + 1
              WHEN 1 THEN n_nationkey % 64 + 5
              ELSE (n_nationkey * 3) % 64 + 1 END AS INT) AS width,
         CAST(CASE CAST(n_nationkey % 3 AS INT)
              WHEN 0 THEN (n_nationkey * 7) % 64 + 1
              WHEN 1 THEN n_nationkey % 32 + 2
              ELSE n_nationkey % 64 + 9 END AS INT) AS height
  FROM nation
), s AS (
  SELECT *, least(CAST(1.0 AS DOUBLE),
                  CAST(48.0 AS DOUBLE) / greatest(width, height)) AS sc
  FROM d
)
SELECT media_id, width, height,
       CAST(greatest(floor(width * sc), 1) AS INT) AS out_w,
       CAST(greatest(floor(height * sc), 1) AS INT) AS out_h,
       CAST(CASE WHEN greatest(width, height) > 48 THEN 1 ELSE 0 END
            AS INT) AS resized
FROM s
"""


def q_clustering_coeff(spark, sf):
    """Local clustering coefficient (operators/graph.py): same synthetic
    graph as triangle_count; cc = 2T/(d(d-1)), 0.0 below degree 2."""
    from ecokg_spark.operators.graph import clustering_coefficient

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.select(k.alias("src"), ((k * 2 + 3) % 25).alias("dst"))
         .union(n.select(k.alias("src"), ((k * 5 + 1) % 25).alias("dst"))))
    return clustering_coefficient(e).withColumnRenamed("id", "node")


SQL_CLUSTERING_COEFF = """
WITH raw AS (
  SELECT n_nationkey AS x, (2*n_nationkey+3)%25 AS y FROM nation
  UNION ALL
  SELECT n_nationkey, (5*n_nationkey+1)%25 FROM nation),
e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
      FROM raw WHERE x <> y),
deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
          SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY id),
tri AS (SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
ex AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
       UNION ALL SELECT c FROM tri),
cnt AS (SELECT id, COUNT(*) AS t FROM ex GROUP BY id),
fin AS (
  SELECT deg.id, deg.degree,
         CAST(COALESCE(cnt.t, 0) AS BIGINT) AS triangles
  FROM deg LEFT JOIN cnt USING (id))
SELECT id AS node, degree, triangles,
       CASE WHEN degree < 2 THEN 0.0
            ELSE ROUND(2.0 * triangles / (degree * (degree - 1)), 6)
       END AS coefficient
FROM fin
"""


def q_cooccur_pmi(spark, sf):
    """Term-pair PMI over shared-document presence (operators/keywords.py
    cooccurrence_pmi) — the KG edge-weight prior; min_pairs=5 prunes the
    tail before the singles join."""
    from ecokg_spark.operators.keywords import cooccurrence_pmi

    return cooccurrence_pmi(t(spark, sf, "documents"), min_pairs=5)


SQL_COOCCUR_PMI = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL.format(c='text')}, ' ')) AS term
  FROM documents),
presence AS (SELECT DISTINCT doc_id, term FROM terms WHERE term <> ''),
singles AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS c
            FROM presence GROUP BY term),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM presence a JOIN presence b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term HAVING COUNT(*) >= 5),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
SELECT p.term_a, p.term_b, p.n_pairs,
       ROUND(LN(p.n_pairs * n.n / (sa.c * sb.c)), 6) AS pmi
FROM pairs p JOIN singles sa ON sa.term = p.term_a
JOIN singles sb ON sb.term = p.term_b CROSS JOIN n
"""
