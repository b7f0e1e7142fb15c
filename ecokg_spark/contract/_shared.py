"""Shared helpers for the contract package: table loader, exact decimal sums, synthetic-input builders used by several domains."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec_sum(col, scale: int = 2):
    """Exact float sum: decimal-accumulate, emit double (bit-identical on
    any engine / any partitioning)."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


_NORM_SQL = "trim(regexp_replace({c}, '[ \\t\\r\\n]+', ' ', 'g'))"


# same character class as functions.text.PUNCT_CLASS; the single quote is
# doubled for the SQL string literal
_PUNCT_SQL = "[.,;:!?''\"()\\[\\]{}-]"


def _marker_sql(markers: list[str]) -> str:
    lst = ",".join(f"'{m}'" for m in markers)
    return (f"len(list_filter(string_split(lower({_NORM_SQL.format(c='text')}), ' '), "
            f"x -> list_contains([{lst}], x)))")


_LOWTOK_SQL = "string_split(lower(" + _NORM_SQL.format(c="text") + "), ' ')"


_TOKCNT_SQL = (f"(CASE WHEN length({_NORM_SQL.format(c='text')}) = 0 THEN 0 "
               f"ELSE len(string_split({_NORM_SQL.format(c='text')}, ' ')) END)")


# base-16 parse of the first 15 hex chars of an md5 column {h} — a strpos
# digit polynomial (60 bits, fits BIGINT); mirrors Spark's conv(substr) path
_HEX15 = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr({{h}}, {p}, 1)) - 1) * {16 ** (15 - p)}"
    for p in range(1, 16)) + ")"


_SHINGLE_SQL = f"""(
  CASE WHEN len(string_split(lower({_NORM_SQL.format(c='text')}), ' ')) <= 3
       THEN [array_to_string(string_split(lower({_NORM_SQL.format(c='text')}), ' '), ' ')]
       ELSE list_transform(
              range(1, len(string_split(lower({_NORM_SQL.format(c='text')}), ' ')) - 1),
              i -> array_to_string(
                     list_slice(string_split(lower({_NORM_SQL.format(c='text')}), ' '), i, i + 2),
                     ' '))
  END)"""


# --- URL / domain ops (functions/url.py, operators/web.py) -----------------
# documents.parquet carries no URL column, so each query first synthesizes a
# deterministic URL from (doc_id, source) — the SAME arithmetic runs in the
# DuckDB oracle, so the parse/canonicalize/aggregate semantics (not the
# synthesis) are what the cross-check proves.

def _synth_url_rich():
    """Deterministic URL exercising every parser branch: mixed-case scheme,
    subdomains, a 2-level public suffix, an explicit default port, utm and
    non-utm query params, and a fragment."""
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 7 == 0, F.lit("HTTP://")).otherwise(F.lit("https://")),
        F.when(d % 3 == 0, F.lit("www."))
        .when(d % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit("")),
        F.col("source"),
        F.when(d % 5 == 0, F.lit(".co.uk")).otherwise(F.lit(".example.com")),
        F.when(d % 11 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/sec"), (d % 4).cast("string"),
        F.lit("/page-"), (d % 37).cast("string"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("?utm_source=feed&id="), (d % 6).cast("string")),
        ).otherwise(F.lit("")),
        F.when(d % 9 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


_SYNTH_URL_RICH_SQL = """(
  (CASE WHEN doc_id % 7 = 0 THEN 'HTTP://' ELSE 'https://' END)
  || (CASE WHEN doc_id % 3 = 0 THEN 'www.'
           WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END)
  || source
  || (CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.example.com' END)
  || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
  || '/sec' || CAST(doc_id % 4 AS VARCHAR)
  || '/page-' || CAST(doc_id % 37 AS VARCHAR)
  || (CASE WHEN doc_id % 2 = 0
           THEN '?utm_source=feed&id=' || CAST(doc_id % 6 AS VARCHAR)
           ELSE '' END)
  || (CASE WHEN doc_id % 9 = 0 THEN '#frag' ELSE '' END))"""


_SQL_URL_PARTS = """
  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
  lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,
  lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1)) AS hostport,
  regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
  regexp_extract(url, '\\?([^#]*)', 1) AS query
"""


_SQL_2L_SUFFIXES = (
    "('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au','org.au',"
    "'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx','co.in',"
    "'co.kr','co.nz')"
)


_SQL_REG_DOMAIN = f"""(
  CASE WHEN len(string_split(host, '.')) < 2 THEN host
       WHEN len(string_split(host, '.')) >= 3
            AND (string_split(host, '.')[-2] || '.' ||
                 string_split(host, '.')[-1]) IN {_SQL_2L_SUFFIXES}
       THEN string_split(host, '.')[-3] || '.' ||
            string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
       ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
  END)"""


# NB: DuckDB array_to_string([]) is NULL (Spark array_join is '') — coalesce
_SQL_KEPT_Q = """coalesce(array_to_string(list_filter(
                       string_split(query, '&'),
                       p -> p <> '' AND NOT starts_with(p, 'utm_')), '&'), '')"""


_SQL_CANONICAL = f"""(
  CASE WHEN scheme = '' THEN url
       ELSE scheme || '://'
            || (CASE WHEN scheme = 'http'
                     THEN regexp_replace(hostport, ':80$', '')
                     WHEN scheme = 'https'
                     THEN regexp_replace(hostport, ':443$', '')
                     ELSE hostport END)
            || (CASE WHEN path = '/' THEN '' ELSE path END)
            || (CASE WHEN {_SQL_KEPT_Q} = ''
                     THEN ''
                     ELSE '?' || {_SQL_KEPT_Q} END)
  END)"""


def _sql_kmeans_assign(cent_rel: str, out: str,
                       src_rel: str = 'embeddings') -> str:
    d = ("list_reduce(list_transform(range(len(e.embedding)), "
         "i -> (CAST(e.embedding[i+1] AS DOUBLE) - c.cent[i+1]) "
         "* (CAST(e.embedding[i+1] AS DOUBLE) - c.cent[i+1])), "
         "(acc, x) -> acc + x)")
    return f"""
{out} AS (
  SELECT vec_id, embedding, cluster, dist FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cluster,
           ROUND({d}, 9) AS dist,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ROUND({d}, 9), c.cid) AS rn
    FROM {src_rel} e CROSS JOIN {cent_rel} c)
  WHERE rn = 1)"""


def _sql_kmeans_update(assign_rel: str, out: str,
                       fallback_rel: str = "seeds") -> str:
    # dead clusters fall back to the PREVIOUS round's centroid, exactly
    # as kmeans_lloyd's `new.get(i, centroids[i])`
    return f"""
{out}_d AS (
  SELECT cluster, u.d AS dim,
         CAST(CAST(u.v AS VARCHAR) AS DECIMAL(38,18)) AS v
  FROM (
    SELECT cluster,
           unnest(list_transform(range(len(embedding)),
                  i -> struct_pack(d := i, v := embedding[i + 1]))) AS u
    FROM {assign_rel})),
{out}_m AS (
  SELECT cluster, dim,
         CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
  FROM {out}_d GROUP BY 1, 2),
{out}_agg AS (
  SELECT cluster AS cid,
         list_transform(list_sort(list(struct_pack(d := dim, m := m))),
                        x -> x.m) AS cent
  FROM {out}_m GROUP BY cluster),
{out} AS (
  SELECT cid, cent FROM {out}_agg
  UNION ALL
  SELECT s.cid, s.cent FROM {fallback_rel} s
  WHERE s.cid NOT IN (SELECT cid FROM {out}_agg))"""
