"""Sketch rows: HyperLogLog, Count-Min, Bloom."""

from __future__ import annotations

from ecokg_spark.functions.text import doc_fingerprint, normalize_ws
from pyspark.sql import functions as F
from ecokg_spark.contract._shared import _HEX15, _NORM_SQL, t


def q_hll_distinct(spark, sf):
    """HyperLogLog distinct-text estimate per source (operators/sketch.py
    hll_distinct, p=12): portable md5/60-bit spec, integer-exact register
    sums (bucket order cannot perturb the estimate), LinearCounting
    small-range branch; the only cross-engine floats are one division and
    one ln(), rounded to 4 dp."""
    from ecokg_spark.operators.sketch import hll_distinct

    d = t(spark, sf, "documents")
    return hll_distinct(d, "text", p=12, group_cols=["source"])


def _sql_hll_distinct(p: int = 12) -> str:
    from ecokg_spark.operators.sketch import _alpha

    m = 2 ** p
    w = 2 ** (60 - p)
    s50 = 2 ** 50
    num = repr(_alpha(m) * m * m * float(s50))  # the exact double Spark uses
    return f"""
WITH x AS (
  SELECT source, {_HEX15.format(h='md5(text)')} AS h FROM documents
),
r AS (
  SELECT source, h // {w} AS bucket,
         CASE WHEN h % {w} = 0 THEN {60 - p + 1}
              ELSE {60 - p + 1} - length(bin(h % {w})) END AS rho
  FROM x
),
reg AS (SELECT source, bucket, MAX(rho) AS register FROM r GROUP BY 1, 2),
agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
               SUM(CAST(pow(2.0, 50 - register) AS BIGINT)) AS s_used
        FROM reg GROUP BY source),
e AS (SELECT source, n_buckets_used, ({m} - n_buckets_used) AS zeros,
             {num} / CAST(s_used + ({m} - n_buckets_used)
                          * CAST({s50} AS BIGINT) AS DOUBLE) AS raw
      FROM agg)
SELECT source, n_buckets_used,
       ROUND(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                  THEN {float(m)} * ln({float(m)} / zeros)
                  ELSE raw END, 4) AS estimate
FROM e
"""


SQL_HLL_DISTINCT = _sql_hll_distinct()


def q_bloom_probe(spark, sf):
    """Portable Bloom filter (operators/sketch.py bloom_bits +
    bloom_might_contain, m=2^16 k=5): bit-set over the EVEN docs'
    fingerprints, probed by every doc — even ids must be true (no false
    negatives), odd ids true only on hash collisions, which the oracle
    reproduces bit-for-bit (same md5 positions => same false
    positives)."""
    from ecokg_spark.functions.text import doc_fingerprint
    from ecokg_spark.operators.sketch import bloom_bits, bloom_might_contain

    # persist the fingerprint projection: projection collapse would
    # otherwise re-inline the regex-normalize + md5 into each of the 2x5
    # bit-position expressions (65x slower at sf0.1; verify-skill gotcha)
    d = t(spark, sf, "documents").select(
        "doc_id", doc_fingerprint("text").alias("v")).persist()
    bits = bloom_bits(d.where(F.col("doc_id") % 2 == 0), "v",
                      m=1 << 16, k=5)
    out = bloom_might_contain(d, bits, "v", m=1 << 16, k=5)
    return out.select("doc_id", "might_contain")


def _sql_bloom_probe(m: int = 1 << 16, k: int = 5) -> str:
    hx = _HEX15.format(h="md5(CAST(r.i AS VARCHAR) || ':' || v)")
    return f"""
WITH fp AS (
  SELECT doc_id, md5(lower({_NORM_SQL.format(c='text')})) AS v
  FROM documents
),
bits AS (
  SELECT DISTINCT ({hx}) % {m} AS bit
  FROM fp CROSS JOIN range({k}) r(i) WHERE doc_id % 2 = 0
),
probe AS (
  SELECT doc_id, ({hx}) % {m} AS bit
  FROM fp CROSS JOIN range({k}) r(i)
)
SELECT doc_id,
       SUM(CASE WHEN bit IN (SELECT bit FROM bits) THEN 1 ELSE 0 END) = {k}
         AS might_contain
FROM probe GROUP BY doc_id
"""


SQL_BLOOM_PROBE = _sql_bloom_probe()


def q_count_min(spark, sf):
    """Count-Min token-frequency sketch (operators/sketch.py
    count_min_table + count_min_estimate, w=256 d=4): build the counter
    table over every corpus token, point-query six tokens (five present,
    one absent). Integer arithmetic end to end — the oracle recomputes
    the sketch cell-for-cell including its collision overcounts."""
    from ecokg_spark.operators.sketch import (count_min_estimate,
                                              count_min_table)

    d = t(spark, sf, "documents")
    toks = d.select(F.explode(
        F.split(F.lower(normalize_ws("text")), " ")).alias("tok"))
    counters = count_min_table(toks, "tok", w=256, d=4)
    queries = spark.createDataFrame(
        [("the",), ("and",), ("spark",), ("batch",), ("window",),
         ("zzz-absent",)], "tok string")
    return count_min_estimate(counters, queries, "tok", w=256, d=4)


def _sql_count_min(w: int = 256, d: int = 4) -> str:
    hx = _HEX15.format(h="md5(CAST(r.i AS VARCHAR) || ':' || v)")
    qhx = _HEX15.format(h="md5(CAST(r.i AS VARCHAR) || ':' || tok)")
    return f"""
WITH toks AS (
  SELECT unnest(string_split(lower({_NORM_SQL.format(c='text')}), ' ')) AS v
  FROM documents
),
cells AS (
  SELECT r.i AS hrow, ({hx}) % {w} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN range({d}) r(i) GROUP BY 1, 2
),
q AS (
  SELECT unnest(['the', 'and', 'spark', 'batch', 'window',
                 'zzz-absent']) AS tok
),
probes AS (
  SELECT tok, r.i AS hrow, ({qhx}) % {w} AS bucket
  FROM q CROSS JOIN range({d}) r(i)
)
SELECT tok, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS estimate
FROM probes p LEFT JOIN cells c ON c.hrow = p.hrow AND c.bucket = p.bucket
GROUP BY tok
"""


SQL_COUNT_MIN = _sql_count_min()
