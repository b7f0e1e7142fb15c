"""Sampling / LM / packing rows: hash-quota-stratified sampling, DSIR, bigram LM, Stupid Backoff, sequence packing, BPE."""

from __future__ import annotations

from ecokg_spark.functions.text import token_count
from pyspark.sql import functions as F
from ecokg_spark.contract._shared import _HEX15, _NORM_SQL, t


def q_stratified_sample(spark, sf):
    """Per-stratum deterministic Bernoulli mixture (operators/sample.py
    stratified_sample): language strata at rates en=1.0 / de=0.5 /
    fr=0.25, unknown strata dropped — the temperature-resampling
    primitive; same md5 prefix decides every stratum so mixtures re-cut
    monotonically."""
    from ecokg_spark.operators.sample import stratified_sample

    d = t(spark, sf, "documents")
    out = stratified_sample(d, "lang", {"en": 1.0, "de": 0.5, "fr": 0.25},
                            key_col="doc_id")
    return out.select("doc_id", "lang", "source")


def _sql_stratified_sample() -> str:
    from ecokg_spark.operators.sample import sample_threshold_hex

    return f"""
SELECT doc_id, lang, source FROM documents
WHERE (lang = 'en')
   OR (lang = 'de' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        < '{sample_threshold_hex(0.5)}')
   OR (lang = 'fr' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        < '{sample_threshold_hex(0.25)}')
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


def q_vocab_topk(spark, sf):
    """Vocabulary induction (functions/text.py build_vocab): top-25
    corpus tokens with counts and deterministic rank (count DESC, token
    ASC). The global top-k is TakeOrderedAndProject — never a full
    sort."""
    from ecokg_spark.functions.text import build_vocab

    d = t(spark, sf, "documents")
    return build_vocab(d, "text", k=25)


SQL_VOCAB_TOPK = f"""
WITH c AS (
  SELECT unnest(string_split(lower({_NORM_SQL.format(c='text')}), ' ')) AS token
  FROM documents
),
n AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY token)
SELECT token, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rank
FROM n ORDER BY n DESC, token ASC LIMIT 25
"""


def q_stupid_backoff(spark, sf):
    """Stupid Backoff trigram scoring (operators/lm.py
    stupid_backoff_score, Brants et al. 2007): self-trained on the
    documents corpus, alpha=0.4 — pure rational arithmetic, so the
    oracle recomputes sum/avg bit-for-bit through the dec-sum idiom."""
    from ecokg_spark.operators.lm import stupid_backoff_score

    d = t(spark, sf, "documents")
    return stupid_backoff_score(d, "doc_id", "text")


SQL_STUPID_BACKOFF = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_SQL.format(c='text')}, ' ') AS t
  FROM documents
),
tri AS (
  SELECT doc_id, u.w1, u.w2, u.w3 FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
             i -> struct_pack(w1 := t[i], w2 := t[i + 1], w3 := t[i + 2])))
           AS u
    FROM toks)
),
big AS (
  SELECT u.w1, u.w2 FROM (
    SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
             i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS u
    FROM toks)
),
c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
       FROM tri GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, SUM(c3) AS c2ctx FROM c3 GROUP BY 1, 2),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
       FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM (
          SELECT unnest(t) AS w FROM toks) WHERE w <> '' GROUP BY w),
n AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_total FROM uni),
probe AS (
  SELECT p.doc_id,
         CASE WHEN c3.c3 IS NOT NULL
                THEN CAST(c3.c3 AS DOUBLE) / CAST(ctx.c2ctx AS DOUBLE)
              WHEN b.c2 IS NOT NULL
                THEN 0.4 * CAST(b.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)
              ELSE 0.4 * 0.4 * CAST(COALESCE(u.cu, 0) AS DOUBLE) / n.n_total
         END AS s
  FROM tri p
  LEFT JOIN c3 ON c3.w1 = p.w1 AND c3.w2 = p.w2 AND c3.w3 = p.w3
  LEFT JOIN ctx ON ctx.w1 = p.w1 AND ctx.w2 = p.w2
  LEFT JOIN c2 b ON b.w1 = p.w2 AND b.w2 = p.w3
  LEFT JOIN c1 ON c1.w1 = p.w2
  LEFT JOIN uni u ON u.w = p.w3
  CROSS JOIN n
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
         CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS sum_s
  FROM probe GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(k.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       k.sum_s, k.sum_s / k.n_trigrams AS avg_s
FROM documents d LEFT JOIN per_doc k ON k.doc_id = d.doc_id
"""


def q_bpe_pairs(spark, sf):
    """BPE merge-candidate counting (functions/text.py
    bpe_merge_candidates): top-20 adjacent character pairs within words —
    the distributed counting step of one tokenizer-training iteration."""
    from ecokg_spark.functions.text import bpe_merge_candidates

    d = t(spark, sf, "documents")
    return bpe_merge_candidates(d, "text", k=20)


SQL_BPE_PAIRS = f"""
WITH w AS (
  SELECT unnest(string_split(lower({_NORM_SQL.format(c='text')}), ' ')) AS w
  FROM documents
),
cs AS (
  SELECT regexp_extract_all(w, '.') AS c FROM w WHERE length(w) >= 2
),
p AS (
  SELECT unnest(list_transform(range(1, len(c)),
                               i -> c[i] || c[i + 1])) AS pair
  FROM cs
),
n AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY pair)
SELECT pair, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rank
FROM n ORDER BY n DESC, pair ASC LIMIT 20
"""


def q_fixed_sample(spark, sf):
    """Exactly-n deterministic sample (operators/sample.py
    fixed_size_sample): the 100 docs whose md5(doc_id) sorts first —
    exact output size, layout/engine-independent, executes as
    TakeOrderedAndProject."""
    from ecokg_spark.operators.sample import fixed_size_sample

    d = t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return fixed_size_sample(d, 100, "doc_id")


SQL_FIXED_SAMPLE = """
SELECT doc_id, source, n_chars FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC LIMIT 100
"""


def q_pack_sequences(spark, sf):
    """GPT-style concat-and-chunk packing (operators/pack.py
    pack_sequences): per-source token streams (shard = source, order =
    md5(doc_id)) cut into 512-token contexts; a doc crossing a cut emits
    one row per chunk it spans. Integer-exact — the oracle recomputes
    every (doc, chunk, slice) assignment."""
    from ecokg_spark.operators.pack import pack_sequences

    d = t(spark, sf, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens"))
    return pack_sequences(d, n_tokens_col="n_tokens", context_len=512,
                          shard_col="source")


SQL_PACK_SEQUENCES = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length({_NORM_SQL.format(c='text')}) = 0 THEN 0
              ELSE len(string_split({_NORM_SQL.format(c='text')}, ' ')) END
              AS BIGINT) AS n,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
o AS (
  SELECT doc_id, source, n,
         SUM(n) OVER (PARTITION BY source ORDER BY h, doc_id
                      ROWS UNBOUNDED PRECEDING) AS e
  FROM d WHERE n > 0
)
SELECT source, CAST(g.i AS BIGINT) AS chunk_idx, doc_id,
       CAST(greatest((e - n) - g.i * 512, 0) AS BIGINT) AS begin_tok,
       CAST(least(e - g.i * 512, 512) AS BIGINT) AS end_tok
FROM o CROSS JOIN generate_series(0, 4000) g(i)
WHERE g.i BETWEEN (e - n) // 512 AND (e - 1) // 512
"""


def q_hash_sample(spark, sf):
    """Deterministic Bernoulli(0.25) content-hash sample (operators/
    sample.py hash_sample): keep iff md5(doc_id) 8-hex prefix sorts below
    the rate threshold — layout-independent, exactly recomputable."""
    from ecokg_spark.operators.sample import hash_sample

    return hash_sample(t(spark, sf, "documents"), 0.25, "doc_id").select(
        "doc_id", "source", "n_chars"
    )


def _sql_hash_sample() -> str:
    from ecokg_spark.operators.sample import sample_threshold_hex

    return f"""
SELECT doc_id, source, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{sample_threshold_hex(0.25)}'
"""


SQL_HASH_SAMPLE = _sql_hash_sample()


def q_bigram_lm(spark, sf):
    """Add-k smoothed bigram LM quality scoring (operators/lm.py) — the
    KenLM-perplexity signal of CCNet/Gopher pipelines expressed fully
    relationally: train = two hash aggregates, score = one equi-join.
    Pure rational arithmetic (no log) so the oracle agrees bit-for-bit
    through the DECIMAL sum."""
    from ecokg_spark.operators.lm import bigram_lm_score

    d = t(spark, sf, "documents")
    return bigram_lm_score(d, "doc_id", "text")


SQL_BIGRAM_LM = f"""
WITH tk AS (
  SELECT doc_id, string_split({_NORM_SQL.format(c='text')}, ' ') AS tk
  FROM documents
),
ix AS (
  SELECT doc_id, tk, unnest(range(2, len(tk) + 1)) AS i FROM tk
),
bg AS (
  SELECT doc_id, tk[i - 1] AS w1, tk[i] AS w2 FROM ix
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
vs AS (SELECT COUNT(DISTINCT w2) AS v FROM c2),
scored AS (
  SELECT b.doc_id,
         (CAST(c.c2 AS DOUBLE) + 0.5)
         / (CAST(c1.c1 AS DOUBLE) + 0.5 * CAST(vs.v AS DOUBLE)) AS p
  FROM bg b JOIN c2 c USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vs
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) AS sum_p
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       per.sum_p,
       per.sum_p / CAST(per.n_bigrams AS DOUBLE) AS avg_p
FROM documents d LEFT JOIN per USING (doc_id)
"""


def q_dsir_weights(spark, sf):
    """DSIR importance log-weights (operators/sample.py dsir_logweights,
    Xie et al. 2023): hashed unigram+bigram bucket distributions, target =
    the src13 slice of the corpus, 64 portable md5 buckets so the oracle
    recomputes every weight verbatim."""
    from ecokg_spark.operators.sample import dsir_logweights

    d = t(spark, sf, "documents")
    return dsir_logweights(d, d.where(F.col("source") == "src13"),
                           dims=64, alpha=1.0, portable=True)


SQL_DSIR_WEIGHTS = f"""
WITH tk AS (
  SELECT doc_id, string_split({_NORM_SQL.format(c='text')}, ' ') AS tk
  FROM documents),
fr AS (
  SELECT doc_id, t AS f FROM (
    SELECT doc_id, unnest(tk) AS t FROM tk) WHERE t <> ''
  UNION ALL
  SELECT doc_id, tk[i - 1] || ' ' || tk[i] FROM (
    SELECT doc_id, tk, unnest(range(2, len(tk) + 1)) AS i FROM tk)),
fb AS (
  SELECT doc_id,
         CAST({_HEX15.format(h='md5(f)')} % 64 AS BIGINT) AS bkt
  FROM fr),
ftgt AS (
  SELECT fb.doc_id, fb.bkt FROM fb
  JOIN documents d USING (doc_id) WHERE d.source = 'src13'),
rg AS (SELECT bkt, CAST(COUNT(*) AS DOUBLE) AS rc FROM fb GROUP BY bkt),
tg AS (SELECT bkt, CAST(COUNT(*) AS DOUBLE) AS tc FROM ftgt GROUP BY bkt),
tot AS (SELECT (SELECT SUM(rc) FROM rg) AS r_tot,
               (SELECT COALESCE(SUM(tc), 0.0) FROM tg) AS t_tot),
lr AS (
  SELECT rg.bkt,
         LN((COALESCE(tg.tc, 0.0) + 1.0) / (tot.t_tot + 64.0))
         - LN((rg.rc + 1.0) / (tot.r_tot + 64.0)) AS lr
  FROM rg LEFT JOIN tg USING (bkt) CROSS JOIN tot),
pd AS (SELECT doc_id, bkt, CAST(COUNT(*) AS DOUBLE) AS c
       FROM fb GROUP BY doc_id, bkt),
w AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_features,
             ROUND(SUM(c * lr.lr), 6) AS logweight
      FROM pd JOIN lr USING (bkt) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(w.n_features, 0) AS BIGINT) AS n_features,
       COALESCE(w.logweight, 0.0) AS logweight
FROM documents d LEFT JOIN w USING (doc_id)
"""


def q_temperature_mix(spark, sf):
    """Temperature-scaled source mixture weights (operators/sample.py
    temperature_mixture, T=2 -> SQRT weights, IEEE-exact cross-engine;
    decimal-staged normalizer per the group_centroids discipline)."""
    from ecokg_spark.operators.sample import temperature_mixture

    d = t(spark, sf, "documents")
    return temperature_mixture(d, group_col="source", temperature=2.0,
                               budget=100_000)


SQL_TEMPERATURE_MIX = """
WITH c AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
w AS (
  SELECT source, n_docs,
         CAST(CAST(SQRT(n_docs) AS VARCHAR) AS DECIMAL(38,18)) AS wd
  FROM c),
s AS (
  SELECT source, n_docs,
         ROUND(CAST(CAST(wd AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(wd) OVER () AS VARCHAR) AS DOUBLE),
               6) AS share
  FROM w)
SELECT source, n_docs, share,
       CAST(FLOOR(share * 100000) AS BIGINT) AS expected_docs
FROM s
"""


def q_chunk_sliding(spark, sf):
    """Sliding-window chunking (operators/pack.py chunk_sliding, size=16
    stride=12): overlapping retrieval windows per document; chunk count
    via integer div, token slices identical to DuckDB 1-based inclusive
    list slicing."""
    from ecokg_spark.operators.pack import chunk_sliding

    d = t(spark, sf, "documents")
    return chunk_sliding(d, size=16, stride=12)


SQL_CHUNK_SLIDING = f"""
WITH d AS (SELECT doc_id, {_NORM_SQL.format(c='text')} AS nt FROM documents),
tk AS (SELECT doc_id, string_split(nt, ' ') AS t,
              len(string_split(nt, ' ')) AS n
       FROM d WHERE length(nt) > 0),
c AS (SELECT doc_id, t, 1 + (greatest(n - 16, 0) + 11) // 12 AS nc FROM tk),
x AS (SELECT doc_id, unnest(range(0, nc)) AS ci, t FROM c)
SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       CAST(len(t[ci*12+1 : ci*12+16]) AS BIGINT) AS n_tokens,
       array_to_string(t[ci*12+1 : ci*12+16], ' ') AS chunk_text
FROM x
"""


def q_group_sample(spark, sf):
    """Per-group deterministic fixed-size sample (operators/sample.py
    group_fixed_sample): 5 docs per source by md5 order — nested,
    layout-independent, WindowGroupLimit partial top-k."""
    from ecokg_spark.operators.sample import group_fixed_sample

    d = t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return group_fixed_sample(d, "source", 5, "doc_id")


SQL_GROUP_SAMPLE = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
WHERE rn <= 5
"""
