"""Text-analysis / training-data quality rows over the documents table: token counts, quality scores, language ID, Gopher/C4 rules, PII, TF-IDF/PMI, entropy, readability."""

from __future__ import annotations

from ecokg_spark.functions.text import lang_id, quality_score, token_count
from pyspark.sql import functions as F
from ecokg_spark.contract._shared import (
    _LOWTOK_SQL,
    _NORM_SQL,
    _PUNCT_SQL,
    _TOKCNT_SQL,
    _marker_sql,
    t,
)


def q_token_count(spark, sf):
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.sum(token_count("text")).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


SQL_TOKEN_COUNT = f"""
SELECT lang,
       CAST(SUM(CASE WHEN length({_NORM_SQL.format(c='text')}) = 0 THEN 0
                     ELSE len(string_split({_NORM_SQL.format(c='text')}, ' ')) END) AS BIGINT)
           AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
"""


def q_quality_buckets(spark, sf):
    """Quality-score distribution (score is a small exact-valued lattice)."""
    d = t(spark, sf, "documents")
    return d.groupBy(quality_score("text").alias("quality")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


SQL_QUALITY_BUCKETS = f"""
WITH q AS (
  SELECT (CASE WHEN length(text) >= 20 AND length(text) <= 100000 THEN 0.4 ELSE 0.0 END
         + CASE WHEN CAST(length(text) - length(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) < 0.2 THEN 0.3 ELSE 0.0 END
         + CASE WHEN CAST(len(list_filter(string_split(lower({_NORM_SQL.format(c='text')}), ' '),
                                          x -> list_contains(['the','and','of','to','is'], x))) AS DOUBLE)
                     / greatest(CASE WHEN length({_NORM_SQL.format(c='text')}) = 0 THEN 0
                                     ELSE len(string_split({_NORM_SQL.format(c='text')}, ' ')) END, 1)
                     > 0.02 THEN 0.3 ELSE 0.0 END) AS quality
  FROM documents
)
SELECT quality, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY quality
"""


def q_lang_id(spark, sf):
    d = t(spark, sf, "documents")
    return d.groupBy(lang_id("text").alias("lang_guess")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


SQL_LANG_ID = f"""
WITH m AS (
  SELECT {_marker_sql(['the','and','of','to','is'])} AS en,
         {_marker_sql(['der','die','und','ist','das'])} AS de,
         {_marker_sql(['le','la','et','les','est'])} AS fr
  FROM documents
)
SELECT CASE WHEN en = 0 AND de = 0 AND fr = 0 THEN 'und'
            WHEN en >= de AND en >= fr THEN 'en'
            WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_guess,
       CAST(COUNT(*) AS BIGINT) AS n
FROM m GROUP BY 1
"""


def q_quality_logit(spark, sf):
    """Fixed-weight logistic quality classifier (functions/text.py
    classifier_score): sigmoid over stopword/punct/repetition ratios +
    log1p token count, one Catalyst expression per doc. Rounded to 6 dp —
    exp/ln differ across engines in the last ulp."""
    from ecokg_spark.functions.text import classifier_score

    d = t(spark, sf, "documents")
    return d.select(
        "doc_id", F.round(classifier_score("text"), 6).alias("q_score"))


SQL_QUALITY_LOGIT = f"""
WITH f AS (
  SELECT doc_id,
         CAST({_marker_sql(['the', 'and', 'of', 'to', 'is'])} AS DOUBLE)
           / greatest({_TOKCNT_SQL}, 1) AS sw,
         CAST(length(text) - length(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct,
         CAST(1.0 - len(list_distinct({_LOWTOK_SQL}))
                    / len({_LOWTOK_SQL}) AS DOUBLE) AS rep,
         ln(1.0 + {_TOKCNT_SQL}) AS logtok
  FROM documents
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-(-1.0 + 6.0*sw - 4.0*punct - 3.0*rep
                                + 0.35*logtok))), 6) AS q_score
FROM f
"""


def q_c4_rules(spark, sf):
    """C4 line+document cleaning rules (functions/text.py
    c4_quality_flags): terminal-punctuation / >=5-word / no-javascript
    line filter, lorem-ipsum + brace + >=3-kept-lines document gate.
    The corpus text has no terminal punctuation, so the fixture
    synthesizes four variants from doc_id: 3 clean punctuated lines
    (passes), a javascript line (line dropped), a lorem-ipsum prefix
    (doc fails), a brace suffix (doc fails) — every rule fires both
    ways."""
    from ecokg_spark.functions.text import c4_quality_flags

    d = t(spark, sf, "documents")
    nl = F.lit("\n")
    base = F.col("text")
    v = F.col("doc_id") % 4
    text2 = (
        F.when(v == 0, F.concat(base, F.lit("."), nl, base, F.lit("!"),
                                nl, base, F.lit("?")))
        .when(v == 1, F.concat(base, F.lit("."), nl, base,
                               F.lit(" javascript rules."), nl, base,
                               F.lit("?"), nl, base, F.lit("!")))
        .when(v == 2, F.concat(F.lit("lorem ipsum "), base, F.lit("."), nl,
                               base, F.lit("!"), nl, base, F.lit("?")))
        .otherwise(F.concat(base, F.lit(" { code }."), nl, base, F.lit("!"),
                            nl, base, F.lit("?")))
    )
    flags = c4_quality_flags(text2)
    return d.select("doc_id", flags["n_lines"].alias("n_lines"),
                    flags["n_kept"].alias("n_kept"),
                    flags["kept_text"].alias("kept_text"),
                    flags["passes_c4"].alias("passes_c4"))


_C4_KEEP_SQL = (
    "list_filter(list_transform(string_split(t2, chr(10)), "
    "l -> trim(regexp_replace(l, ' +', ' ', 'g'))), "
    "t -> regexp_matches(t, '[.!?]$') AND len(string_split(t, ' ')) >= 5 "
    "AND NOT regexp_matches(t, '(?i)javascript'))")


SQL_C4_RULES = f"""
WITH v AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN text || '.' || chr(10) || text || '!'
                       || chr(10) || text || '?'
           WHEN 1 THEN text || '.' || chr(10) || text
                       || ' javascript rules.' || chr(10) || text || '?'
                       || chr(10) || text || '!'
           WHEN 2 THEN 'lorem ipsum ' || text || '.' || chr(10) || text
                       || '!' || chr(10) || text || '?'
           ELSE text || ' {{ code }}.' || chr(10) || text || '!'
                || chr(10) || text || '?'
         END AS t2
  FROM documents
)
SELECT doc_id,
       CAST(len(string_split(t2, chr(10))) AS BIGINT) AS n_lines,
       CAST(len({_C4_KEEP_SQL}) AS BIGINT) AS n_kept,
       COALESCE(list_aggregate({_C4_KEEP_SQL}, 'string_agg', chr(10)),
                '') AS kept_text,
       (len({_C4_KEEP_SQL}) >= 3
        AND NOT contains(lower(t2), 'lorem ipsum')
        AND NOT contains(t2, '{{')) AS passes_c4
FROM v
"""


def q_gopher_rules(spark, sf):
    """Gopher-style quality rules (word count / mean word length / alpha
    ratio / bullet + ellipsis line ratios / stopword floor). The corpus
    text has no newlines, so a deterministic 3-line document is rebuilt
    from (text, doc_id) — both engines recompute it exactly."""
    from ecokg_spark.functions.text import gopher_quality_flags

    d = t(spark, sf, "documents")
    did = F.col("doc_id")
    txt = F.concat(
        F.col("text"), F.lit("\n"),
        F.when(did % 3 == 0, F.lit("- bullet item"))
         .otherwise(F.lit("plain tail line")),
        F.lit("\n"),
        F.when(did % 4 == 0, F.lit("trailing..."))
         .otherwise(F.lit("solid end")),
    )
    fl = gopher_quality_flags(txt)
    return d.select(
        "doc_id",
        fl["word_count"].alias("word_count"),
        fl["mean_word_len"].alias("mean_word_len"),
        fl["alpha_word_ratio"].alias("alpha_word_ratio"),
        fl["bullet_line_ratio"].alias("bullet_line_ratio"),
        fl["ellipsis_line_ratio"].alias("ellipsis_line_ratio"),
        fl["passes_gopher"].cast("int").alias("passes_gopher"),
    )


SQL_GOPHER_RULES = """
WITH x AS (
  SELECT doc_id,
         text || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN '- bullet item'
              ELSE 'plain tail line' END || chr(10) ||
         CASE WHEN doc_id % 4 = 0 THEN 'trailing...'
              ELSE 'solid end' END AS txt
  FROM documents
), w AS (
  SELECT doc_id, txt,
         trim(regexp_replace(txt, '[ \\t\\r\\n]+', ' ', 'g')) AS norm,
         string_split(txt, chr(10)) AS lines
  FROM x
), m AS (
  SELECT doc_id,
         len(string_split(norm, ' ')) AS wc,
         CAST(length(norm) - (len(string_split(norm, ' ')) - 1) AS DOUBLE)
             / greatest(len(string_split(norm, ' ')), 1) AS mwl,
         CAST(len(list_filter(string_split(lower(norm), ' '),
                              tk -> regexp_matches(tk, '[a-z]'))) AS DOUBLE)
             / greatest(len(string_split(norm, ' ')), 1) AS alpha,
         CAST(len(list_filter(lines,
                              l -> regexp_matches(ltrim(l), '^[-*•]')))
              AS DOUBLE) / greatest(len(lines), 1) AS bullet,
         CAST(len(list_filter(lines,
                              l -> regexp_matches(rtrim(l),
                                                  '(\\.\\.\\.|…)$')))
              AS DOUBLE) / greatest(len(lines), 1) AS ellipsis,
         len(list_filter(string_split(lower(norm), ' '),
             tk -> list_contains(['the','and','of','to','is'], tk))) AS sw
  FROM w
)
SELECT doc_id,
       CAST(wc AS BIGINT) AS word_count,
       mwl AS mean_word_len,
       alpha AS alpha_word_ratio,
       bullet AS bullet_line_ratio,
       ellipsis AS ellipsis_line_ratio,
       CAST(CASE WHEN wc BETWEEN 50 AND 100000
                  AND mwl BETWEEN 3.0 AND 10.0
                  AND alpha > 0.8 AND bullet < 0.9 AND ellipsis < 0.3
                  AND sw >= 2
            THEN 1 ELSE 0 END AS INT) AS passes_gopher
FROM m
"""


def q_length_quartiles(spark, sf):
    """Per-source token-length quartiles (operators/curation.py
    length_quartiles): exact percentiles at binary-fraction probes so the
    interpolated doubles are bit-identical across engines."""
    from ecokg_spark.operators.curation import length_quartiles

    return length_quartiles(
        t(spark, sf, "documents"), "text", "source"
    ).withColumnRenamed("grp", "source")


SQL_LENGTH_QUARTILES = f"""
WITH tc AS (
  SELECT source,
         CASE WHEN length({_NORM_SQL.format(c='text')}) = 0 THEN 0
              ELSE len(string_split({_NORM_SQL.format(c='text')}, ' '))
         END AS n
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       quantile_cont(n, 0.25) AS p25,
       quantile_cont(n, 0.50) AS p50,
       quantile_cont(n, 0.75) AS p75
FROM tc GROUP BY source
"""


def q_pii_redact(spark, sf):
    """PII scrubbing (functions/pii.py): the corpus carries no PII, so a
    deterministic email + IPv4 + phone string is appended per document;
    the query returns the redacted text and per-kind counts, all
    recomputed verbatim by the oracle with the same RE2-safe regexes."""
    from ecokg_spark.functions.pii import pii_counts, redact_pii

    d = F.col("doc_id")
    pii_text = F.concat(
        F.substring(F.col("text"), 1, 50),
        F.lit(" Contact user"), d.cast("string"),
        F.lit("@mail.example.com now. Server 10.0."),
        (d % 200).cast("string"),
        F.lit(".7 up. Call +1 (415) 555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" today."),
    )
    docs = t(spark, sf, "documents").withColumn("text", pii_text)
    return docs.select(
        "doc_id",
        redact_pii("text").alias("clean_text"),
        *pii_counts("text"),
    )


def _sql_pii_redact() -> str:
    from ecokg_spark.functions.pii import (
        EMAIL_TOKEN,
        IP_TOKEN,
        PHONE_TOKEN,
        RE_EMAIL,
        RE_IPV4,
        RE_PHONE,
    )

    synth = """(
      substr(text, 1, 50)
      || ' Contact user' || CAST(doc_id AS VARCHAR)
      || '@mail.example.com now. Server 10.0.'
      || CAST(doc_id % 200 AS VARCHAR)
      || '.7 up. Call +1 (415) 555-'
      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || ' today.')"""
    return f"""
WITH u AS (SELECT doc_id, {synth} AS text FROM documents),
s1 AS (SELECT doc_id, text,
              regexp_replace(text, '{RE_EMAIL}', '{EMAIL_TOKEN}', 'g') AS t1
       FROM u),
s2 AS (SELECT *, regexp_replace(t1, '{RE_IPV4}', '{IP_TOKEN}', 'g') AS t2
       FROM s1)
SELECT doc_id,
       regexp_replace(t2, '{RE_PHONE}', '{PHONE_TOKEN}', 'g') AS clean_text,
       CAST(len(regexp_extract_all(text, '{RE_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{RE_IPV4}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{RE_PHONE}')) AS BIGINT) AS n_phones
FROM s2
"""


SQL_PII_REDACT = _sql_pii_redact()


def q_tfidf_topk(spark, sf):
    """Top-3 TF-IDF terms per document (operators/keywords.py): scores
    rounded to 6 dp BEFORE ranking so the JVM-vs-libm ln() ulp gap cannot
    reorder ties; (score desc, term asc) tiebreak is total."""
    from ecokg_spark.operators.keywords import tfidf_topk

    return tfidf_topk(t(spark, sf, "documents"), k=3)


SQL_TFIDF_TOPK = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL.format(c='text')}, ' ')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM terms WHERE term <> '' GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, ROUND(tf.tf * LN(n.n / df.df), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term ASC) AS BIGINT) AS rank
  FROM scored)
SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3
"""


def q_word_entropy(spark, sf):
    """Per-document word-unigram Shannon entropy (operators/keywords.py
    doc_word_entropy) — the boilerplate/keyword-stuffing quality signal,
    one-pass c*ln(c) form, rounded before comparison."""
    from ecokg_spark.operators.keywords import doc_word_entropy

    return doc_word_entropy(t(spark, sf, "documents"))


SQL_WORD_ENTROPY = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL.format(c='text')}, ' ')) AS term
  FROM documents),
c AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS c
      FROM terms WHERE term <> '' GROUP BY doc_id, term),
agg AS (SELECT doc_id, SUM(c) AS n, SUM(c * LN(c)) AS clc
        FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       ROUND(LN(n) - clc / n, 6) AS entropy
FROM agg
"""


def q_flesch_score(spark, sf):
    """Flesch reading ease (functions/text.py flesch_reading_ease):
    vowel-group syllable proxy, [.!?]+ sentence runs clamped to >= 1;
    both divisions are long/long -> double (IEEE-identical cross-engine),
    rounded to 4 dp."""
    from ecokg_spark.functions.text import flesch_reading_ease

    d = t(spark, sf, "documents")
    return d.select(
        "doc_id", flesch_reading_ease("text").alias("flesch"))


_W_SQL = ("CASE WHEN length({n}) = 0 THEN 0 "
          "ELSE len(string_split({n}, ' ')) END")


SQL_FLESCH_SCORE = f"""
WITH x AS (
  SELECT doc_id,
         CAST({_W_SQL.format(n=_NORM_SQL.format(c='text'))} AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS y
  FROM documents)
SELECT doc_id,
       CASE WHEN w > 0
            THEN ROUND(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)
       END AS flesch
FROM x
"""


def q_jsonl_corrupt(spark, sf):
    """Corrupt-tolerant JSONL ingestion (io.py read_jsonl_tolerant):
    a feed synthesized from documents with every 7th line truncated
    mid-string; the parse must keep good rows fully typed and capture
    bad lines in _corrupt. Emits the per-source QC aggregate; the
    oracle recomputes it from the generator arithmetic."""
    import tempfile

    from ecokg_spark.io import read_jsonl_tolerant

    d = t(spark, sf, "documents")
    line = F.when(
        F.col("doc_id") % 7 == 3,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id"),
                 F.lit(', "source": "'), F.col("source"),
                 F.lit('", "text": "trunc')),
    ).otherwise(
        F.concat(F.lit('{"doc_id": '), F.col("doc_id"),
                 F.lit(', "source": "'), F.col("source"),
                 F.lit('", "nc": '), F.col("n_chars"), F.lit("}")))
    out_dir = tempfile.mkdtemp(prefix="ecokg_jsonl_")
    d.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(
        out_dir)
    parsed = read_jsonl_tolerant(
        spark, out_dir, "doc_id long, source string, nc long")
    # corrupt rows bind only _corrupt: recover the source for the QC
    # aggregate from the raw line so the report stays per-source
    src = F.coalesce(
        F.col("source"),
        F.regexp_extract(F.col("_corrupt"), '"source": "([^"]*)"', 1))
    return (
        parsed.select(src.alias("source"),
                      F.col("_corrupt").isNotNull().alias("_bad"),
                      "nc")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("_bad").cast("long")).cast("long").alias("n_corrupt"),
            F.sum("nc").cast("long").alias("nc_sum"),
        )
    )


SQL_JSONL_CORRUPT = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN NULL ELSE n_chars END)
            AS BIGINT) AS nc_sum
FROM documents GROUP BY source
"""


def q_nfc_normalize(spark, sf):
    """Unicode NFC normalization (functions/text.py nfc_normalize_col —
    the engine's one Arrow-UDF text stage) against DuckDB's NATIVE
    nfc_normalize: decomposed accents planted ahead of every document
    must collapse to precomposed form identically in both engines."""
    from ecokg_spark.functions.text import nfc_normalize_col

    d = t(spark, sf, "documents")
    planted = d.select(
        "doc_id",
        F.concat(F.lit("Cafe\u0301 nai\u0308ve "), F.col("text"))
         .alias("text"))
    out = nfc_normalize_col(planted, "text")
    return out.select("doc_id", "text_nfc",
                      F.length("text_nfc").alias("n_chars_nfc"))


SQL_NFC_NORMALIZE = """
SELECT doc_id,
       nfc_normalize('Cafe' || chr(769) || ' nai' || chr(776) || 've '
                     || text) AS text_nfc,
       length(nfc_normalize('Cafe' || chr(769) || ' nai' || chr(776)
                            || 've ' || text)) AS n_chars_nfc
FROM documents
"""
