"""Corpus keyword statistics: TF-IDF and co-occurrence PMI.

Training-data curation needs corpus-level term weighting (keyword
extraction, topic balancing) and the KG-construction pipeline needs an
edge-weight prior (how surprising is it that two entities share a
document?). Both are two-shuffle jobs: one groupBy to count, one join to
score — no UDFs, everything whole-stage-codegen.

Float discipline: ln() differs in the last ulp between JVM StrictMath and
libm, so scores are rounded (default 6 dp) BEFORE any ranking — the
cross-engine order and hash then agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) pairs, whitespace tokens, empties dropped."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
    )


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Top-k terms per document by tf * ln(N/df), deterministic (score
    desc, term asc) tiebreak. Returns (id, term, score, rank).

    Scale shape: tf is one shuffle on (id, term); df reuses tf's output
    (one row per (id, term), so COUNT(*) per term == document frequency);
    N rides along as a broadcast 1-row aggregate rather than a driver
    collect, keeping the plan fully lazy. The final top-k is a window over
    id — bounded by the per-document vocabulary, never corpus-wide.
    """
    tf = (
        _terms(docs, id_col, text_col)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id", "term",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")),
                    decimals).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "score", "rank")
    )


def cooccurrence_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pairs: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Pointwise mutual information of term pairs sharing a document:
    pmi(a,b) = ln(c_ab * N / (c_a * c_b)) over document-level presence
    counts. Returns (term_a, term_b, n_pairs, pmi) with term_a < term_b.

    Scale shape: presence (distinct (id, term)) is one shuffle; the pair
    generator is a self-equi-join on id — per-document work is quadratic
    in the DISTINCT vocabulary of that document (bounded by doc length,
    not corpus size), the classic co-occurrence blocking. min_pairs prunes
    the long tail before the singles join.
    """
    presence = _terms(docs, id_col, text_col).distinct()
    singles = presence.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    a = presence.select("id", F.col("term").alias("term_a"))
    b = presence.select("id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pairs)
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    return (
        pairs.join(singles.withColumnRenamed("term", "term_a")
                   .withColumnRenamed("c", "_ca"), "term_a")
        .join(singles.withColumnRenamed("term", "term_b")
              .withColumnRenamed("c", "_cb"), "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a", "term_b", "n_pairs",
            F.round(F.log(F.col("n_pairs") * F.col("_n")
                          / (F.col("_ca") * F.col("_cb"))),
                    decimals).alias("pmi"),
        )
    )


def doc_word_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy of the word-unigram distribution —
    a standard corpus-quality signal (low entropy flags boilerplate and
    keyword-stuffing pages; SEO-spam detectors and C4-style filters use
    exactly this statistic). Returns (id, n_tokens, entropy) in nats,
    empty documents omitted.

    H = ln(n) - (sum over terms c * ln(c)) / n computed from per-term
    counts c — the algebraic form that needs only ONE pass over the
    (id, term) aggregate, no per-term probability column. Two hash
    aggregates, both with map-side partial combine: (id, term) counts,
    then per-id reduce; never a corpus-wide shuffle wider than the
    tokenized input. Rounded so cross-engine float comparison is exact
    (double SUM order differs between engines; noise ~1e-16 vs the 5e-7
    rounding boundary, same discipline as pagerank/tfidf).
    """
    counts = (
        _terms(docs, id_col, text_col)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    return (
        counts.groupBy("id")
        .agg(F.sum("c").alias("_n"),
             F.sum(F.col("c") * F.log("c")).alias("_clc"))
        .select(
            F.col("id").alias(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            F.round(F.log("_n") - F.col("_clc") / F.col("_n"),
                    decimals).alias("entropy"),
        )
    )
