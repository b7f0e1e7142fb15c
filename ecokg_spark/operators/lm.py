"""Statistical language-model quality scoring (perplexity proxy).

Production curation pipelines (CCNet, Gopher, RefinedWeb) score candidate
documents with an n-gram LM trained on a reference corpus and drop the
tails of the score distribution. A KenLM binary is not a Spark-friendly
dependency; this module implements the same signal fully relationally: an
add-k smoothed BIGRAM model trained with two hash aggregates, scoring via
one equi-join. Everything is whole-stage-codegen Catalyst — no UDFs.

Score = mean smoothed conditional probability
    p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + k) / (c(w_{i-1} ·) + k·V)
averaged over a document's bigrams — a monotone proxy for (negated)
perplexity that stays in pure rational arithmetic: no log() means no
JVM-vs-libm ulp drift, so the cross-engine (DuckDB oracle) values agree
bit-for-bit once summed through DECIMAL (the repo-wide dec-sum idiom).

100-TB shape: bigram counts are ONE corpus shuffle on (w1, w2) — the Zipf
head collapses map-side (algebraic count). The continuation-vocabulary
size V and the unigram table c1 are VOCABULARY-sized (c1 derives from c2
by re-aggregation, not a second corpus pass). Scoring is one corpus-sized
equi-join probe against the count table (AQE skew-join absorbs hot
bigrams) plus one groupBy(doc). Training and scoring corpora may differ —
unseen bigrams get the smoothed floor k/(c1 + k·V) resp. 1/V.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecokg_spark.functions.text import normalize_ws


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — consecutive whitespace-token pairs, zero-shuffle
    (zip of two shifted slices; slice length clamps at 0 so documents with
    < 2 tokens contribute no rows without a CASE branch)."""
    toks = F.split(normalize_ws(text_col), " ")
    m = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("_b"))
        .select("id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )


def train_bigram_counts(
    train: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Train the count tables: returns (counts, vstats) where ``counts`` is
    (w1, w2, c2, c1) — bigram count plus its left-context total — and
    ``vstats`` is a 1-row (v) continuation-vocabulary size. ``counts`` is
    vocabulary-sized; c1 and vstats re-aggregate c2 rather than re-reading
    the corpus — but those are three consumers of the same lazy subtree,
    and exchange reuse is not guaranteed across them, so c2 is persisted
    by default (VOCABULARY-sized — the corpus-sized explode happens once;
    pass persist=False to keep the plan fully lazy on small inputs)."""
    c2 = (
        _bigrams(train, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    if persist:
        c2 = c2.persist()
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    counts = c2.join(c1, "w1")
    vstats = c2.agg(F.count_distinct("w2").cast("long").alias("v"))
    return counts, vstats


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    add_k: float = 0.5,
) -> DataFrame:
    """Score each document with the add-k smoothed bigram model trained on
    ``train`` (default: the scored corpus itself — self-perplexity, the
    standard within-corpus outlier signal).

    Returns (id_col, n_bigrams, sum_p, avg_p): bigram count, exact
    decimal-accumulated sum of smoothed conditional probabilities, and
    their mean (NULL when the document has < 2 tokens). Low avg_p =
    improbable word sequences = gibberish/boilerplate candidate.
    """
    counts, vstats = train_bigram_counts(
        train if train is not None else docs, id_col, text_col
    )
    # c1 joins on w1 ALONE: an unseen bigram whose left word IS in the
    # training vocabulary must still see its context total (the add-k
    # floor k/(c1 + k·V)); joining c1 through the (w1, w2) counts row
    # would zero it and score unseen continuations of frequent words 1/V
    # — far ABOVE seen ones, inverting the quality signal.
    c1_tbl = counts.select("w1", "c1").dropDuplicates(["w1"])
    scored = (
        _bigrams(docs, id_col, text_col)
        .join(counts.select("w1", "w2", "c2"), ["w1", "w2"], "left")
        .join(c1_tbl, "w1", "left")
        .crossJoin(F.broadcast(vstats))
        .select(
            "id",
            (
                (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(add_k))
                / (
                    F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                    + F.lit(add_k) * F.col("v").cast("double")
                )
            ).alias("p"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.col("p").cast("decimal(28,12)")).cast("double").alias("sum_p"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "sum_p",
            (F.col("sum_p") / F.col("n_bigrams").cast("double")).alias("avg_p"),
        )
    )
