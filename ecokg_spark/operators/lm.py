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


def _trigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3) — consecutive token triples, zero-shuffle (three
    shifted slices zipped; length clamps at 0 for short docs)."""
    toks = F.split(normalize_ws(text_col), " ")
    m = F.greatest(F.size(toks) - F.lit(2), F.lit(0))
    pairs = F.zip_with(
        F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        F.slice(toks, 3, m),
        lambda ab, c: F.struct(ab["w1"].alias("w1"), ab["w2"].alias("w2"),
                               c.alias("w3")),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("_t"))
        .select("id", F.col("_t.w1").alias("w1"), F.col("_t.w2").alias("w2"),
                F.col("_t.w3").alias("w3"))
    )


def stupid_backoff_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    alpha: float = 0.4,
) -> DataFrame:
    """Stupid Backoff trigram scoring (Brants et al. 2007, EMNLP — THE
    web-scale n-gram scheme: no discounting, no normalization, just
    relative frequencies with a fixed backoff penalty, designed exactly
    because principled smoothing doesn't distribute):

        S(w3 | w1 w2) = c3(w1w2w3) / c2ctx(w1w2)        if c3 > 0
                      = alpha * c2(w2w3) / c1(w2)        elif c2 > 0
                      = alpha^2 * c1(w3) / N             otherwise (0 if OOV)

    Returns (id_col, n_trigrams, sum_s, avg_s) — the decimal-accumulated
    sum and mean of S over each document's trigrams (NULL when < 3
    tokens). Pure rational arithmetic (no log) so the DuckDB oracle
    agrees bit-for-bit through the dec-sum idiom.

    100-TB shape: count tables are three corpus shuffles (trigram,
    bigram, unigram counts — each map-side-combinable so the Zipf head
    collapses before the exchange; the context table re-aggregates the
    trigram table, not the corpus); scoring is vocabulary-table probe
    joins +
    one broadcast 1-row N, then one groupBy(doc). Everything Catalyst.
    """
    src = train if train is not None else docs
    c3 = (_trigrams(src, id_col, text_col)
          .groupBy("w1", "w2", "w3")
          .agg(F.count(F.lit(1)).cast("long").alias("c3")).persist())
    c2 = (_bigrams(src, id_col, text_col)
          .groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("c2")).persist())
    c2ctx = (c3.groupBy("w1", "w2").agg(F.sum("c3").alias("c2ctx")))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # unigram counts incl. each doc's final token: re-aggregate bigrams
    # on BOTH positions would double-count; derive from the token stream
    # of the bigram table + per-doc tail is corpus work again — instead
    # count unigrams directly (one more map-side-combinable shuffle over
    # the corpus, still the cheapest exact form)
    uni = (src.select(F.explode(F.split(normalize_ws(text_col), " "))
                      .alias("w"))
           .where(F.col("w") != "")
           .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cu")))
    nstats = uni.agg(F.sum("cu").cast("double").alias("n_total"))

    a = F.lit(alpha)
    s = (
        _trigrams(docs, id_col, text_col)
        .join(c3, ["w1", "w2", "w3"], "left")
        .join(c2ctx, ["w1", "w2"], "left")
        .join(c2.select(F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                        F.col("c2")), ["w2", "w3"], "left")
        .join(c1.select(F.col("w1").alias("w2"), "c1"), "w2", "left")
        .join(uni.select(F.col("w").alias("w3"), "cu"), "w3", "left")
        .crossJoin(F.broadcast(nstats))
        .select(
            "id",
            F.when(F.col("c3").isNotNull(),
                   F.col("c3").cast("double") / F.col("c2ctx").cast("double"))
            .when(F.col("c2").isNotNull(),
                  a * F.col("c2").cast("double") / F.col("c1").cast("double"))
            .otherwise(a * a * F.coalesce(F.col("cu"), F.lit(0))
                       .cast("double") / F.col("n_total"))
            .alias("s"),
        )
    )
    per_doc = s.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum(F.col("s").cast("decimal(28,12)")).cast("double").alias("sum_s"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_trigrams", F.lit(0)).cast("long")
            .alias("n_trigrams"),
            "sum_s",
            (F.col("sum_s") / F.col("n_trigrams").cast("double"))
            .alias("avg_s"),
        )
    )
