"""End-to-end corpus curation: the composed training-data filter chain.

What a 100-TB pretraining-data job actually runs is not one operator but
the chain — language gate, length/repetition quality gates, exact dedup,
deterministic downsample. This module composes the engine's individual
pieces (functions/text.py signals, operators/dedup.exact_dedup,
operators/sample.hash_sample) into one declarative plan so Catalyst sees
the WHOLE chain: the narrow filters run inside the scan stage (before the
one dedup shuffle), and the sample predicate is pushed below everything
that follows it.

Shuffle budget: exactly ONE corpus-sized shuffle (the dedup groupBy on
the 16-byte fingerprint). Everything else — language/quality gates,
signal columns, Bernoulli sampling — is a narrow map over the scan.
Every step is deterministic (md5-based dedup keys and sample threshold),
so the curated corpus is byte-reproducible on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecokg_spark.functions.text import repetition_ratio, token_count
from ecokg_spark.operators.dedup import exact_dedup
from ecokg_spark.operators.sample import hash_sample


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_repetition: float = 0.5,
    sample_rate: float = 1.0,
) -> DataFrame:
    """Language -> quality -> exact-dedup -> deterministic sample.

    Returns the surviving rows plus the computed signal columns
    (n_tokens, rep_ratio). Dedup keeps the min-id row per normalized-text
    fingerprint; the sample is the md5-prefix Bernoulli gate (nested:
    a rate-0.1 sample is a subset of the rate-0.5 sample)."""
    d = docs
    if lang_col and langs and lang_col in docs.columns:
        d = d.where(F.col(lang_col).isin(list(langs)))
    d = (
        d.withColumn("n_tokens", token_count(text_col))
        .withColumn("rep_ratio", repetition_ratio(text_col))
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("rep_ratio") <= max_repetition)
        )
    )
    d = exact_dedup(d, text_col=text_col, id_col=id_col)
    if sample_rate < 1.0:
        d = hash_sample(d, sample_rate, id_col)
    return d


def length_quartiles(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-length distribution: (group, n_docs, p25, p50, p75)
    — the corpus-shape profile a curation run reports before/after
    filtering. Exact percentiles (one shuffle on the group key; at corpus
    scale swap F.percentile for percentile_approx and keep the same
    schema — the contract row pins the exact variant so the oracle can
    recompute it). The probes are binary fractions (.25/.5/.75) on
    integer token counts, so the interpolated values are exact doubles in
    any engine — no rounding needed for cross-engine comparison."""
    return (
        df.select(F.col(group_col).alias("grp"),
                  token_count(text_col).alias("_nt"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.percentile("_nt", F.lit(0.25)).alias("p25"),
            F.percentile("_nt", F.lit(0.50)).alias("p50"),
            F.percentile("_nt", F.lit(0.75)).alias("p75"),
        )
    )


def curate_corpus_v2(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    path_pattern: str | None = None,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    lm_floor_frac: float = 0.5,
    paragraph_min_docs: int = 2,
    sample_rate: float = 1.0,
) -> DataFrame:
    """Second-generation curation chain, composing the round-4 operators:

      URL blocklist (broadcast domain join + path rlike)
        -> token-count gate
        -> bigram-LM quality floor: drop documents whose mean smoothed
           conditional probability is below ``lm_floor_frac`` x the
           corpus mean (self-trained on the gated corpus — the standard
           relative perplexity cut, scale-free so the same fraction works
           at any corpus size)
        -> paragraph-level boilerplate removal (text rebuilt)
        -> exact dedup on the REBUILT text (two pages differing only in
           boilerplate collapse here — the reason paragraph dedup runs
           first)
        -> deterministic md5 Bernoulli sample

    Returns surviving rows with signal columns
    (id, n_tokens, avg_p, n_paras, n_kept, text).

    Shuffle budget: the narrow gates (blocklist, tokens, sample) fuse
    into scan stages; the corpus-sized shuffles are the LM's count/probe
    pair, the paragraph census + rebuild, and the dedup aggregate — each
    the documented shape of its operator, nothing quadratic, nothing on
    the driver (the LM floor is a broadcast 1-row aggregate).
    """
    from ecokg_spark.operators.dedup import paragraph_dedup
    from ecokg_spark.operators.lm import bigram_lm_score
    from ecokg_spark.operators.web import url_blocklist_filter

    flt = url_blocklist_filter(docs, blocklist, url_col, path_pattern)
    d = (flt.where(F.col("block_reason").isNull())
         .drop("block_reason", "block_category", "domain", url_col))
    d = (d.withColumn("n_tokens", token_count(text_col))
         .where((F.col("n_tokens") >= min_tokens)
                & (F.col("n_tokens") <= max_tokens)))
    lm = bigram_lm_score(d, id_col, text_col)
    tot = lm.agg(
        F.sum(F.col("sum_p").cast("decimal(28,12)")).cast("double")
        .alias("_tp"),
        F.sum("n_bigrams").alias("_tn"),
    )
    d = (
        d.join(lm.select(id_col, "avg_p"), id_col)
        .crossJoin(F.broadcast(tot))
        .where(F.col("avg_p")
               >= F.lit(lm_floor_frac) * (F.col("_tp")
                                          / F.col("_tn").cast("double")))
        .drop("_tp", "_tn")
    )
    paras = paragraph_dedup(d.select(id_col, text_col), text_col, id_col,
                            min_docs=paragraph_min_docs)
    d = d.drop(text_col).join(paras, id_col)
    d = exact_dedup(d, text_col=text_col, id_col=id_col)
    if sample_rate < 1.0:
        d = hash_sample(d, sample_rate, id_col)
    return d


def curate_corpus_v3(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    score_floor_frac: float = 1.0,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Third-generation curation chain, composing the round-4 session
    operators:

      model-based quality floor: logistic classifier_score (rounded to
        6 dp so the floor comparison is cross-engine exact), drop
        documents below ``score_floor_frac`` x the corpus mean score
        (decimal-staged mean — a broadcast 1-row aggregate, scale-free)
        -> fuzzy_dedup: banded portable-MinHash near-dup clusters,
           ONE survivor per transitive cluster (min id)
        -> stratified_sample: per-stratum deterministic mixture rates

    Returns surviving rows + q_score. Shuffle budget: the floor is a
    narrow filter against a broadcast mean; fuzzy_dedup contributes its
    documented band-bucket + CC shuffles (bounded by near-dup volume);
    the mixture cut is zero-shuffle. Nothing corpus-sized reaches the
    driver.
    """
    from ecokg_spark.functions.text import classifier_score
    from ecokg_spark.operators.dedup import fuzzy_dedup
    from ecokg_spark.operators.sample import stratified_sample

    rates = rates or {"en": 1.0, "de": 0.5, "fr": 0.25}
    d = docs.withColumn("q_score", F.round(classifier_score(text_col), 6))
    tot = d.agg(
        (F.sum(F.col("q_score").cast("decimal(28,12)")).cast("double")
         / F.count(F.lit(1))).alias("_mean"))
    d = (d.crossJoin(F.broadcast(tot))
         .where(F.col("q_score") >= F.lit(score_floor_frac) * F.col("_mean"))
         .drop("_mean"))
    d = fuzzy_dedup(d, text_col, id_col, threshold=threshold, k=k,
                    bands=bands, transitive=True, portable=portable)
    return stratified_sample(d, strata_col, rates, key_col=id_col)


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
    decimals: int = 6,
) -> DataFrame:
    """Robust per-group outlier flags via the modified z-score
    (Iglewicz & Hoaglin 1993): z = 0.6745 * (x - median) / MAD, flagged
    past `threshold` (their recommended 3.5). The ingest-QC dual of
    rolling_zscore — mean/stddev break down exactly where outlier
    detection matters, the median/MAD pair does not (50% breakdown
    point).

    Both medians are exact 0.5-percentile probes (one shuffle on the
    group each, joined back); z is ROUNDed before the flag compare so
    the verdict is reproducible cross-engine (the float-before-ranking
    discipline — interpolated medians of doubles agree to the last ulp
    on the standard lower + 0.5*(upper-lower) formula, and the rounding
    absorbs any summation residue in |x - median|). MAD = 0 (a
    majority-constant group) yields NULL z and no flag. At corpus scale
    swap F.percentile for percentile_approx, same schema.

    Returns df plus (med, mad, z, is_outlier), med/mad/z rounded.
    """
    g = F.col(group_col)
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"))
    with_med = df.join(med, group_col)
    dev = F.abs(F.col(value_col) - F.col("_med"))
    mad = (with_med.select(g.alias(group_col), dev.alias("_dev"))
           .groupBy(group_col)
           .agg(F.percentile("_dev", F.lit(0.5)).alias("_mad")))
    out = with_med.join(mad, group_col)
    z = F.when(
        F.col("_mad") > 0,
        F.round(F.lit(0.6745) * (F.col(value_col) - F.col("_med"))
                / F.col("_mad"), decimals))
    return out.select(
        *df.columns,
        F.round(F.col("_med"), decimals).alias("med"),
        F.round(F.col("_mad"), decimals).alias("mad"),
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_outlier"),
    )
