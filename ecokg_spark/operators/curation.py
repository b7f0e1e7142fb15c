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
