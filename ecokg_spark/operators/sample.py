"""Deterministic sampling operators for corpus curation.

Training-data pipelines need samples that are (a) reproducible across
runs and cluster layouts — `df.sample()` is neither — and (b) exactly
recomputable by an independent engine for auditing. Both operators here
key on md5 of a stable id, so the DuckDB oracle reproduces the selected
set verbatim.

100-TB shape: hash_sample is a narrow filter (no shuffle at all).
domain_quota_sample is the salted two-phase top-k: stage 1 windows over
(domain, salt) so a mega-site's rows split across `salts` partitions and
each keeps at most `quota`; stage 2 windows over domain on the <=
salts*quota survivors. No single task ever sorts a whole hot domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecokg_spark.functions.url import url_registered_domain


def sample_threshold_hex(rate: float) -> str:
    """8-hex-digit threshold for a Bernoulli(rate) content-hash sample:
    keep rows whose md5-prefix sorts below it (lowercase fixed-width hex
    compares lexicographically == numerically)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def hash_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 8 hex
    chars of md5(key) fall below the rate threshold. Same input -> same
    sample, on any cluster, in any engine with md5."""
    if rate >= 1.0:
        return df
    th = sample_threshold_hex(rate)
    return df.where(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8) < F.lit(th)
    )


def domain_quota_sample(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quota: int = 100,
) -> DataFrame:
    """Cap each registered domain's contribution at `quota` documents,
    picked uniformly-by-hash (order by md5(id), tie-broken by id — fully
    deterministic). The standard guard against one mega-site dominating a
    crawl-derived corpus.

    Returns the input columns plus (domain, rank), rank in [1, quota].
    """
    h = F.md5(F.col(id_col).cast("string"))
    keyed = (
        df.withColumn("_dom", url_registered_domain(url_col))
        .withColumn("_h", h)
        .withColumn("_salt", F.substring("_h", 1, 1))
    )
    # stage 1: per (domain, salt) — bounds any single window partition
    w1 = Window.partitionBy("_dom", "_salt").orderBy("_h", id_col)
    stage1 = (
        keyed.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= quota)
        .drop("_r1")
    )
    # stage 2: exact top-quota over the <= 16*quota survivors per domain
    w2 = Window.partitionBy("_dom").orderBy("_h", id_col)
    return (
        stage1.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= quota)
        .withColumnRenamed("_dom", "domain")
        .drop("_h", "_salt")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — the
    temperature/importance-resampling primitive training-data mixes are
    built from (upsample rare high-quality strata, downsample the head;
    cf. the public data-mixture weighting in Gopher/Pile-style recipes,
    done here as exact per-stratum keep rates).

    Each stratum s keeps rows whose md5(key) 8-hex prefix sorts below
    threshold(rates[s]); a stratum absent from `rates` uses
    `default_rate` (0.0 = drop — an explicit mixture spec drops unknown
    strata rather than silently passing them). Rates >= 1.0 keep the
    whole stratum. The SAME key prefix decides every stratum, so nested
    mixtures compose: a row kept at rate r stays kept at any rate > r
    (coupon-collector-free monotone subsampling, the property you need
    to re-cut a mixture without reshuffling data).

    100-TB shape: a narrow filter against a broadcast-size CASE — no
    shuffle, no UDF, exact DuckDB twin.
    """
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    expr = None
    for stratum, rate in sorted(rates.items()):
        th = F.lit(sample_threshold_hex(min(rate, 1.0)))
        cond = (F.col(strata_col) == stratum) & (
            F.lit(rate >= 1.0) | (h < th))
        expr = cond if expr is None else (expr | cond)
    if default_rate > 0.0:
        known = list(sorted(rates))
        dflt = (~F.col(strata_col).isin(known)) & (
            F.lit(default_rate >= 1.0)
            | (h < F.lit(sample_threshold_hex(min(default_rate, 1.0)))))
        expr = dflt if expr is None else (expr | dflt)
    if expr is None:
        return df.where(F.lit(False))
    return df.where(expr)


def fixed_size_sample(df: DataFrame, n: int, key_col: str) -> DataFrame:
    """Exactly-n deterministic sample: the n rows whose md5(key) sorts
    first (ties broken by key). Unlike a Bernoulli rate, the output SIZE
    is exact — the 'give me exactly 100k eval docs' primitive — and it is
    layout- and engine-independent.

    100-TB shape: orderBy+limit executes as TakeOrderedAndProject —
    every partition keeps its local top-n and the driver merges n-row
    heaps; the corpus is never globally sorted."""
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    h = F.md5(F.col(key_col).cast("string"))
    return (df.withColumn("_h", h)
            .orderBy(F.col("_h").asc(), F.col(key_col).asc())
            .limit(n)
            .drop("_h"))


def _hashed_ngram_features(df: DataFrame, id_col: str, text_col: str,
                           dims: int, portable: bool) -> DataFrame:
    """(id, bkt) hashed word unigram+bigram features — the DSIR feature
    space (Xie et al. 2023 use hashed n-grams for exactly this). Bucket
    spec matches embed.hashed_bow_embed: portable=True is the md5
    15-hex-char bucket a SQL oracle recomputes verbatim; portable=False
    is the xxhash64 production path."""
    from ecokg_spark.functions.text import normalize_ws

    d = df.select(F.col(id_col).alias("id"),
                  F.split(normalize_ws(text_col), " ").alias("_tk"))
    uni = (d.select("id", F.explode("_tk").alias("_f"))
           .where(F.col("_f") != ""))
    # bigram i joins 0-based tokens (i-1, i); guarded because
    # F.sequence(2, 1) would DESCEND, not produce an empty array
    bigrams = F.when(
        F.size("_tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_tk") - 1),
            lambda i: F.concat_ws(" ", F.get("_tk", i - 1), F.get("_tk", i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = d.select("id", F.explode(bigrams).alias("_f"))
    feats = uni.unionByName(big)
    if portable:
        bkt = F.pmod(
            F.conv(F.substring(F.md5(F.col("_f")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(dims),
        )
    else:
        bkt = F.pmod(F.xxhash64("_f"), F.lit(dims))
    return feats.select("id", bkt.alias("bkt"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = 1024,
    alpha: float = 1.0,
    portable: bool = False,
    decimals: int = 6,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, Data Selection via
    Importance Resampling): score every raw document by how target-like
    its hashed n-gram distribution is —

        logweight(d) = sum over buckets g of c_g(d) *
                       ( ln p_hat(g | target) - ln p_hat(g | raw) )

    with add-alpha smoothed bucket distributions. Downstream, sampling
    raw docs with probability proportional to exp(logweight) yields a
    target-distributed subset (pair with hash_sample / fixed_size_sample
    for the deterministic draw). Returns (id_col, n_features, logweight)
    for EVERY raw doc; featureless (blank) docs weigh 0.0.

    Scale shape: feature extraction is a narrow explode; each corpus
    reduces to a dims-row bucket histogram (map-side combine absorbs the
    Zipf head), totals ride along as broadcast 1-row aggregates, and the
    log-ratio table — dims rows, a PARAMETER independent of corpus size —
    broadcasts into one (id, bkt) aggregate join. One corpus-sized
    shuffle total (the per-doc bucket aggregate). The target corpus is
    typically sample-sized (the quality exemplar set), but nothing here
    requires it.
    """
    fr = _hashed_ngram_features(raw, id_col, text_col, dims, portable)
    ft = _hashed_ngram_features(target, id_col, text_col, dims, portable)
    rg = fr.groupBy("bkt").agg(F.count(F.lit(1)).cast("double").alias("rc"))
    tg = ft.groupBy("bkt").agg(F.count(F.lit(1)).cast("double").alias("tc"))
    rtot = rg.agg(F.sum("rc").alias("_R"))
    ttot = tg.agg(F.coalesce(F.sum("tc"), F.lit(0.0)).alias("_T"))
    lr = (
        rg.join(tg, "bkt", "left")
        .crossJoin(F.broadcast(rtot)).crossJoin(F.broadcast(ttot))
        .select(
            "bkt",
            (F.log((F.coalesce(F.col("tc"), F.lit(0.0)) + alpha)
                   / (F.col("_T") + alpha * dims))
             - F.log((F.col("rc") + alpha)
                     / (F.col("_R") + alpha * dims))).alias("lr"),
        )
    )
    perdoc = (
        fr.groupBy("id", "bkt")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .join(F.broadcast(lr), "bkt")
        .groupBy("id")
        .agg(F.sum("c").cast("long").alias("n_features"),
             F.round(F.sum(F.col("c") * F.col("lr")),
                     decimals).alias("logweight"))
    )
    ids = raw.select(F.col(id_col).alias("id"))
    return (
        ids.join(perdoc, "id", "left")
        .select(F.col("id").alias(id_col),
                F.coalesce("n_features", F.lit(0)).cast("long")
                .alias("n_features"),
                F.coalesce("logweight", F.lit(0.0)).alias("logweight"))
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    temperature: float = 2.0,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled mixture weights over corpus sources — the
    mT5/Pile sampling rule: source i gets probability
    n_i^(1/T) / sum_j n_j^(1/T). T=1 is proportional sampling, T->inf
    uniform; published pipelines run T in [2, 5] to up-weight small
    high-quality sources without drowning the big ones.

    Cross-engine determinism: for the default T=2 the weight is
    SQRT(n) — IEEE 754 requires a correctly-rounded sqrt, so Spark (JVM)
    and DuckDB (libm) produce bit-identical doubles (general pow() does
    NOT carry that guarantee — contract rows should stick to T=2).
    Weights are then staged through their shortest string repr into
    DECIMAL(38,18) so the normalizing sum is exact integer arithmetic
    (no accumulation-order drift), and both the weight and the sum come
    back to double THROUGH the fixed-scale decimal string (engine decimal
    ->double conversions differ in the last ulp; strtod is correctly
    rounded everywhere) — the group_centroids staging discipline.

    `share` is ROUND(w/total, 6); expected_docs (when `budget` is given)
    is FLOOR(share * budget) on the ROUNDED share, so both engines floor
    the same double product.

    Scale shape: one map-side-combinable count shuffle on the source key,
    then a single-partition window over the source-level table (sources
    number in the hundreds, not the billions — the window input is
    aggregate-sized by construction).

    Returns (group_col, n_docs, share[, expected_docs]).
    """
    if temperature == 2.0:
        w = F.sqrt(F.col("n_docs"))
    else:
        w = F.pow(F.col("n_docs"), F.lit(1.0 / temperature))
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    staged = counts.select(
        group_col, "n_docs",
        w.cast("string").cast("decimal(38,18)").alias("_w"),
    )
    total = F.sum("_w").over(Window.partitionBy())
    share = F.round(
        F.col("_w").cast("string").cast("double")
        / total.cast("string").cast("double"),
        6,
    ).alias("share")
    out = staged.select(group_col, "n_docs", share)
    if budget is not None:
        out = out.withColumn(
            "expected_docs",
            F.floor(F.col("share") * F.lit(int(budget))).cast("long"),
        )
    return out


def group_fixed_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
) -> DataFrame:
    """Exactly min(n, group size) rows PER GROUP, deterministically —
    the per-domain / per-source cap a mixture policy needs when rates
    (domain_quota_sample) are too coarse: order each group by
    (md5(key), key) and keep the first n. The md5 order is a uniform
    permutation independent of the data layout, so the kept set is a
    true deterministic random sample of each group and is NESTED in the
    kept set for any larger n (enlarging the budget only adds rows).

    One shuffle on the group key; the rank<=n filter hits Spark's
    WindowGroupLimit partial top-k, so a giant group never materializes
    a full sort (same plan class as window_topk). Returns the sampled
    rows of ``df``.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
