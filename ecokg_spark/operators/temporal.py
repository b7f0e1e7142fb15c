"""Temporal joins the built-in operator set lacks: as-of join and range
join, composed from DataFrame primitives (no UDF, no cross join).

The reference has no temporal operators (SURVEY.md §2.3 "theta/range/as-of
joins — none in reference"); these are beyond-parity additions for the
event/feature side of a training-data pipeline (latest-feature-as-of
lookup, neighborhood aggregation around anchor events).

Scale shape:
  * `asof_join` is the classic union + running-window formulation: both
    sides shuffle ONCE on the join key, then a single windowed pass fills
    the most recent right-side payload forward. No per-left-row probe, no
    range explosion — at 100 TB this is one key-partitioned sort, the same
    cost class as sessionization.
  * `range_join` buckets time into `range`-sized bins and equi-joins on
    (key, bin), with the right side replicated to its 3 adjacent bins —
    candidate fanout is bounded by 3x the right side instead of the
    |left| x |right| theta join a naive BETWEEN predicate degenerates to.
    Catalyst sees a plain equi-join, so AQE/skew handling apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MICROS = 1_000_000


def _us(c) -> "F.Column":
    """Epoch microseconds; the cast makes TIMESTAMP_NTZ inputs (what
    parquet timestamps load as) acceptable to unix_micros — both join
    sides shift by the same session offset, so gaps and bins agree."""
    return F.unix_micros(c.cast("timestamp"))


def _dedup_right(right: DataFrame, on: list[str], ts: str,
                 tiebreak: str | None) -> DataFrame:
    """At most one right row per (key, ts): without this, the as-of match
    at an exactly-tied timestamp would be partition-dependent. Tiebreak
    keeps the MAX of `tiebreak` (deterministic); None asserts uniqueness
    is the caller's contract."""
    if tiebreak is None:
        return right
    w = Window.partitionBy(*on, ts).orderBy(F.col(tiebreak).desc())
    return (right.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    `right_ts` <= `left_ts` (direction='backward', inclusive) or the
    smallest `right_ts` >= `left_ts` ('forward') sharing the `on` keys.

    Unmatched left rows keep NULL right columns (left-outer semantics).
    `tolerance_s` voids matches further than that many seconds away.
    Returns all left columns + `right_cols` + `_asof_ts` (the matched
    right timestamp, NULL when unmatched).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols clash with left columns: {sorted(clash)}")

    # the right payload travels as ONE struct so the fill is row-ATOMIC:
    # filling each column independently would let a NULL field in the
    # matched right row pull that field from an OLDER right row, stitching
    # the output from two different rows
    r = _dedup_right(right, on, right_ts, tiebreak).select(
        *on,
        F.col(right_ts).alias("_t"),
        F.struct(F.col(right_ts).alias("_asof_ts"), *right_cols).alias("_p"),
    )

    lu = left.select(
        *left.columns,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    ru = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        *on,
        "_t",
        F.lit(0).alias("_is_l"),
        "_p",
    )
    u = lu.unionByName(ru)

    # at equal timestamps the right row must precede the left row so the
    # inclusive match is visible to last(ignorenulls); forward scans the
    # timeline in reverse
    order = [F.col("_t").asc(), F.col("_is_l").asc()] \
        if direction == "backward" else \
        [F.col("_t").desc(), F.col("_is_l").asc()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (u.withColumn("_p", F.last("_p", ignorenulls=True).over(w))
           .where(F.col("_is_l") == 1))

    if tolerance_s is not None:
        tol = int(tolerance_s * _MICROS)
        gap = F.abs(_us(F.col("_t")) - _us(F.col("_p._asof_ts")))
        keep = F.col("_p").isNotNull() & (gap <= tol)
        out = out.withColumn("_p", F.when(keep, F.col("_p")))
    return out.select(
        *left.columns,
        F.col("_p._asof_ts").alias("_asof_ts"),
        *[F.col(f"_p.{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    range_s: float = 300.0,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs sharing `on` with |left_ts - right_ts| <=
    range_s, produced by a BUCKETED equi-join: left lands in its own
    time bin, right replicates to bins {b-1, b, b+1}, the bin becomes
    part of the join key, and the exact band predicate filters after.
    Each qualifying pair appears exactly once (left sits in one bin).

    Returns left columns + right_cols + `_r_ts` (the right timestamp).
    """
    range_us = int(range_s * _MICROS)
    if range_us <= 0:
        raise ValueError("range_s must be positive")
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols clash with left columns: {sorted(clash)}")

    # floor, not cast: truncation would mis-bin pre-1970 timestamps
    lbin = F.floor(_us(F.col(left_ts)) / F.lit(range_us)) \
        .cast("long").alias("_bin")
    l_ = left.select("*", lbin)
    rbin = F.floor(_us(F.col(right_ts)) / F.lit(range_us)).cast("long")
    r_ = (right.select(*on, F.col(right_ts).alias("_r_ts"), *right_cols,
                       rbin.alias("_rbin"))
          .withColumn("_bin", F.explode(F.array(
              F.col("_rbin") - 1, F.col("_rbin"), F.col("_rbin") + 1)))
          .drop("_rbin"))

    j = l_.join(r_, [*on, "_bin"])
    band = (F.abs(_us(F.col(left_ts)) - _us(F.col("_r_ts"))) <= range_us)
    return j.where(band).drop("_bin")


def scd2_intervals(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    compress: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an update log: per
    key, each attribute state becomes one row with a validity interval
    [valid_from, valid_to) — valid_to is the next change's timestamp,
    NULL for the current state (the Kimball SCD2 convention). Returns
    (key, attrs..., valid_from, valid_to, is_current).

    ``compress=True`` (default) drops consecutive updates whose
    attributes did not change, so intervals describe STATE CHANGES, not
    raw update arrivals. ``tiebreak_cols`` extends the per-key ordering
    beyond ts_col so same-timestamp updates order deterministically —
    REQUIRED when the log can carry timestamp ties (pass the log's
    sequence/id column); without it lead()/lag() on tied rows is
    nondeterministic and two runs can emit different histories.

    Scale shape: everything is windows over ONE shuffle on the key —
    lag() for change detection and lead() for interval close share the
    same (key, ts, tiebreak) sort order, so Catalyst plans a single
    exchange + sort. No join, no driver state; exactly the cost class of
    sessionization at 100 TB.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    df = updates
    if compress:
        changed = F.lit(False)
        for c in attr_cols:
            prev = F.lag(F.col(c)).over(w)
            # null-safe inequality: a NULL attr differs from a non-NULL
            changed = changed | ~F.col(c).eqNullSafe(prev)
        first = F.lag(F.col(ts_col)).over(w).isNull()
        df = df.withColumn("_chg", first | changed).where(F.col("_chg")) \
               .drop("_chg")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w2)
    return df.select(
        key_col, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    gap: int = 0,
) -> DataFrame:
    """Merge overlapping (and, with ``gap`` > 0, near-adjacent) numeric
    intervals per key — the gaps-and-islands operator. Used for crawl
    coverage windows (which time ranges of a site do we actually hold),
    validity-interval compaction after SCD2 merges, and dup-span overlap
    collapse. Returns (key, start, end, n_intervals) with one row per
    maximal merged island.

    Two intervals on the same key merge when the later one starts at or
    before (running max end + gap): sort by (start, end), take the
    running max of end over all PRECEDING rows, open a new island when
    the current start exceeds it, and number islands with a running sum
    of the island-open flag. Standard SQL gaps-and-islands — exactly
    recomputable by any window-capable engine.

    Scale shape: both windows and the final aggregate share ONE shuffle
    on the key with the same (start, end) sort — Catalyst plans a single
    exchange + sort, then the island aggregate is map-side combinable.
    Per-row window state is O(1) (running max / running sum). A key with
    a billion intervals is a single sort partition — pre-split such keys
    upstream (e.g. by coarse time bucket) if one key dominates the
    corpus; island ids are local to the key so bucket-splitting only
    risks missing merges ACROSS bucket boundaries, which a second
    coalesce pass over the per-bucket output repairs.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc())
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + F.lit(gap)),
        F.lit(1),
    ).otherwise(F.lit(0))
    island = F.sum(opens).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_island", island)
        .groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .drop("_island")
    )


def rolling_zscore(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: int = 20,
    min_points: int = 5,
    threshold: float = 3.0,
    tiebreak_cols: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags over the PRECEDING `window`
    events — the current row is excluded from its own baseline
    (leave-one-out), so a spike cannot mask itself. The standard
    event-stream QC gate (ingest monitoring, sensor/metric validation).
    Returns (key, ts, value, n_baseline, mean, z, is_anomaly); z is NULL
    (and is_anomaly false) below `min_points` baseline rows or at zero
    variance.

    Variance comes from running (sum, sum-of-squares) over the row frame
    rather than a built-in stddev: both engines then compute the same
    closed form from the same sums (built-in one-pass stddev algorithms
    differ across engines beyond the last ulp). Catastrophic cancellation
    can push the closed form epsilon-negative — clamped at 0. mean/z are
    rounded, and the anomaly comparison uses the ROUNDED z, so the flag
    is reproducible cross-engine.

    Scale shape: ONE shuffle on the key; every aggregate is a sliding
    row-frame window over the same (key, ts, tiebreak) sort. Bounded
    frame (`window` rows), so state per row is O(1) — the batch dual of
    the streaming sessionizer's cost class.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])]
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-window, -1))
    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean = s / n
    var = F.greatest((s2 - s * s / n) / (n - 1), F.lit(0.0))
    z = F.when((n >= min_points) & (var > 0),
               F.round((v - mean) / F.sqrt(var), decimals))
    return events.select(
        key_col,
        F.col(ts_col).alias("ts"),
        v.alias("value"),
        n.cast("long").alias("n_baseline"),
        F.when(n >= 1, F.round(mean, decimals)).alias("mean"),
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def recrawl_priority(
    history: DataFrame,
    key_col: str,
    ts_col: str,
    changed_col: str,
    now_ts,
    decimals: int = 6,
) -> DataFrame:
    """Recrawl scheduling priority from a per-URL observation history
    (Cho & Garcia-Molina 2003's Poisson change model, the classic
    freshness policy): estimate each page's change rate lambda =
    changes / observed-span-days, then priority = 1 - exp(-lambda *
    days-since-last-crawl) — the probability the page has changed since
    we last fetched it. Rank the frontier by priority descending.

    `history` has one row per (key, observation ts, changed flag);
    `now_ts` is the scheduling instant (pass an explicit literal — the
    job must be deterministic/replayable, so no clock reads here).
    Pages with a single observation (no measurable span) fall back to
    lambda = 1/day (crawl-soon optimism), the standard cold-start
    choice. exp() is IEEE-identical cross-engine on identical inputs;
    lambda and priority are ROUNDed (the float-before-ranking
    discipline).

    One shuffle on the key (the per-key aggregate). Returns
    (key, n_obs, n_changes, lambda_per_day, priority).
    """
    span_days = (
        (F.unix_micros(F.max(F.col(ts_col)).cast("timestamp"))
         - F.unix_micros(F.min(F.col(ts_col)).cast("timestamp")))
        / F.lit(86_400_000_000.0))
    agg = history.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col(changed_col).cast("long")).cast("long")
         .alias("n_changes"),
        span_days.alias("_span"),
        F.max(F.col(ts_col).cast("timestamp")).alias("_last"),
    )
    lam = F.when(F.col("_span") > 0,
                 F.col("n_changes") / F.col("_span")).otherwise(F.lit(1.0))
    age_days = (
        (F.unix_micros(F.lit(now_ts).cast("timestamp"))
         - F.unix_micros(F.col("_last"))) / F.lit(86_400_000_000.0))
    lam_r = F.round(lam, decimals)
    prio = F.round(F.lit(1.0) - F.exp(-lam_r * age_days), decimals)
    return agg.select(
        key_col, "n_obs", "n_changes",
        lam_r.alias("lambda_per_day"),
        prio.alias("priority"),
    )


def funnel_counts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: how many keys (users/sessions) reached
    each step of `steps` IN ORDER — step k counts a key iff it has an
    event of step k at a timestamp strictly after its earliest
    qualifying step-(k-1) event (the classic strict-order funnel; ties
    at the same timestamp do not advance). Returns
    (step_idx, step, n_keys), n_keys non-increasing in step_idx.

    Shape: one min-timestamp aggregate per step, each joined on the key
    against the previous frontier — len(steps) small-key-space
    aggregates and joins, never a per-key sort of the full event log.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    spark_rows = []
    frontier = None
    for i, s in enumerate(steps):
        ev = events.where(F.col(step_col) == s).select(
            F.col(key_col).alias("_k"), F.col(ts_col).alias("_t"))
        if frontier is None:
            cur = ev.groupBy("_k").agg(F.min("_t").alias("_ft"))
        else:
            cur = (
                ev.join(frontier, "_k")
                .where(F.col("_t") > F.col("_ft"))
                .groupBy("_k")
                .agg(F.min("_t").alias("_ft"))
            )
        frontier = cur.localCheckpoint()
        spark_rows.append(
            frontier.agg(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_keys")))
    out = spark_rows[0]
    for fr in spark_rows[1:]:
        out = out.unionByName(fr)
    return out


def event_transitions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    tiebreak_cols: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """First-order Markov transition table of event types per key: for
    each consecutive event pair in (ts, tiebreak) order, count
    (from_step, to_step) and the row-normalized transition probability
    — the behavioral fingerprint session-quality and bot-detection
    heuristics read. Pass `tiebreak_cols` when timestamps can tie (the
    lead() determinism rule, as in scd2_intervals).

    ONE shuffle on the key for the lead window, then a map-side-
    combinable pair count and a broadcast-sized from-step total join.
    Probabilities are exact-integer ratios divided once in double and
    ROUNDed. Returns (from_step, to_step, n, p).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        events.select(F.col(key_col), F.col(step_col).alias("from_step"),
                      *[F.col(c) for c in [ts_col, *(tiebreak_cols or [])]])
        .withColumn("to_step", F.lead("from_step").over(w))
        .where(F.col("to_step").isNotNull())
        .groupBy("from_step", "to_step")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_step").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_step")
        .select("from_step", "to_step", "n",
                F.round(F.col("n") / F.col("_tot"), decimals).alias("p"))
    )


def retention_curve(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Cumulative-audience curve: per time bucket, how many DISTINCT
    keys have appeared up to and including it — the growth/retention
    denominator every engagement report starts from. A distinct-count
    over an expanding window is intractable directly; the exact
    first-seen decomposition isn't: cumulative_distinct(b) = sum over
    buckets <= b of |keys first seen in that bucket|. One aggregate for
    first-seen, one bucket count, one running-sum window over the
    bucket-cardinality table (tiny). Also emits the per-bucket active
    distinct count for the same report. Returns
    (bucket_start, n_active, n_new, n_cumulative).
    """
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    keyed = events.select(F.col(key_col).alias("_k"), b.alias("_b"))
    active = keyed.groupBy("_b").agg(
        F.countDistinct("_k").cast("long").alias("n_active"))
    first_seen = keyed.groupBy("_k").agg(F.min("_b").alias("_fb"))
    new = first_seen.groupBy("_fb").agg(
        F.count(F.lit(1)).cast("long").alias("n_new"))
    joined = active.join(
        new.withColumnRenamed("_fb", "_b"), "_b", "left"
    ).withColumn("n_new", F.coalesce("n_new", F.lit(0)).cast("long"))
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        F.col("_b").alias("bucket_start"), "n_active", "n_new",
        F.sum("n_new").over(w).cast("long").alias("n_cumulative"),
    )
