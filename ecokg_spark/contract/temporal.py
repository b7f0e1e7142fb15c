"""Temporal / event rows: as-of and range joins, SCD2, intervals, funnels, retention, z-scores, OLAP cubes."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ecokg_spark.contract._shared import dec_sum, t


def q_events_window(spark, sf):
    """Tumbling event-time window aggregation (streaming-compatible shape)."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             dec_sum("value").alias("sum_value"))
    )


SQL_EVENTS_WINDOW = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity) per user via lag."""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.withColumn("_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("_new").cast("long").alias("n_sessions"),
             F.count(F.lit(1)).cast("long").alias("n_events"))
    )


SQL_SESSIONIZE = """
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
) GROUP BY user_id
"""


def q_asof_join(spark, sf):
    """As-of join (union + running-window formulation, ONE shuffle on the
    key): every event gets the latest marker event (event_id % 10 == 0)
    at-or-before it for the same user; DuckDB recomputes with its native
    ASOF LEFT JOIN."""
    from ecokg_spark.operators.temporal import asof_join

    ev = t(spark, sf, "events")
    markers = ev.where(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("event_id").alias("marker_id"))
    out = asof_join(ev.select("event_id", "user_id", "ts"), markers,
                    on=["user_id"], right_cols=["marker_id"],
                    tiebreak="marker_id")
    return out.select(
        "event_id", "marker_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("_asof_ts").cast("timestamp")))
        .cast("long").alias("gap_us"),
    )


SQL_ASOF_JOIN = """
WITH m AS (
  SELECT user_id, ts, event_id AS marker_id,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_id % 10 = 0
), md AS (SELECT user_id, ts, marker_id FROM m WHERE rn = 1)
SELECT e.event_id, md.marker_id,
       CAST(date_diff('microsecond', md.ts, e.ts) AS BIGINT) AS gap_us
FROM events e ASOF LEFT JOIN md
  ON e.user_id = md.user_id AND e.ts >= md.ts
"""


def q_range_join_agg(spark, sf):
    """Range join via time-bin bucketed equi-join (right side replicated
    to 3 adjacent bins — bounded fanout, no theta-join cartesian): events
    within +-600s of each marker event per user, aggregated per marker."""
    from ecokg_spark.operators.temporal import range_join

    ev = t(spark, sf, "events")
    markers = ev.where(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("event_id").alias("marker_id"))
    j = range_join(markers, ev.select("user_id", "ts", "value"),
                   on=["user_id"], range_s=600.0, right_cols=["value"])
    return j.groupBy("marker_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_range"),
        dec_sum("value").alias("sum_val"),
    )


SQL_RANGE_JOIN_AGG = """
WITH m AS (
  SELECT user_id, ts, event_id AS marker_id
  FROM events WHERE event_id % 10 = 0
)
SELECT m.marker_id,
       CAST(COUNT(*) AS BIGINT) AS n_in_range,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
FROM m JOIN events e
  ON m.user_id = e.user_id
 AND abs(date_diff('microsecond', e.ts, m.ts)) <= 600000000
GROUP BY m.marker_id
"""


def q_rolling_zscore(spark, sf):
    """Per-user rolling z-score anomaly flags (operators/temporal.py
    rolling_zscore): leave-one-out 20-event baseline, variance from
    running (sum, sum2) so both engines evaluate the same closed form,
    rounded-z comparison for a reproducible flag."""
    from ecokg_spark.operators.temporal import rolling_zscore

    e = t(spark, sf, "events")
    return rolling_zscore(e, key_col="user_id", ts_col="ts",
                          value_col="value", window=20, min_points=5,
                          threshold=3.0, tiebreak_cols=["event_id"])


SQL_ROLLING_ZSCORE = """
WITH w AS (
  SELECT user_id, ts, value,
         COUNT(value) OVER fr AS n,
         SUM(value) OVER fr AS s,
         SUM(value * value) OVER fr AS s2
  FROM events
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT user_id, ts, value, CAST(n AS BIGINT) AS n_baseline,
         CASE WHEN n >= 1 THEN ROUND(s / n, 6) END AS mean,
         CASE WHEN n >= 5
                   AND GREATEST((s2 - s * s / n) / (n - 1), 0.0) > 0
              THEN ROUND((value - s / n)
                         / SQRT(GREATEST((s2 - s * s / n) / (n - 1), 0.0)),
                         6)
         END AS z
  FROM w)
SELECT user_id, ts, value, n_baseline, mean, z,
       COALESCE(ABS(z) > 3.0, FALSE) AS is_anomaly
FROM z
"""


def q_scd2_history(spark, sf):
    """SCD2 validity intervals (operators/temporal.py scd2_intervals):
    per-customer order-status history from the orders log, change-
    compressed, o_orderkey as the deterministic timestamp tiebreak."""
    from ecokg_spark.operators.temporal import scd2_intervals

    o = t(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus")
    return scd2_intervals(o, key_col="o_custkey", ts_col="o_orderdate",
                          attr_cols=["o_orderstatus"],
                          tiebreak_cols=["o_orderkey"])


SQL_SCD2_HISTORY = """
WITH m AS (
  SELECT o_custkey, o_orderdate AS ts, o_orderkey AS sq,
         o_orderstatus AS st,
         LAG(o_orderstatus) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS pst,
         LAG(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS pts
  FROM orders),
c AS (SELECT o_custkey, ts, sq, st FROM m
      WHERE pts IS NULL OR st IS DISTINCT FROM pst),
f AS (
  SELECT o_custkey, st, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY o_custkey ORDER BY ts, sq)
           AS valid_to
  FROM c)
SELECT o_custkey, st AS o_orderstatus, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM f
"""


def q_interval_merge(spark, sf):
    """Gaps-and-islands interval coalescing (operators/temporal.py
    coalesce_intervals): per-user synthetic intervals derived from
    event_id by integer arithmetic (heavy overlap by construction), the
    oracle recomputes the running-max island numbering as window SQL."""
    from ecokg_spark.operators.temporal import coalesce_intervals

    e = t(spark, sf, "events")
    iv = e.select(
        F.col("user_id").alias("k"),
        ((F.col("event_id") * 37) % 3000).alias("s"),
        ((F.col("event_id") * 37) % 3000 + 1
         + F.col("event_id") % 40).alias("e"),
    )
    return coalesce_intervals(iv, "k", "s", "e").withColumnRenamed(
        "k", "user_id")


SQL_INTERVAL_MERGE = """
WITH iv AS (
  SELECT user_id AS k, (event_id * 37) % 3000 AS s,
         (event_id * 37) % 3000 + 1 + event_id % 40 AS e
  FROM events),
m AS (
  SELECT k, s, e,
         MAX(e) OVER (PARTITION BY k ORDER BY s ASC, e ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv),
isl AS (
  SELECT k, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY k ORDER BY s ASC, e ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM m)
SELECT k AS user_id, MIN(s) AS start, MAX(e) AS "end",
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM isl GROUP BY k, island
"""


def q_rollup_cube(spark, sf):
    """Hierarchical subtotal aggregation (SURVEY §2.4 OLAP surface):
    Spark's .rollup over (source, lang) with grouping-set ids — the
    graph-stats YAML's facet rollup generalized to the standard ROLLUP
    form. NULL group keys are disambiguated from real NULLs via
    grouping(), emitted as the literal 'ALL'."""
    d = t(spark, sf, "documents")
    return (
        d.rollup("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_chars").cast("long").alias("n_chars"),
             F.grouping("source").alias("_gs"),
             F.grouping("lang").alias("_gl"))
        .select(
            F.when(F.col("_gs") == 1, F.lit("ALL"))
             .otherwise(F.col("source")).alias("source"),
            F.when(F.col("_gl") == 1, F.lit("ALL"))
             .otherwise(F.col("lang")).alias("lang"),
            "n_docs", "n_chars",
        )
    )


SQL_ROLLUP_CUBE = """
SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
       CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY ROLLUP(source, lang)
"""


def q_pivot_events(spark, sf):
    """Wide-format pivot (SURVEY §2.4): per-user event counts spread
    into one column per event type — Spark groupBy().pivot() with an
    explicit value list (never the distinct-scan inference at scale);
    the oracle is conditional aggregation, the engine-portable pivot
    form."""
    e = t(spark, sf, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = (e.groupBy("user_id")
           .pivot("event_type", types)
           .agg(F.count(F.lit(1))))
    for c in types:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)).cast("long"))
    return out


SQL_PIVOT_EVENTS = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
         AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
         AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS error
FROM events GROUP BY user_id
"""


def q_ts_multi(spark, sf):
    """Multi-format timestamp ingestion (io.py parse_timestamp_multi):
    event times re-rendered in five rotating formats, parsed back with
    the try_to_timestamp coalesce chain; fmt_idx must equal the
    generator's format choice, and the parsed value the original
    truncated to that format's precision."""
    from ecokg_spark.io import parse_timestamp_multi

    e = t(spark, sf, "events")
    m = F.col("event_id") % 5
    raw = (
        F.when(m == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(m == 1, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(m == 2, F.date_format("ts", "yyyy-MM-dd"))
        .when(m == 3, F.date_format("ts", "MM/dd/yyyy HH:mm"))
        .otherwise(F.date_format("ts", "MM/dd/yyyy"))
    )
    p = parse_timestamp_multi(raw)
    return e.select(
        "event_id", p["ts"].alias("parsed_ts"),
        p["fmt_idx"].alias("fmt_idx"))


SQL_TS_MULTI = """
SELECT event_id,
       CASE event_id % 5
         WHEN 0 THEN date_trunc('second', ts)
         WHEN 1 THEN date_trunc('second', ts)
         WHEN 2 THEN date_trunc('day', ts)
         WHEN 3 THEN date_trunc('minute', ts)
         ELSE date_trunc('day', ts) END AS parsed_ts,
       CAST(event_id % 5 AS INT) AS fmt_idx
FROM events
"""


def q_mad_outliers(spark, sf):
    """Robust modified-z outlier flags (operators/curation.py
    mad_outliers): per-event-type median/MAD over the value column,
    z rounded before the flag compare."""
    from ecokg_spark.operators.curation import mad_outliers

    e = t(spark, sf, "events").select("event_id", "event_type", "value")
    return mad_outliers(e, "event_type", "value")


SQL_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS d
  FROM events e JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev
  GROUP BY event_type),
z AS (
  SELECT d.event_id, d.event_type, d.value,
         ROUND(d.med, 6) AS med, ROUND(m.mad, 6) AS mad,
         CASE WHEN m.mad > 0
              THEN ROUND(0.6745 * (d.value - d.med) / m.mad, 6) END AS z
  FROM dev d JOIN mad m USING (event_type))
SELECT event_id, event_type, value, med, mad, z,
       COALESCE(abs(z) > 3.5, FALSE) AS is_outlier
FROM z
"""


def q_funnel(spark, sf):
    """Strict-order funnel (operators/temporal.py funnel_counts):
    click -> view -> purchase per user, each step strictly after the
    previous step's earliest qualifying event."""
    from ecokg_spark.operators.temporal import funnel_counts

    e = t(spark, sf, "events")
    return funnel_counts(e, "user_id", "ts", "event_type",
                         ["click", "view", "purchase"])


SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'click' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'view' GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CAST(0 AS INT) AS step_idx, 'click' AS step,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_keys
UNION ALL SELECT 1, 'view', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT 2, 'purchase', (SELECT COUNT(*) FROM s3)
"""


def q_event_transitions(spark, sf):
    """Markov transition table (operators/temporal.py event_transitions)
    per user over (ts, event_id) order — event_id as the determinism
    tiebreak; probabilities are exact ratios rounded to 6 dp."""
    from ecokg_spark.operators.temporal import event_transitions

    e = t(spark, sf, "events")
    return event_transitions(e, "user_id", "ts", "event_type",
                             tiebreak_cols=["event_id"])


SQL_EVENT_TRANSITIONS = """
WITH p AS (
  SELECT event_type AS from_step,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_step
  FROM events),
c AS (
  SELECT from_step, to_step, CAST(COUNT(*) AS BIGINT) AS n
  FROM p WHERE to_step IS NOT NULL GROUP BY from_step, to_step),
tot AS (SELECT from_step, SUM(n) AS tt FROM c GROUP BY from_step)
SELECT c.from_step, c.to_step, c.n, ROUND(c.n / t2.tt, 6) AS p
FROM c JOIN tot t2 USING (from_step)
"""


def q_retention(spark, sf):
    """Cumulative-audience curve (operators/temporal.py retention_curve):
    exact expanding distinct via the first-seen decomposition — one
    aggregate + one tiny running-sum window, never a distinct-over-
    expanding-window."""
    from ecokg_spark.operators.temporal import retention_curve

    e = t(spark, sf, "events")
    return retention_curve(e, "user_id", "ts", bucket="day")


SQL_RETENTION = """
WITH k AS (SELECT user_id AS u,
                  CAST(date_trunc('day', ts) AS TIMESTAMP) AS b
           FROM events),
active AS (
  SELECT b, CAST(COUNT(DISTINCT u) AS BIGINT) AS n_active
  FROM k GROUP BY b),
fs AS (SELECT u, MIN(b) AS fb FROM k GROUP BY u),
new AS (SELECT fb AS b, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM fs GROUP BY fb)
SELECT a.b AS bucket_start, a.n_active,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(SUM(COALESCE(n.n_new, 0))
            OVER (ORDER BY a.b ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS n_cumulative
FROM active a LEFT JOIN new n ON a.b = n.b
"""
