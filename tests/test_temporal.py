"""As-of and range joins (beyond-reference temporal operators)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ecokg_spark.operators.temporal import asof_join, range_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", ts("2024-01-01 10:00:05"), 100.0),
         (2, "A", ts("2024-01-01 10:00:10"), 101.0),
         (3, "B", ts("2024-01-01 10:00:07"), 50.0),
         (4, "C", ts("2024-01-01 10:00:07"), 7.0)],
        "trade_id long, sym string, ts timestamp, px double")
    quotes = spark.createDataFrame(
        [(10, "A", ts("2024-01-01 10:00:03"), 99.5),
         (11, "A", ts("2024-01-01 10:00:10"), 100.5),   # equal-ts match
         (12, "A", ts("2024-01-01 10:00:20"), 102.0),
         (13, "B", ts("2024-01-01 10:00:01"), 49.0)],
        "quote_id long, sym string, ts timestamp, bid double")
    return trades, quotes


def test_asof_backward_inclusive(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"],
                    right_cols=["quote_id", "bid"]).collect()
    got = {r["trade_id"]: (r["quote_id"], r["bid"]) for r in out}
    assert got[1] == (10, 99.5)
    assert got[2] == (11, 100.5)      # ties at equal ts match inclusively
    assert got[3] == (13, 49.0)
    assert got[4] == (None, None)     # no C quotes -> left outer NULLs
    assert len(out) == 4


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], direction="forward",
                    right_cols=["quote_id"]).collect()
    got = {r["trade_id"]: r["quote_id"] for r in out}
    assert got[1] == 11       # next quote at/after 10:00:05
    assert got[2] == 11       # equal ts inclusive
    assert got[3] is None     # no B quote after 10:00:07


def test_asof_tolerance_voids_stale_match(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], tolerance_s=3.0,
                    right_cols=["quote_id"]).collect()
    got = {r["trade_id"]: r["quote_id"] for r in out}
    assert got[1] == 10       # 2s gap, within tolerance
    assert got[2] == 11       # 0s gap
    assert got[3] is None     # 6s gap voided; row kept
    assert len(out) == 4


def test_asof_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, "A", ts("2024-01-01 00:00:10"))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(7, "A", ts("2024-01-01 00:00:05")),
         (9, "A", ts("2024-01-01 00:00:05"))],
        "rid long, k string, ts timestamp")
    out = asof_join(left, right, on=["k"], right_cols=["rid"],
                    tiebreak="rid").collect()
    assert out[0]["rid"] == 9     # max tiebreak survives the tie


def test_asof_null_payload_row_atomic(spark):
    """The matched right row attaches ATOMICALLY: a NULL field in the
    matched row stays NULL instead of backfilling from an older right row
    (per-column ignorenulls fill would stitch two rows together)."""
    left = spark.createDataFrame([("k", 3)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", 1, 5, None), ("k", 2, None, 7)],
        "k string, ts long, a int, b int")
    out = asof_join(left, right, on=["k"]).collect()
    assert len(out) == 1
    assert out[0]["_asof_ts"] == 2
    assert out[0]["a"] is None and out[0]["b"] == 7


def test_range_join_band(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = range_join(trades, quotes, on=["sym"], range_s=5.0,
                     right_cols=["quote_id"]).collect()
    pairs = sorted((r["trade_id"], r["quote_id"]) for r in out)
    # trade1 A@05: quotes @03 (2s) and @10 (5s, inclusive); trade2 A@10:
    # quote @10 only; trade3 B@07: quote @01 is 6s away -> excluded
    assert pairs == [(1, 10), (1, 11), (2, 11)]


def test_range_join_matches_theta_join(spark):
    """Bucketed equi-join == naive theta join on a randomized-ish grid."""
    left = spark.range(0, 40).select(
        (F.col("id") % 4).cast("string").alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 37).alias("ts"))
    right = spark.range(0, 40).select(
        (F.col("id") % 4).cast("string").alias("k"),
        F.col("id").alias("rid"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 53 + 11).alias("ts"))
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(left, right, on=["k"], range_s=60.0,
                            right_cols=["rid"]).collect())
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.alias("l").join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.abs(F.unix_micros(F.col("l.ts"))
                     - F.unix_micros(F.col("r.ts"))) <= 60_000_000),
        ).select(F.col("l.lid"), F.col("r.rid")).collect())
    assert got == naive and len(got) > 0


def test_column_clash_rejected(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="clash"):
        asof_join(trades, quotes.withColumnRenamed("bid", "px"),
                  on=["sym"], right_cols=["px"])


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_plan_single_shuffle_without_tiebreak(spark, trades_quotes):
    """The union+window formulation shuffles ONCE on the key (the tiebreak
    dedup adds a second, differently-keyed exchange only when requested)."""
    trades, quotes = trades_quotes
    p = _plan(asof_join(trades, quotes, on=["sym"], right_cols=["bid"]))
    assert p.count("Exchange") == 1
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_range_join_plan_no_cartesian(spark, trades_quotes):
    """The bucketed formulation must reach Catalyst as an equi-join — a
    BETWEEN-style theta join would degenerate to nested-loop."""
    trades, quotes = trades_quotes
    p = _plan(range_join(trades, quotes, on=["sym"], range_s=5.0,
                         right_cols=["bid"]))
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert ("SortMergeJoin" in p) or ("HashJoin" in p)


def test_coalesce_intervals(spark):
    from ecokg_spark.operators.temporal import coalesce_intervals

    rows = [
        # key a: [1,5] [3,7] overlap -> [1,7]; [10,12] separate
        ("a", 1, 5), ("a", 3, 7), ("a", 10, 12),
        # key b: touching endpoints merge ([1,2] + [2,3])
        ("b", 1, 2), ("b", 2, 3), ("b", 5, 6),
        # key c: contained interval collapses
        ("c", 0, 10), ("c", 2, 3),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = coalesce_intervals(df, "k", "s", "e")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("a", 1, 7, 2), ("a", 10, 12, 1),
        ("b", 1, 3, 2), ("b", 5, 6, 1),
        ("c", 0, 10, 2),
    ]


def test_coalesce_intervals_gap(spark):
    from ecokg_spark.operators.temporal import coalesce_intervals

    df = spark.createDataFrame(
        [("a", 1, 2), ("a", 4, 5), ("a", 9, 10)], "k string, s long, e long")
    # gap=2 bridges 2 -> 4 but not 5 -> 9
    out = coalesce_intervals(df, "k", "s", "e", gap=2)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("a", 1, 5, 2), ("a", 9, 10, 1)]


def test_recrawl_priority(spark):
    import datetime as dt

    from ecokg_spark.operators.temporal import recrawl_priority

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # hot page: observed daily for 10 days, changed every time
    for i in range(10):
        rows.append(("hot", t0 + dt.timedelta(days=i), True))
    # cold page: observed daily for 10 days, changed once
    for i in range(10):
        rows.append(("cold", t0 + dt.timedelta(days=i), i == 5))
    # single observation: cold-start lambda = 1/day
    rows.append(("new", t0, True))
    h = spark.createDataFrame(rows, "url string, ts timestamp, changed boolean")
    now = dt.datetime(2024, 1, 15)
    got = {r["url"]: r for r in
           recrawl_priority(h, "url", "ts", "changed", now).collect()}
    import math
    # hot: lambda = 10/9, age 5 days since last obs (t0+9d) -> near 1
    lam_hot = round(10 / 9, 6)
    assert abs(got["hot"]["lambda_per_day"] - lam_hot) < 1e-9
    assert abs(got["hot"]["priority"]
               - round(1 - math.exp(-lam_hot * 5), 6)) < 1e-9
    # cold changes rarely -> lower priority than hot at equal age
    assert got["cold"]["priority"] < got["hot"]["priority"]
    # cold-start: lambda = 1.0
    assert got["new"]["lambda_per_day"] == 1.0
    assert got["new"]["n_obs"] == 1


def test_degree_assortativity(spark):
    from ecokg_spark.operators.kgqc import degree_assortativity

    # star graph: hub -> leaves is maximally disassortative in the
    # (out-deg, in-deg) pairing only when degrees VARY; a pure star has
    # constant degrees per side -> NULL (zero variance)
    star = spark.createDataFrame(
        [("h", f"l{i}") for i in range(5)], "src string, dst string")
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 5 and r["assortativity"] is None

    # mixed graph: hub->hub edge plus hub->leaf edges gives variance
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b"), ("d", "e"), ("f", "b")],
        "src string, dst string")
    r2 = degree_assortativity(e).collect()[0]
    assert r2["n_edges"] == 5 and r2["assortativity"] is not None
    assert -1.0 <= r2["assortativity"] <= 1.0


def test_funnel_counts(spark):
    import datetime as dt

    from ecokg_spark.operators.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, s, m):
        return (u, t0 + dt.timedelta(minutes=m), s)

    rows = [
        # u1 completes the funnel in order
        ev(1, "click", 0), ev(1, "view", 5), ev(1, "purchase", 10),
        # u2 views BEFORE clicking: stops at click
        ev(2, "view", 0), ev(2, "click", 5),
        # u3 clicks then views, no purchase
        ev(3, "click", 0), ev(3, "view", 1),
        # u4 same-timestamp tie does not advance
        ev(4, "click", 0), (4, t0, "view"),
    ]
    e = spark.createDataFrame(rows, "u long, ts timestamp, s string")
    got = {r["step"]: r["n_keys"] for r in funnel_counts(
        e, "u", "ts", "s", ["click", "view", "purchase"]).collect()}
    assert got == {"click": 4, "view": 2, "purchase": 1}


def test_event_transitions(spark):
    import datetime as dt

    from ecokg_spark.operators.temporal import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), s, i)
            for i, s in enumerate(["a", "b", "a", "b", "c"])]
    rows += [(2, t0 + dt.timedelta(minutes=i), s, i)
             for i, s in enumerate(["a", "b"])]
    e = spark.createDataFrame(rows, "u long, ts timestamp, s string, seq int")
    got = {(r["from_step"], r["to_step"]): (r["n"], r["p"])
           for r in event_transitions(e, "u", "ts", "s",
                                      tiebreak_cols=["seq"]).collect()}
    # a->b 3 times (all of a's transitions), b->a once, b->c once
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "c")] == (1, 0.5)


def test_retention_curve(spark):
    import datetime as dt

    from ecokg_spark.operators.temporal import retention_curve

    d0 = dt.datetime(2024, 1, 1, 10)
    d1 = dt.datetime(2024, 1, 2, 11)
    d2 = dt.datetime(2024, 1, 3, 12)
    rows = [(1, d0), (2, d0), (1, d1), (3, d1), (1, d2), (2, d2), (3, d2)]
    e = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {r["bucket_start"].day: (r["n_active"], r["n_new"],
                                   r["n_cumulative"])
           for r in retention_curve(e, "u", "ts").collect()}
    assert got[1] == (2, 2, 2)      # users 1,2 appear
    assert got[2] == (2, 1, 3)      # user 3 new; 1 returning
    assert got[3] == (3, 0, 3)      # all active, none new
