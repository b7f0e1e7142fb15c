"""Tenth batch of independent pure-Python cross-checks: the distributed
KGX merge family (heterogeneous-schema node/edge merge, deterministic
min-dedup, first-wins dedup, snapshot diff) and the Poisson recrawl
priority — the reference's EP2/A1/A2 semantics re-derived in dicts."""

import datetime
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _round_half_up(x: float, nd: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"),
                                           rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# merge_nodes — union across heterogeneous schemas, min-per-property,
# '|'-joined sorted provenance set
# ---------------------------------------------------------------------------

_id = st.integers(0, 6).map(lambda i: f"N:{i}")
_val = st.sampled_from(["a", "b", "c"])
_src = st.sampled_from(["s1", "s2", "s3"])


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_id, _val, _src), min_size=1, max_size=12),
       st.lists(st.tuples(_id, _val, _val, _src), min_size=1, max_size=12))
def test_merge_nodes_matches_python_reference(spark, t1, t2):
    from ecokg_spark.operators.merge import merge_nodes

    d1 = spark.createDataFrame(t1, "id string, name string, provided_by string")
    d2 = spark.createDataFrame(
        t2, "id string, name string, category string, provided_by string")
    out = merge_nodes([d1, d2])
    got = {r["id"]: (r["name"], r["category"], r["provided_by"])
           for r in out.collect()}

    rows = [(i, n, None, s) for i, n, s in t1] + list(t2)
    exp = {}
    for i in {r[0] for r in rows}:
        mine = [r for r in rows if r[0] == i]
        names = sorted(r[1] for r in mine if r[1] is not None)
        cats = sorted(r[2] for r in mine if r[2] is not None)
        provs = sorted({r[3] for r in mine})
        exp[i] = (names[0] if names else None,
                  cats[0] if cats else None, "|".join(provs))
    assert got == exp


# ---------------------------------------------------------------------------
# dedup_min / dedup_first_wins — deterministic survivor selection
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_id, _val, _val), min_size=1, max_size=15))
def test_dedup_min_matches_python_reference(spark, rows):
    from ecokg_spark.operators.merge import dedup_min

    df = spark.createDataFrame(rows, "id string, a string, b string")
    got = {tuple(r) for r in dedup_min(df, ["id"]).collect()}
    exp = set()
    for i in {r[0] for r in rows}:
        exp.add((i,) + min((r[1], r[2]) for r in rows if r[0] == i))
    assert got == exp


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_id, _val), min_size=1, max_size=15))
def test_dedup_first_wins_matches_python_reference(spark, pairs):
    from ecokg_spark.operators.merge import dedup_first_wins

    rows = [(k, v, i) for i, (k, v) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id string, v string, ord long")
    got = {tuple(r) for r in dedup_first_wins(df, ["id"], "ord").collect()}
    exp = set()
    for k in {r[0] for r in rows}:
        exp.add(min((r for r in rows if r[0] == k), key=lambda r: r[2]))
    assert got == exp


# ---------------------------------------------------------------------------
# diff_graphs — membership diff with set semantics
# ---------------------------------------------------------------------------

_triple = st.tuples(_id, st.sampled_from(["p", "q"]), _id)


@settings(max_examples=10, **_S)
@given(st.lists(_triple, min_size=0, max_size=15),
       st.lists(_triple, min_size=0, max_size=15))
def test_diff_graphs_matches_python_reference(spark, old, new):
    from ecokg_spark.operators.merge import diff_graphs

    schema = "subject string, predicate string, object string"
    odf = spark.createDataFrame(old, schema) if old else \
        spark.createDataFrame([], schema)
    ndf = spark.createDataFrame(new, schema) if new else \
        spark.createDataFrame([], schema)
    got = {tuple(r) for r in diff_graphs(odf, ndf).collect()}
    oset, nset = set(old), set(new)
    exp = {("added",) + t for t in nset - oset} | \
          {("removed",) + t for t in oset - nset}
    assert got == exp


# ---------------------------------------------------------------------------
# recrawl_priority — Poisson change-rate scheduling vs Python
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 10_000),       # minutes offset
              st.booleans()),               # changed
    min_size=1, max_size=25))
def test_recrawl_priority_matches_python_reference(spark, raw):
    from ecokg_spark.operators.temporal import recrawl_priority

    t0 = datetime.datetime(2024, 3, 1)
    now = datetime.datetime(2024, 3, 20, 12, 0, 0)
    rows = [(f"u{k}", t0 + datetime.timedelta(minutes=m), bool(c))
            for k, m, c in raw]
    df = spark.createDataFrame(rows, "url string, ts timestamp, changed boolean")
    got = {r["url"]: (r["n_obs"], r["n_changes"], r["lambda_per_day"],
                      r["priority"])
           for r in recrawl_priority(df, "url", "ts", "changed",
                                     now_ts=now).collect()}

    by_key: dict[str, list] = {}
    for u, ts, c in rows:
        by_key.setdefault(u, []).append((ts, c))
    day_us = 86_400_000_000.0
    for u, obs in by_key.items():
        n = len(obs)
        ch = sum(1 for _, c in obs if c)
        tss = [ts for ts, _ in obs]
        span = (max(tss) - min(tss)).total_seconds() * 1e6 / day_us
        lam = ch / span if span > 0 else 1.0
        lam_r = _round_half_up(lam, 6)
        age = (now - max(tss)).total_seconds() * 1e6 / day_us
        prio = _round_half_up(1.0 - math.exp(-lam_r * age), 6)
        gn, gc, gl, gp = got[u]
        assert (gn, gc) == (n, ch)
        assert math.isclose(gl, lam_r, abs_tol=2e-6)
        assert math.isclose(gp, prio, abs_tol=2e-6)
