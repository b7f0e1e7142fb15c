"""Seventh batch of independent pure-Python cross-checks: retention curve
(first-seen decomposition), host-scoped boilerplate strip (census +
anti-join + rebuild), the rho-df RDFS materialization rules, and the
leave-one-out rolling z-score."""

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
# retention_curve — cumulative distinct via first-seen decomposition
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 9)),
                min_size=1, max_size=40))
def test_retention_curve_matches_python_reference(spark, raw):
    from ecokg_spark.operators.temporal import retention_curve

    rows = [(f"u{k}", datetime.datetime(2024, 1, d + 1, 7, 30))
            for k, d in raw]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {(r["bucket_start"], r["n_active"], r["n_new"], r["n_cumulative"])
           for r in retention_curve(df, "user_id", "ts").collect()}

    by_day: dict[datetime.datetime, set] = {}
    for k, d in raw:
        day = datetime.datetime(2024, 1, d + 1)
        by_day.setdefault(day, set()).add(f"u{k}")
    first = {}
    for day in sorted(by_day):
        for u in by_day[day]:
            first.setdefault(u, day)
    exp, cum = set(), 0
    for day in sorted(by_day):
        n_new = sum(1 for u, fd in first.items() if fd == day)
        cum += n_new
        exp.add((day, len(by_day[day]), n_new, cum))
    assert got == exp


# ---------------------------------------------------------------------------
# strip_host_boilerplate — census, ratio gate, anti-join, rebuild
# ---------------------------------------------------------------------------

_line = st.sampled_from(["nav bar", "  nav bar  ", "content A", "content B",
                         "footer", "", "  ", "unique %d"])
_page = st.lists(_line, min_size=0, max_size=6)


@settings(max_examples=10, **_S)
@given(st.lists(_page, min_size=1, max_size=8), st.integers(1, 3))
def test_strip_host_boilerplate_matches_python(spark, pages_lines, min_pages):
    from ecokg_spark.operators.web import strip_host_boilerplate

    pages = []
    for i, ls in enumerate(pages_lines):
        host = f"h{i % 2}.com"
        text = "\n".join(l % i if "%d" in l else l for l in ls)
        pages.append((f"http://{host}/p{i}", text))
    df = spark.createDataFrame(pages, "url string, text string")
    got = {r["url"]: r["text"]
           for r in strip_host_boilerplate(
               df, min_ratio=0.5, min_pages=min_pages).collect()}

    hosts: dict[str, list] = {}
    for url, text in pages:
        h = url.split("://")[1].split("/")[0]
        hosts.setdefault(h, []).append((url, text))
    exp = {}
    for h, ps in hosts.items():
        host_pages = len({u for u, _ in ps})
        census: dict[str, set] = {}
        for u, t in ps:
            for ln in t.split("\n"):
                tr = ln.strip()
                if tr:
                    census.setdefault(tr, set()).add(u)
        flagged = {
            ln for ln, us in census.items()
            if len(us) >= min_pages
            and _round_half_up(len(us) / host_pages, 6) >= 0.5}
        for u, t in ps:
            kept = [ln for ln in t.split("\n") if ln.strip() not in flagged]
            exp[u] = "\n".join(kept)
    assert got == exp


# ---------------------------------------------------------------------------
# rdfs_materialize — the rho-df rule set vs a Python fixpoint
# ---------------------------------------------------------------------------

_RDF_TYPE = "rdf:type"
_SC = "rdfs:subClassOf"
_SP = "rdfs:subPropertyOf"
_DOM = "rdfs:domain"
_RNG = "rdfs:range"

_ent = st.sampled_from(["x", "y", "z", "C1", "C2", "C3", "p", "q", "r"])
_sch = st.sampled_from([_SC, _SP, _DOM, _RNG, _RDF_TYPE, "p", "q", "r"])


def _closure_py(pairs):
    """All (a, b) reachable in >= 1 step."""
    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    out = set()
    for start in adj:
        stack, reach = list(adj[start]), set()
        while stack:
            cur = stack.pop()
            if cur in reach:
                continue
            reach.add(cur)
            stack.extend(adj.get(cur, ()))
        out |= {(start, c) for c in reach}
    return out


def _rdfs_py(triples):
    t = set(triples)
    sc = _closure_py({(s, o) for s, p, o in t if p == _SC})
    sp = _closure_py({(s, o) for s, p, o in t if p == _SP})
    d7 = {(s, p2, o) for s, p, o in t for p1, p2 in sp if p == p1}
    base = t | d7
    dom = {(s, o) for s, p, o in t if p == _DOM}
    rng = {(s, o) for s, p, o in t if p == _RNG}
    d2 = {(s, _RDF_TYPE, dc) for s, p, o in base for dp, dc in dom if p == dp}
    d3 = {(o, _RDF_TYPE, rc) for s, p, o in base for rp, rc in rng if p == rp}
    typed = {(s, o) for s, p, o in base if p == _RDF_TYPE}
    typed |= {(s, o) for s, _, o in d2} | {(s, o) for s, _, o in d3}
    d9 = {(s, _RDF_TYPE, sup) for s, c in typed
          for sub, sup in sc if c == sub}
    return base | d2 | d3 | d9


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_ent, _sch, _ent), min_size=1, max_size=20))
def test_rdfs_materialize_matches_python_fixpoint(spark, triples):
    from ecokg_spark.operators.reasoning import rdfs_materialize

    df = spark.createDataFrame(
        triples, "subject string, predicate string, object string")
    got = {(r["subject"], r["predicate"], r["object"])
           for r in rdfs_materialize(
               df, type_pred=_RDF_TYPE, subclass_pred=_SC, subprop_pred=_SP,
               domain_pred=_DOM, range_pred=_RNG).collect()}
    assert got == _rdfs_py(triples)


# ---------------------------------------------------------------------------
# rolling_zscore — leave-one-out baseline sums vs a Python replay
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.integers(-20, 100), min_size=1, max_size=30),
       st.integers(2, 8), st.integers(2, 5))
def test_rolling_zscore_matches_python_reference(spark, vals, window,
                                                 min_points):
    from ecokg_spark.operators.temporal import rolling_zscore

    rows = [("k", float(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts double, value double")
    got = {r["ts"]: (r["n_baseline"], r["mean"], r["z"], r["is_anomaly"])
           for r in rolling_zscore(df, "key", "ts", "value", window=window,
                                   min_points=min_points,
                                   threshold=3.0).collect()}
    for i, v in enumerate(vals):
        base = vals[max(0, i - window):i]
        n = len(base)
        mean = z = None
        anom = False
        if n >= 1:
            s, s2 = float(sum(base)), float(sum(b * b for b in base))
            m = s / n
            mean = _round_half_up(m, 6)
            if n >= min_points:
                var = max((s2 - s * s / n) / (n - 1), 0.0)
                if var > 0:
                    z = _round_half_up((v - m) / math.sqrt(var), 6)
                    anom = abs(z) > 3.0
        gn, gm, gz, ga = got[float(i)]
        assert gn == n
        assert gm == mean
        assert gz == z
        assert ga == anom
