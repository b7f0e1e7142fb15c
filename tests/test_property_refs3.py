"""Third batch of independent pure-Python cross-checks: the triangle
kernel (counts + clustering coefficients), personalized PageRank, and the
deterministic label-propagation variant — randomized graphs vs dict/set
references."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

_node = st.integers(0, 9).map(lambda i: f"n{i}")
_edges = st.lists(st.tuples(_node, _node), min_size=1, max_size=25)


def _undirected(edges):
    adj: dict[str, set] = {}
    for s, t in edges:
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    return adj


# ---------------------------------------------------------------------------
# Triangle participation + clustering coefficient
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_edges)
def test_triangles_and_clustering_match_python_reference(spark, edges):
    from ecokg_spark.operators.graph import (clustering_coefficient,
                                             triangle_count)

    adj = _undirected(edges)
    if not adj:
        return  # all self-loops: empty simple graph
    tri_exp = {}
    for v in adj:
        ns = sorted(adj[v])
        tri_exp[v] = sum(
            1 for i, a in enumerate(ns) for b in ns[i + 1:] if b in adj[a])

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == tri_exp

    cc = {r["id"]: (r["degree"], r["coefficient"])
          for r in clustering_coefficient(df).collect()}
    for v in adj:
        d = len(adj[v])
        assert cc[v][0] == d
        exp = 0.0 if d < 2 else round(2.0 * tri_exp[v] / (d * (d - 1)), 6)
        assert math.isclose(cc[v][1], exp, rel_tol=1e-9, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# Personalized PageRank — seed-restart power iteration vs dict reference
# ---------------------------------------------------------------------------

@settings(max_examples=8, **_S)
@given(_edges, st.lists(_node, min_size=1, max_size=3))
def test_ppr_matches_python_reference(spark, edges, seed_pool):
    import pytest

    from ecokg_spark.operators.graph import personalized_pagerank

    nodes = sorted({x for e in edges for x in e})
    seeds = sorted(set(seed_pool))
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id string")

    live_seeds = [s for s in seeds if s in nodes]
    if not live_seeds:
        with pytest.raises(ValueError):
            personalized_pagerank(df, sdf, iterations=2)
        return

    got = {r["id"]: r["rank"]
           for r in personalized_pagerank(df, sdf, iterations=6).collect()}

    e = sorted({(a, b) for a, b in edges})
    out = {v: sorted({b for a, b in e if a == v}) for v in nodes}
    t = {v: (1.0 / len(live_seeds) if v in live_seeds else 0.0)
         for v in nodes}
    r = dict(t)
    d = 0.85
    for _ in range(6):
        contrib = {v: 0.0 for v in nodes}
        dm = 0.0
        for v in nodes:
            if out[v]:
                share = r[v] / len(out[v])
                for w in out[v]:
                    contrib[w] += share
            else:
                dm += r[v]
        r = {v: (1.0 - d + d * dm) * t[v] + d * contrib[v] for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert math.isclose(got[v], r[v], rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# Label propagation — synchronous, smallest-label tie-break, vs reference
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_edges, st.integers(1, 4))
def test_label_propagation_matches_python_reference(spark, edges, iters):
    from collections import Counter

    from ecokg_spark.operators.graph import label_propagation

    adj = _undirected(edges)
    if not adj:
        return
    labels = {v: v for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            freq = Counter(labels[u] for u in adj[v])
            best = min(lbl for lbl, c in freq.items()
                       if c == max(freq.values()))
            nxt[v] = best
        labels = nxt

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["label"]
           for r in label_propagation(df, iterations=iters).collect()}
    assert got == labels
