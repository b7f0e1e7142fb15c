"""Fourteenth batch of independent pure-Python cross-checks: derandomized
hash walks (md5-argmin successor), hierarchy cycle pairs, multi-source BFS
distances, and the KGX validation report."""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

_node = st.integers(0, 8).map(lambda i: f"n{i}")
_edges = st.lists(st.tuples(_node, _node), min_size=1, max_size=25)


# ---------------------------------------------------------------------------
# hash_walks — md5-argmin successor function, walk-until-dead-end
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_edges, st.integers(1, 4), st.integers(0, 3))
def test_hash_walks_match_python_reference(spark, edges, length, seed):
    from ecokg_spark.operators.graph import hash_walks

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["start"], r["step"], r["node"])
           for r in hash_walks(df, length=length, seed=seed).collect()}

    adj: dict[str, set] = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        nodes |= {a, b}

    def nxt(c, t):
        if c not in adj:
            return None
        return min(adj[c], key=lambda nbr: (
            hashlib.md5(f"{seed}|{t}|{c}|{nbr}".encode()).hexdigest(), nbr))

    exp = {(v, 0, v) for v in nodes}
    for start in nodes:
        cur = start
        for t in range(1, length + 1):
            cur = nxt(cur, t)
            if cur is None:
                break
            exp.add((start, t, cur))
    assert got == exp


# ---------------------------------------------------------------------------
# hierarchy_cycles — mutually-reachable pairs, each reported once
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_edges)
def test_hierarchy_cycles_match_python_reference(spark, edges):
    from ecokg_spark.operators.reasoning import hierarchy_cycles

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["node_a"], r["node_b"])
           for r in hierarchy_cycles(df).collect()}

    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)

    def reach(s):
        stack, seen = list(adj.get(s, ())), set()
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            stack.extend(adj.get(c, ()))
        return seen

    r = {v: reach(v) for v in adj}
    exp = set()
    for a in r:
        for b in r[a]:
            if a in r.get(b, set()) and a < b:
                exp.add((a, b))
    assert got == exp


# ---------------------------------------------------------------------------
# bfs_distances — multi-source shortest hop distance
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_edges, st.lists(_node, min_size=1, max_size=3))
def test_bfs_distances_match_python_reference(spark, edges, seeds):
    from collections import deque

    from ecokg_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in sorted(set(seeds))],
                                "id string")
    got = {r["id"]: r["dist"] for r in bfs_distances(df, sdf).collect()}

    adj: dict[str, set] = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        nodes |= {a, b}
    dist = {}
    dq = deque()
    for s in set(seeds):
        # seeds outside the graph still appear at dist 0 (engine contract)
        dist[s] = 0
        dq.append(s)
    while dq:
        c = dq.popleft()
        for n in adj.get(c, ()):
            if n not in dist:
                dist[n] = dist[c] + 1
                dq.append(n)
    assert got == dist


# ---------------------------------------------------------------------------
# validate_kgx — rule-by-rule violation counts
# ---------------------------------------------------------------------------

_CURIE = "^[A-Za-z_][A-Za-z0-9_.-]*:[^ \\t]+$"

_nid = st.sampled_from(["GO:1", "GO:2", "bad id", "X:ok", "", None,
                        "noprefix", "GO:1"])
_cat = st.sampled_from(["biolink:Gene", "biolink:Disease", "Thing", "",
                       None])
_pred = st.sampled_from(["biolink:related_to", "rel", None])


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_nid, _cat), min_size=1, max_size=12),
       st.lists(st.tuples(_nid, _pred, _nid), min_size=1, max_size=12))
def test_validate_kgx_matches_python_reference(spark, nrows, erows):
    from ecokg_spark.operators.validate import validate_kgx

    ndf = spark.createDataFrame(nrows, "id string, category string")
    edf = spark.createDataFrame(
        erows, "subject string, predicate string, object string")
    got = {r["check"]: r["n_violations"]
           for r in validate_kgx(ndf, edf).collect()}

    ids = [i for i, _ in nrows]
    live = [i for i in ids if i not in (None, "")]
    from collections import Counter
    c = Counter(i for i in ids if i is not None)
    exp = {
        "node_id_null": sum(1 for i in ids if i in (None, "")),
        "node_id_duplicate": sum(n - 1 for n in c.values() if n > 1),
        "node_id_not_curie": sum(
            1 for i in live if not re.match(_CURIE, i)),
        "node_category_missing": sum(
            1 for _, cat in nrows if cat in (None, "")),
        "node_category_not_biolink": sum(
            1 for _, cat in nrows
            if cat not in (None, "") and not cat.startswith("biolink:")),
    }
    idset = {i for i in ids if i is not None}
    exp["edge_subject_dangling"] = sum(
        1 for s, _, _ in erows if s not in idset)
    exp["edge_object_dangling"] = sum(
        1 for _, _, o in erows if o not in idset)
    exp["edge_predicate_not_biolink"] = sum(
        1 for _, p, _ in erows
        if p is None or not p.startswith("biolink:"))
    # SQL equality: NULL == NULL is NULL, not a self-loop
    exp["edge_self_loop"] = sum(
        1 for s, _, o in erows if s is not None and s == o)
    assert got == exp
