"""Second batch of independent pure-Python cross-checks: SimHash (the
portable md5 bit spec and the pigeonhole pair funnel), DSIR importance
weights, Adamic-Adar link prediction, and HITS — same discipline as
test_property_sketches.py."""

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _norm_toks(text):
    t = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").split(" ")
    return [] if t == [""] else t


# ---------------------------------------------------------------------------
# SimHash — the portable md5 bit spec, then exact pigeonhole recall
# ---------------------------------------------------------------------------

def _simhash_py(text):
    """bit i of token hash = bit (i%4) of hex digit (i//4) of md5(token);
    majority vote over the DISTINCT lower-cased tokens."""
    toks = []
    for t in _norm_toks(text.lower()):
        if t not in toks:
            toks.append(t)
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in toks]
    out = 0
    for i in range(64):
        d, b = divmod(i, 4)
        ones = sum(1 for h in hashes if int(h[d], 16) & (1 << b))
        if ones * 2 > len(hashes):
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # to signed i64


_word = st.sampled_from(["cat", "dog", "Cat", "fish", "a1", "b2"])
_doc = st.lists(_word, min_size=1, max_size=10).map(" ".join)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_simhash_md5_matches_python_reference(spark, texts):
    from ecokg_spark.operators.dedup import with_simhash

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in with_simhash(df, "text", token_hash="md5").collect()}
    for d, t in rows:
        assert got[d] == _simhash_py(t), (d, t)


@settings(max_examples=8, **_S)
@given(st.lists(_doc, min_size=2, max_size=10), st.integers(0, 4))
def test_simhash_pairs_match_bruteforce(spark, texts, max_h):
    from ecokg_spark.operators.dedup import simhash_pairs

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_pairs(df, max_hamming=max_h,
                                  token_hash="md5").collect()}
    sh = {d: _simhash_py(t) for d, t in rows}
    exp = {}
    for i, (da, _) in enumerate(rows):
        for db, _ in rows[i + 1:]:
            ham = bin((sh[da] ^ sh[db]) & ((1 << 64) - 1)).count("1")
            if ham <= max_h:
                exp[tuple(sorted((da, db)))] = ham
    assert got == exp


# ---------------------------------------------------------------------------
# DSIR importance log-weights — hashed n-gram log-ratio sums vs Python
# ---------------------------------------------------------------------------

def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dsir_py(raw, target, dims, alpha):
    def feats(text):
        t = _norm_toks(text)
        return [ _h60(w) % dims for w in t ] + \
               [ _h60(f"{a} {b}") % dims for a, b in zip(t, t[1:]) ]

    rg, tg = {}, {}
    for _, t in raw:
        for g in feats(t):
            rg[g] = rg.get(g, 0) + 1
    for _, t in target:
        for g in feats(t):
            tg[g] = tg.get(g, 0) + 1
    R, T = sum(rg.values()), sum(tg.values())
    out = {}
    for doc_id, t in raw:
        fs = feats(t)
        lw = sum(
            math.log((tg.get(g, 0) + alpha) / (T + alpha * dims))
            - math.log((rg.get(g, 0) + alpha) / (R + alpha * dims))
            for g in fs)
        out[doc_id] = (len(fs), lw if fs else 0.0)
    return out


@settings(max_examples=8, **_S)
@given(st.lists(_doc, min_size=1, max_size=8),
       st.lists(_doc, min_size=1, max_size=4),
       st.integers(4, 32))
def test_dsir_matches_python_reference(spark, raws, targets, dims):
    from ecokg_spark.operators.sample import dsir_logweights

    raw = [(f"r{i}", t) for i, t in enumerate(raws)]
    tgt = [(f"t{i}", t) for i, t in enumerate(targets)]
    rdf = spark.createDataFrame(raw, "doc_id string, text string")
    tdf = spark.createDataFrame(tgt, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_features"], r["logweight"])
           for r in dsir_logweights(rdf, tdf, dims=dims, portable=True)
           .collect()}
    exp = _dsir_py(raw, tgt, dims, 1.0)
    assert set(got) == set(exp)
    for d, (n, lw) in exp.items():
        assert got[d][0] == n
        # engine rounds to 6 decimals; compare against the unrounded ref
        assert math.isclose(got[d][1], lw, rel_tol=1e-6, abs_tol=2e-6)


# ---------------------------------------------------------------------------
# Adamic-Adar — wedge join + anti-join vs a dict-of-sets reference
# ---------------------------------------------------------------------------

def _aa_py(edges):
    adj: dict[str, set] = {}
    for s, t in edges:
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    out = {}
    ns = sorted(adj)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if common:
                score = sum(1.0 / math.log(len(adj[z])) for z in common)
                out[(a, b)] = (len(common), round(score, 6))
    return out


_node = st.integers(0, 9).map(lambda i: f"n{i}")


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_node, _node), min_size=1, max_size=25))
def test_adamic_adar_matches_python_reference(spark, edges):
    from ecokg_spark.operators.graph import adamic_adar

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["node_a"], r["node_b"]): (r["common_neighbors"], r["score"])
           for r in adamic_adar(df).collect()}
    exp = _aa_py(edges)
    assert set(got) == set(exp)
    for pair, (n, score) in exp.items():
        assert got[pair][0] == n
        assert math.isclose(got[pair][1], score, rel_tol=1e-9, abs_tol=1e-6)


# ---------------------------------------------------------------------------
# HITS — L1-normalized hub/authority iteration vs a dict reference
# ---------------------------------------------------------------------------

def test_hits_matches_python_power_iteration(spark):
    from ecokg_spark.operators.graph import hits

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
             ("d", "e"), ("e", "a"), ("b", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: (r["hub"], r["authority"])
           for r in hits(df, iterations=5).collect()}

    nodes = sorted({x for e in edges for x in e})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(5):
        na = {v: sum(hub[u] for u, w in edges if w == v) for v in nodes}
        at = sum(na.values())
        auth = {v: na[v] / at for v in nodes}
        nh = {v: sum(auth[w] for u, w in edges if u == v) for v in nodes}
        ht = sum(nh.values())
        hub = {v: nh[v] / ht for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert math.isclose(got[v][0], hub[v], rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(got[v][1], auth[v], rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(sum(h for h, _ in got.values()), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(a for _, a in got.values()), 1.0, rel_tol=1e-9)
