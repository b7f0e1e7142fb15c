"""Property-based cross-checks for the sketch / fingerprint / web-graph /
LM operators: each distributed implementation must agree with an
INDEPENDENT pure-Python reference on adversarial random inputs — the same
discipline test_property_ops.py applies to packing/closure/HLL/k-core.
The md5-60-bit portability spec (sketch.py module docstring) is what makes
the sketch tables exactly recomputable here: hashlib.md5 IS the oracle."""

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _h60(s: str) -> int:
    """The repo's portable 60-bit hash: first 15 hex chars of md5."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_val = st.text(alphabet="abxy01|:", min_size=0, max_size=6)


# ---------------------------------------------------------------------------
# Count-Min sketch — table cell-for-cell, then the point-query bound
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(_val, min_size=1, max_size=60), st.integers(2, 9),
       st.integers(1, 4))
def test_count_min_matches_python_reference(spark, vals, w, d):
    from ecokg_spark.operators.sketch import count_min_estimate, count_min_table

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {(r["row"], r["bucket"]): r["cnt"]
           for r in count_min_table(df, "v", w=w, d=d).collect()}

    exp: dict[tuple[int, int], int] = {}
    for v in vals:
        for r in range(d):
            cell = (r, _h60(f"{r}:{v}") % w)
            exp[cell] = exp.get(cell, 0) + 1
    assert got == exp

    # point query: min over rows == the Python min; and >= the true count
    queries = sorted(set(vals))[:8] + ["@absent@"]
    qdf = spark.createDataFrame([(q,) for q in queries], "q string")
    est = {
        r["q"]: r["estimate"]
        for r in count_min_estimate(
            count_min_table(df, "v", w=w, d=d), qdf, "q", w=w, d=d).collect()}
    true = {q: sum(1 for v in vals if v == q) for q in queries}
    for q in queries:
        exp_est = min(exp.get((r, _h60(f"{r}:{q}") % w), 0) for r in range(d))
        assert est[q] == exp_est
        assert est[q] >= true[q]


# ---------------------------------------------------------------------------
# Bloom filter — exact bit set, exact probe verdicts, no false negatives
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(_val, min_size=1, max_size=40),
       st.lists(_val, min_size=1, max_size=20),
       st.integers(8, 64), st.integers(1, 4))
def test_bloom_matches_python_reference(spark, vals, probes, m, k):
    from ecokg_spark.operators.sketch import bloom_bits, bloom_might_contain

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    bits = bloom_bits(df, "v", m=m, k=k)
    got_bits = {r["bit"] for r in bits.collect()}
    exp_bits = {_h60(f"{r}:{v}") % m for v in vals for r in range(k)}
    assert got_bits == exp_bits

    pdf = spark.createDataFrame([(p,) for p in set(probes)], "v string")
    got = {r["v"]: r["might_contain"]
           for r in bloom_might_contain(pdf, bits, "v", m=m, k=k).collect()}
    for p in set(probes):
        expect = all(_h60(f"{r}:{p}") % m in exp_bits for r in range(k))
        assert got[p] == expect
        if p in vals:  # no false negatives, ever
            assert got[p] is True


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — rightmost-min selection vs Python
# ---------------------------------------------------------------------------

def _winnow_py(text, k, w):
    toks = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").lower().split(" ")
    if toks == [""]:
        toks = []
    n = len(toks)
    if n == 0:
        shingles = [""]  # normalize_ws("") -> "", n<=k branch: one shingle
    elif n <= k:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(n - k + 1)]
    h = [_h60(s) for s in shingles]
    m = len(h)
    sel = set()
    if m < w:
        lo = 0
        best = min(range(lo, m), key=lambda i: (h[i], -i))
        sel.add((best, h[best]))
    else:
        for p in range(w - 1, m):
            best = min(range(p - w + 1, p + 1), key=lambda i: (h[i], -i))
            sel.add((best, h[best]))
    return sel


_text = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", " ", "  ", "\t"]),
    min_size=0, max_size=40,
).map(" ".join)


@settings(max_examples=10, **_S)
@given(st.lists(_text, min_size=1, max_size=8),
       st.integers(1, 4), st.integers(1, 6))
def test_winnow_matches_python_reference(spark, texts, k, w):
    from ecokg_spark.operators.dedup import winnow_fingerprints

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["doc_id"], r["pos"], r["hash"])
           for r in winnow_fingerprints(df, k=k, w=w).collect()}
    exp = {(d, p, h) for d, t in rows for p, h in _winnow_py(t, k, w)}
    assert got == exp


# ---------------------------------------------------------------------------
# Redirect resolution (pointer doubling) — vs a sequential Python chase
# ---------------------------------------------------------------------------

def _chase_py(edges):
    nxt = {}
    for s, t in edges:
        if s != t and (s not in nxt or t < nxt[s]):
            nxt[s] = t
    out = {}
    for s in nxt:
        cur, seen = nxt[s], {s}
        while cur in nxt:
            if cur in seen:
                out[s] = (None, False)
                break
            seen.add(cur)
            cur = nxt[cur]
        else:
            out[s] = (cur, True)
    return out


_node = st.integers(0, 11).map(lambda i: f"u{i}")


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(_node, _node), min_size=1, max_size=30))
def test_resolve_redirects_matches_python_chase(spark, edges):
    from ecokg_spark.operators.web import resolve_redirects

    df = spark.createDataFrame(edges, "src string, dst string")
    res = resolve_redirects(df).collect()
    got = {r["src"]: (r["final_url"], r["resolved"]) for r in res}
    exp = _chase_py(edges)
    assert got == exp
    # pointer doubling must emit exactly one row per distinct non-self src
    assert len(res) == len(exp)


# ---------------------------------------------------------------------------
# Bigram LM scoring — add-k smoothed conditional probabilities vs Python
# ---------------------------------------------------------------------------

def _toks(text):
    t = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").split(" ")
    return [] if t == [""] else t


def _bigram_py(docs, add_k):
    c2: dict[tuple[str, str], int] = {}
    for _, t in docs:
        w = _toks(t)
        for a, b in zip(w, w[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    v = len({b for _, b in c2})
    out = {}
    for doc_id, t in docs:
        w = _toks(t)
        ps = [(c2.get((a, b), 0) + add_k) / (c1.get(a, 0) + add_k * v)
              for a, b in zip(w, w[1:])]
        out[doc_id] = (len(ps), sum(ps) if ps else None)
    return out


_word2 = st.sampled_from(["a", "b", "c", "dd"])
_doc2 = st.lists(_word2, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=10, **_S)
@given(st.lists(_doc2, min_size=1, max_size=10))
def test_bigram_lm_matches_python_reference(spark, texts):
    from ecokg_spark.operators.lm import bigram_lm_score

    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_p"], r["avg_p"])
           for r in bigram_lm_score(df, add_k=0.5).collect()}
    exp = _bigram_py(docs, 0.5)
    assert set(got) == set(exp)
    for d, (n, s) in exp.items():
        gn, gs, ga = got[d]
        assert gn == n
        if s is None:
            assert gs is None and ga is None
        else:
            assert math.isclose(gs, s, rel_tol=1e-9, abs_tol=1e-12)
            assert math.isclose(ga, s / n, rel_tol=1e-9, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# Stupid Backoff trigram scoring — Brants et al. backoff ladder vs Python
# ---------------------------------------------------------------------------

def _backoff_py(docs, alpha):
    c3, c2, cu = {}, {}, {}
    for _, t in docs:
        w = _toks(t)
        for a, b, c in zip(w, w[1:], w[2:]):
            c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
        for a, b in zip(w, w[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a in w:
            cu[a] = cu.get(a, 0) + 1
    c2ctx = {}
    for (a, b, _), c in c3.items():
        c2ctx[(a, b)] = c2ctx.get((a, b), 0) + c
    c1 = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    n_total = sum(cu.values())
    out = {}
    for doc_id, t in docs:
        w = _toks(t)
        ss = []
        for a, b, c in zip(w, w[1:], w[2:]):
            if (a, b, c) in c3:
                ss.append(c3[(a, b, c)] / c2ctx[(a, b)])
            elif (b, c) in c2:
                ss.append(alpha * c2[(b, c)] / c1[b])
            else:
                ss.append(alpha * alpha * cu.get(c, 0) / n_total)
        out[doc_id] = (len(ss), sum(ss) if ss else None)
    return out


@settings(max_examples=10, **_S)
@given(st.lists(_doc2, min_size=1, max_size=10))
def test_stupid_backoff_matches_python_reference(spark, texts):
    from ecokg_spark.operators.lm import stupid_backoff_score

    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_trigrams"], r["sum_s"], r["avg_s"])
           for r in stupid_backoff_score(df, alpha=0.4).collect()}
    exp = _backoff_py(docs, 0.4)
    assert set(got) == set(exp)
    for d, (n, s) in exp.items():
        gn, gs, ga = got[d]
        assert gn == n
        if s is None:
            assert gs is None and ga is None
        else:
            assert math.isclose(gs, s, rel_tol=1e-9, abs_tol=1e-12)
            assert math.isclose(ga, s / n, rel_tol=1e-9, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# PageRank — vs a dense numpy power iteration with the same dangling rule
# ---------------------------------------------------------------------------

def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from ecokg_spark.operators.graph import pagerank

    rng = np.random.default_rng(7)
    n = 12
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, size=(40, 2))})
    # node 11 guaranteed dangling: drop its out-edges
    edges = [(a, b) for a, b in edges if a != 11] or [(0, 1)]
    df = spark.createDataFrame([(f"v{a}", f"v{b}") for a, b in edges],
                               "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(df, iterations=12).collect()}

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    nn = len(nodes)
    out = {v: [b for a, b in edges if a == v] for v in nodes}
    r = np.full(nn, 1.0 / nn)
    d = 0.85
    for _ in range(12):
        nxt = np.zeros(nn)
        dangling = 0.0
        for v in nodes:
            if out[v]:
                share = r[idx[v]] / len(out[v])
                for t in out[v]:
                    nxt[idx[t]] += share
            else:
                dangling += r[idx[v]]
        r = (1 - d) / nn + d * (nxt + dangling / nn)
    assert set(got) == {f"v{v}" for v in nodes}
    for v in nodes:
        assert math.isclose(got[f"v{v}"], r[idx[v]], rel_tol=1e-9,
                            abs_tol=1e-12)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)
