"""Property-based tests (hypothesis) for the late-addition operators:
each distributed implementation must agree with an INDEPENDENT pure-Python
reference on adversarial random inputs — the same discipline
test_property.py applies to the extract/fused path. Batched: each example
becomes ONE DataFrame so Spark round-trips stay bounded."""

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# pack_sequences — concat-and-chunk packing arithmetic
# ---------------------------------------------------------------------------

def _pack_py(rows, context_len):
    """Reference: sort by (md5(id), id), running offset, interval->chunks."""
    live = [(i, n) for i, n in rows if n > 0]
    live.sort(key=lambda r: (hashlib.md5(r[0].encode()).hexdigest(), r[0]))
    out, off = set(), 0
    for doc_id, n in live:
        start, end = off, off + n
        off = end
        for ci in range(start // context_len, (end - 1) // context_len + 1):
            out.add((ci, doc_id,
                     max(start - ci * context_len, 0),
                     min(end - ci * context_len, context_len)))
    return out


@settings(max_examples=12, **_S)
@given(st.lists(st.integers(0, 40), min_size=1, max_size=30),
       st.integers(1, 17))
def test_pack_sequences_matches_python_reference(spark, sizes, context_len):
    from ecokg_spark.operators.pack import pack_sequences

    rows = [(f"d{i:03d}", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    got = {(r["chunk_idx"], r["doc_id"], r["begin_tok"], r["end_tok"])
           for r in pack_sequences(df, context_len=context_len).collect()}
    assert got == _pack_py(rows, context_len)


# ---------------------------------------------------------------------------
# chunk_sliding — overlapping token windows
# ---------------------------------------------------------------------------

def _chunks_py(text, size, stride):
    toks = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").split(" ")
    if toks == [""]:
        return set()
    n = len(toks)
    n_chunks = (max(n - size, 0) + stride - 1) // stride + 1
    return {
        (i, len(toks[i * stride:i * stride + size]),
         " ".join(toks[i * stride:i * stride + size]))
        for i in range(n_chunks)
    }


_word = st.text(alphabet="abcXY0", min_size=1, max_size=4)
_ws = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
_doc = st.lists(st.one_of(_word, _ws), max_size=30).map("".join)


@settings(max_examples=12, **_S)
@given(st.lists(_doc, min_size=1, max_size=15),
       st.integers(1, 8), st.integers(1, 8))
def test_chunk_sliding_matches_python_reference(spark, texts, size, stride):
    from ecokg_spark.operators.pack import chunk_sliding

    stride = min(stride, size)  # contract: 0 < stride <= size
    df = spark.createDataFrame([(f"d{i}", t) for i, t in enumerate(texts)],
                               "doc_id string, text string")
    out = chunk_sliding(df, size=size, stride=stride).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"]))
    for i, t in enumerate(texts):
        assert got.get(f"d{i}", set()) == _chunks_py(t, size, stride), (i, t)


# ---------------------------------------------------------------------------
# transitive_closure — iterative-squaring reachability
# ---------------------------------------------------------------------------

def _reach_py(edges):
    """Strict reachability: all (a, b), a != b, with a path of length >= 1."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = set()
    for a in adj:
        seen, stack = set(), [*adj[a]]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj.get(x, ()))
        out |= {(a, b) for b in seen if b != a}
    return out


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=30))
def test_transitive_closure_matches_python_reference(spark, pairs):
    from ecokg_spark.operators.reasoning import transitive_closure

    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["src"], r["dst"]) for r in transitive_closure(df).collect()}
    assert got == _reach_py(edges)


# ---------------------------------------------------------------------------
# HLL — the portable register spec, bucket/register exact + estimate
# ---------------------------------------------------------------------------

def _hll_py(values, p):
    w_bits = 60 - p
    m = 1 << p
    regs = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bucket = h >> w_bits
        w = h % (1 << w_bits)
        rho = (w_bits + 1) if w == 0 else w_bits - w.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    if m <= 16:
        alpha = 0.673
    elif m <= 32:
        alpha = 0.697
    elif m <= 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    s_used = sum(2 ** (50 - r) for r in regs.values())
    zeros = m - len(regs)
    s = s_used + zeros * 2 ** 50
    raw = alpha * m * m * float(2 ** 50) / float(s)
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / zeros)
    else:
        est = raw
    return regs, est


@settings(max_examples=10, **_S)
@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=6),
                min_size=1, max_size=200),
       st.sampled_from([4, 6, 12]))
def test_hll_registers_and_estimate_match_python_reference(spark, vals, p):
    from ecokg_spark.operators.sketch import hll_distinct, hll_registers

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    regs_want, est_want = _hll_py(vals, p)
    regs_got = {r["bucket"]: r["register"]
                for r in hll_registers(df, "v", p=p).collect()}
    assert regs_got == regs_want
    est_got = hll_distinct(df, "v", p=p).collect()[0]["estimate"]
    # both sides compute the same double arithmetic; 2e-4 absorbs the
    # HALF_UP-vs-bankers rounding edge and any 1-ulp libm log() drift
    assert abs(est_got - round(est_want, 4)) <= 2e-4, (est_got, est_want)


# ---------------------------------------------------------------------------
# kcore — iterative peel
# ---------------------------------------------------------------------------

def _kcore_py(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for nb in adj.pop(n):
                adj[nb].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 10), st.integers(0, 10)),
                min_size=1, max_size=40),
       st.integers(1, 4))
def test_kcore_matches_python_reference(spark, pairs, k):
    from ecokg_spark.operators.graph import kcore

    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["core_deg"] for r in kcore(df, k).collect()}
    assert got == _kcore_py(edges, k)


# ---------------------------------------------------------------------------
# funnel_counts — strict-order funnel frontier
# ---------------------------------------------------------------------------

def _funnel_py(events, steps):
    out, frontier = [], {}
    for i, s in enumerate(steps):
        cur = {}
        for k, t, stp in events:
            if stp != s:
                continue
            if i == 0 or (k in frontier and t > frontier[k]):
                if k not in cur or t < cur[k]:
                    cur[k] = t
        frontier = cur
        out.append((i, s, len(cur)))
    return out


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 8),
                          st.sampled_from(["a", "b", "c"])),
                min_size=1, max_size=50))
def test_funnel_counts_matches_python_reference(spark, raw):
    from ecokg_spark.operators.temporal import funnel_counts

    events = [(f"u{k}", t, s) for k, t, s in raw]
    df = spark.createDataFrame(events, "uid string, ts long, step string")
    steps = ["a", "b", "c"]
    got = sorted(
        (r["step_idx"], r["step"], r["n_keys"])
        for r in funnel_counts(df, "uid", "ts", "step", steps).collect())
    assert got == _funnel_py(events, steps)
