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


# ---------------------------------------------------------------------------
# coalesce_intervals — gaps-and-islands merge
# ---------------------------------------------------------------------------

def _coalesce_py(rows, gap):
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    out = set()
    for k, iv in by_key.items():
        iv.sort()
        cur_s, cur_e, n = iv[0][0], iv[0][1], 1
        for s, e in iv[1:]:
            if s <= cur_e + gap:
                cur_e, n = max(cur_e, e), n + 1
            else:
                out.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        out.add((k, cur_s, cur_e, n))
    return out


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 40),
                          st.integers(0, 15)),
                min_size=1, max_size=40),
       st.integers(0, 3))
def test_coalesce_intervals_matches_python_reference(spark, raw, gap):
    from ecokg_spark.operators.temporal import coalesce_intervals

    rows = [(f"k{k}", s, s + d) for k, s, d in raw]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {(r["k"], r["start"], r["end"], r["n_intervals"])
           for r in coalesce_intervals(df, "k", "s", "e", gap=gap).collect()}
    assert got == _coalesce_py(rows, gap)


# ---------------------------------------------------------------------------
# scd2_intervals — change-compressed validity intervals
# ---------------------------------------------------------------------------

def _scd2_py(rows):
    by_key = {}
    for k, ts, a in rows:
        by_key.setdefault(k, []).append((ts, a))
    out = set()
    for k, ups in by_key.items():
        ups.sort()
        changes = []
        prev = object()
        for ts, a in ups:
            if a != prev:
                changes.append((ts, a))
            prev = a
        for i, (ts, a) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.add((k, a, ts, nxt, nxt is None))
    return out


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(st.integers(0, 3), st.sampled_from("abc")),
                min_size=1, max_size=40))
def test_scd2_intervals_matches_python_reference(spark, raw):
    from ecokg_spark.operators.temporal import scd2_intervals

    # unique ts per key (no ties -> no tiebreak column needed)
    seen = {}
    rows = []
    for k, a in raw:
        ts = seen.get(k, 0)
        seen[k] = ts + 1
        rows.append((f"k{k}", ts, a))
    df = spark.createDataFrame(rows, "k string, ts long, attr string")
    got = {(r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
           for r in scd2_intervals(df, "k", "ts", ["attr"]).collect()}
    assert got == _scd2_py(rows)


# ---------------------------------------------------------------------------
# event_transitions — first-order Markov pair counts
# ---------------------------------------------------------------------------

def _transitions_py(rows):
    by_key = {}
    for k, ts, s in rows:
        by_key.setdefault(k, []).append((ts, s))
    pairs = {}
    for seq in by_key.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    totals = {}
    for (a, _), n in pairs.items():
        totals[a] = totals.get(a, 0) + n
    # tot <= 40 here: n/tot can't hit an exact 6-dp rounding tie (that
    # needs a terminating expansion of exactly 7 digits, i.e. tot >= 128),
    # so Python round == Spark HALF_UP round
    return {(a, b, n, round(n / totals[a], 6)) for (a, b), n in pairs.items()}


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(st.integers(0, 3), st.sampled_from("xyz")),
                min_size=2, max_size=40))
def test_event_transitions_matches_python_reference(spark, raw):
    from ecokg_spark.operators.temporal import event_transitions

    seen = {}
    rows = []
    for k, s in raw:
        ts = seen.get(k, 0)
        seen[k] = ts + 1
        rows.append((f"k{k}", ts, s))
    df = spark.createDataFrame(rows, "k string, ts long, step string")
    got = {(r["from_step"], r["to_step"], r["n"], r["p"])
           for r in event_transitions(df, "k", "ts", "step").collect()}
    assert got == _transitions_py(rows)


# ---------------------------------------------------------------------------
# remove_dup_spans — ExactSubstr-style covered-token removal
# ---------------------------------------------------------------------------

def _rds_py(docs, n, min_docs):
    toks = {i: re.sub(r"[ \t\r\n]+", " ", t).strip(" ").split(" ")
            for i, t in docs}
    occ, sh_pos = {}, {}
    for i, tk in toks.items():
        m = max(len(tk) - (n - 1), 0)
        lst = [(p, " ".join(tk[p:p + n]).lower()) for p in range(m)]
        sh_pos[i] = lst
        for p, sh in lst:
            occ.setdefault(sh, set()).add(i)
    dup = {sh for sh, ds in occ.items() if len(ds) >= min_docs}
    out = {}
    for i, tk in toks.items():
        cov = set()
        for p, sh in sh_pos[i]:
            if sh in dup:
                cov.update(range(p, p + n))
        kept = [t for p2, t in enumerate(tk) if p2 not in cov]
        out[i] = (len(tk), len(kept), " ".join(kept))
    return out


_rds_word = st.sampled_from(["aa", "bb", "cc", "dd", "Aa"])
_rds_doc = st.lists(_rds_word, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=10, **_S)
@given(st.lists(_rds_doc, min_size=1, max_size=8), st.integers(2, 4))
def test_remove_dup_spans_matches_python_reference(spark, texts, n):
    from ecokg_spark.operators.dedup import remove_dup_spans

    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = remove_dup_spans(df, n=n).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text"]) for r in out}
    want = {i: v for i, v in _rds_py(docs, n, 2).items()}
    assert got == want
