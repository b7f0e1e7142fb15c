"""Fifteenth batch of independent pure-Python cross-checks: exact dedup
(md5 fingerprint + min-id survivor), int8 quantization (floor-ties-up),
integer-exact int8 top-k retrieval, and exact-mode embedding near-dup
pairs (float cosine, left-fold order)."""

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# exact_dedup — min-id survivor per normalized-text md5
# ---------------------------------------------------------------------------

_txt = st.sampled_from(["Hello  World", "hello world", "HELLO\tWORLD",
                        " hello world ", "other doc", "", "  "])


@settings(max_examples=10, **_S)
@given(st.lists(_txt, min_size=1, max_size=12))
def test_exact_dedup_matches_python_reference(spark, texts):
    from ecokg_spark.operators.dedup import exact_dedup

    rows = [(f"d{i:02d}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["doc_id"], r["text"]) for r in exact_dedup(df).collect()}

    def fp(t):
        norm = re.sub(r"[ \t\r\n]+", " ", t).strip(" ").lower()
        return hashlib.md5(norm.encode()).hexdigest()

    keep: dict[str, str] = {}
    for d, t in rows:
        f = fp(t)
        if f not in keep or d < keep[f]:
            keep[f] = d
    by_id = dict(rows)
    exp = {(d, by_id[d]) for d in keep.values()}
    assert got == exp


# ---------------------------------------------------------------------------
# int8_quantize — floor(127 x / max_abs + 0.5), scale round
# ---------------------------------------------------------------------------

_vec = st.lists(st.integers(-50, 50).map(lambda i: i / 4.0),
                min_size=1, max_size=6)


@settings(max_examples=10, **_S)
@given(st.lists(_vec, min_size=1, max_size=8))
def test_int8_quantize_matches_python_reference(spark, vecs):
    from decimal import ROUND_HALF_UP, Decimal

    from ecokg_spark.operators.embed import int8_quantize

    rows = [(f"v{i}", v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = {r["vec_id"]: (r["scale"], r["qvec"])
           for r in int8_quantize(df).collect()}
    for vid, v in rows:
        m = max((abs(x) for x in v), default=0.0)
        m = max(m, 0.0)
        if m > 0:
            q = [math.floor(127.0 * x / m + 0.5) for x in v]
            scale = float(Decimal(repr(m / 127.0)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP))
        else:
            q = [0] * len(v)
            scale = 0.0
        assert got[vid] == (scale, q), (vid, v)


# ---------------------------------------------------------------------------
# int8_topk — exact BIGINT dot ranking over quantized vectors
# ---------------------------------------------------------------------------

def test_int8_topk_matches_python_reference(spark):
    from ecokg_spark.operators.similarity import int8_topk

    corpus = [(f"c{i:02d}",
               [((i * 7 + j * 3) % 21 - 10) / 2.0 for j in range(4)])
              for i in range(14)]
    queries = [("q0", [1.0, -2.0, 0.5, 3.0]), ("q1", [-1.0, 0.0, 2.0, 1.0])]
    cdf = spark.createDataFrame(corpus, "vec_id string, embedding array<double>")
    qdf = spark.createDataFrame(queries, "vec_id string, embedding array<double>")
    k = 5
    got = {(r["query_id"], r["rank"]): (r["vec_id"], r["dot"])
           for r in int8_topk(cdf, qdf, k=k).collect()}

    def quant(v):
        m = max(abs(x) for x in v)
        if m == 0:
            return [0] * len(v)
        return [math.floor(127.0 * x / m + 0.5) for x in v]

    qq = {d: quant(v) for d, v in queries}
    cq = {d: quant(v) for d, v in corpus}
    exp = {}
    for qid, qv in qq.items():
        scored = sorted(
            ((sum(a * b for a, b in zip(cv, qv)), cid)
             for cid, cv in cq.items() if cid != qid),
            key=lambda t: (-t[0], t[1]))
        for rk, (dot, cid) in enumerate(scored[:k], start=1):
            exp[(qid, rk)] = (cid, dot)
    assert got == exp


# ---------------------------------------------------------------------------
# embedding_neardup_pairs (exact mode) — all-pairs cosine, fold order
# ---------------------------------------------------------------------------

_vec4 = st.lists(st.integers(-50, 50).map(lambda i: i / 4.0),
                 min_size=4, max_size=4).filter(lambda v: any(v))


@settings(max_examples=8, **_S)
@given(st.lists(_vec4, min_size=2, max_size=8), st.floats(0.5, 0.99))
def test_embedding_neardup_exact_matches_python(spark, vecs, threshold):
    from ecokg_spark.operators.dedup import embedding_neardup_pairs

    rows = [(f"v{i}", v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cos"]
           for r in embedding_neardup_pairs(
               df, threshold=threshold, exact=True).collect()}

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):  # strict left fold, engine order
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    exp = {}
    for i, (da, va) in enumerate(rows):
        for db, vb in rows[i + 1:]:
            c = cos(va, vb)
            if c >= threshold:
                exp[(da, db)] = c
    assert set(got) == set(exp)
    for pair, c in exp.items():
        assert math.isclose(got[pair], c, rel_tol=1e-12)
