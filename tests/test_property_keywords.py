"""Ninth batch of independent pure-Python cross-checks: corpus keyword
statistics — TF-IDF top-k (deterministic ranking), document co-occurrence
PMI, and word-unigram entropy — vs dict references using math.log."""

import math
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _r6(x: float) -> float:
    """Spark's ROUND(double, 6): shortest-repr BigDecimal + HALF_UP (NOT
    Python's banker's round — matters because these values feed ranking)."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"),
                                           rounding=ROUND_HALF_UP))

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

_word = st.sampled_from(["ant", "bee", "cat", "dog", "elk"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _toks(text):
    t = re.split(r"\s+", text.strip())
    return [w for w in t if w != ""]


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 4))
def test_tfidf_topk_matches_python_reference(spark, texts, k):
    from ecokg_spark.operators.keywords import tfidf_topk

    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {(r["doc_id"], r["term"], r["rank"]): r["score"]
           for r in tfidf_topk(df, k=k).collect()}

    n = len(docs)
    tf: dict[tuple, int] = {}
    for d, t in docs:
        for w in _toks(t):
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dfreq: dict[str, int] = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    exp = {}
    for d, _ in docs:
        terms = [(w, c) for (dd, w), c in tf.items() if dd == d]
        scored = sorted(
            ((_r6(c * math.log(n / dfreq[w])), w) for w, c in terms),
            key=lambda x: (-x[0], x[1]))
        for rk, (s, w) in enumerate(scored[:k], start=1):
            exp[(d, w, rk)] = s
    assert set(got) == set(exp)
    for key, s in exp.items():
        assert math.isclose(got[key], s, abs_tol=2e-6)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 3))
def test_cooccurrence_pmi_matches_python_reference(spark, texts, min_pairs):
    from ecokg_spark.operators.keywords import cooccurrence_pmi

    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {(r["term_a"], r["term_b"]): (r["n_pairs"], r["pmi"])
           for r in cooccurrence_pmi(df, min_pairs=min_pairs).collect()}

    n = len(docs)
    presence = {(d, w) for d, t in docs for w in _toks(t)}
    singles: dict[str, int] = {}
    for _, w in presence:
        singles[w] = singles.get(w, 0) + 1
    pair_counts: dict[tuple, int] = {}
    for d, _ in docs:
        words = sorted({w for dd, w in presence if dd == d})
        for i, a in enumerate(words):
            for b in words[i + 1:]:
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    exp = {
        pair: (c, _r6(math.log(c * n / (singles[pair[0]]
                                        * singles[pair[1]]))))
        for pair, c in pair_counts.items() if c >= min_pairs}
    assert set(got) == set(exp)
    for pair, (c, pmi) in exp.items():
        assert got[pair][0] == c
        assert math.isclose(got[pair][1], pmi, abs_tol=2e-6)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_doc_word_entropy_matches_python_reference(spark, texts):
    from ecokg_spark.operators.keywords import doc_word_entropy

    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"])
           for r in doc_word_entropy(df).collect()}

    exp = {}
    for d, t in docs:
        toks = _toks(t)
        if not toks:
            continue  # empty documents omitted
        counts: dict[str, int] = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        n = len(toks)
        h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        exp[d] = (n, _r6(h))
    assert set(got) == set(exp)
    for d, (n, h) in exp.items():
        assert got[d][0] == n
        assert math.isclose(got[d][1], h, abs_tol=2e-6)
