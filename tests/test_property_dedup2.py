"""Eighth batch of independent pure-Python cross-checks: the shingle-set
dedup family — n-gram Jaccard pairs, Broder containment pairs, benchmark
decontamination, and CCNet line-dedup semantics (census on the normalized
form, original-order rebuild)."""

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _shingles(text, k):
    """with_word_shingles' rule: lowercased whitespace tokens; n <= k
    yields the single whole-normalized-text shingle; distinct set."""
    norm = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").lower()
    toks = norm.split(" ")
    if len(toks) <= k:
        return {norm}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=2, max_size=8), st.integers(1, 4),
       st.floats(0.1, 1.0))
def test_ngram_jaccard_pairs_match_python(spark, texts, n, threshold):
    from ecokg_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, n=n,
                                        threshold=threshold).collect()}
    sh = {d: _shingles(t, n) for d, t in rows}
    exp = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= threshold:
                exp[(a, b)] = j
    assert set(got) == set(exp)
    for pair, j in exp.items():
        assert math.isclose(got[pair], j, rel_tol=1e-12)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=2, max_size=8), st.integers(1, 4),
       st.floats(0.1, 1.0))
def test_containment_pairs_match_python(spark, texts, n, threshold):
    from ecokg_spark.operators.dedup import containment_pairs

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
           for r in containment_pairs(df, n=n, threshold=threshold).collect()}
    sh = {d: _shingles(t, n) for d, t in rows}
    exp = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            ca, cb = inter / len(sh[a]), inter / len(sh[b])
            if max(ca, cb) >= threshold:
                exp[(a, b)] = (ca, cb)
    assert set(got) == set(exp)
    for pair, (ca, cb) in exp.items():
        assert math.isclose(got[pair][0], ca, rel_tol=1e-12)
        assert math.isclose(got[pair][1], cb, rel_tol=1e-12)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8),
       st.lists(_doc, min_size=1, max_size=3),
       st.integers(1, 3), st.integers(1, 3))
def test_decontaminate_matches_python(spark, train, evals, n, min_shared):
    from ecokg_spark.operators.dedup import decontaminate

    t_rows = [(f"t{i}", x) for i, x in enumerate(train)]
    e_rows = [(f"e{i}", x) for i, x in enumerate(evals)]
    tdf = spark.createDataFrame(t_rows, "doc_id string, text string")
    edf = spark.createDataFrame(e_rows, "eval_id string, text string")
    got = {(r["doc_id"], r["eval_id"]): r["n_shared"]
           for r in decontaminate(tdf, edf, n=n,
                                  min_shared=min_shared).collect()}
    exp = {}
    for td, tt in t_rows:
        for ed, et in e_rows:
            shared = len(_shingles(tt, n) & _shingles(et, n))
            if shared >= min_shared:
                exp[(td, ed)] = shared
    assert got == exp


# ---------------------------------------------------------------------------
# line_dedup — census semantics on the normalized form, ordered rebuild
# ---------------------------------------------------------------------------

_line = st.sampled_from(["nav", " nav ", "alpha beta", "gamma", "", "x  y"])


@settings(max_examples=10, **_S)
@given(st.lists(st.lists(_line, min_size=1, max_size=6),
                min_size=1, max_size=6),
       st.integers(2, 3))
def test_line_dedup_matches_python_semantics(spark, docs, min_docs):
    from ecokg_spark.operators.dedup import line_dedup

    rows = [(f"d{i}", "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["text"])
           for r in line_dedup(df, min_docs=min_docs).collect()}

    def norm(s):
        return re.sub(r"[ \t\r\n]+", " ", s).strip(" ")

    census: dict[str, set] = {}
    for d, text in rows:
        for ln in text.split("\n"):
            census.setdefault(norm(ln), set()).add(d)
    dup = {k for k, ds in census.items() if len(ds) >= min_docs}
    for d, text in rows:
        lines = text.split("\n")
        kept = [ln for ln in lines if norm(ln) not in dup]
        assert got[d] == (len(lines), len(kept), "\n".join(kept))
