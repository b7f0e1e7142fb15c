"""Nineteenth batch of independent pure-Python cross-checks: hashed
bag-of-words embeddings (portable md5 bucket spec, left-fold L2 norm) and
the decimal-staged group centroid — both compared bit-for-bit."""

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# hashed_bow_embed (portable) — md5 buckets, fold-order-exact L2 norm
# ---------------------------------------------------------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc = st.lists(_word, min_size=0, max_size=15).map(" ".join)


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8), st.sampled_from([4, 8, 16]))
def test_hashed_bow_embed_matches_python_reference(spark, texts, dims):
    from ecokg_spark.operators.embed import hashed_bow_embed

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["embedding"]
           for r in hashed_bow_embed(df, dims=dims, portable=True).collect()}
    for d, t in rows:
        toks = [w for w in re.sub(r"[ \t\r\n]+", " ", t).strip(" ").split(" ")
                if w != ""]
        v = [0.0] * dims
        for w in toks:
            b = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % dims
            v[b] += 1.0
        acc = 0.0
        for x in v:  # strict left fold, engine order
            acc += x * x
        norm = acc ** 0.5
        exp = [x / norm for x in v] if norm > 0 else v
        assert got[d] == exp, (d, t)


# ---------------------------------------------------------------------------
# group_centroids — decimal-staged exact mean, dim-ordered rebuild
# ---------------------------------------------------------------------------

_comp = st.integers(-800, 800).map(lambda i: i / 128.0)
_vec = st.lists(_comp, min_size=3, max_size=3)


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 2), _vec),
                min_size=1, max_size=12))
def test_group_centroids_match_python_reference(spark, rows_in):
    from ecokg_spark.operators.embed import group_centroids

    rows = [(f"g{g}", v) for g, v in rows_in]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = {r["label"]: (r["n_vectors"], r["centroid"])
           for r in group_centroids(df, "embedding", "label").collect()}

    q = Decimal(1).scaleb(-18)
    groups: dict[str, list] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        n = len(vs)
        centroid = []
        for dim in range(3):
            s = sum((Decimal(repr(v[dim])).quantize(q, ROUND_HALF_UP)
                     for v in vs), Decimal(0))
            centroid.append(float(str(s)) / n)
        assert got[g] == (n, centroid), g
