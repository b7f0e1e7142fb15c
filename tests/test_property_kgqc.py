"""Fifth batch of independent pure-Python cross-checks, pinning the two
round-4 ADVICE fix sites with randomized replays: kg_negative_samples (the
md5-hash pick/bucket protocol, including '|'-containing entities) and
degree_assortativity (exact-integer Pearson sums)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# kg_negative_samples — full protocol replay (salted pick, bucket probe,
# filtered anti-join), with separator-adversarial entity names
# ---------------------------------------------------------------------------

def _negatives_py(triples, k, buckets):
    entities = sorted({o for _, _, o in triples})
    picks = {}
    for salt in range(k):
        per_bucket: dict[int, str] = {}
        for e in entities:
            eh = _h60(f"{salt}#{e}")
            key = f"{eh:019d}|{e}"  # the engine's literal pick-key string
            b = eh % buckets
            if b not in per_bucket or key < per_bucket[b]:
                per_bucket[b] = key
        picks[salt] = {b: key[20:] for b, key in per_bucket.items()}

    def lp(x):
        return f"{len(x)}:{x}"

    positives = {(s, p, o) for s, p, o in triples}
    out = set()
    for s, p, o in set(triples):
        for salt in range(k):
            th = _h60(f"{lp(s)}|{lp(p)}|{lp(o)}|{salt}")
            pick = picks[salt].get(th % buckets)
            if pick is None or pick == o:
                continue
            if (s, p, pick) in positives:
                continue
            out.add((s, p, pick, salt))
    return out


_ent = st.sampled_from(["a", "b|b", "c", "d|", "|e", "ff", "g:1", "h"])
_pred = st.sampled_from(["likes", "knows"])


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(_ent, _pred, _ent), min_size=1, max_size=25),
       st.integers(1, 3), st.integers(2, 8))
def test_negative_samples_match_python_protocol(spark, triples, k, buckets):
    from ecokg_spark.operators.kgtrain import kg_negative_samples

    df = spark.createDataFrame(triples,
                               "subject string, predicate string, object string")
    got = {(r["subject"], r["predicate"], r["neg_object"], r["neg_idx"])
           for r in kg_negative_samples(df, k=k, buckets=buckets).collect()}
    exp = _negatives_py(triples, k, buckets)
    assert got == exp
    # the filtered protocol: no emitted negative may be a known positive
    pos = {(s, p, o) for s, p, o in triples}
    assert not any((s, p, n) in pos for s, p, n, _ in got)


# ---------------------------------------------------------------------------
# degree_assortativity — Pearson over (out-deg(src), in-deg(dst)) vs Python
# ---------------------------------------------------------------------------

_node = st.integers(0, 7).map(lambda i: f"n{i}")


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(_node, _node), min_size=1, max_size=30))
def test_assortativity_matches_python_reference(spark, edges):
    from ecokg_spark.operators.kgqc import degree_assortativity

    df = spark.createDataFrame(edges, "src string, dst string")
    row = degree_assortativity(df).collect()[0]

    dout: dict[str, int] = {}
    din: dict[str, int] = {}
    for s, t in edges:
        dout[s] = dout.get(s, 0) + 1
        din[t] = din.get(t, 0) + 1
    xs = [dout[s] for s, _ in edges]
    ys = [din[t] for _, t in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)

    assert row["n_edges"] == n
    if den <= 0:
        assert row["assortativity"] is None
    else:
        assert math.isclose(row["assortativity"], round(num / den, 6),
                            rel_tol=1e-9, abs_tol=1e-6)
