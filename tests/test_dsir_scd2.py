"""DSIR importance weights (operators/sample.py) and SCD2 validity
intervals (operators/temporal.py): exact reference recomputation + hand
cases."""

import hashlib
import math

import pytest

from ecokg_spark.operators.sample import dsir_logweights
from ecokg_spark.operators.temporal import scd2_intervals

DIMS = 16


def _feats(text):
    toks = [t for t in text.split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(f):
    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % DIMS


def _ref_weights(raw, target, alpha=1.0):
    rg, tg = {}, {}
    for _, text in raw:
        for f in _feats(text):
            rg[_bucket(f)] = rg.get(_bucket(f), 0) + 1
    for _, text in target:
        for f in _feats(text):
            tg[_bucket(f)] = tg.get(_bucket(f), 0) + 1
    R, T = sum(rg.values()), sum(tg.values())
    out = {}
    for did, text in raw:
        w, n = 0.0, 0
        for f in _feats(text):
            b = _bucket(f)
            w += (math.log((tg.get(b, 0) + alpha) / (T + alpha * DIMS))
                  - math.log((rg[b] + alpha) / (R + alpha * DIMS)))
            n += 1
        out[did] = (n, round(w, 6))
    return out


def test_dsir_matches_reference_and_ranks_target_like_docs(spark):
    raw = [("d1", "alpha beta alpha"), ("d2", "gamma delta epsilon"),
           ("d3", "alpha beta"), ("d4", "  ")]
    target = [("t1", "alpha beta alpha beta")]
    raw_df = spark.createDataFrame(raw, "doc_id string, text string")
    tgt_df = spark.createDataFrame(target, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_features"], r["logweight"])
           for r in dsir_logweights(raw_df, tgt_df, dims=DIMS,
                                    portable=True).collect()}
    ref = _ref_weights([r for r in raw if r[1].strip()], target)
    assert got["d4"] == (0, 0.0)                  # blank doc weighs 0
    for did, (n, w) in ref.items():
        assert got[did][0] == n
        assert got[did][1] == pytest.approx(w, abs=2e-6)
    # docs sharing the target's vocabulary outrank disjoint-vocab docs
    assert got["d1"][1] > got["d2"][1]
    assert got["d3"][1] > got["d2"][1]


def test_dsir_n_features_counts_unigrams_and_bigrams(spark):
    raw_df = spark.createDataFrame([("d", "a b c")],
                                   "doc_id string, text string")
    got = dsir_logweights(raw_df, raw_df, dims=DIMS,
                          portable=True).collect()[0]
    assert got["n_features"] == 5                 # 3 unigrams + 2 bigrams


UPD = "k int, ts int, sq int, st string"


def test_scd2_compresses_and_closes_intervals(spark):
    u = spark.createDataFrame(
        [(1, 10, 1, "A"), (1, 20, 2, "A"), (1, 30, 3, "B"), (1, 40, 4, "A"),
         (2, 10, 5, "X")],
        UPD,
    )
    rows = sorted(
        scd2_intervals(u, "k", "ts", ["st"], tiebreak_cols=["sq"]).collect(),
        key=lambda r: (r["k"], r["valid_from"]))
    assert [(r["k"], r["st"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in rows] == [
        (1, "A", 10, 30, False),       # the ts=20 duplicate is compressed
        (1, "B", 30, 40, False),
        (1, "A", 40, None, True),      # reverting to A opens a NEW interval
        (2, "X", 10, None, True),
    ]


def test_scd2_tiebreak_orders_same_timestamp_updates(spark):
    u = spark.createDataFrame([(1, 10, 1, "A"), (1, 10, 2, "B")], UPD)
    rows = sorted(
        scd2_intervals(u, "k", "ts", ["st"], tiebreak_cols=["sq"]).collect(),
        key=lambda r: (r["valid_from"], r["st"]))
    assert [(r["st"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("A", 10, 10), ("B", 10, None)]


def test_scd2_uncompressed_keeps_every_update(spark):
    u = spark.createDataFrame([(1, 10, 1, "A"), (1, 20, 2, "A")], UPD)
    assert scd2_intervals(u, "k", "ts", ["st"], tiebreak_cols=["sq"],
                          compress=False).count() == 2
    assert scd2_intervals(u, "k", "ts", ["st"],
                          tiebreak_cols=["sq"]).count() == 1


def test_scd2_null_attr_transitions_null_safe(spark):
    u = spark.createDataFrame([(1, 10, 1, "A"), (1, 20, 2, None),
                               (1, 30, 3, None)], UPD)
    rows = sorted(scd2_intervals(u, "k", "ts", ["st"],
                                 tiebreak_cols=["sq"]).collect(),
                  key=lambda r: r["valid_from"])
    # A -> NULL is a change; NULL -> NULL is not
    assert [(r["st"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("A", 10, 20), (None, 20, None)]


# --------------------------------------------------------------------------
# rolling z-score anomalies (operators/temporal.py rolling_zscore)
# --------------------------------------------------------------------------

def _ref_zscores(vals, window, min_points, threshold):
    out = []
    for i, v in enumerate(vals):
        base = vals[max(0, i - window):i]
        n = len(base)
        mean = round(sum(base) / n, 6) if n >= 1 else None
        z = None
        if n >= min_points:
            m = sum(base) / n
            var = sum((x - m) ** 2 for x in base) / (n - 1)
            if var > 0:
                z = round((v - m) / math.sqrt(var), 6)
        out.append((n, mean, z, bool(z is not None and abs(z) > threshold)))
    return out


def test_rolling_zscore_matches_reference(spark):
    from ecokg_spark.operators.temporal import rolling_zscore

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 3.0, 2.5]
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, ts int, sq int, value double")
    got = sorted(
        rolling_zscore(df, "k", "ts", "value", window=5, min_points=5,
                       threshold=3.0, tiebreak_cols=["sq"]).collect(),
        key=lambda r: r["ts"])
    ref = _ref_zscores(vals, window=5, min_points=5, threshold=3.0)
    for r, (n, mean, z, flag) in zip(got, ref):
        assert r["n_baseline"] == n
        assert r["mean"] == (pytest.approx(mean, abs=2e-6)
                             if mean is not None else None)
        if z is None:
            assert r["z"] is None
        else:
            assert r["z"] == pytest.approx(z, abs=2e-6)
        assert r["is_anomaly"] == flag
    # the planted spike is the only anomaly
    assert [r["ts"] for r in got if r["is_anomaly"]] == [5]


def test_rolling_zscore_zero_variance_and_min_points(spark):
    from ecokg_spark.operators.temporal import rolling_zscore

    rows = [(1, i, i, 7.0) for i in range(6)] + [(1, 6, 6, 9.0)]
    df = spark.createDataFrame(rows, "k int, ts int, sq int, value double")
    got = {r["ts"]: r for r in rolling_zscore(
        df, "k", "ts", "value", window=10, min_points=5,
        tiebreak_cols=["sq"]).collect()}
    assert got[2]["z"] is None          # below min_points
    assert got[6]["z"] is None          # zero-variance baseline
    assert not got[6]["is_anomaly"]
    assert got[6]["mean"] == pytest.approx(7.0)
