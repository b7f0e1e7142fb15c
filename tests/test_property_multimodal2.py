"""Eighteenth batch of independent pure-Python cross-checks: the
multimodal planning/feature ops (byte features, resize plan, audio chunk
plan, frame sample plan) and the dup-span census."""

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# byte_features — numpy-free Python replay over raw payload bytes
# ---------------------------------------------------------------------------

_payload = st.binary(min_size=0, max_size=60)


@settings(max_examples=10, **_S)
@given(st.lists(_payload, min_size=1, max_size=8), st.integers(0, 255),
       st.sampled_from([4, 8, 16]))
def test_byte_features_match_python_reference(spark, payloads, marker, bins):
    from ecokg_spark.operators.multimodal import byte_features

    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r
           for r in byte_features(df, marker_byte=marker,
                                  bins=bins).collect()}
    width = 256 // bins
    for i, p in rows:
        n = len(p)
        hist = [0.0] * bins
        for b in p:
            hist[b // width] += 1
        g = got[i]
        assert g["byte_len"] == n
        assert g["n_marker"] == sum(1 for b in p if b == marker)
        if n:
            assert math.isclose(g["mean_byte"], sum(p) / n, rel_tol=1e-12)
            assert math.isclose(g["frac_marker"], g["n_marker"] / n,
                                rel_tol=1e-12)
            for gb, eb in zip(g["hist"], hist):
                assert math.isclose(gb, eb / n, rel_tol=1e-12)
        else:
            assert g["mean_byte"] == 0.0 and g["frac_marker"] == 0.0
            assert g["hist"] == [0.0] * bins


# ---------------------------------------------------------------------------
# resize_plan — aspect-preserving box fit, floor + clamp
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 4000), st.integers(0, 4000)),
                min_size=1, max_size=10),
       st.integers(16, 512))
def test_resize_plan_matches_python_reference(spark, dims, max_side):
    from ecokg_spark.operators.multimodal import resize_plan

    rows = [(i, w, h) for i, (w, h) in enumerate(dims)]
    df = spark.createDataFrame(rows, "media_id long, width int, height int")
    got = {r["media_id"]: (r["out_w"], r["out_h"], r["resized"])
           for r in resize_plan(df, max_side=max_side).collect()}
    for i, w0, h0 in rows:
        w, h = max(w0, 1), max(h0, 1)
        scale = min(1.0, float(max_side) / max(w, h))
        exp = (max(math.floor(w * scale), 1), max(math.floor(h * scale), 1),
               max(w, h) > max_side)
        assert got[i] == exp, (w0, h0)


# ---------------------------------------------------------------------------
# audio_chunk_plan / frame_sample_plan — integer scheduling arithmetic
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.integers(0, 200_000), min_size=1, max_size=8),
       st.integers(1_000, 40_000), st.integers(0, 900))
def test_audio_chunk_plan_matches_python_reference(spark, durs, chunk_ms,
                                                   overlap_ms):
    from ecokg_spark.operators.multimodal import audio_chunk_plan

    rows = [(f"a{i}", d) for i, d in enumerate(durs)]
    df = spark.createDataFrame(rows, "doc_id string, duration_ms long")
    got = {(r["doc_id"], r["chunk_idx"]): (r["start_ms"], r["end_ms"])
           for r in audio_chunk_plan(df, chunk_ms=chunk_ms,
                                     overlap_ms=overlap_ms).collect()}
    step = chunk_ms - overlap_ms
    exp = {}
    for d, dur in rows:
        n = (max(dur - chunk_ms, 0) + step - 1) // step + 1
        for ci in range(n):
            start = ci * step
            exp[(d, ci)] = (start, min(start + chunk_ms, dur))
    assert got == exp


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 120_000), st.integers(1, 60)),
                min_size=1, max_size=8),
       st.integers(1, 60), st.one_of(st.none(), st.integers(1, 50)))
def test_frame_sample_plan_matches_python_reference(spark, rows_in, every_n,
                                                    max_frames):
    from ecokg_spark.operators.multimodal import frame_sample_plan

    rows = [(f"v{i}", d, f) for i, (d, f) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "doc_id string, duration_ms long, fps int")
    got = {(r["doc_id"], r["frame_idx"]): (r["ts_ms"], r["n_sampled"])
           for r in frame_sample_plan(df, fps_col="fps", every_n=every_n,
                                      max_frames=max_frames).collect()}
    exp = {}
    for d, dur, fps in rows:
        total = dur * fps // 1000
        n = (total + every_n - 1) // every_n
        if max_frames is not None:
            n = min(n, max_frames)
        for i in range(n):
            exp[(d, i * every_n)] = (i * every_n * 1000 // fps, n)
    assert got == exp


# ---------------------------------------------------------------------------
# dup_span_stats — posting-list census of distinct word n-grams
# ---------------------------------------------------------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _shingles(text, k):
    norm = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").lower()
    toks = norm.split(" ")
    if len(toks) <= k:
        return {norm}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 4))
def test_dup_span_stats_match_python_reference(spark, texts, n):
    from ecokg_spark.operators.dedup import dup_span_stats

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"])
           for r in dup_span_stats(df, n=n).collect()}
    sh = {d: _shingles(t, n) for d, t in rows}
    census: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            census[g] = census.get(g, 0) + 1
    for d, s in sh.items():
        n_spans = len(s)
        n_dup = sum(1 for g in s if census[g] >= 2)
        gd = got[d]
        assert gd[0] == n_spans and gd[1] == n_dup
        assert math.isclose(gd[2], n_dup / n_spans, rel_tol=1e-12)
