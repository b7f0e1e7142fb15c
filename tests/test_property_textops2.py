"""Twelfth batch of independent pure-Python cross-checks: the banded
range join (bag semantics), C4 cleaning rules, vocabulary induction, BPE
pair counting, and Flesch reading ease."""

import datetime
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _round_half_up(x: float, nd: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"),
                                           rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# range_join — every in-band pair exactly once, bag semantics
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 120)),
                min_size=1, max_size=15),
       st.lists(st.tuples(st.integers(0, 2), st.integers(0, 120),
                          st.integers(0, 9)),
                min_size=1, max_size=15),
       st.integers(1, 30))
def test_range_join_matches_python_reference(spark, lrows, rrows, range_s):
    from ecokg_spark.operators.temporal import range_join

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    ldf = spark.createDataFrame([(f"k{k}", ts(s)) for k, s in lrows],
                                "key string, ts timestamp")
    rdf = spark.createDataFrame([(f"k{k}", ts(s), v) for k, s, v in rrows],
                                "key string, ts timestamp, val int")
    out = range_join(ldf, rdf, on=["key"], range_s=float(range_s))
    got = Counter((r["key"], r["ts"], r["val"], r["_r_ts"])
                  for r in out.collect())
    exp = Counter()
    for lk, ls in lrows:
        for rk, rs, v in rrows:
            if lk == rk and abs(ls - rs) <= range_s:
                exp[(f"k{lk}", ts(ls), v, ts(rs))] += 1
    assert got == exp


# ---------------------------------------------------------------------------
# c4_quality_flags — line rule + document rules
# ---------------------------------------------------------------------------

_c4line = st.sampled_from([
    "This is a good long sentence.", "Too short.", "no terminal punct",
    "Enable javascript to view this page.", "one two three four five!",
    "lorem ipsum dolor sit amet.", "code { body }", "", "   ",
    "Is  this   five words long?", "\tTabbed line with five words.",
])
_c4doc = st.lists(_c4line, min_size=0, max_size=8).map("\n".join)


@settings(max_examples=12, **_S)
@given(st.lists(_c4doc, min_size=1, max_size=8))
def test_c4_flags_match_python_reference(spark, texts):
    import pyspark.sql.functions as F

    from ecokg_spark.functions.text import c4_quality_flags

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    flags = c4_quality_flags(F.col("text"))
    got = {r["doc_id"]: r
           for r in df.select("doc_id", *[v.alias(k)
                                          for k, v in flags.items()])
           .collect()}
    for d, t in rows:
        lines = t.split("\n")
        kept = []
        for ln in lines:
            # Spark: trim(regexp_replace(l, " +", " ")) — spaces only
            norm = re.sub(" +", " ", ln).strip(" ")
            words = norm.split(" ")
            if (re.search(r"[.!?]$", norm) and len(words) >= 5
                    and not re.search("javascript", norm, re.I)):
                kept.append(norm)
        passes = (len(kept) >= 3 and "lorem ipsum" not in t.lower()
                  and "{" not in t)
        g = got[d]
        assert g["n_lines"] == len(lines)
        assert g["n_kept"] == len(kept)
        assert g["kept_text"] == "\n".join(kept)
        assert g["passes_c4"] == passes


# ---------------------------------------------------------------------------
# build_vocab / bpe_merge_candidates — top-k counting with exact rank
# ---------------------------------------------------------------------------

_word = st.sampled_from(["aa", "ab", "ba", "The", "the", "x", ""])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _norm_toks_lower(text):
    n = re.sub(r"[ \t\r\n]+", " ", text).strip(" ").lower()
    return n.split(" ")  # NOTE: blank text yields the "" token, as Spark


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 6))
def test_build_vocab_matches_python_reference(spark, texts, k):
    from ecokg_spark.functions.text import build_vocab

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["token"], r["n"], r["rank"])
           for r in build_vocab(df, k=k).orderBy("rank").collect()]
    counts = Counter(w for t in texts for w in _norm_toks_lower(t))
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    exp = [(w, c, i + 1) for i, (w, c) in enumerate(ordered)]
    assert got == exp


@settings(max_examples=10, **_S)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 8))
def test_bpe_pairs_match_python_reference(spark, texts, k):
    from ecokg_spark.functions.text import bpe_merge_candidates

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["pair"], r["n"], r["rank"])
           for r in bpe_merge_candidates(df, k=k).orderBy("rank").collect()]
    counts = Counter()
    for t in texts:
        for w in _norm_toks_lower(t):
            if len(w) >= 2:
                for a, b in zip(w, w[1:]):
                    counts[a + b] += 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    exp = [(p, c, i + 1) for i, (p, c) in enumerate(ordered)]
    assert got == exp


# ---------------------------------------------------------------------------
# flesch_reading_ease — vowel-group syllable proxy
# ---------------------------------------------------------------------------

_ftext = st.lists(st.sampled_from([
    "The cat sat.", "Hello world", "Why?!", "aeiou", "rhythm", "",
    "  ", "one. two. three.", "xyz",
]), min_size=0, max_size=6).map(" ".join)


@settings(max_examples=12, **_S)
@given(st.lists(_ftext, min_size=1, max_size=8))
def test_flesch_matches_python_reference(spark, texts):
    import pyspark.sql.functions as F

    from ecokg_spark.functions.text import flesch_reading_ease

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["score"]
           for r in df.select(
               "doc_id", flesch_reading_ease("text").alias("score"))
           .collect()}
    for d, t in rows:
        norm = re.sub(r"[ \t\r\n]+", " ", t).strip(" ")
        words = 0 if norm == "" else len(norm.split(" "))
        if words == 0:
            assert got[d] is None
            continue
        sents = max(len(re.findall(r"[.!?]+", t)), 1)
        syll = len(re.findall(r"[aeiouy]+", t.lower()))
        score = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
        assert math.isclose(got[d], _round_half_up(score, 4), abs_tol=2e-4)
