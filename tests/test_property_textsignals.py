"""Eleventh batch of independent pure-Python cross-checks: the Catalyst
text quality-signal family over adversarial whitespace/punct/unicode
inputs — token counts, punctuation/stopword ratios, the marker-based
language heuristic, repetition ratio, BPE-ish token count, and the full
Gopher flag set."""

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

_EN = ["the", "and", "of", "to", "is"]
_DE = ["der", "die", "und", "ist", "das"]
_FR = ["le", "la", "et", "les", "est"]
_PUNCT = r"[.,;:!?'\"()\[\]{}-]"


def _norm(s):
    return re.sub(r"[ \t\r\n]+", " ", s).strip(" ")


def _toks(s):
    n = _norm(s)
    return [] if n == "" else n.split(" ")


_piece = st.sampled_from([
    "the", "The", "und", "le", "les", "Hello", "WORLD", "don't", "2024-01",
    "...", "…", "- bullet", "* item", "• dot", "a.b,c!", "(x)", "[y]",
    " ", "  ", "\t", "\n", "\r\n", "", "zz", "αβγ",
])
_text = st.lists(_piece, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=12, **_S)
@given(st.lists(_text, min_size=1, max_size=10))
def test_text_signals_match_python_reference(spark, texts):
    import pyspark.sql.functions as F

    from ecokg_spark.functions.text import (bpe_token_count, lang_id,
                                            punct_ratio, repetition_ratio,
                                            stopword_ratio, token_count)

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            punct_ratio("text").alias("pr"),
            stopword_ratio("text").alias("sr"),
            lang_id("text").alias("lang"),
            repetition_ratio("text").alias("rr"),
            bpe_token_count("text").alias("bc"),
        ).collect()
    }
    for d, t in rows:
        toks = _toks(t)
        tc = len(toks)
        assert got[d]["tc"] == tc

        n_punct = len(re.findall(_PUNCT, t))
        pr = n_punct / max(len(t), 1)
        assert math.isclose(got[d]["pr"], pr, rel_tol=1e-12)

        low = [w.lower() for w in toks]
        sr = sum(1 for w in low if w in _EN) / max(tc, 1)
        assert math.isclose(got[d]["sr"], sr, rel_tol=1e-12)

        en = sum(1 for w in low if w in _EN)
        de = sum(1 for w in low if w in _DE)
        fr = sum(1 for w in low if w in _FR)
        if en == de == fr == 0:
            lang = "und"
        elif en >= de and en >= fr:
            lang = "en"
        elif de >= fr:
            lang = "de"
        else:
            lang = "fr"
        assert got[d]["lang"] == lang

        if _norm(t) == "":
            rr = 0.0
        else:
            rr = 1.0 - len(set(low)) / len(low)
        assert math.isclose(got[d]["rr"], rr, rel_tol=1e-12)

        bc = len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+", _norm(t)))
        assert got[d]["bc"] == bc


@settings(max_examples=12, **_S)
@given(st.lists(_text, min_size=1, max_size=8))
def test_gopher_flags_match_python_reference(spark, texts):
    import pyspark.sql.functions as F

    from ecokg_spark.functions.text import gopher_quality_flags

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    flags = gopher_quality_flags(F.col("text"))
    got = {r["doc_id"]: r
           for r in df.select("doc_id", *[v.alias(k)
                                          for k, v in flags.items()])
           .collect()}
    for d, t in rows:
        toks = _toks(t)
        wc = len(toks)
        wc1 = max(wc, 1)
        norm = _norm(t)
        mwl = (len(norm) - (wc - 1)) / wc1
        low = [w.lower() for w in toks]
        alpha = sum(1 for w in low if re.search("[a-z]", w)) / wc1
        lines = t.split("\n")
        nlines = max(len(lines), 1)
        # Spark ltrim/rtrim strip ONLY the space character, not \t
        bullet = sum(1 for ln in lines
                     if re.match(r"^[-*•]", ln.lstrip(" "))) / nlines
        ellipsis = sum(1 for ln in lines
                       if re.search(r"(\.\.\.|…)$", ln.rstrip(" "))) / nlines
        sw = sum(1 for w in low if w in _EN)
        passes = (50 <= wc <= 100000 and 3.0 <= mwl <= 10.0
                  and alpha > 0.8 and bullet < 0.9 and ellipsis < 0.3
                  and sw >= 2)
        g = got[d]
        assert g["word_count"] == wc
        assert math.isclose(g["mean_word_len"], mwl, rel_tol=1e-12)
        assert math.isclose(g["alpha_word_ratio"], alpha, rel_tol=1e-12)
        assert math.isclose(g["bullet_line_ratio"], bullet, rel_tol=1e-12)
        assert math.isclose(g["ellipsis_line_ratio"], ellipsis,
                            rel_tol=1e-12)
        assert g["passes_gopher"] == passes
