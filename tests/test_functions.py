"""Unit tests for the pure column-expression library (SURVEY.md §5 item 1 —
mirrors tests/test_transform_utils.py:7-24 parameterized pure-function tests)."""

import pytest
from pyspark.sql import functions as F

from ecokg_spark.functions.curie import (
    collapse_uniprot_curie,
    curie_local,
    curie_prefix,
    guess_bl_category,
    make_curie,
    priority_coalesce,
)
from ecokg_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("r")).first()["r"]


@pytest.mark.parametrize(
    "ident,expected",
    [
        ("UniProtKB:P12345", "biolink:Protein"),
        ("ComplexPortal:X", "biolink:Protein"),
        ("GO:0001", "biolink:OntologyClass"),
        ("FOO:bar", "biolink:NamedThing"),
    ],
)
def test_guess_bl_category(spark, ident, expected):
    # parity: reference utils/transform_utils.py:183-198
    assert one(spark, guess_bl_category("x"), x=ident) == expected


@pytest.mark.parametrize(
    "ident,expected",
    [
        ("UniProtKB:P63151-1", "UniProtKB:P63151"),
        ("uniprotkb:P63151-2", "uniprotkb:P63151"),
        ("PR:000123-1", "PR:000123-1"),  # non-uniprot untouched
        ("UniProtKB:P63151", "UniProtKB:P63151"),
    ],
)
def test_collapse_uniprot_curie(spark, ident, expected):
    # parity: reference utils/transform_utils.py:201-210
    assert one(spark, collapse_uniprot_curie("x"), x=ident) == expected


def test_curie_parts(spark):
    assert one(spark, curie_prefix("x"), x="EOL:123") == "EOL"
    assert one(spark, curie_local("x"), x="EOL:123") == "123"
    assert one(spark, make_curie("EOL", "x"), x="99") == "EOL:99"


def test_priority_coalesce(spark):
    # parity: get_item_by_priority (transform_utils.py:83-97) — empty = missing
    assert one(spark, priority_coalesce("a", "b"), a="", b="v") == "v"
    assert one(spark, priority_coalesce("a", "b"), a="x", b="v") == "x"


def test_token_count(spark):
    assert one(spark, token_count("x"), x="  a  b\tc\n") == 3
    assert one(spark, token_count("x"), x="") == 0
    assert one(spark, token_count("x"), x="   ") == 0


def test_lang_id(spark):
    assert one(spark, lang_id("x"), x="the cat and the dog is here") == "en"
    assert one(spark, lang_id("x"), x="der Hund und die Katze ist da") == "de"
    assert one(spark, lang_id("x"), x="le chat et la souris est là") == "fr"
    assert one(spark, lang_id("x"), x="xyzzy qwerty") == "und"


def test_fingerprint_ws_invariant(spark):
    a = one(spark, doc_fingerprint("x"), x="Hello   World")
    b = one(spark, doc_fingerprint("x"), x="hello world")
    assert a == b


def test_word_shingles(spark):
    assert one(spark, word_shingles("x", 3), x="a b c d") == ["a b c", "b c d"]
    assert one(spark, word_shingles("x", 3), x="a b") == ["a b"]


def test_quality_score_bounds(spark):
    v = one(spark, quality_score("x"), x="the quick brown fox jumps over the lazy dog today")
    assert 0.0 <= v <= 1.0 and v >= 0.7  # long enough, low punct, has stopwords


def test_repetition_ratio(spark):
    from ecokg_spark.functions.text import repetition_ratio
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a a a a"), (2, "A  a\tb"), (3, "")],
        "i long, text string")
    got = {r["i"]: r["r"] for r in
           df.select("i", repetition_ratio("text").alias("r")).collect()}
    assert got[0] == 0.0
    assert got[1] == 0.75
    assert abs(got[2] - (1 - 2 / 3)) < 1e-12   # case-folded 'A'=='a'
    assert got[3] == 0.0


def test_bpe_token_count(spark):
    from ecokg_spark.functions.text import bpe_token_count
    df = spark.createDataFrame(
        [("don't stop",), ("2024-01 x",), ("",), ("plain words here",)],
        "t string")
    got = [r[0] for r in
           df.select(bpe_token_count("t")).collect()]
    # don|'|t|stop ; 2024|-|01|x ; "" ; plain|words|here
    assert got == [4, 4, 0, 3]


def test_gopher_quality_flags(spark):
    from ecokg_spark.functions.text import gopher_quality_flags
    good = ("the quick brown fox jumps over the lazy dog and runs to " * 5
            ).strip()
    bullets = "- a\n- b\n- c"
    df = spark.createDataFrame([(good,), (bullets,), ("x y z",)], "t string")
    fl = gopher_quality_flags("t")
    rows = df.select(*[c.alias(k) for k, c in fl.items()]).collect()
    assert rows[0]["passes_gopher"] is True
    assert rows[0]["word_count"] == 60
    # bullet doc: every line starts with '-', fails bullet rule
    assert rows[1]["bullet_line_ratio"] == 1.0
    assert rows[1]["passes_gopher"] is False
    # tiny doc: fails word-count floor
    assert rows[2]["word_count"] == 3
    assert rows[2]["passes_gopher"] is False


def test_dup_ngram_ratio(spark):
    from pyspark.sql import functions as F
    from ecokg_spark.functions.text import dup_ngram_ratio, normalize_ws

    df = spark.createDataFrame(
        [("a b c a b c a b",), ("all tokens unique here now",), ("x y",)],
        "t string").withColumn(
        "_toks", F.split(F.lower(normalize_ws("t")), " "))
    got = [r[0] for r in df.select(dup_ngram_ratio(F.col("_toks"))).collect()]
    # 6 shingles, 3 distinct -> 0.5; 3 shingles all distinct -> 0; short -> 0
    assert got == [0.5, 0.0, 0.0]


def test_c4_flags_line_and_doc_rules(spark):
    from pyspark.sql import functions as F

    from ecokg_spark.functions.text import c4_quality_flags

    rows = [
        (1, "this line ends with a period here.\n"
            "another good long line goes here!\n"
            "and a third quality line appears?"),          # passes
        (2, "short line.\nno punct here at all\n"
            "this javascript line would be long enough."),  # all dropped
        (3, "lorem ipsum dolor sit amet something.\n"
            "another good long line goes here!\n"
            "and a third quality line appears?"),          # lorem gate
        (4, "a { brace } marks code in this line.\n"
            "another good long line goes here!\n"
            "and a third quality line appears?"),          # brace gate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fl = c4_quality_flags("text")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", fl["n_kept"].alias("k"), fl["passes_c4"].alias("p"),
        fl["kept_text"].alias("t")).collect()}
    assert got[1]["k"] == 3 and got[1]["p"] is True
    assert got[2]["k"] == 0 and got[2]["p"] is False and got[2]["t"] == ""
    assert got[3]["k"] == 3 and got[3]["p"] is False   # lorem ipsum
    assert got[4]["k"] == 3 and got[4]["p"] is False   # brace


def test_build_vocab_topk_rank(spark):
    from ecokg_spark.functions.text import build_vocab

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b a z")], "doc_id long, text string")
    got = [(r["token"], r["n"], r["rank"])
           for r in build_vocab(df, k=3).collect()]
    assert got == [("a", 4, 1), ("b", 3, 2), ("c", 1, 3)]  # c before z: tie->codepoint


def test_bpe_merge_candidates_counts_adjacent_pairs(spark):
    from ecokg_spark.functions.text import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "aab aab"), (2, "ab x")], "doc_id long, text string")
    got = [(r["pair"], r["n"], r["rank"])
           for r in bpe_merge_candidates(df, k=3).collect()]
    # pairs: "aab" x2 -> aa x2, ab x2; "ab" -> ab; "x" dropped (len 1)
    assert got == [("ab", 3, 1), ("aa", 2, 2)]


def test_flesch_reading_ease(spark):
    from ecokg_spark.functions.text import flesch_reading_ease

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran."),
            (2, "no terminal punctuation here"),
            (3, ""),
        ],
        "id long, text string")
    got = {r["id"]: r["f"] for r in df.select(
        "id", flesch_reading_ease("text").alias("f")).collect()}
    # doc 1: 6 words, 2 sentences, 6 vowel groups:
    # 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(got[1] - 119.19) < 1e-6
    # doc 2: 4 words, sentences clamped to 1, syllables = 9 vowel groups
    # ("o", "o", "e", "i", "a", "u", "ua", "io", "e"):
    # 206.835 - 1.015*4 - 84.6*(9/4)
    assert abs(got[2] - (206.835 - 1.015 * 4 - 84.6 * 2.25)) < 1e-6
    assert got[3] is None


def test_nfc_normalize_col(spark):
    from ecokg_spark.functions.text import nfc_normalize_col

    df = spark.createDataFrame(
        [(1, "Café"), (2, "Café"), (3, "plain"), (4, None)],
        "id long, text string")
    got = {r["id"]: r["text_nfc"] for r in
           nfc_normalize_col(df, "text").collect()}
    # decomposed and precomposed forms collapse to the same bytes
    assert got[1] == got[2] == "Café"
    assert got[3] == "plain" and got[4] is None
