"""Property-based tests (hypothesis): the vectorized paths must agree with
the frozen reference implementations on ADVERSARIAL inputs, not just the
synthetic corpus. Batched: each example set becomes ONE DataFrame so Spark
round-trips stay bounded."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ecokg_spark.operators.extract import (
    extract_text_py,
    split_sentences_py,
)

# html-ish fragments: tags, entities, boilerplate blocks, junk bytes
_tagish = st.sampled_from([
    "<p>", "</p>", "<script>var x=1;</script>", "<style>p{}</style>",
    "<nav>menu</nav>", "<SCRIPT a=b>X</SCRIPT >", "<head><title>t</title></head>",
    "&amp;", "&lt;", "&nbsp;", "&amp;lt;", "<footer>f</footer>", "<br/>",
    "<a href='x'>", "</a>", "<header>h</header>", "< notatag",
])
_textish = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF,
                           exclude_characters="<>"),
    max_size=30,
)
_fragment = st.one_of(_tagish, _textish, st.sampled_from([" ", "\t", "\n", ". ", "! ", "? "]))
_html = st.lists(_fragment, max_size=25).map(lambda xs: "".join(xs).encode())


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_html, min_size=1, max_size=40))
def test_extract_udf_matches_reference(spark, htmls):
    from ecokg_spark.operators.extract import extract_text_udf

    df = spark.createDataFrame([(i, h) for i, h in enumerate(htmls)],
                               "i long, html binary")
    got = {r["i"]: r["t"] for r in
           df.select("i", extract_text_udf("html").alias("t")).collect()}
    for i, h in enumerate(htmls):
        assert got[i] == extract_text_py(h), (i, h)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
                        max_size=60).map(lambda s: re.sub(r"[\x00]", "", s)),
                min_size=1, max_size=40))
def test_sentence_split_udf_matches_reference(spark, texts):
    from ecokg_spark.operators.extract import split_sentences_udf

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: r["s"] for r in
           df.select("i", split_sentences_udf("text").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == split_sentences_py(t), (i, t)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_html, min_size=1, max_size=15))
def test_fused_matches_staged_operators(spark, htmls):
    """The fused single-pass operator must equal the staged
    extract_pages/text_audit/extract_triples composition on adversarial
    html — the guarantee that fusing changed the physical plan only."""
    from pyspark.sql import functions as F

    from ecokg_spark.operators.extract import extract_pages, text_audit
    from ecokg_spark.operators.fused import fused_extract_triples
    from ecokg_spark.operators.triples import extract_triples

    rows = [(f"u{i}", h, "en") for i, h in enumerate(htmls)]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string")
    fused = fused_extract_triples(pages).localCheckpoint(eager=True)

    staged = extract_pages(pages).localCheckpoint(eager=True)
    audit_want = {(r["url"], r["text_sha256"], r["n_sentences"])
                  for r in text_audit(staged).collect()}
    audit_got = {
        (r["url"],
         __import__("hashlib").sha256(r["extracted_text"].encode()).hexdigest(),
         r["n_sentences"])
        for r in fused.where(F.col("sent_id") == -1).collect()}
    assert audit_got == audit_want

    trip_want = {tuple(r) for r in extract_triples(staged).select(
        "url", "sent_id", "subj_mention", "verb", "obj_mention").collect()}
    trip_got = {tuple(r) for r in fused.where(F.col("sent_id") >= 0).select(
        "url", "sent_id", "subj_mention", "verb", "obj_mention").collect()}
    assert trip_got == trip_want


_PHRASES = [
    "Very_weak_all_plants_flat_", "Strong_no_lodging_", "Short__<30cm_",
]
_ae_frag = st.one_of(
    st.sampled_from(["(", ")", "=", "_", "TRAIT", "purple", "12.5", "999",
                     "EAR_DIAMETER", *_PHRASES]),
    st.text(alphabet="abcXY_()=0123456789", max_size=6),
)
_ae = st.lists(_ae_frag, max_size=6).map("".join)


def _pheno_py(ae: str | None) -> str | None:
    """Python reference of the germplasm pheno parse
    (planteome.py:317-332 semantics as implemented in gaf_kgx._parse_pheno)."""
    from ecokg_spark.transforms.gaf_kgx import PHRASE_PHENOS

    if not ae:
        return None
    if "=" in ae:
        p = ae.split("=")[1].strip(")")
        if "_" in p:
            p = p.split("_")[0]
    elif "(" in ae:
        p = ae.split("(")[1].strip(")")
        if p not in PHRASE_PHENOS and "_" in p:
            p = p.split("_")[0]
    else:
        return None
    return p


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_ae, min_size=1, max_size=50))
def test_pheno_parse_matches_python_reference(spark, aes):
    from pyspark.sql import functions as F

    from ecokg_spark.transforms.gaf_kgx import _parse_pheno

    df = spark.createDataFrame([(i, a) for i, a in enumerate(aes)],
                               "i long, ae string")
    got = {r["i"]: r["p"] for r in
           df.select("i", _parse_pheno(F.col("ae")).alias("p")).collect()}
    for i, a in enumerate(aes):
        assert got[i] == _pheno_py(a), (i, a)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=60))
def test_unionfind_gate_matches_distributed(spark, pairs):
    """Both CC physical paths must agree on arbitrary graphs."""
    from ecokg_spark.operators.components import connected_components

    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "u string, v string")
    small = {(r["node"], r["component"])
             for r in connected_components(df, small_graph_edges=10**6).collect()}
    big = {(r["node"], r["component"])
           for r in connected_components(df, small_graph_edges=0).collect()}
    assert small == big
