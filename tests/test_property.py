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
