"""EXTRACT_SPEC v1: vectorized UDF == single-value reference implementation;
byte-identity audit on the synthetic corpus (north_rule invariant)."""

from pyspark.sql import functions as F

from ecokg_spark.operators.extract import (
    audit_mismatches,
    extract_pages,
    extract_text_py,
    split_sentences_py,
    text_audit,
)
from ecokg_spark.sources.pages import expected_text, synth_pages

HTML_CASES = [
    b"<html><head><title>T</title><style>p{}</style><script>x</script></head>"
    b"<body><nav>N</nav><p>Hello  world.</p><footer>F</footer></body></html>",
    b"<p>Terms &amp; conditions &lt;apply&gt; &quot;now&quot;.</p>",
    b"<body></body>",
    b"",
    None,
    "caf\xe9 <b>bold</b> text".encode(),
]


def test_spec_reference_impl():
    assert extract_text_py(HTML_CASES[0]) == "Hello world."
    assert extract_text_py(HTML_CASES[1]) == 'Terms & conditions <apply> "now".'
    assert extract_text_py(HTML_CASES[2]) == ""
    assert extract_text_py(None) == ""
    assert extract_text_py(HTML_CASES[5]) == "café bold text"


def test_strip_pass_cross_engine_edge_cases():
    """The combined block+tag strip (spec step 2+3) must behave identically
    on RE2 (pyarrow) and Python `re` for nested/unclosed/adjacent blocks —
    leftmost-first alternation, non-greedy block spans."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ecokg_spark.operators.extract import _STRIP_PAT, _STRIP_RE

    cases = [
        "<script>a</script>KEEP<script>c</script>",
        "<header>x</header>y<p>z</p>",
        "<script>a</footer>b</script>",     # closes at first listed closer
        "<nav>1<script>2</script>3</nav>",  # nested: outer span wins
        "a<b>c",
        "<script>no close <p>para</p>",     # unclosed block -> tag strip
        "<style >attr</style>",
    ]
    re2 = pc.replace_substring_regex(pa.array(cases), _STRIP_PAT, " ").to_pylist()
    for c, got in zip(cases, re2):
        assert got == _STRIP_RE.sub(" ", c), c


def test_sentence_split():
    assert split_sentences_py("A b. C d! E f? G") == ["A b.", "C d!", "E f?", "G"]
    assert split_sentences_py("") == []


def test_udf_matches_reference_impl(spark):
    rows = [(i, h) for i, h in enumerate(HTML_CASES)]
    df = spark.createDataFrame(rows, "i long, html binary")
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i",
            F.coalesce(
                __import__("ecokg_spark.operators.extract", fromlist=["x"]).extract_text_udf("html"),
                F.lit(""),
            ).alias("t"),
        ).collect()
    }
    for i, h in rows:
        assert got[i] == extract_text_py(h), f"case {i}"


def test_corpus_audit_byte_identity(spark):
    n = 150
    pages = synth_pages(spark, n)
    ext = extract_pages(pages).localCheckpoint(eager=True)
    # 1) provided text (where present) agrees with extract(html)
    assert audit_mismatches(ext).count() == 0
    # 2) extracted text equals generator ground truth on EVERY url
    exp = expected_text(spark, n).withColumnRenamed("text", "want")
    bad = ext.join(exp, "url").where(F.col("extracted_text") != F.col("want"))
    assert bad.count() == 0
    # 3) audit table covers every page exactly once, sha256 well-formed
    audit = text_audit(ext)
    assert audit.count() == n
    assert audit.where(F.length("text_sha256") != 64).count() == 0
