"""HTML boilerplate-strip + sentence split (EXTRACT_SPEC v1) + sha256 audit.

North-star stage 1: a vectorized Arrow UDF turns (url, html binary) into
byte-identical extracted text per url. The spec is frozen and self-contained
(regex/stdlib only — no external HTML lib, so no library-version drift can
break the audit; SURVEY.md §7 risk 2):

  EXTRACT_SPEC v1
    1. decode UTF-8 (errors=replace)
    2. drop <script>/<style>/<head>/<nav>/<footer>/<header> blocks
       (case-insensitive, dot-matches-newline)
    3. replace every remaining tag <...> with a single space
    4. decode the fixed entity set: &amp; &lt; &gt; &quot; &#39; &apos;
       &nbsp;(-> space)   [&amp; last, per HTML spec double-escape order]
    5. collapse [ \\t\\r\\n]+ runs to one space; strip ends
    6. sentences = split on whitespace following '.', '!' or '?'

The whole batch runs as vectorized pandas ``.str`` ops over Arrow batches —
no per-row Python (BASELINE.json input_hint). Audit table: per-url sha256 of
the UTF-8 bytes of extracted text (north_rule byte-identity invariant).

Reference parity: this generalizes the reference's strip/replace/split string
family (utils/transform_utils.py:148,161; F1-F4 in SURVEY.md §2.6) to the
web-page corpus the north rule mandates.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_BLOCK_RE = re.compile(
    r"<(script|style|head|nav|footer|header)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n]+")
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

# fixed entity set; &amp; decoded last so "&amp;lt;" -> "&lt;" (literal)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def extract_text_py(html: bytes | None) -> str:
    """Single-value reference implementation of EXTRACT_SPEC v1 (used by
    tests as the independent oracle for the vectorized path)."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace")
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def split_sentences_py(text: str) -> list[str]:
    if not text:
        return []
    return [p for p in _SENT_SPLIT_RE.split(text) if p]


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized EXTRACT_SPEC v1 over an Arrow batch of html bytes."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace(_BLOCK_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


@pandas_udf(T.ArrayType(T.StringType()))
def split_sentences_udf(text: pd.Series) -> pd.Series:
    """Vectorized sentence split (step 6)."""
    empty: list[str] = []
    return text.str.split(_SENT_SPLIT_RE).map(
        lambda xs: [p for p in xs if p] if isinstance(xs, list) else empty
    )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> + extracted_text, sentences.

    ``extracted_text`` is always recomputed from html; where the input
    carried a pre-extracted ``text`` the audit (below) proves equality.
    """
    return pages.withColumn("extracted_text", extract_text_udf("html")).withColumn(
        "sentences", split_sentences_udf("extracted_text")
    )


def text_audit(extracted: DataFrame) -> DataFrame:
    """Per-url sha256-of-text audit table (url, text_sha256, n_sentences).

    sha2 runs JVM-side over the UTF-8 bytes — the byte-identity invariant
    the north rule requires, checkable against any other extractor run.
    """
    return extracted.select(
        "url",
        F.sha2(F.encode(F.col("extracted_text"), "UTF-8"), 256).alias("text_sha256"),
        F.size("sentences").cast("long").alias("n_sentences"),
    )


def audit_mismatches(extracted: DataFrame) -> DataFrame:
    """Rows whose provided ``text`` disagrees with extract(html) — must be
    empty for a healthy corpus; kept as a quarantine-style audit query."""
    return extracted.where(
        F.col("text").isNotNull() & (F.col("text") != F.col("extracted_text"))
    ).select("url", "text", "extracted_text")
