"""HTML boilerplate-strip + sentence split (EXTRACT_SPEC v5) + sha256 audit.

North-star stage 1: a vectorized Arrow UDF turns (url, html binary) into
byte-identical extracted text per url. The spec is frozen and self-contained
(regex/stdlib only — no external HTML lib, so no library-version drift can
break the audit; SURVEY.md §7 risk 2):

  EXTRACT_SPEC v5
    1. decode UTF-8 (errors=replace)
    1.5 drop NUL bytes (\\x00): valid UTF-8 but never meaningful text; this
       also guarantees the vectorized sentence split's \\x00 boundary
       sentinel can never collide with data (the v2 divergence between the
       Arrow and pandas split paths on NUL-bearing input)
    2+3. ONE combined pass replaces boilerplate blocks and stray tags with
       a single space: alternation `BLOCK|<[^>]*>` where BLOCK is the
       non-greedy <script|style|head|nav|footer|header>...</any-of-those>
       span (case-insensitive, dot-matches-newline). Leftmost-first
       matching means a position opening a block takes the BLOCK branch
       (so an unclosed block tag degrades to a plain tag strip). No
       backreference, so the identical regex runs on RE2 and Python `re`;
       cross-engine equality is tested on nested/unclosed edge cases.
       v4->v5 note: merging v4's two passes (and v2/v3's seven) into one
       cuts regex scanning ~40% total — extraction is memory-bandwidth-
       bound at high core counts, so passes are the scaling currency.
    4. decode the fixed entity set: &lt; &gt; &quot; &#39; &apos;
       &nbsp;(-> space) &amp;   [&amp; last, per HTML double-escape order]
    5. collapse [ \\t\\r\\n]+ runs to one space; strip ' ' from both ends
       (other Unicode whitespace is data, not formatting)
    6. sentences = split on ASCII whitespace following '.', '!' or '?'

Physical execution: the UDF body runs pyarrow.compute kernels (RE2,
vectorized C++) directly on the Arrow batch — ~5-10x faster than pandas
``.str`` ops, which loop Python ``re`` per element. A pandas fallback
implements the identical spec for batches whose bytes are not valid UTF-8
(Arrow's cast cannot do errors=replace). ``extract_text_py`` is the
single-value reference implementation tests compare both paths against.

Audit table: per-url sha256 of the UTF-8 bytes of extracted text
(north_rule byte-identity invariant).

Reference parity: this generalizes the reference's strip/replace/split
string family (utils/transform_utils.py:148,161; F1-F4 in SURVEY.md §2.6)
to the web-page corpus the north rule mandates.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

BLOCK_TAGS = ["script", "style", "head", "nav", "footer", "header"]

_TAG_ALT = "|".join(BLOCK_TAGS)
# combined block-span + stray-tag pass (spec step 2+3)
_STRIP_PAT = (
    rf"(?is)<(?:{_TAG_ALT})\b[^>]*>.*?</(?:{_TAG_ALT})\s*>|<[^>]*>"
)
_STRIP_RE = re.compile(_STRIP_PAT)
_WS_RE = re.compile(r"[ \t\r\n]+")
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])[ \t\r\n]+")

# fixed entity set; &amp; decoded last so "&amp;lt;" -> "&lt;" (literal)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def extract_text_py(html: bytes | None) -> str:
    """Single-value reference implementation of EXTRACT_SPEC v5 (used by
    tests as the independent oracle for both vectorized paths)."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace").replace("\x00", "")
    s = _STRIP_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip(" ")


def split_sentences_py(text: str) -> list[str]:
    if not text:
        return []
    # NUL-strip first: EXTRACT_SPEC v5 output is NUL-free already, but this
    # keeps all three split paths identical on arbitrary (non-spec) input
    return [p for p in _SENT_SPLIT_RE.split(text.replace("\x00", "")) if p]


# --------------------------------------------------------------------------
# vectorized paths
# --------------------------------------------------------------------------

def _extract_arrow(arr: pa.Array) -> pa.Array:
    """EXTRACT_SPEC v5 steps 2-5 as pyarrow.compute kernels over a string
    array (step 1, decode, is the caller's cast)."""
    s = pc.replace_substring(pc.fill_null(arr, ""), "\x00", "")
    s = pc.replace_substring_regex(s, _STRIP_PAT, " ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, ent, ch)
    s = pc.replace_substring_regex(s, "[ \\t\\r\\n]+", " ")
    return pc.utf8_trim(s, " ")


def _extract_pandas(html: pd.Series) -> pd.Series:
    """Pandas fallback (identical spec; handles invalid UTF-8 bytes)."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace("\x00", "", regex=False)
    s = s.str.replace(_STRIP_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip(" ")


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized EXTRACT_SPEC v5 over an Arrow batch of html bytes.
    Arrow/RE2 fast path; pandas path when the batch is not valid UTF-8."""
    try:
        arr = pa.Array.from_pandas(html)
        s = pc.cast(arr, pa.string())  # raises on invalid UTF-8
    except pa.ArrowInvalid:
        return _extract_pandas(html)
    return _extract_arrow(s).to_pandas()


@pandas_udf(T.ArrayType(T.StringType()))
def split_sentences_udf(text: pd.Series) -> pd.Series:
    """Vectorized sentence split (step 6): mark boundaries with a \\x00
    sentinel (RE2, group backref in the replacement), split on it, drop
    empties. Pre-existing NULs are stripped first (spec v3 step 1.5), so the
    sentinel can never collide with data and all split paths agree."""
    try:
        arr = pc.cast(pa.Array.from_pandas(text), pa.string())
        arr = pc.replace_substring(arr, "\x00", "")
        marked = pc.replace_substring_regex(arr, "([.!?])[ \\t\\r\\n]+", "\\1\x00")
        parts = pc.split_pattern(pc.fill_null(marked, ""), "\x00").to_pandas()
        return parts.map(lambda xs: [p for p in xs if p])
    except pa.ArrowInvalid:
        empty: list[str] = []
        return text.str.replace("\x00", "", regex=False).str.split(_SENT_SPLIT_RE).map(
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
