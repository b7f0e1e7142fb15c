"""Text-analysis column expressions for the training-data pipeline.

All JVM-side (`pyspark.sql.functions` only — whole-stage codegen keeps these
inside one stage with the scan). Each has a DuckDB-SQL twin in
``__spark_entry__.oracle_sql`` so the driver cross-checks values.

These extend the reference's string-function surface (SURVEY.md §2.6 F1-F8)
with the ops a 100 TB web-text pipeline needs: token counting, quality
scoring, language ID, document fingerprinting, shingling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small multilingual stopword marker sets for the n-gram/language heuristic
_EN_MARKERS = ["the", "and", "of", "to", "is"]
_DE_MARKERS = ["der", "die", "und", "ist", "das"]
_FR_MARKERS = ["le", "la", "et", "les", "est"]

# punctuation class shared verbatim with the DuckDB oracle (dialect-safe:
# explicit characters, no POSIX classes)
PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_ws(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(_c(col), "[ \\t\\r\\n]+", " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    n = normalize_ws(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(
        F.size(F.split(n, " "))
    ).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    c = _c(col)
    return (
        (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, "")))
        / F.greatest(F.length(c), F.lit(1))
    ).cast("double")


def _marker_hits(col: Column | str, markers: list[str]) -> Column:
    """How many tokens of `col` (lowered) are in the marker set."""
    toks = F.split(F.lower(normalize_ws(col)), " ")
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords — a classic web-text
    quality signal (Gopher-style)."""
    sw = stopwords or _EN_MARKERS
    return (
        _marker_hits(col, sw) / F.greatest(token_count(col), F.lit(1))
    ).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length band + low punctuation +
    stopword presence. Deterministic, explainable, SQL-expressible."""
    c = _c(col)
    len_ok = F.when((F.length(c) >= 20) & (F.length(c) <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(c) > 0.02, F.lit(0.3)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + sw_ok).cast("double")


def lang_id(col: Column | str) -> Column:
    """Marker-token language heuristic: argmax of en/de/fr marker hits,
    'und' (undetermined) when all are zero. Ties break en > de > fr."""
    en, de, fr = (
        _marker_hits(col, _EN_MARKERS),
        _marker_hits(col, _DE_MARKERS),
        _marker_hits(col, _FR_MARKERS),
    )
    return (
        F.when((en == 0) & (de == 0) & (fr == 0), F.lit("und"))
        .when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def repetition_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are repeats of an earlier token
    (1 - distinct/total over lower-cased whitespace tokens) — the
    Gopher-style repetition quality signal; 0.0 for empty text."""
    n = normalize_ws(col)
    toks = F.split(F.lower(n), " ")
    total = F.size(toks)
    return (
        F.when(F.length(n) == 0, F.lit(0.0))
        .otherwise(1.0 - F.size(F.array_distinct(toks)) / total)
        .cast("double")
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs, over
# single-space-normalized text. The three classes are disjoint, so Java
# regex (Spark) and RE2 (DuckDB) produce identical matches — the pattern is
# shared verbatim with the SQL oracle.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def bpe_token_count(col: Column | str) -> Column:
    """Subword-ish token count: GPT-2-style pre-tokenization classes
    (letter runs / digit runs / symbol runs) counted with one JVM-side
    regex pass. A closer LLM-cost proxy than whitespace tokens ('don't'
    counts 3, '2024-01' counts 3); 0 for empty text."""
    n = normalize_ws(col)
    return F.size(
        F.regexp_extract_all(n, F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ).cast("long")


def gopher_quality_flags(col: Column | str) -> dict[str, Column]:
    """Gopher-style (Rae et al. 2021, public) document quality rules as a
    dict of named column expressions — pure Catalyst, no UDF, each with an
    exact DuckDB twin (contract row `gopher_rules`):

      word_count         whitespace tokens
      mean_word_len      avg token length; single-spaced text makes this
                         (length(norm) - (wc-1)) / wc — no per-token pass
      alpha_word_ratio   fraction of tokens containing a letter
      bullet_line_ratio  fraction of lines starting with -, * or •
      ellipsis_line_ratio fraction of lines ending with ... or …
      passes_gopher      conjunction of the published thresholds:
                         50 <= wc <= 100000, 3 <= mwl <= 10,
                         alpha > 0.8, bullets < 0.9, ellipsis < 0.3,
                         >= 2 stopword hits
    """
    c = _c(col)
    n = normalize_ws(c)
    wc = token_count(c)
    wc1 = F.greatest(wc, F.lit(1))
    mwl = ((F.length(n) - (wc - 1)) / wc1).cast("double")
    toks = F.split(F.lower(n), " ")
    alpha = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / wc1
    ).cast("double")
    lines = F.split(c, "\n")
    nlines = F.greatest(F.size(lines), F.lit(1))
    bullet = (
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]")))
        / nlines
    ).cast("double")
    ellipsis = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike("(\\.\\.\\.|…)$")))
        / nlines
    ).cast("double")
    sw_hits = _marker_hits(c, _EN_MARKERS)
    passes = (
        (wc >= 50) & (wc <= 100000)
        & (mwl >= 3.0) & (mwl <= 10.0)
        & (alpha > 0.8) & (bullet < 0.9) & (ellipsis < 0.3)
        & (sw_hits >= 2)
    )
    return {
        "word_count": wc,
        "mean_word_len": mwl,
        "alpha_word_ratio": alpha,
        "bullet_line_ratio": bullet,
        "ellipsis_line_ratio": ellipsis,
        "passes_gopher": passes,
    }


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the lower-cased,
    whitespace-collapsed text. Exact-dedup key for web text."""
    return F.md5(F.lower(normalize_ws(col)))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingle array over an ALREADY-MATERIALIZED token-array column.

    The token array must be a plain column reference, not an inline
    expression: higher-order lambdas are interpreted without common-
    subexpression elimination, so an inline `split(lower(...))` closed over
    by the lambda re-tokenizes the whole text once per shingle — measured
    6x slower (O(tokens^2)). Use `with_word_shingles` below."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n <= k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles of the normalized, lower-cased text
    (basis for MinHash / n-gram Jaccard dedup). Documents shorter than k
    tokens yield a single shingle = the whole normalized text.

    NOTE: expression-only form — fine for small/blocked inputs and SQL
    parity, but hot paths should stage the token array first
    (`with_word_shingles`) to avoid per-shingle re-tokenization."""
    return shingles_from_tokens(F.split(F.lower(normalize_ws(col)), " "), k)


def dup_ngram_ratio(toks: Column, k: int = 3) -> Column:
    """Gopher's duplicate n-gram fraction at token granularity: the share
    of k-gram shingles that repeat an earlier shingle (1 - distinct/total)
    — catches paragraph-level copy loops that single-token
    repetition_ratio misses. Takes a MATERIALIZED token-array column
    (shingles_from_tokens' CSE warning applies); < = k tokens scores 0."""
    sh = shingles_from_tokens(toks, k)
    return (
        F.when(F.size(toks) <= k, F.lit(0.0))
        .otherwise(1.0 - F.size(F.array_distinct(sh)) / F.size(sh))
        .cast("double")
    )


def with_word_shingles(df, text_col: str, out_col: str = "_sh", k: int = 3,
                       distinct: bool = False):
    """df -> df with one EXPLODED shingle row per k-gram; the token array
    is staged as a materialized projection so tokenization runs once per
    document (see shingles_from_tokens). ``distinct`` dedups shingles
    per document map-side (array_distinct — no shuffle)."""
    staged = df.withColumn("_toks", F.split(F.lower(normalize_ws(text_col)), " "))
    sh = shingles_from_tokens(F.col("_toks"), k)
    if distinct:
        sh = F.array_distinct(sh)
    return staged.withColumn(out_col, F.explode(sh)).drop("_toks")


# Fixed, interpretable weights for classifier_score — a deterministic
# stand-in for a learned linear/fastText quality model (no model artifact
# ships in this environment; the plumbing — featurize -> dot -> sigmoid ->
# threshold gate — is the production shape and the weights are swappable).
# Signs follow the published signals: stopword presence is positive
# evidence of running prose (Gopher rule), punctuation soup and token
# repetition are negative, and longer documents get a mild log-scale boost.
CLASSIFIER_WEIGHTS: dict[str, float] = {
    "bias": -1.0,
    "stopword_ratio": 6.0,
    "punct_ratio": -4.0,
    "repetition_ratio": -3.0,
    "log1p_tokens": 0.35,
}


def classifier_score(col: Column | str,
                     weights: dict[str, float] | None = None) -> Column:
    """Logistic quality-classifier score in (0, 1): sigmoid of a fixed
    linear model over four pure-Catalyst text features (stopword ratio,
    punctuation ratio, repetition ratio, log1p token count). One JVM-side
    expression — no UDF, no shuffle; exactly recomputable in SQL (exp/ln
    differ across engines only in the last ulp — round to 6 dp before
    cross-engine hashing, contract row `quality_logit`)."""
    w = dict(CLASSIFIER_WEIGHTS)
    if weights:
        unknown = sorted(set(weights) - set(w))
        if unknown:
            raise ValueError(f"unknown classifier feature weights: {unknown}")
        w.update(weights)
    c = _c(col)
    z = (
        F.lit(w["bias"])
        + F.lit(w["stopword_ratio"]) * stopword_ratio(c)
        + F.lit(w["punct_ratio"]) * punct_ratio(c)
        + F.lit(w["repetition_ratio"]) * repetition_ratio(c)
        + F.lit(w["log1p_tokens"])
        * F.log1p(token_count(c).cast("double"))
    )
    return (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).cast("double")


def c4_quality_flags(col: Column | str) -> dict[str, Column]:
    """C4-style (Raffel et al. 2020 §2.2, public) line + document
    cleaning rules as named column expressions — the other canonical
    published web-text filter set next to gopher_quality_flags. Pure
    Catalyst; exact DuckDB twin (contract row `c4_rules`).

    Line rule (applied to each single-space-normalized, trimmed line):
    keep iff it ends in terminal punctuation ([.!?] — the paper also
    accepts a closing quote; simplified here), has >= 5 words, and does
    not mention javascript (case-insensitive). Document rules: >= 3
    retained lines, no "lorem ipsum", no '{' (code marker).

      n_lines     lines in the raw document
      n_kept      lines surviving the line rule
      kept_text   the rebuilt document (kept lines joined with \\n)
      passes_c4   n_kept >= 3 AND no lorem-ipsum AND no brace
    """
    c = _c(col)
    lines = F.split(c, "\n")
    # stage the normalization once per line — a filter lambda re-evaluates
    # its whole body per reference (no CSE in interpreted HOFs)
    norm_lines = F.transform(
        lines, lambda l: F.trim(F.regexp_replace(l, " +", " ")))
    kept = F.filter(
        norm_lines,
        lambda t: t.rlike("[.!?]$")
        & (F.size(F.split(t, " ")) >= 5)
        & ~t.rlike("(?i)javascript"),
    )
    n_kept = F.size(kept).cast("long")
    passes = (
        (n_kept >= 3)
        & ~F.lower(c).contains("lorem ipsum")
        & ~c.contains("{")
    )
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": n_kept,
        "kept_text": F.array_join(kept, "\n"),
        "passes_c4": passes,
    }


def build_vocab(df, text_col: str = "text", k: int = 1000):
    """Vocabulary induction: the k most frequent whitespace tokens with
    counts and 1-based rank (ties broken by token codepoint order — fully
    deterministic, cross-engine recomputable).

    100-TB shape: token counts are ONE map-side-combinable shuffle; the
    global top-k executes as TakeOrderedAndProject (per-partition top-k,
    driver merges k rows — never a full sort) and the rank window runs
    over the k surviving rows only. The Zipf head ('the') is absorbed by
    partial_count before the exchange."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(
            F.split(F.lower(normalize_ws(text_col)), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bpe_merge_candidates(df, text_col: str = "text", k: int = 50):
    """The counting step of one BPE training iteration (Sennrich et al.
    2016): frequency of every ADJACENT CHARACTER PAIR within words, top-k
    with deterministic rank (count DESC, pair ASC). Iterating
    count->merge->recount trains the full tokenizer; the count step is
    the distributed-scale part (the merge table is vocabulary-sized).

    Plan: words explode once, pairs derive via transform over the
    materialized char array (no per-pair re-tokenization), then ONE
    map-side-combinable count shuffle + TakeOrderedAndProject top-k —
    same shape as build_vocab."""
    from pyspark.sql import Window

    words = df.select(F.explode(
        F.split(F.lower(normalize_ws(text_col)), " ")).alias("w"))
    words = words.where(F.length("w") >= 2)
    chars = words.select(F.split("w", "").alias("_cs"))
    pairs = chars.select(F.explode(F.transform(
        F.slice("_cs", 1, F.size("_cs") - 1),
        lambda c, i: F.concat(c, F.element_at(F.col("_cs"), i + 2)),
    )).alias("pair"))
    counts = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def flesch_reading_ease(col: Column | str) -> Column:
    """Flesch reading ease (Flesch 1948): 206.835 - 1.015*(words/sentences)
    - 84.6*(syllables/words) — the classic document-difficulty prior used
    as a curation feature next to the Gopher/C4 gates. Syllables are
    approximated as VOWEL GROUPS ([aeiouy]+ runs, lowercased), the
    standard dictionary-free proxy; sentences as [.!?]+ runs, clamped to
    >= 1 so headline-only docs don't divide by zero. NULL for empty/blank
    text. Pure Catalyst; both divisions are long/long -> double, which is
    IEEE-identical cross-engine, and the result is rounded to 4 dp before
    any comparison."""
    c = _c(col)
    words = token_count(c)
    sents = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit("[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    syll = F.size(
        F.regexp_extract_all(F.lower(c), F.lit("[aeiouy]+"), 0)
    ).cast("long")
    score = (F.lit(206.835) - F.lit(1.015) * (words / sents)
             - F.lit(84.6) * (syll / words))
    return F.when(words > 0, F.round(score, 4))



def nfc_normalize_col(df, col: str, out_col: str = "text_nfc"):
    """Unicode NFC normalization of a text column — the first transform
    of any multilingual pipeline (decomposed accents, compatibility
    variants, and platform-specific encodings must collapse BEFORE any
    hashing/dedup/shingling, or the same sentence fingerprints two
    ways). Spark has no built-in normalizer, so this is one of the
    engine's few Python stages — an Arrow-batched pandas UDF over
    `unicodedata.normalize` (C-implemented per string; the batch
    transfer dominates, ~the cost class of the fused extractor), never
    a row-at-a-time UDF. DuckDB's native nfc_normalize implements the
    same Unicode algorithm, which the contract row exploits.

    Takes/returns a DataFrame (pandas UDFs need the session context).
    """
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pandas_udf's hint resolver rejects that in a
    # nested scope; the explicit return type string is authoritative
    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x)
                     if x is not None else None)

    return df.withColumn(out_col, _nfc(F.col(col)))
