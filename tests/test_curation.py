"""Composed curation chain (operators/curation.py)."""

from ecokg_spark.operators.curation import curate_corpus


def test_chain_filters_dedups_and_keeps_signals(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today", "en"),
        (2, "the quick brown fox jumps over the lazy dog today", "en"),  # dup
        (3, "la plume de ma tante est sur la table toujours", "fr"),     # lang
        (4, "short text", "en"),                                         # len
        (5, "spam spam spam spam spam spam spam spam spam spam", "en"),  # rep
        (6, "every word here is distinct so quality gates pass fine", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = curate_corpus(docs, min_tokens=5, max_repetition=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 6}  # dup 2 loses to min-id 1; 3/4/5 gated
    assert got[1]["n_tokens"] == 10
    assert got[6]["rep_ratio"] == 0.0


def test_sample_is_nested_subset(spark):
    docs = spark.createDataFrame(
        [(i, "all these words are unique alpha beta gamma delta epsilon "
             f"zeta{i}", "en") for i in range(200)],
        "doc_id long, text string, lang string")
    full = {r["doc_id"] for r in
            curate_corpus(docs, min_tokens=2).collect()}
    half = {r["doc_id"] for r in
            curate_corpus(docs, min_tokens=2, sample_rate=0.5).collect()}
    tenth = {r["doc_id"] for r in
             curate_corpus(docs, min_tokens=2, sample_rate=0.1).collect()}
    assert tenth <= half <= full
    assert len(full) == 200
    assert 0 < len(half) < 200


def test_missing_lang_col_skips_gate(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    assert curate_corpus(docs, min_tokens=5).count() == 1


def test_length_quartiles_hand_computed(spark):
    from ecokg_spark.operators.curation import length_quartiles

    # group a: token counts 1,2,3,4 -> p25=1.75, p50=2.5, p75=3.25
    df = spark.createDataFrame(
        [("a", "w"), ("a", "w w"), ("a", "w w w"), ("a", "w w w w"),
         ("b", "")],
        "source string, text string")
    got = {r["grp"]: r for r in length_quartiles(df).collect()}
    assert got["a"]["n_docs"] == 4
    assert (got["a"]["p25"], got["a"]["p50"], got["a"]["p75"]) == (
        1.75, 2.5, 3.25)
    # empty text counts 0 tokens
    assert (got["b"]["p25"], got["b"]["p50"], got["b"]["p75"]) == (
        0.0, 0.0, 0.0)
