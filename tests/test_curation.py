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


def test_curate_corpus_v2_stage_interactions(spark):
    from ecokg_spark.operators.curation import curate_corpus_v2

    body = " ".join(f"w{i}" for i in range(30))
    rows = [
        # 1: clean doc with a boilerplate paragraph shared with 2
        (1, f"{body}\n\nCOOKIE BANNER NOTICE HERE", "https://ok.example.org/a"),
        (2, f"COOKIE BANNER NOTICE HERE\n\n{body} tail", "https://ok.example.org/b"),
        # 3: blocked domain
        (3, body, "https://bad.example.net/x"),
        # 4: too short for the token gate
        (4, "tiny doc here", "https://ok.example.org/c"),
        # 5: shares BOTH paragraphs with doc 1 -> both docs reduce to ""
        # and exact dedup collapses the empties to the min id
        (5, f"COOKIE BANNER NOTICE HERE\n\n{body}", "https://ok.example.org/d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, url string")
    bl = spark.createDataFrame([("example.net", "malware")],
                               "domain string, category string")
    out = {r["doc_id"]: r for r in
           curate_corpus_v2(docs, bl, min_tokens=10, lm_floor_frac=0.0,
                            sample_rate=1.0).collect()}
    assert 3 not in out          # domain-blocked
    assert 4 not in out          # token gate
    assert 5 not in out          # emptied like doc 1, min id wins the dedup
    assert set(out) == {1, 2}
    # every paragraph of doc 1 (banner AND body) repeats cross-doc, so its
    # rebuilt text is empty — paragraph dedup at min_docs=2 subsumes the
    # exact-dup pair by emptying both before the fingerprint dedup
    assert out[1]["text"] == "" and out[1]["n_kept"] == 0
    assert out[1]["n_paras"] == 2
    # doc 2's banner is boilerplate but its body+tail paragraph is unique
    assert out[2]["text"] == f"{body} tail"


def test_curate_corpus_v2_lm_floor_drops_gibberish(spark):
    from ecokg_spark.operators.curation import curate_corpus_v2

    base = "the cat sat on the mat and the dog sat on the rug again today"
    rows = [(i, base, f"https://ok.example.org/{i}") for i in range(10)]
    rows.append((99, "qq zz xx vv qq pp ww mm nn kk jj hh gg ff",
                 "https://ok.example.org/odd"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, url string")
    bl = spark.createDataFrame([("none.example", "x")],
                               "domain string, category string")
    # exact dedup collapses the 10 copies to doc 0; gibberish doc 99 falls
    # below half the corpus-mean LM score
    out = {r["doc_id"] for r in
           curate_corpus_v2(docs, bl, min_tokens=5, lm_floor_frac=0.5,
                            sample_rate=1.0).collect()}
    assert out == {0}


def test_curate_v3_stage_order_and_survivors(spark):
    """Floor -> fuzzy dedup -> mixture: a below-mean doc is cut by the
    floor, a near-dup pair collapses to the min id, and the unknown
    stratum is dropped by the mixture spec."""
    from pyspark.sql import functions as F

    from ecokg_spark.operators.curation import curate_corpus_v3

    prose = ("the quick brown fox jumps over the lazy dog and the birds "
             "sing while the sun is warm and the river is slow today")
    soup = "@@@ ??? !!! ,,, ;;; ::: ((( ))) [[[ ]]]"
    docs = spark.createDataFrame(
        [(1, "en", "s1", prose),
         (2, "en", "s1", prose + " extra"),   # near-dup of 1
         (3, "en", "s1", soup),               # below the score floor
         (4, "xx", "s1", prose + " entirely different tail with new words "
                         "about engines and partitions and shuffles")],
        "doc_id long, lang string, source string, text string")
    out = curate_corpus_v3(docs, rates={"en": 1.0})
    kept = sorted(r["doc_id"] for r in out.collect())
    assert 1 in kept          # cluster survivor (min id)
    assert 2 not in kept      # fuzzy-dedup drop
    assert 3 not in kept      # score floor drop
    assert 4 not in kept      # stratum absent from the mixture spec
    assert all(0.0 < r["q_score"] < 1.0 for r in out.collect())


def test_mad_outliers(spark):
    from ecokg_spark.operators.curation import mad_outliers

    rows = ([("a", float(v)) for v in [10, 11, 12, 13, 14, 100]]
            + [("b", 5.0), ("b", 5.0), ("b", 5.0)])
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, "grp", "v")
    flagged = {(r["grp"], r["v"]) for r in out.collect() if r["is_outlier"]}
    # only the planted spike is flagged
    assert flagged == {("a", 100.0)}
    # constant group: mad=0 -> no z, no flags
    b = [r for r in out.collect() if r["grp"] == "b"]
    assert all(r["z"] is None and not r["is_outlier"] for r in b)
