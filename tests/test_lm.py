"""Bigram LM quality scoring (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from ecokg_spark.operators.lm import bigram_lm_score, train_bigram_counts


def test_train_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id int, text string")
    counts, vstats = train_bigram_counts(docs)
    got = {(r["w1"], r["w2"]): (r["c2"], r["c1"]) for r in counts.collect()}
    # bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (a,b) (b,c)
    assert got == {("a", "b"): (3, 3), ("b", "a"): (1, 2), ("b", "c"): (1, 2)}
    assert vstats.first()["v"] == 3  # continuations {a, b, c}


def test_scores_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id int, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    k, v = 0.5, 3.0
    p_ab = (3 + k) / (3 + k * v)   # 3.5/4.5
    p_ba = (1 + k) / (2 + k * v)   # 1.5/3.5
    p_bc = (1 + k) / (2 + k * v)
    assert out[1]["n_bigrams"] == 3
    assert math.isclose(out[1]["avg_p"], (2 * p_ab + p_ba) / 3, rel_tol=1e-9)
    assert out[2]["n_bigrams"] == 2
    assert math.isclose(out[2]["avg_p"], (p_ab + p_bc) / 2, rel_tol=1e-9)


def test_short_and_empty_docs_score_null(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "single"), (3, ""), (4, "   ")],
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert out[1]["n_bigrams"] == 1
    for d in (2, 3, 4):
        assert out[d]["n_bigrams"] == 0 and out[d]["avg_p"] is None


def test_separate_train_corpus_unseen_floor(spark):
    train = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    score = spark.createDataFrame([(9, "x y")], "doc_id int, text string")
    out = bigram_lm_score(score, train=train).first()
    # unseen bigram AND unseen context -> k/(0 + k*V) = 1/V, V = {b, c}
    assert out["n_bigrams"] == 1
    assert math.isclose(out["avg_p"], 1 / 2, rel_tol=1e-9)


def test_gibberish_scores_below_natural(spark):
    base = "the cat sat on the mat and the dog sat on the rug "
    rows = [(i, base) for i in range(10)]
    rows.append((99, "mat the rug cat on dog and sat zz qq"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["avg_p"] for r in bigram_lm_score(docs).collect()}
    natural = out[0]
    assert out[99] < natural


def test_train_counts_persisted_against_replay(spark):
    """c2 feeds three consumers (counts, c1, vstats); without the persist
    each would replay the corpus-sized bigram explode."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    counts, _v = train_bigram_counts(docs)
    # the persisted aggregate appears as an InMemoryRelation leaf
    plan = counts._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan


def test_unseen_bigram_seen_context_gets_addk_floor(spark):
    """An unseen continuation of a seen left word must score the add-k
    floor k/(c1 + k*V), NOT 1/V — otherwise gibberish continuations of
    frequent words outscore fluent text."""
    train = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id int, text string")
    # bigrams: (a,b)x2 (b,a)x2 (a,c) -> c1(a)=3, V={a,b,c}=3
    score = spark.createDataFrame([(9, "a zz")], "doc_id int, text string")
    out = bigram_lm_score(score, train=train).first()
    k, c1, v = 0.5, 3.0, 3.0
    assert math.isclose(out["avg_p"], k / (c1 + k * v), rel_tol=1e-9)
    # and it must be BELOW a seen bigram's score
    seen = bigram_lm_score(
        spark.createDataFrame([(9, "a b")], "doc_id int, text string"),
        train=train).first()
    assert out["avg_p"] < seen["avg_p"]


def test_stupid_backoff_three_tiers(spark):
    """Seen trigram scores c3/c2ctx; unseen trigram with seen bigram
    backs off to 0.4*c2/c1; unseen bigram backs off to 0.16*c1(w3)/N;
    OOV final word scores 0."""
    from ecokg_spark.operators.lm import stupid_backoff_score

    train = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d"), (4, "x b c")],
        "doc_id long, text string")
    probes = spark.createDataFrame(
        [(10, "a b c"),    # seen trigram: c3=2, ctx(a b)=3 -> 2/3
         (11, "x b d"),    # unseen tri, seen bigram (b d): 0.4 * 1/4
         (12, "c a b"),    # unseen (c a); bigram (a b) c2=3, c1(a)=3 -> 0.4
         (13, "d c x"),    # unseen tri+bigram(c x): 0.16 * cu(x)/12
         (14, "a b zz")],  # OOV final word -> 0
        "doc_id long, text string")
    got = {r["doc_id"]: r["avg_s"] for r in stupid_backoff_score(
        probes, train=train).collect()}
    assert abs(got[10] - 2 / 3) < 1e-12
    assert abs(got[11] - 0.4 * (1 / 4)) < 1e-12
    assert abs(got[12] - 0.4 * (3 / 3)) < 1e-12
    assert abs(got[13] - 0.16 * (1 / 12)) < 1e-12
    assert got[14] == 0.0


def test_stupid_backoff_short_docs_null(spark):
    from ecokg_spark.operators.lm import stupid_backoff_score

    docs = spark.createDataFrame([(1, "a b"), (2, "a b c")],
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["n_trigrams"], r["avg_s"])
           for r in stupid_backoff_score(docs).collect()}
    assert got[1] == (0, None)
    assert got[2][0] == 1
