"""TF-IDF top-k and co-occurrence PMI (operators/keywords.py)."""

import math

import pytest

from ecokg_spark.operators.keywords import cooccurrence_pmi, tfidf_topk


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "apple apple banana"),
         (2, "apple cherry"),
         (3, "banana  cherry cherry date")],  # double space: ws-normalize
        "doc_id long, text string")


def test_tfidf_scores_and_ranks(spark, docs):
    out = {(r["doc_id"], r["term"]): (r["score"], r["rank"])
           for r in tfidf_topk(docs, k=2).collect()}
    # every term appears in exactly 2 of 3 docs except date (1 of 3)
    idf2, idf1 = math.log(3 / 2), math.log(3 / 1)
    assert out[(1, "apple")] == (pytest.approx(round(2 * idf2, 6)), 1)
    assert out[(3, "date")][0] == pytest.approx(round(idf1, 6))
    # doc 2: both terms tf=1, df=2 -> tie broken by term asc
    assert out[(2, "apple")][1] == 1
    assert out[(2, "cherry")][1] == 2
    assert all(rank <= 2 for _, rank in out.values())


def test_tfidf_k_bounds_rows_per_doc(spark, docs):
    counts = (tfidf_topk(docs, k=1).groupBy("doc_id").count().collect())
    assert all(r["count"] == 1 for r in counts)


def test_pmi_known_value(spark, docs):
    out = {(r["term_a"], r["term_b"]): (r["n_pairs"], r["pmi"])
           for r in cooccurrence_pmi(docs, min_pairs=1).collect()}
    # apple+banana share doc 1 only; c_apple=2, c_banana=2, N=3
    n, pmi = out[("apple", "banana")]
    assert n == 1
    assert pmi == pytest.approx(round(math.log(1 * 3 / (2 * 2)), 6))
    # presence is per-document DISTINCT: doc 3's double cherry counts once
    assert out[("banana", "cherry")][0] == 1
    # ordering canonical: no (b, a) duplicates
    assert all(a < b for a, b in out)


def test_pmi_min_pairs_prunes(spark, docs):
    out = cooccurrence_pmi(docs, min_pairs=2).collect()
    assert out == []  # no pair shares two documents in this corpus
