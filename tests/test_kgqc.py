"""KG schema QC (operators/kgqc.py), Adamic-Adar (operators/graph.py),
word entropy (operators/keywords.py): hand-computed values on tiny graphs."""

import hashlib
import math

import pytest

from ecokg_spark.operators.graph import adamic_adar
from ecokg_spark.operators.keywords import doc_word_entropy
from ecokg_spark.operators.kgqc import inverse_candidates, predicate_profile

SPO = "subject string, predicate string, object string"


def test_predicate_profile_all_four_classes(spark):
    e = spark.createDataFrame(
        [
            ("s1", "p_mo", "o1"), ("s2", "p_mo", "o1"),
            ("s1", "p_mo", "o1"),                      # duplicate assertion
            ("s1", "p_oo", "o1"),
            ("s1", "p_om", "o1"), ("s1", "p_om", "o2"),
            ("s1", "p_mm", "o1"), ("s1", "p_mm", "o2"), ("s2", "p_mm", "o1"),
        ],
        SPO,
    )
    got = {r["predicate"]: r.asDict() for r in predicate_profile(e).collect()}
    assert got["p_mo"]["cardinality"] == "many_to_one"
    assert got["p_mo"]["n_triples"] == 2          # duplicate collapsed
    assert got["p_mo"]["is_functional"] and not got["p_mo"]["is_inverse_functional"]
    assert got["p_oo"]["cardinality"] == "one_to_one"
    assert got["p_om"]["cardinality"] == "one_to_many"
    assert got["p_om"]["objs_per_subject"] == 2.0
    assert got["p_mm"]["cardinality"] == "many_to_many"
    assert got["p_mm"]["objs_per_subject"] == pytest.approx(1.5)
    assert got["p_mm"]["subjs_per_object"] == pytest.approx(1.5)


def test_inverse_candidates_partial_and_symmetric(spark):
    e = spark.createDataFrame(
        [
            ("a", "p", "b"), ("b", "q", "a"), ("c", "p", "d"),
            ("x", "s", "y"), ("y", "s", "x"),
        ],
        SPO,
    )
    got = {(r["p"], r["q"]): r.asDict()
           for r in inverse_candidates(e, min_support=1).collect()}
    pq = got[("p", "q")]
    assert pq["overlap"] == 1 and pq["n_p"] == 2 and pq["n_q"] == 1
    assert pq["conf_p"] == pytest.approx(0.5)
    assert pq["conf_q"] == pytest.approx(1.0)
    ss = got[("s", "s")]                           # symmetric predicate
    assert ss["overlap"] == 2 and ss["conf_p"] == pytest.approx(1.0)
    assert ("q", "p") not in got                   # p <= q canonical order

    pruned = {(r["p"], r["q"])
              for r in inverse_candidates(e, min_support=2).collect()}
    assert pruned == {("s", "s")}


def test_adamic_adar_path_and_square(spark):
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    got = adamic_adar(path).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["node_a"], r["node_b"], r["common_neighbors"]) == ("a", "c", 1)
    assert r["score"] == pytest.approx(round(1 / math.log(2), 6))

    square = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string")
    rows = adamic_adar(square).collect()
    assert {(r["node_a"], r["node_b"]) for r in rows} == {("a", "c"), ("b", "d")}
    assert all(r["common_neighbors"] == 2 for r in rows)
    assert all(r["score"] == pytest.approx(round(2 / math.log(2), 6))
               for r in rows)
    # tie broken by node_a asc under top=1
    top = adamic_adar(square, top=1).collect()
    assert (top[0]["node_a"], top[0]["node_b"]) == ("a", "c")


def test_adamic_adar_excludes_edges_and_hub_cap(spark):
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string")
    assert adamic_adar(tri).count() == 0          # every pair adjacent

    star = spark.createDataFrame(
        [("hub", "a"), ("hub", "b"), ("hub", "c")], "src string, dst string")
    assert adamic_adar(star).count() == 3          # leaf pairs via the hub
    assert adamic_adar(star, max_center_degree=2).count() == 0


def test_doc_word_entropy(spark):
    docs = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "a b c d"), ("d3", "a"), ("d4", "  ")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in doc_word_entropy(docs).collect()}
    assert "d4" not in got                         # empty doc omitted
    assert got["d3"]["entropy"] == 0.0 and got["d3"]["n_tokens"] == 1
    assert got["d2"]["entropy"] == pytest.approx(round(math.log(4), 6))
    h = math.log(3) - (2 * math.log(2)) / 3
    assert got["d1"]["entropy"] == pytest.approx(round(h, 6))
    assert got["d1"]["n_tokens"] == 3


# --------------------------------------------------------------------------
# deterministic hash walks (operators/graph.py hash_walks)
# --------------------------------------------------------------------------

def _choice(seed, step, c, nbrs):
    return min(nbrs, key=lambda n: hashlib.md5(
        f"{seed}|{step}|{c}|{n}".encode()).hexdigest())


def test_hash_walks_follow_md5_argmin_and_stop_at_dead_ends(spark):
    from ecokg_spark.operators.graph import hash_walks

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string")
    rows = {(r["start"], r["step"]): r["node"]
            for r in hash_walks(e, length=3, seed=0).collect()}
    first = _choice(0, 1, "a", ["b", "c"])
    assert rows[("a", 0)] == "a"
    assert rows[("a", 1)] == first
    assert rows[("a", 2)] == "d"            # b and c both lead to d
    assert ("a", 3) not in rows             # d is a dead end — walk stops
    assert rows[("d", 0)] == "d" and ("d", 1) not in rows
    # a different seed may change the choice, but stays deterministic
    again = {(r["start"], r["step"]): r["node"]
             for r in hash_walks(e, length=3, seed=7).collect()}
    assert again[("a", 1)] == _choice(7, 1, "a", ["b", "c"])


# --------------------------------------------------------------------------
# degree histogram (operators/kgqc.py degree_histogram)
# --------------------------------------------------------------------------

def test_degree_histogram_log2_buckets(spark):
    from ecokg_spark.operators.kgqc import degree_histogram

    # node degrees: a=1, b=2, c=3, d=8  -> buckets 1, 2, 2, 4
    edges = spark.createDataFrame(
        [("a",)] + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 8
        + [(None,)],                      # nulls are dropped
        "s string")
    got = {r["bucket"]: r for r in
           degree_histogram(edges, node_col="s").collect()}
    assert set(got) == {1, 2, 4}
    assert (got[1]["n_nodes"], got[1]["min_degree"], got[1]["max_degree"]) \
        == (1, 1, 1)
    assert (got[2]["n_nodes"], got[2]["min_degree"], got[2]["max_degree"]) \
        == (2, 2, 3)
    assert (got[4]["n_nodes"], got[4]["min_degree"], got[4]["max_degree"]) \
        == (1, 8, 8)
