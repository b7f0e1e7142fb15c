"""Transitive closure + RDFS materialization (operators/reasoning.py)
and redirect-chain resolution (operators/web.py resolve_redirects)."""

from pyspark.sql import functions as F

from ecokg_spark.operators.reasoning import (
    RDF_TYPE,
    rdfs_materialize,
    transitive_closure,
)
from ecokg_spark.operators.web import resolve_redirects


def test_transitive_closure_chain(spark):
    # a -> b -> c -> d plus an unrelated edge
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string")
    got = sorted(tuple(r) for r in transitive_closure(e).collect())
    assert got == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("x", "y")]


def test_transitive_closure_deep_chain_log_rounds(spark):
    # 40-deep chain converges within the doubling budget (2^6 > 40)
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long")
    out = transitive_closure(e, max_rounds=8)
    assert out.count() == 41 * 40 // 2


def test_transitive_closure_cycle_terminates(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    got = sorted(tuple(r) for r in transitive_closure(e).collect())
    # strict closure: every ordered pair of distinct cycle members
    assert got == [("a", "b"), ("a", "c"), ("b", "a"),
                   ("b", "c"), ("c", "a"), ("c", "b")]


def test_rdfs_materialize_rules(spark):
    triples = spark.createDataFrame(
        [
            # schema
            ("B1", "rdfs:subClassOf", "M1"),
            ("M1", "rdfs:subClassOf", "Product"),
            ("eco:sized", "rdfs:subPropertyOf", "eco:dimension"),
            ("eco:dimension", "rdfs:domain", "Measured"),
            ("eco:dimension", "rdfs:range", "Size"),
            # data
            ("p1", "rdf:type", "B1"),
            ("p1", "eco:sized", "s10"),
        ],
        "subject string, predicate string, object string")
    out = rdfs_materialize(triples)
    got = {tuple(r) for r in out.collect()}
    # rdfs7: subproperty expansion
    assert ("p1", "eco:dimension", "s10") in got
    # rdfs2 fires on the EXPANDED triple (domain is on eco:dimension only)
    assert ("p1", RDF_TYPE, "Measured") in got
    # rdfs3: range types the object
    assert ("s10", RDF_TYPE, "Size") in got
    # rdfs9: transitive type inheritance through the class closure
    assert ("p1", RDF_TYPE, "M1") in got
    assert ("p1", RDF_TYPE, "Product") in got
    # asserted triples are kept
    assert ("p1", "rdf:type", "B1") in got
    assert ("B1", "rdfs:subClassOf", "M1") in got
    # nothing types the schema nodes spuriously
    assert ("B1", RDF_TYPE, "Product") not in got


def test_rdfs_materialize_is_fixpoint(spark):
    triples = spark.createDataFrame(
        [
            ("A", "rdfs:subClassOf", "B"),
            ("B", "rdfs:subClassOf", "C"),
            ("x", "rdf:type", "A"),
        ],
        "subject string, predicate string, object string")
    once = rdfs_materialize(triples)
    twice = rdfs_materialize(once)
    assert once.count() == twice.count()
    assert once.exceptAll(twice).isEmpty() and twice.exceptAll(once).isEmpty()


def test_resolve_redirects_chain_and_cycle(spark):
    r = spark.createDataFrame(
        [
            # chain: a -> b -> c -> T (T not a source => terminal)
            ("a", "b"), ("b", "c"), ("c", "T"),
            # 2-cycle
            ("p", "q"), ("q", "p"),
            # self-redirect is dropped entirely
            ("z", "z"),
            # conflicting targets collapse to MIN
            ("m", "n2"), ("m", "n1"),
        ],
        "src string, dst string")
    out = {r2["src"]: (r2["final_url"], r2["resolved"])
           for r2 in resolve_redirects(r).collect()}
    assert out["a"] == ("T", True)
    assert out["b"] == ("T", True)
    assert out["c"] == ("T", True)
    assert out["p"] == (None, False)
    assert out["q"] == (None, False)
    assert out["m"] == ("n1", True)
    assert "z" not in out


def test_resolve_redirects_long_chain(spark):
    # 30-hop chain: needs doubling, not one-hop-per-round
    rows = [(f"u{i}", f"u{i+1}") for i in range(30)]
    r = spark.createDataFrame(rows, "src string, dst string")
    out = resolve_redirects(r, max_rounds=8).collect()
    assert all(row["resolved"] and row["final_url"] == "u30" for row in out)
    assert len(out) == 30


def test_hierarchy_cycles(spark):
    from ecokg_spark.operators.reasoning import hierarchy_cycles

    e = spark.createDataFrame(
        [
            # clean chain
            ("a", "b"), ("b", "c"),
            # 3-cycle x -> y -> z -> x
            ("x", "y"), ("y", "z"), ("z", "x"),
        ],
        "src string, dst string")
    got = sorted(tuple(r) for r in hierarchy_cycles(e).collect())
    # every unordered pair of mutually reachable nodes, reported once
    assert got == [("x", "y"), ("x", "z"), ("y", "z")]


def test_hierarchy_cycles_acyclic_empty(spark):
    from ecokg_spark.operators.reasoning import hierarchy_cycles

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string")
    assert hierarchy_cycles(e).count() == 0
