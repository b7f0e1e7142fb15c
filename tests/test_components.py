"""Connected components (large-star/small-star): chains, cliques, isolated
nodes (FIXTURES.md F-7 golden 5)."""

from ecokg_spark.operators.components import canonical_map, connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "u string, v string")
    if nodes is None:
        nodes = sorted({x for uv in edges for x in uv})
    n = spark.createDataFrame([(x,) for x in nodes], "node string")
    return {r["node"]: r["canonical"] for r in canonical_map(e, n).collect()}


def test_chain_clique_isolated(spark):
    edges = [
        # chain a-b-c-d
        ("a", "b"), ("b", "c"), ("c", "d"),
        # clique x,y,z
        ("x", "y"), ("y", "z"), ("x", "z"),
        # pair p-q
        ("p", "q"),
    ]
    got = _cc(spark, edges, nodes=["a", "b", "c", "d", "x", "y", "z", "p", "q", "iso"])
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "p": "p", "q": "p",
        "iso": "iso",
    }


def test_long_chain_converges(spark):
    # 40-node path: stresses O(log n) convergence + lineage checkpointing
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes, nodes[1:]))
    got = _cc(spark, edges)
    assert set(got.values()) == {"n000"}


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")])
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_component_label_is_min(spark):
    comp = connected_components(
        spark.createDataFrame([("m", "k"), ("k", "z")], "u string, v string")
    )
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert set(got.values()) == {"k"}
