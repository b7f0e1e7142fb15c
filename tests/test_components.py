"""Connected components: chains, cliques, isolated nodes (FIXTURES.md F-7
golden 5). Parametrized over BOTH physical paths — the driver-side
union-find small-graph gate and the distributed large-star/small-star
iteration (forced with small_graph_edges=0)."""

import pytest

from ecokg_spark.operators.components import canonical_map, connected_components

PATHS = [pytest.param(10**6, id="unionfind"), pytest.param(0, id="largestar")]


def _cc(spark, edges, nodes=None, gate=10**6):
    e = spark.createDataFrame(edges, "u string, v string")
    if nodes is None:
        nodes = sorted({x for uv in edges for x in uv})
    n = spark.createDataFrame([(x,) for x in nodes], "node string")
    return {r["node"]: r["canonical"]
            for r in canonical_map(e, n, small_graph_edges=gate).collect()}


@pytest.mark.parametrize("gate", PATHS)
def test_chain_clique_isolated(spark, gate):
    edges = [
        # chain a-b-c-d
        ("a", "b"), ("b", "c"), ("c", "d"),
        # clique x,y,z
        ("x", "y"), ("y", "z"), ("x", "z"),
        # pair p-q
        ("p", "q"),
    ]
    got = _cc(spark, edges, nodes=["a", "b", "c", "d", "x", "y", "z", "p", "q", "iso"],
              gate=gate)
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "p": "p", "q": "p",
        "iso": "iso",
    }


@pytest.mark.parametrize("gate", PATHS)
def test_long_chain_converges(spark, gate):
    # 40-node path: stresses O(log n) convergence + lineage checkpointing
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes, nodes[1:]))
    got = _cc(spark, edges, gate=gate)
    assert set(got.values()) == {"n000"}


@pytest.mark.parametrize("gate", PATHS)
def test_duplicate_and_reversed_edges(spark, gate):
    got = _cc(spark, [("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")], gate=gate)
    assert got == {"a": "a", "b": "a", "c": "a"}


@pytest.mark.parametrize("gate", PATHS)
def test_component_label_is_min(spark, gate):
    comp = connected_components(
        spark.createDataFrame([("m", "k"), ("k", "z")], "u string, v string"),
        small_graph_edges=gate,
    )
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert set(got.values()) == {"k"}


@pytest.mark.parametrize("gate", PATHS)
def test_paths_agree_random_graph(spark, gate):
    # deterministic pseudo-random graph: both paths must produce identical maps
    edges = [(f"v{(i * 7) % 50:02d}", f"v{(i * 13 + 3) % 50:02d}")
             for i in range(60) if (i * 7) % 50 != (i * 13 + 3) % 50]
    got = _cc(spark, edges, gate=gate)
    # independent oracle: networkx-free union-find in the test
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for uv in edges for n in uv}
    assert got == want
