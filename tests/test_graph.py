"""PageRank (operators/graph.py): conservation, symmetry, hand-computed
values, dangling redistribution."""

import pytest
from pyspark.sql import functions as F

from ecokg_spark.operators.graph import pagerank


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_rank_mass_conserved_and_symmetric_cycle(spark):
    # 3-cycle: perfectly symmetric -> uniform ranks at any iteration count
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    got = _ranks(pagerank(e, iterations=5))
    assert got == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})


def test_hand_computed_one_iteration(spark):
    # a->b, a->c, b->c, c dangling. r0 = 1/3 each.
    # contrib: b gets 1/6, c gets 1/6 + 1/3; dangling mass = 1/3 (from c)
    # r1(x) = 0.05 + 0.85*(contrib + (1/3)/3)
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string")
    got = _ranks(pagerank(e, iterations=1))
    base = 0.15 / 3 + 0.85 * (1 / 9)
    assert got["a"] == pytest.approx(base)
    assert got["b"] == pytest.approx(base + 0.85 * (1 / 6))
    assert got["c"] == pytest.approx(base + 0.85 * (1 / 6 + 1 / 3))
    assert sum(got.values()) == pytest.approx(1.0)


def test_mass_conserved_with_dangling_many_iters(spark):
    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 7) for i in range(7) if i % 2 == 0],
        "src int, dst int")
    pr = pagerank(e, iterations=10)
    total = pr.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0)


def test_duplicate_edges_collapse(spark):
    # distinct edge-set semantics: a duplicated edge must not double-count
    e1 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string")
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string")
    assert _ranks(pagerank(e1, iterations=3)) == pytest.approx(
        _ranks(pagerank(e2, iterations=3)))


def test_triangle_count_known_graph(spark):
    from ecokg_spark.operators.graph import triangle_count

    # K4 minus one edge (a-d missing): triangles abc, bcd
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string")
    got = {r["id"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_triangle_count_direction_and_dup_invariant(spark):
    from ecokg_spark.operators.graph import triangle_count

    # same triangle given with mixed directions and a duplicate edge
    e = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("a", "c"), ("c", "a"), ("x", "y")],
        "src string, dst string")
    got = {r["id"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "x": 0, "y": 0}


def test_clustering_coefficient_known_graph(spark):
    from ecokg_spark.operators.graph import clustering_coefficient

    # K4 minus edge a-d: deg a=2,b=3,c=3,d=2; tri a=1,b=2,c=2,d=1
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string")
    got = {r["id"]: (r["degree"], r["triangles"], r["coefficient"])
           for r in clustering_coefficient(e).collect()}
    assert got == {"a": (2, 1, 1.0), "b": (3, 2, round(2 / 3, 6)),
                   "c": (3, 2, round(2 / 3, 6)), "d": (2, 1, 1.0)}


def test_clustering_coefficient_degree_one_is_zero(spark):
    from ecokg_spark.operators.graph import clustering_coefficient

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["id"]: r["coefficient"]
           for r in clustering_coefficient(e).collect()}
    assert got == {"a": 0.0, "b": 0.0}


def test_bfs_distances_chain_with_branch(spark):
    from ecokg_spark.operators.graph import bfs_distances

    # a -> b -> c -> d, plus shortcut a -> c: first discovery wins
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["dist"] for r in bfs_distances(e, seeds).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_multi_source_and_unreachable(spark):
    from ecokg_spark.operators.graph import bfs_distances

    # two seeds; z unreachable (only an out-edge FROM z is absent entirely)
    e = spark.createDataFrame(
        [("a", "b"), ("x", "y"), ("z", "a")], "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("x",)], "id string")
    got = {r["id"]: r["dist"] for r in bfs_distances(e, seeds).collect()}
    assert got == {"a": 0, "x": 0, "b": 1, "y": 1}


def test_bfs_cycle_terminates_each_node_once(spark):
    from ecokg_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "id string")
    out = bfs_distances(e, seeds)
    assert out.count() == out.dropDuplicates(["id"]).count() == 3
    got = {r["id"]: r["dist"] for r in out.collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_bfs_max_depth_truncates(spark):
    from ecokg_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["dist"]
           for r in bfs_distances(e, seeds, max_depth=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_kcore_triangle_with_pendant(spark):
    from ecokg_spark.operators.graph import kcore

    # triangle 1-2-3 plus pendant 3-4: 2-core is exactly the triangle
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int")
    out = {r["id"]: r["core_deg"] for r in kcore(e, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_peels_path_to_empty(spark):
    from ecokg_spark.operators.graph import kcore

    # path 1-2-3-4: removing the endpoints cascades until nothing is left
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    assert kcore(e, k=2).count() == 0


def test_kcore_k1_keeps_every_connected_node(spark):
    from ecokg_spark.operators.graph import kcore

    e = spark.createDataFrame([(1, 2), (3, 4)], "src int, dst int")
    out = {r["id"]: r["core_deg"] for r in kcore(e, k=1).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_personalized_pagerank_seed_bias_and_mass(spark):
    from ecokg_spark.operators.graph import personalized_pagerank

    # 0 <-> 1 <-> 2 chain plus isolated pair 8 <-> 9; seed = {0}
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (8, 9), (9, 8)],
        "src int, dst int")
    seeds = spark.createDataFrame([(0,)], "id int")
    out = {r["id"]: r["rank"] for r in
           personalized_pagerank(e, seeds, iterations=20).collect()}
    # total mass 1; unreachable-from-seed component gets nothing
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out[8] == 0.0 and out[9] == 0.0
    # the seed holds the teleport bonus over the symmetric far node:
    # rank(0) = rank(2) + (1-d) exactly, and all reachable nodes rank > 0
    assert out[0] > out[2] > 0 and out[1] > 0
    assert abs((out[0] - out[2]) - 0.15) < 1e-9


def test_personalized_pagerank_requires_graph_seed(spark):
    from ecokg_spark.operators.graph import personalized_pagerank

    e = spark.createDataFrame([(0, 1)], "src int, dst int")
    seeds = spark.createDataFrame([(42,)], "id int")
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(e, seeds)


def test_hits_star(spark):
    """Two hubs pointing at one authority: authority mass all on the
    sink, hub mass split evenly (L1-normalized)."""
    from ecokg_spark.operators.graph import hits

    e = spark.createDataFrame([("a", "c"), ("b", "c")], "src string, dst string")
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(e, iterations=3).collect()}
    assert got["c"] == (0.0, 1.0)
    assert got["a"] == (0.5, 0.0)
    assert got["b"] == (0.5, 0.0)


def test_hits_dedups_multi_edges(spark):
    """The kernel runs on the DISTINCT edge set — a duplicated edge must
    not double its hub's weight."""
    from ecokg_spark.operators.graph import hits

    e1 = spark.createDataFrame([("a", "c"), ("b", "c")], "src string, dst string")
    e2 = spark.createDataFrame(
        [("a", "c"), ("a", "c"), ("b", "c")], "src string, dst string")
    r1 = sorted(map(tuple, hits(e1, iterations=2).collect()))
    r2 = sorted(map(tuple, hits(e2, iterations=2).collect()))
    assert r1 == r2


def test_label_propagation_two_cliques(spark):
    """Two disconnected triangles converge to one label per clique (the
    min id) within 3 synchronous rounds under the min tie-break."""
    from ecokg_spark.operators.graph import label_propagation

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z")], "src string, dst string")
    got = {r["id"]: r["label"] for r in label_propagation(e, iterations=3).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_label_propagation_ignores_self_loops(spark):
    from ecokg_spark.operators.graph import label_propagation

    e = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src string, dst string")
    got = {r["id"]: r["label"] for r in label_propagation(e, iterations=2).collect()}
    # path a-b: round 1 swaps labels, round 2 swaps back
    assert got == {"a": "a", "b": "b"}


def test_hyperball_small_exact(spark):
    """At tiny ball sizes the LinearCounting branch is near-exact: compare
    the estimate against true ball sizes on a 6-node path + branch."""
    from ecokg_spark.operators.graph import hyperball

    #  a -> b -> c -> d ;  b -> e ;  f isolated-ish (f -> a)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e"), ("f", "a")],
        "src string, dst string")
    out = hyperball(e, radius=3, p=8)
    got = {(r["id"], r["r"]): r["estimate"] for r in out.collect()}
    true = {
        ("a", 0): 1, ("a", 1): 2, ("a", 2): 4, ("a", 3): 5,
        ("b", 0): 1, ("b", 1): 3, ("b", 2): 4, ("b", 3): 4,
        ("d", 0): 1, ("d", 1): 1, ("d", 2): 1, ("d", 3): 1,
        ("f", 0): 1, ("f", 1): 2, ("f", 2): 3, ("f", 3): 5,
    }
    for k, exact in true.items():
        assert abs(got[k] - exact) / exact < 0.05, (k, got[k], exact)
    # neighborhood function is monotone in r for every node
    for node in ("a", "b", "c", "d", "e", "f"):
        vals = [got[(node, r)] for r in range(4)]
        assert vals == sorted(vals)


def test_hyperball_matches_exact_ball_on_random_graph(spark):
    """The HyperBall recurrence (register union along edges) must yield
    EXACTLY the HLL sketch of the true BFS ball at every (node, radius):
    recompute registers from exact ball sets in Python with the same
    md5/60-bit spec and compare estimates to 4 dp (deterministic — real
    bucket collisions like n16/n8 at p=12 affect both sides equally)."""
    import hashlib
    import math

    from ecokg_spark.operators.graph import hyperball
    from ecokg_spark.operators.sketch import _alpha

    p = 12
    edges = [(i, (i * 7 + 3) % 60) for i in range(60)] + [
        (i, (i * 13 + 1) % 60) for i in range(60)]
    e = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges if a != b],
        "src string, dst string")
    out = hyperball(e, radius=2, p=p)
    got = {(r["id"], r["r"]): (r["n_buckets_used"], r["estimate"])
           for r in out.collect()}

    def expected(members):
        m, wb = 2 ** p, 60 - p
        regs = {}
        for v in members:
            h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
            b, w = h >> wb, h % (2 ** wb)
            rho = wb + 1 if w == 0 else wb - w.bit_length() + 1
            regs[b] = max(regs.get(b, 0), rho)
        used = len(regs)
        s = sum(2 ** (50 - r) for r in regs.values()) + (m - used) * 2 ** 50
        raw = _alpha(m) * m * m * float(2 ** 50) / float(s)
        zeros = m - used
        if raw <= 2.5 * m and zeros > 0:
            return used, round(float(m) * math.log(float(m) / zeros), 4)
        return used, round(raw, 4)

    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(f"n{a}", set()).add(f"n{b}")
    for node in {f"n{i}" for i in range(60)}:
        ball = {node}
        for r in range(3):
            if r > 0:
                ball = ball | {w for u in list(ball)
                               for w in adj.get(u, ())}
            exp_used, exp_est = expected(ball)
            used, est = got[(node, r)]
            assert used == exp_used and abs(est - exp_est) < 1e-3, (
                node, r, (used, est), (exp_used, exp_est))


def test_distance_distribution_monotone(spark):
    from ecokg_spark.operators.graph import distance_distribution

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e"), ("f", "a")],
        "src string, dst string")
    out = {r["r"]: (r["reachable_pairs"], r["fraction"])
           for r in distance_distribution(e, radius=3, p=8).collect()}
    pairs = [out[r][0] for r in range(4)]
    assert pairs == sorted(pairs)          # N(r) is monotone
    assert abs(out[3][1] - 1.0) < 1e-9     # fraction of max radius is 1
    # r=0: every node reaches itself only -> ~|V| = 6
    assert abs(out[0][0] - 6) / 6 < 0.05


def test_harmonic_centrality_path(spark):
    """a -> b -> c: truncated harmonic over out-balls —
    a: 1/1 + 1/2, b: 1, c: 0 (LinearCounting near-exact at these sizes)."""
    from ecokg_spark.operators.graph import harmonic_centrality

    e = spark.createDataFrame([("a", "b"), ("b", "c")],
                              "src string, dst string")
    got = {r["id"]: r["harmonic"]
           for r in harmonic_centrality(e, radius=3, p=10).collect()}
    assert abs(got["a"] - 1.5) < 0.05
    assert abs(got["b"] - 1.0) < 0.05
    assert abs(got["c"] - 0.0) < 0.01
