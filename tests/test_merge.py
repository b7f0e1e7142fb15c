"""KGX merge: heterogeneous-schema union, id-merge, provenance union,
first-wins dedup (reference EP2 / merge.yaml semantics)."""

from ecokg_spark.operators.merge import dedup_first_wins, merge_edges, merge_nodes


def test_merge_nodes_heterogeneous(spark):
    a = spark.createDataFrame(
        [("N:1", "Alpha", "biolink:OrganismTaxon", "src_a"),
         ("N:2", "Beta", "biolink:OrganismTaxon", "src_a")],
        "id string, name string, category string, provided_by string",
    )
    # source b lacks `category`, has extra `has_attribute`
    b = spark.createDataFrame(
        [("N:1", "alpha", "T", "src_b"), ("N:3", "Gamma", "F", "src_b")],
        "id string, name string, has_attribute string, provided_by string",
    )
    m = merge_nodes([a, b])
    rows = {r["id"]: r for r in m.collect()}
    assert set(rows) == {"N:1", "N:2", "N:3"}
    # property union across sources; min-pick deterministic; provenance joined
    assert rows["N:1"]["provided_by"] == "src_a|src_b"
    assert rows["N:1"]["category"] == "biolink:OrganismTaxon"
    assert rows["N:1"]["has_attribute"] == "T"
    assert rows["N:3"]["category"] is None  # missing column -> null, not error


def test_merge_edges_spo_dedup(spark):
    a = spark.createDataFrame(
        [("s", "p", "o", "R:1", "src_a"), ("s", "p", "o2", "R:1", "src_a")],
        "subject string, predicate string, object string, relation string, provided_by string",
    )
    b = spark.createDataFrame(
        [("s", "p", "o", "R:1", "src_b")],
        "subject string, predicate string, object string, relation string, provided_by string",
    )
    m = merge_edges([a, b])
    assert m.count() == 2  # (s,p,o) merged across sources
    r = {(x["subject"], x["predicate"], x["object"]): x for x in m.collect()}
    assert r[("s", "p", "o")]["provided_by"] == "src_a|src_b"


def test_first_wins(spark):
    df = spark.createDataFrame(
        [("k", "second", 2), ("k", "first", 1), ("j", "only", 5)],
        "key string, val string, pos long",
    )
    out = {r["key"]: r["val"] for r in dedup_first_wins(df, ["key"], "pos").collect()}
    assert out == {"k": "first", "j": "only"}


def test_stats_yaml_shape(spark, tmp_path):
    """S18 golden-stats sink: merged-kg_stats.yaml shape (edge_stats.
    count_by_predicates / node_stats.count_by_category / totals)."""
    from ecokg_spark.operators.stats import write_stats_yaml

    nodes = spark.createDataFrame(
        [("A:1", "biolink:GenomicEntity"), ("A:2", "biolink:OrganismTaxon")],
        "id string, category string")
    edges = spark.createDataFrame(
        [("A:1", "biolink:in_taxon", "A:2"), ("A:1", "biolink:in_taxon", "A:2")],
        "subject string, predicate string, object string")
    out = str(tmp_path / "stats.yaml")
    s = write_stats_yaml(nodes, edges, out)
    text = open(out).read()
    assert s["total_nodes"] == 2 and s["total_edges"] == 2
    assert "edge_stats:" in text and "  count_by_predicates:" in text
    assert "    biolink:in_taxon:" in text and "      count: 2" in text
    assert "node_stats:" in text and "  total_nodes: 2" in text
    # parseable as YAML shape (stdlib-free check: indentation pairs)
    for line in text.splitlines():
        assert line == line.rstrip()


def test_diff_graphs_membership(spark):
    from ecokg_spark.operators.merge import diff_graphs

    old = spark.createDataFrame(
        [("A:1", "p", "B:1"), ("A:2", "p", "B:2"), ("A:2", "p", "B:2")],
        "subject string, predicate string, object string")
    new = spark.createDataFrame(
        [("A:1", "p", "B:1"), ("A:3", "p", "B:3")],
        "subject string, predicate string, object string")
    got = sorted(map(tuple, diff_graphs(old, new).collect()))
    assert got == [("added", "A:3", "p", "B:3"),
                   ("removed", "A:2", "p", "B:2")]
