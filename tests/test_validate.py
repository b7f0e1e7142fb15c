"""KGX validation report: one (check, n_violations) row per public
KGX/Biolink convention check, all counts distributed."""

from ecokg_spark.operators.validate import validate_kgx


def test_validate_kgx_counts_each_violation_class(spark):
    nodes = spark.createDataFrame(
        [("A:1", "biolink:Gene"), ("A:1", "biolink:Gene"),
         ("", "biolink:Gene"), ("badid", "biolink:Gene"),
         ("A:2", None), ("A:3", "NotBiolink"), ("A:4", "biolink:Gene")],
        "id string, category string")
    edges = spark.createDataFrame(
        [("A:1", "biolink:related_to", "A:2"),
         ("A:9", "biolink:related_to", "A:2"),
         ("A:1", "related_to", "A:99"),
         ("A:4", "biolink:related_to", "A:4")],
        "subject string, predicate string, object string")
    got = {r["check"]: r["n_violations"]
           for r in validate_kgx(nodes, edges).collect()}
    assert got == {
        "node_id_null": 1,
        "node_id_duplicate": 1,        # one EXTRA copy of A:1
        "node_id_not_curie": 1,        # badid
        "node_category_missing": 1,
        "node_category_not_biolink": 1,
        "edge_subject_dangling": 1,    # A:9
        "edge_object_dangling": 1,     # A:99
        "edge_predicate_not_biolink": 1,
        "edge_self_loop": 1,
    }


def test_validate_kgx_clean_graph_is_all_zero(spark):
    nodes = spark.createDataFrame(
        [("A:1", "biolink:Gene"), ("A:2", "biolink:Gene")],
        "id string, category string")
    edges = spark.createDataFrame(
        [("A:1", "biolink:related_to", "A:2")],
        "subject string, predicate string, object string")
    got = {r["check"]: r["n_violations"]
           for r in validate_kgx(nodes, edges).collect()}
    assert set(got.values()) == {0} and len(got) == 9
