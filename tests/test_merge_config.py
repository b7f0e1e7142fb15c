"""Config-driven merge phase (EP2): KGX merge-YAML subset -> distributed
union/id-merge + stats yaml + TSV dump (run.py merge semantics,
merge_utils/merge_kg.py:10-31, merge.yaml:1-81)."""

import gzip
import glob
import os

from ecokg_spark.merge_config import load_and_merge, parse_simple_yaml


def test_parse_reference_shaped_yaml():
    cfg = parse_simple_yaml(
        """
configuration:
  output_directory: out
merged_graph:
  name: G
  source:
    a:
      input:
        name: "A"
        format: tsv
        filename:
        - a_nodes.tsv
        - a_edges.tsv
  operations:
    - name: kgx.graph_operations.summarize_graph.generate_graph_stats
      args:
        graph_name: Merged Graph
        filename: stats.yaml
  destination:
    merged-kg-tsv:
      format: tsv
      compression: tar.gz
"""
    )
    inp = cfg["merged_graph"]["source"]["a"]["input"]
    assert inp["name"] == "A"
    assert inp["filename"] == ["a_nodes.tsv", "a_edges.tsv"]
    op = cfg["merged_graph"]["operations"][0]
    assert "generate_graph_stats" in op["name"]
    assert op["args"]["filename"] == "stats.yaml"


def _write_tsv(path, header, rows):
    with open(path, "w") as f:
        f.write("\t".join(header) + "\n")
        for r in rows:
            f.write("\t".join(r) + "\n")


def test_load_and_merge_end_to_end(spark, tmp_path):
    base = str(tmp_path)
    # source A: overlapping node ids with B; heterogeneous edge schemas
    _write_tsv(f"{base}/a_nodes.tsv", ["id", "name", "category"],
               [["X:1", "alpha", "biolink:GenomicEntity"],
                ["X:2", "", "biolink:OrganismTaxon"]])
    _write_tsv(f"{base}/a_edges.tsv", ["subject", "predicate", "object", "relation"],
               [["X:1", "biolink:in_taxon", "X:2", "RO:1"]])
    _write_tsv(f"{base}/b_nodes.tsv", ["id", "name", "category"],
               [["X:2", "beta", "biolink:OrganismTaxon"],
                ["X:3", "gamma", "biolink:PhenotypicFeature"]])
    _write_tsv(f"{base}/b_edges.tsv",
               ["subject", "predicate", "object", "relation", "has_unit"],
               [["X:1", "biolink:in_taxon", "X:2", "RO:1", "cm"],   # same (s,p,o) as A
                ["X:1", "biolink:has_phenotype", "X:3", "RO:2", ""]])
    cfg = f"""
configuration:
  output_directory: merged
merged_graph:
  name: T
  source:
    a:
      input:
        name: "srcA"
        format: tsv
        filename:
        - a_nodes.tsv
        - a_edges.tsv
    b:
      input:
        name: "srcB"
        format: tsv
        filename:
        - b_nodes.tsv
        - b_edges.tsv
  operations:
    - name: kgx.graph_operations.summarize_graph.generate_graph_stats
      args:
        graph_name: Merged Graph
        filename: merged-kg_stats.yaml
  destination:
    merged-kg-tsv:
      format: tsv
      compression: tar.gz
"""
    out = load_and_merge(spark, cfg, base_dir=base)

    nodes = {r["id"]: r for r in out["nodes"].collect()}
    assert len(nodes) == 3
    # id-merge: X:2's empty name from A loses to min() over non-null...
    # min("", "beta") = "" -> reference keeps first; our merge_nodes uses
    # min of values, '' sorts first — property-merge is deterministic
    assert nodes["X:2"]["provided_by"] == "srcA|srcB"
    edges = {(r["subject"], r["predicate"], r["object"]) for r in out["edges"].collect()}
    assert edges == {("X:1", "biolink:in_taxon", "X:2"),
                     ("X:1", "biolink:has_phenotype", "X:3")}
    # heterogeneous schema union: has_unit survives on the merged edges
    assert "has_unit" in out["edges"].columns

    stats = open(os.path.join(out["out_dir"], "merged-kg_stats.yaml")).read()
    assert "total_nodes: 3" in stats and "total_edges: 2" in stats
    assert "biolink:in_taxon:" in stats

    gz = glob.glob(os.path.join(out["out_dir"], "nodes_tsv", "*.csv.gz"))
    assert gz, "tsv.gz dump missing"
    dumped = gzip.open(gz[0], "rt").read()
    assert "X:1" in dumped or len(gz) > 1


def test_jsonl_destination(spark, tmp_path):
    import json as _json

    base = str(tmp_path)
    _write_tsv(f"{base}/n_nodes.tsv", ["id", "name", "category"],
               [["X:1", "alpha", "biolink:GenomicEntity"]])
    _write_tsv(f"{base}/n_edges.tsv",
               ["subject", "predicate", "object", "relation"],
               [["X:1", "biolink:in_taxon", "X:1b", "RO:1"]])
    cfg = """
configuration:
  output_directory: merged
merged_graph:
  name: T
  source:
    n:
      input:
        name: "srcN"
        format: tsv
        filename:
        - n_nodes.tsv
        - n_edges.tsv
  destination:
    merged-kg-jsonl:
      format: jsonl
"""
    out = load_and_merge(spark, cfg, base_dir=base)
    files = glob.glob(os.path.join(out["out_dir"], "nodes_jsonl", "part-*"))
    assert files, "jsonl dump missing"
    rows = [_json.loads(line) for f in files
            for line in open(f) if line.strip()]
    assert {r["id"] for r in rows} == {"X:1"}
    assert rows[0]["category"] == "biolink:GenomicEntity"
