"""Reference-shaped CLI (scripts/run_phases.py): transform -> merge ->
query, the run.py phase surface a reference user drives."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.run_phases import cmd_merge, cmd_query, cmd_transform  # noqa: E402

GAF = (
    "!gaf-version: 2.1\n"
    "PO\tG1\tSYM1\t\tTO:0000001\tREF\tIEA\t\tT\tAT1G01010.2\t\tgene\t"
    "taxon:3702\t20240101\tPO\t\t\n"
    "PO\tLOC_Os01g01010\tSYM2\t\tGO:0005634\tREF\tIEA\t\tC\t\t\tgene\t"
    "taxon:4530\t20240101\tPO\t\t\n"
)

MERGE_YAML = """
configuration:
  output_directory: merged
merged_graph:
  name: Demo
  source:
    a:
      input:
        name: "demo"
        format: tsv
        filename:
        - t_out/nodes
        - t_out/edges
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


def test_phases_end_to_end(spark, tmp_path):
    base = str(tmp_path)
    (tmp_path / "assoc.gaf").write_text(GAF)
    cmd_transform(argparse.Namespace(
        source="gaf", input=f"{base}/assoc.gaf", output=f"{base}/t_out",
        ortho=False, cat_traits=None, num_traits=None))
    nodes_csv = glob.glob(f"{base}/t_out/nodes/part*.csv")
    assert nodes_csv and "AT1G01010" in open(nodes_csv[0]).read()

    (tmp_path / "merge.yaml").write_text(MERGE_YAML)
    cmd_merge(argparse.Namespace(config=f"{base}/merge.yaml", base_dir=base))
    stats = open(f"{base}/merged/merged-kg_stats.yaml").read()
    assert "total_nodes: 6" in stats and "biolink:in_taxon:" in stats

    cmd_query(argparse.Namespace(
        sparql="SELECT (COUNT(?v2) AS ?v1) ?v0 WHERE "
               "{ ?v2 biolink:category ?v0 } GROUP BY ?v0",
        nodes=f"{base}/t_out/nodes", edges=f"{base}/t_out/edges",
        output=f"{base}/q_out"))
    out = open(glob.glob(f"{base}/q_out/part*.csv")[0]).read()
    assert out.splitlines()[0] == "v1\tv0"
    assert "biolink:GenomicEntity" in out
