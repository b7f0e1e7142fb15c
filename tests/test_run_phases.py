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


def test_download_phase(tmp_path):
    """Download phase parity (reference run.py:19-41 ->
    eco_kg/utils/download_utils.py:13-51): YAML manifest, local_name
    override, last-URL-segment default, cache skip, ignore_cache refetch,
    url-less item skipped with a warning. The fetcher is injected so the
    test never touches the network (reference precedent:
    tests/resources/mock_download.py)."""
    from ecokg_spark.sources.download import (download_from_manifest,
                                              download_from_yaml)

    calls: list[str] = []

    def fake_fetch(url: str) -> bytes:
        calls.append(url)
        return f"payload-of:{url}".encode()

    out = str(tmp_path / "raw")
    (tmp_path / "download.yaml").write_text(
        "- url: http://x.test/a/assoc.gaf.gz\n"
        "- url: http://x.test/b/traits.csv\n"
        "  local_name: renamed.csv\n"
        "- note: no url here\n")
    paths = download_from_yaml(str(tmp_path / "download.yaml"), out,
                               fetcher=fake_fetch)
    # url-less item skipped; default name = last URL segment; local_name wins
    assert [os.path.basename(p) for p in paths] == ["assoc.gaf.gz",
                                                    "renamed.csv"]
    assert open(os.path.join(out, "renamed.csv"), "rb").read() == \
        b"payload-of:http://x.test/b/traits.csv"
    assert len(calls) == 2

    # cache skip: second run fetches nothing but still reports both paths
    paths2 = download_from_yaml(str(tmp_path / "download.yaml"), out,
                                fetcher=fake_fetch)
    assert paths2 == paths and len(calls) == 2

    # ignore_cache: cached file deleted and re-fetched
    download_from_manifest([{"url": "http://x.test/a/assoc.gaf.gz"}], out,
                           ignore_cache=True, fetcher=fake_fetch)
    assert len(calls) == 3


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


def test_eol_sources_via_cli(spark, tmp_path):
    """EOL transforms reachable from the reference-shaped CLI (VERDICT r2
    gap #3): a user replaying `run.py transform eol_traits`
    (reference run.py:44-66, eol_traits.py:36-534) drives the same surface
    here. Mirrors the reference golden-shape test intent
    (tests/test_traits.py:73-99): fixed node/edge counts, KGX headers,
    node-id uniqueness."""
    base = str(tmp_path)
    (tmp_path / "pages.csv").write_text(
        "page_id,parent_id,rank,canonical\n"
        '"1","10","species","Solanum lycopersicum"\n'
        '"2","10","species","Solanum tuberosum"\n'
        '"10","100","genus","Solanum"\n')
    (tmp_path / "traits.csv").write_text(
        "eol_pk,page_id,object_page_id,resource_id,predicate,value_uri,"
        "measurement,units,units_uri,normal_measurement,normal_units,"
        "normal_units_uri\n"
        '"t1","1","","R5","uri:leafarea","","9","cm2","","3.5","","uri:cm2"\n'
        '"t4","1","2","R5","uri:eats","","","","","","",""\n'
        '"t5","1","1","R5","uri:eats","","","","","","",""\n')
    (tmp_path / "td.csv").write_text(
        "trait_uri,trait_type,data_type,label,curie\n"
        '"uri:leafarea","measurement","numerical","leaf area","TO:0002"\n'
        '"uri:eats","association","","eats","RO:0002470"\n')
    (tmp_path / "vd.csv").write_text("trait_uri,value_uri,label,curie\n")
    (tmp_path / "ud.csv").write_text(
        "unit_uri,label\n" + '"uri:cm2","square centimeter"\n')

    cmd_transform(argparse.Namespace(
        source="eol-pages", input=f"{base}/pages.csv",
        output=f"{base}/hier_out"))
    cmd_transform(argparse.Namespace(
        source="eol-traits", input=f"{base}/traits.csv",
        pages=f"{base}/pages.csv", trait_dim=f"{base}/td.csv",
        value_dim=f"{base}/vd.csv", unit_dim=f"{base}/ud.csv",
        location_uris=None, skip_uris=None,
        output=f"{base}/traits_out"))

    def read_tsv(d):
        return (spark.read.option("sep", "\t").option("header", True)
                .csv(f"{base}/{d}"))

    hn, he = read_tsv("hier_out/nodes"), read_tsv("hier_out/edges")
    tn, te = read_tsv("traits_out/nodes"), read_tsv("traits_out/edges")
    # golden shapes (this fixture): 4 taxon nodes / 3 subclass edges;
    # 1 trait node + 1 assoc node / 1 measurement + 1 assoc edge
    assert (hn.count(), len(hn.columns)) == (4, 6)
    assert (he.count(), len(he.columns)) == (3, 10)
    assert (tn.count(), len(tn.columns)) == (2, 6)
    assert (te.count(), len(te.columns)) == (2, 10)
    # node-id uniqueness (reference test_traits.py:95-99)
    for df in (hn, tn):
        assert df.select("id").distinct().count() == df.count()
    sub = {r["subject"] for r in te.collect()}
    assert sub == {"EOL:1"}
