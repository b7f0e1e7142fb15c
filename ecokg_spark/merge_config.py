"""Config-driven KG merge — the reference's merge phase (EP2) end-to-end.

The reference's `run.py merge` parses a KGX merge YAML
(merge_utils/merge_kg.py:10-19; config shape merge.yaml:1-81) and funnels
every per-source nodes/edges TSV through an in-driver networkx graph. This
module runs the SAME config shape fully distributed:

  merged_graph.source.<key>.input.filename[]  -> per-source node/edge scans
                                                 (TSV or parquet; *nodes* /
                                                 *edges* classified by
                                                 filename, as KGX does)
  union + id-merge / (s,p,o)-merge             -> operators/merge.py (J8/A1)
  operations: generate_graph_stats             -> stats.write_stats_yaml
                                                 (merged-kg_stats.yaml shape)
  destination: format tsv [+ compression]      -> TableIO.export_kgx_tsv
                                                 (.tsv.gz; the reference's
                                                 tar wrapper carries no
                                                 information)

The YAML itself is parsed with a ~30-line indentation walker (no external
YAML lib in this environment; the merge-config subset has only nested maps
and '-' list items), or pass an already-parsed dict.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ecokg_spark.io import TableIO
from ecokg_spark.operators.merge import merge_edges, merge_nodes
from ecokg_spark.operators.stats import write_stats_yaml


def parse_simple_yaml(text: str) -> dict:
    """Minimal YAML subset parser: nested maps by indentation, '- item'
    lists (plain strings or list-of-maps, as in `operations:`), scalar
    values; '#' comments and '---' markers ignored. Covers the KGX
    merge-config shape (merge.yaml) without an external YAML dependency."""
    lines: list[tuple[int, str]] = []
    for raw in text.splitlines():
        ln = raw.split("#", 1)[0].rstrip()
        if not ln.strip() or ln.strip() == "---":
            continue
        lines.append((len(ln) - len(ln.lstrip()), ln.strip()))

    pos = 0

    def parse_block(indent: int) -> Any:
        nonlocal pos
        if lines[pos][1].startswith("- "):
            out_l: list[Any] = []
            while pos < len(lines) and lines[pos][0] == indent \
                    and lines[pos][1].startswith("- "):
                head = lines[pos][1][2:].strip()
                if ":" in head:  # list element is a map: '- key: value'
                    # re-inject the head as a map line two columns deeper,
                    # then parse the element's map block
                    lines[pos] = (indent + 2, head)
                    out_l.append(parse_block(indent + 2))
                else:
                    out_l.append(head)
                    pos += 1
            return out_l
        out_m: dict[str, Any] = {}
        while pos < len(lines) and lines[pos][0] >= indent:
            ind, item = lines[pos]
            if ind > indent:
                raise ValueError(f"bad indentation near: {item!r}")
            key, _, val = item.partition(":")
            pos += 1
            if val.strip():
                out_m[key.strip()] = val.strip().strip("'\"")
            elif pos < len(lines) and (
                lines[pos][0] > ind
                # YAML allows a key's list items at the KEY's indent
                # (merge.yaml writes `filename:` and its `- path` rows at
                # the same column)
                or (lines[pos][0] == ind and lines[pos][1].startswith("- "))
            ):
                out_m[key.strip()] = parse_block(lines[pos][0])
            else:
                out_m[key.strip()] = None
        return out_m

    return parse_block(0) if lines else {}


def _read_table(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    if fmt == "parquet" or path.endswith(".parquet"):
        return spark.read.parquet(path)
    return (
        spark.read.option("sep", "\t").option("header", "true").csv(path)
    )


def load_and_merge(
    spark: SparkSession,
    config: dict | str,
    base_dir: str = ".",
) -> dict[str, DataFrame]:
    """Run a KGX-shaped merge config. Returns {'nodes', 'edges'} plus the
    side effects the config requests (stats yaml, TSV dump).

    config: parsed dict or YAML text (parse_simple_yaml subset).
    Paths resolve against base_dir. Source name -> provided_by is KGX's
    behavior when inputs lack provenance; inputs that already carry
    provided_by keep it.
    """
    if isinstance(config, str):
        config = parse_simple_yaml(config)
    mg = config["merged_graph"]
    out_dir = os.path.join(
        base_dir, config.get("configuration", {}).get("output_directory", "merged"))

    node_dfs: list[DataFrame] = []
    edge_dfs: list[DataFrame] = []
    for _key, src in mg["source"].items():
        inp = src["input"]
        fmt = inp.get("format", "tsv")
        name = inp.get("name", _key)
        for fn in inp.get("filename", []):
            df = _read_table(spark, os.path.join(base_dir, fn), fmt)
            if "provided_by" not in df.columns:
                from pyspark.sql import functions as F

                df = df.withColumn("provided_by", F.lit(name))
            stem = os.path.basename(fn).lower()
            if "node" in stem:
                node_dfs.append(df)
            elif "edge" in stem:
                edge_dfs.append(df)
            else:
                raise ValueError(f"cannot classify {fn!r} as nodes or edges")
    if not node_dfs or not edge_dfs:
        raise ValueError("merge config needs at least one nodes and one edges input")

    nodes = merge_nodes(node_dfs)
    edges = merge_edges(edge_dfs)

    os.makedirs(out_dir, exist_ok=True)
    for op in mg.get("operations", []) or []:
        op_name = op if isinstance(op, str) else op.get("name", "")
        if "generate_graph_stats" in op_name:
            args = op.get("args", {}) if isinstance(op, dict) else {}
            fn = args.get("filename", "merged-kg_stats.yaml")
            write_stats_yaml(nodes, edges, os.path.join(out_dir, fn))

    io = TableIO(spark, warehouse=out_dir)
    for _dkey, dest in (mg.get("destination", {}) or {}).items():
        if not isinstance(dest, dict):
            continue
        compress = "gz" in str(dest.get("compression", ""))
        if dest.get("format") == "tsv":
            io.export_kgx_tsv(nodes, os.path.join(out_dir, "nodes_tsv"), compress)
            io.export_kgx_tsv(edges, os.path.join(out_dir, "edges_tsv"), compress)
        elif dest.get("format") == "jsonl":
            io.export_kgx_jsonl(nodes, os.path.join(out_dir, "nodes_jsonl"),
                                compress)
            io.export_kgx_jsonl(edges, os.path.join(out_dir, "edges_jsonl"),
                                compress)

    return {"nodes": nodes, "edges": edges, "out_dir": out_dir}
