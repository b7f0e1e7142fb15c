"""Per-stage profile of the EXACT run_pipeline_once path at a given core
count (run me under `taskset -c <cores>`): finds where the N->4N serial
fraction lives.

Usage: taskset -c 0-3 python scripts/profile_scaling.py 1920000 4
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1920000
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = bench._spark(str(cores))
path = bench.prepare_corpus(spark, n_pages)
wpath = bench.prepare_corpus(spark, bench.WARMUP_PAGES, n_files=8)

# warmup identical to timed_pipeline
bench.run_pipeline_once(spark, wpath, cores)

from ecokg_spark.operators.components import canonical_map  # noqa: E402
from ecokg_spark.operators.fused import fused_extract_triples  # noqa: E402
from ecokg_spark.operators.linking import (  # noqa: E402
    alias_identity_edges, build_termlist,
)
from ecokg_spark.operators.merge import merge_edges  # noqa: E402
from ecokg_spark.operators.triples import verb_map  # noqa: E402
from ecokg_spark.pipeline import link_triples, release_all  # noqa: E402
from ecokg_spark.sources.pages import alias_table  # noqa: E402

T: dict[str, float] = {}


def clock(name, fn):
    t0 = time.time()
    out = fn()
    T[name] = round(time.time() - t0, 3)
    print(f"{name:28s} {T[name]:8.3f}s", flush=True)
    return out


t_all = time.time()
pages = spark.read.parquet(path).coalesce(max(min(cores, 16), 4))
aliases = alias_table(spark)
termlist = clock("termlist_ckpt", lambda: build_termlist(aliases).localCheckpoint(eager=True))
canon = clock("canon(serial)", lambda: canonical_map(
    alias_identity_edges(termlist), termlist.select(F.col("curie").alias("node"))
).localCheckpoint(eager=True))

fused = clock("fused_ckpt", lambda: fused_extract_triples(pages).select(
    "url", "sent_id", "subj_mention", "verb", "obj_mention", "n_sentences",
    F.when(F.col("sent_id") < 0,
           F.sha2(F.encode(F.col("extracted_text"), "UTF-8"), 256)
           ).alias("text_sha256"),
).localCheckpoint(eager=True))
triples = fused.where(F.col("sent_id") >= 0).select(
    "url", "sent_id", "subj_mention", "verb", "obj_mention")
linked = clock("link(resolve+join)", lambda: link_triples(triples, termlist))[0]

canon_b = F.broadcast(canon)
vmap = F.broadcast(verb_map(spark))
edges_raw = (
    linked.join(canon_b.withColumnRenamed("node", "subj_curie")
                .withColumnRenamed("canonical", "subject"), "subj_curie")
    .join(canon_b.withColumnRenamed("node", "obj_curie")
          .withColumnRenamed("canonical", "object"), "obj_curie")
    .join(vmap, "verb")
    .where(F.col("subject") != F.col("object"))
)
edges = edges_raw.select(
    "subject", "predicate", "object", "relation",
    F.lit("ecokg-web").alias("provided_by"))
clock("edges_count", lambda: merge_edges([edges]).count())
clock("audit_count", lambda: fused.where(F.col("sent_id") < 0).count())
total = time.time() - t_all
print(json.dumps({"cores": cores, "pages": n_pages, "total": round(total, 3),
                  "stages": T}))
release_all(spark)
spark.stop()
