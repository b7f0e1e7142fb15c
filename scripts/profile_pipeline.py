"""Per-stage wall-clock profile of the KG pipeline (bench feedback loop).

Usage: python scripts/profile_pipeline.py [n_pages] [cpus]
Times each stage boundary separately so scaling bottlenecks are visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

from ecokg_spark.session import get_spark

spark = get_spark(app_name="profile", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from ecokg_spark.operators.components import canonical_map
from ecokg_spark.operators.extract import extract_pages, text_audit
from ecokg_spark.operators.linking import (
    alias_identity_edges, build_termlist, link_mentions,
)
from ecokg_spark.pipeline import build_kg, link_triples
from ecokg_spark.operators.triples import extract_triples
from ecokg_spark.sources.pages import alias_table, synth_pages

T: dict[str, float] = {}


def clock(name):
    def deco(fn):
        t0 = time.time()
        out = fn()
        T[name] = round(time.time() - t0, 3)
        print(f"{name:30s} {T[name]:8.3f}s", flush=True)
        return out
    return deco


pages = synth_pages(spark, n_pages).localCheckpoint(eager=True)
t_all0 = time.time()

termlist = clock("termlist")(lambda: build_termlist(alias_table(spark)).localCheckpoint(eager=True))
extracted = clock("extract+materialize")(lambda: extract_pages(pages).localCheckpoint(eager=True))
clock("audit_count")(lambda: text_audit(extracted).count())
triples = clock("triples+materialize")(lambda: extract_triples(extracted).localCheckpoint(eager=True))
linked = clock("link+materialize")(lambda: link_triples(triples, termlist)[0].localCheckpoint(eager=True))
canon = clock("canonicalize")(lambda: canonical_map(
    alias_identity_edges(termlist), termlist.select(F.col("curie").alias("node"))
).localCheckpoint(eager=True))

out = clock("build_kg(full, fresh)")(lambda: build_kg(spark, pages))
clock("edges_count")(lambda: out["edges"].count())
clock("audit_count2")(lambda: out["audit"].count())

total = time.time() - t_all0
print(f"{'TOTAL':30s} {total:8.3f}s   ({n_pages / (T['build_kg(full, fresh)'] + T['edges_count'] + T['audit_count2']):.1f} pages/s full)")
spark.stop()
