"""Durable spark-submit job: stage tables, lineage metrics, resume."""

import shutil

from pyspark.sql import functions as F

from ecokg_spark.io import TableIO
from ecokg_spark.job import run_kg_job
from ecokg_spark.pipeline import build_kg
from ecokg_spark.sources.pages import synth_pages

N = 200


def test_job_runs_resumes_and_matches_pipeline(spark, tmp_path):
    wh = str(tmp_path / "wh")
    pages = synth_pages(spark, N).localCheckpoint(eager=True)
    io = TableIO(spark, warehouse=wh)

    r1 = run_kg_job(spark, pages, io, run_id="t1")
    assert set(r1.timings) >= {"termlist", "fused", "audit", "triples",
                               "linked_raw", "quarantine", "canonical",
                               "edges", "nodes"}
    edges = io.read("kg.edges")
    n_edges = edges.count()
    assert n_edges > 0
    # stage outputs match the in-memory pipeline exactly
    mem = build_kg(spark, pages)
    assert edges.select("subject", "predicate", "object").exceptAll(
        mem["edges"].select("subject", "predicate", "object")).count() == 0
    assert mem["edges"].count() == n_edges

    # lineage metrics exist per stage partition
    m = io.read("kg._checkpoints.edges")
    assert m.where(F.col("stage") == "edges").count() >= 1
    assert {"partition_id", "row_count", "key_fingerprint", "latency_s"} <= set(m.columns)

    # full resume: nothing recomputes
    r2 = run_kg_job(spark, pages, io, run_id="t2")
    assert r2.timings == {}

    # partial resume: drop the edges stage -> only downstream recomputes
    shutil.rmtree(f"{wh}/kg/edges")
    shutil.rmtree(f"{wh}/kg/_done/edges")
    r3 = run_kg_job(spark, pages, io, run_id="t3")
    assert "edges" in r3.timings
    assert "fused" not in r3.timings and "linked_raw" not in r3.timings
    assert io.read("kg.edges").count() == n_edges


def test_tableio_merge_into_upsert_and_insert_only(spark, tmp_path):
    """merge_into (io.py): parquet-fallback MERGE semantics — matched rows
    replaced (update) or kept (ignore), unmatched inserted, replays
    idempotent. The Iceberg branch runs the same contract via MERGE INTO
    when a catalog is configured (none in this sandbox)."""
    io = TableIO(spark, warehouse=str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    io.write(base, "kg.t", mode="overwrite")

    src = spark.createDataFrame([("b", 20), ("d", 40)], "k string, v int")
    io.merge_into(src, "kg.t", keys=["k"])  # update mode
    got = {(r.k, r.v) for r in io.read("kg.t").collect()}
    assert got == {("a", 1), ("b", 20), ("c", 3), ("d", 40)}

    # replay the same merge: idempotent (same final relation)
    io.merge_into(src, "kg.t", keys=["k"])
    assert {(r.k, r.v) for r in io.read("kg.t").collect()} == got

    # insert-only: matched key keeps its current value, new key lands
    src2 = spark.createDataFrame([("b", 99), ("e", 50)], "k string, v int")
    io.merge_into(src2, "kg.t", keys=["k"], when_matched="ignore")
    got2 = {(r.k, r.v) for r in io.read("kg.t").collect()}
    assert got2 == got | {("e", 50)}

    # first merge into a missing table creates it
    io.merge_into(src, "kg.fresh", keys=["k"])
    assert {(r.k, r.v) for r in io.read("kg.fresh").collect()} == {
        ("b", 20), ("d", 40)}
