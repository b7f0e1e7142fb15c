"""Checkpoint/resume: stage materialization, lineage metrics, anti-join
mid-stage resume."""

import pytest
from pyspark.sql import functions as F

from ecokg_spark.io import TableIO
from ecokg_spark.operators.checkpoint import StageRunner, partition_metrics


@pytest.fixture()
def io(spark, tmp_path):
    return TableIO(spark, warehouse=str(tmp_path / "wh"))


def test_stage_runs_once_and_resumes(spark, io):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        return spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("x"))

    r = StageRunner(io, run_id="t1", resume=True)
    out1 = r.run("stage_a", fn)
    assert out1.count() == 100 and calls["n"] == 1
    # second runner (fresh process semantics): resume reads, does not recompute
    r2 = StageRunner(io, run_id="t2", resume=True)
    out2 = r2.run("stage_a", fn)
    assert out2.count() == 100 and calls["n"] == 1
    # resume=False forces recompute
    r3 = StageRunner(io, run_id="t3", resume=False)
    r3.run("stage_a", fn)
    assert calls["n"] == 2


def test_lineage_metrics_written(spark, io):
    r = StageRunner(io, run_id="t1", resume=False)
    r.run("stage_m", lambda: spark.range(1000).select(F.col("id").alias("k")))
    m = io.read("kg._checkpoints.stage_m")
    rows = m.collect()
    assert {c for c in m.columns} >= {"stage", "run_id", "partition_id", "row_count",
                                      "key_fingerprint", "latency_s"}
    assert sum(x["row_count"] for x in rows) == 1000


def test_anti_join_remaining(spark, io):
    r = StageRunner(io, run_id="t1", resume=True)
    inputs = spark.range(10).select(F.col("id").alias("k"))
    # nothing done yet -> everything remains
    assert r.anti_join_remaining(inputs, "stage_x", "k").count() == 10
    # half done -> only the other half remains
    io.write(spark.range(5).select(F.col("id").alias("k")), "kg.stage_x")
    rem = {x["k"] for x in r.anti_join_remaining(inputs, "stage_x", "k").collect()}
    assert rem == {5, 6, 7, 8, 9}
