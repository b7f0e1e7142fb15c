"""Physical-plan assertions: the scale properties must be visible in the
plan, not just hoped for (filters pushed to the scan, dims broadcast,
UDF stages narrow)."""

import pytest
from pyspark.sql import functions as F

from ecokg_spark.contract import q_broadcast_join_agg, q_filter_project, q_multi_join
from ecokg_spark.plans.explain import (
    count_exchanges,
    has_broadcast_join,
    has_pushed_filters,
    physical_plan,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = q_filter_project(spark, SF)
    plan = physical_plan(df)
    assert "PushedFilters" in plan
    # both predicates should be pushed (In + GreaterThan)
    assert "c_acctbal" in plan.split("PushedFilters")[1][:300]


def test_small_dims_broadcast(spark):
    assert has_broadcast_join(q_broadcast_join_agg(spark, SF))
    assert has_broadcast_join(q_multi_join(spark, SF))


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = physical_plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_extract_stage_is_narrow(spark):
    """The pandas-UDF extraction pipeline must contain zero shuffles —
    pages -> text -> sentences -> mention triples is all pipelined."""
    from ecokg_spark.operators.extract import extract_pages
    from ecokg_spark.operators.triples import extract_triples
    from ecokg_spark.sources.pages import synth_pages

    df = extract_triples(extract_pages(synth_pages(spark, 10)))
    assert count_exchanges(df) == 0, physical_plan(df)
