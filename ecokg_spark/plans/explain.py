"""Plan-inspection helpers: assert the physical plan is the one we want.

Used by tests to enforce scale properties (SURVEY.md §4): filters reach the
parquet scan, small dims broadcast, Python stays out of the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in physical_plan(df) and "PushedFilters: []" not in physical_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges (NOT BroadcastExchange) in the plan.
    Formatted explain prints each operator twice (tree + detail section);
    count only the detail headers '(n) Exchange'."""
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))
