"""Physical-plan assertions backing SCALE.md's claims: dimension joins
broadcast, filters reach the parquet scan, projections prune the read
schema. These are the properties that decide 100 TB behavior; asserting
them in CI keeps a refactor from silently de-optimizing a plan that still
returns correct rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_dimensions_broadcast(spark):
    """region/nation/customer/supplier never shuffle the fact table —
    every dim join in the 6-table Q5 plan is a broadcast join."""
    plan = _final_plan(QUERIES["q5_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing fell back to a fact shuffle


def test_filter_pushdown_and_column_pruning(spark):
    li = (
        table(spark, SF, "lineitem")
        .filter(F.col("l_shipdate") >= "1995-01-01")
        .select("l_orderkey", "l_extendedprice")
    )
    plan = _final_plan(li)
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # predicate reached the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in scan
    # read schema carries ONLY the 3 referenced columns of lineitem's 16
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_shipdate:timestamp_ntz>" in scan
    assert "l_comment" not in scan


def test_topk_window_uses_group_limit(spark):
    """Top-K per group runs below the shuffle (WindowGroupLimit), so only
    K rows per group per mapper move."""
    plan = _final_plan(QUERIES["window_topk_orders_per_segment"](spark, SF))
    assert "WindowGroupLimit" in plan
