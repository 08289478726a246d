"""Hand-value tests for relational9 (seasonality, late-arriving dims,
backlog sweep line, deletion manifest)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational9 import (
    compliance_delete_manifest,
    dim_late_arriving_unknown,
    timeseries_active_backlog,
)

SF_DIR = "/root/testdata/sf0.001"


def test_backlog_sweep_hand_values(spark, tmp_path):
    # order 1 active Jan1..Jan3, order 2 active Jan2..Jan5:
    # backlog by day: 1:+1=1, 2:+1=2, 3:-1=1, 5:-1=0 → Jan peak 2, min 0
    orders = [
        Row(o_orderkey=1, o_orderdate=datetime.datetime(2024, 1, 1)),
        Row(o_orderkey=2, o_orderdate=datetime.datetime(2024, 1, 2)),
    ]
    lines = [
        Row(l_orderkey=1, l_shipdate=datetime.datetime(2024, 1, 3)),
        Row(l_orderkey=2, l_shipdate=datetime.datetime(2024, 1, 4)),
        Row(l_orderkey=2, l_shipdate=datetime.datetime(2024, 1, 5)),
    ]
    spark.createDataFrame(orders).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(lines).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = timeseries_active_backlog(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].month, out[0].peak_backlog, out[0].min_backlog) == ("2024-01", 2, 0)


def test_unknown_member_absorbs_orphans(spark):
    rows = dim_late_arriving_unknown(spark, SF_DIR).collect()
    unknown = [r for r in rows if r.member == "__UNKNOWN__"]
    assert len(unknown) == 1 and unknown[0].n_orders > 0
    # withheld dimension keys (every 13th customer) all roll into UNKNOWN,
    # so the fact count is preserved overall (spot check: top row is UNKNOWN
    # because it aggregates many customers' orders)
    assert rows[0].member == "__UNKNOWN__"


def test_delete_manifest_transitive_reach(spark):
    out = {r.tbl: r for r in compliance_delete_manifest(spark, SF_DIR).collect()}
    assert set(out) == {"customer", "orders", "lineitem", "events"}
    # one manifest row per doomed customer in the customer table itself
    assert out["customer"].n_rows_to_delete == out["customer"].n_keys
    # facts reach at least as many rows as keys
    for t in ("orders", "lineitem"):
        assert out[t].n_rows_to_delete >= out[t].n_keys
