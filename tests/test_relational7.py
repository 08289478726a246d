"""Hand-value and invariant tests for the relational7 battery
(basket lift, RFM, union-by-name, try_*, equi-width histogram,
NOT IN null semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational7 import (
    basket_pair_lift,
    hist_equiwidth_events,
    rfm_customer_segments,
    scalar_try_arithmetic,
    setops_union_by_name,
    subquery_not_in_null_semantics,
)

SF_DIR = "/root/testdata/sf0.001"


def test_basket_pair_lift_hand_values(spark, tmp_path):
    # o1{1,2} o2{1,2} o3{1,3}: pair (1,2) in 2 baskets survives the
    # min-support cut; lift = 2*3/(3*2) = 1.0, confidence = 2/3.
    rows = [
        Row(l_orderkey=1, l_partkey=1),
        Row(l_orderkey=1, l_partkey=2),
        Row(l_orderkey=2, l_partkey=1),
        Row(l_orderkey=2, l_partkey=2),
        Row(l_orderkey=2, l_partkey=2),  # dup line, must not double-count
        Row(l_orderkey=3, l_partkey=1),
        Row(l_orderkey=3, l_partkey=3),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = basket_pair_lift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pk_a, r.pk_b, r.pair_orders) == (1, 2, 2)
    assert (r.a_orders, r.b_orders) == (3, 2)
    assert r.lift == pytest.approx(1.0)
    assert r.confidence_a_to_b == pytest.approx(2 / 3)


def test_rfm_segment_totals_and_ranges(spark):
    out = rfm_customer_segments(spark, SF_DIR).collect()
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    n_cust = table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in out) == n_cust
    for r in out:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4


def test_union_by_name_fills_missing_column(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    out = setops_union_by_name(spark, SF_DIR)
    p = table(spark, SF_DIR, "part")
    total = p.count()
    with_size = p.where("p_size <= 25").count()
    rows = out.collect()
    assert sum(r.n_rows for r in rows) == total
    # size exists ONLY on the <=25 branch: by-name alignment, NULL fill.
    assert sum(r.n_with_size for r in rows) == with_size


def test_try_arithmetic_null_lanes(spark):
    r = scalar_try_arithmetic(spark, SF_DIR).collect()[0]
    assert r.n_rows > 0
    assert r.n_div_zero_ok == 0  # x/0 is NULL, never an error
    assert r.n_int_parsed == 0  # 'A'/'N'/'R' never parse as int
    assert r.n_ts_parsed == 0  # 'O-F' etc never parse as timestamp
    assert r.n_oob_elem == 0  # index 5 of a 2-array is NULL
    assert r.n_div_ok == r.n_rows  # the healthy lane is full
    # ok_elem is element 2 = 2*l_linenumber, so its sum exceeds n_rows
    assert r.sum_ok_elem > r.n_rows and r.sum_div_floor > 0


def test_hist_equiwidth_partitions_all_rows(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    rows = hist_equiwidth_events(spark, SF_DIR).collect()
    n = (
        table(spark, SF_DIR, "events")
        .where("value IS NOT NULL")
        .count()
    )
    assert sum(r.n_events for r in rows) == n
    for r in rows:
        assert r.hi - r.lo == 20 and r.bucket == r.lo // 20 + 1


def test_not_in_null_trap(spark):
    r = subquery_not_in_null_semantics(spark, SF_DIR).collect()[0]
    assert r.n_nulls > 0  # the trap is armed
    assert r.not_in_count == 0  # NULL in the list voids NOT IN entirely
    assert r.not_exists_count > 0  # NOT EXISTS gives the real complement
    assert r.in_count > 0
