"""Hand-value and invariant tests for relational14 (forward as-of,
runs test, gap islands, l-diversity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational14 import (
    asof_join_next_click_forward,
    dq_id_gap_islands,
    kanon_ldiversity_audit,
    stats_runs_test,
)

SF_DIR = "/root/testdata/sf0.001"

T0 = dt.datetime(2024, 5, 1, 10, 0, 0)


def _ev(eid, minutes, uid, kind):
    return Row(event_id=eid, ts=T0 + dt.timedelta(minutes=minutes), user_id=uid,
               event_type=kind, value=1.0, props="{}")


def test_forward_asof_picks_first_click_after(spark, tmp_path):
    rows = [
        _ev(1, 0, 1, "purchase"),
        _ev(2, 5, 1, "click"),      # first click after -> lag 5 min
        _ev(3, 9, 1, "click"),
        _ev(4, 20, 2, "click"),     # click BEFORE purchase: must not match
        _ev(5, 30, 2, "purchase"),
        _ev(6, 40, 3, "purchase"),  # no click after -> excluded
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r.purchase_id: r.followup_lag_us
        for r in asof_join_next_click_forward(spark, str(tmp_path)).collect()
    }
    assert got == {1: 5 * 60 * 1_000_000}


def test_runs_test_alternating_vs_blocked(spark, tmp_path):
    """Perfectly alternating above/below days -> n_runs == n_obs;
    a blocked series -> exactly 2 runs."""
    def write(tmp, series):
        rows = [
            Row(o_orderkey=i, o_custkey=1, o_orderstatus="F",
                o_totalprice=float(v), o_orderdate=T0 + dt.timedelta(days=i),
                o_orderpriority="1-URGENT")
            for i, v in enumerate(series)
        ]
        spark.createDataFrame(rows).write.parquet(f"{tmp}/orders.parquet")

    # median (value 14) is the LAST day, so its drop preserves alternation
    alt = [1000, 10, 1001, 11, 1002, 12, 1003, 13, 1004, 14]
    (tmp_path / "a").mkdir(exist_ok=True)
    write(tmp_path / "a", alt)
    out = stats_runs_test(spark, str(tmp_path / "a")).collect()[0]
    assert out.n_obs == out.n_runs  # strict alternation
    blocked = [1, 2, 3, 4, 1000, 1001, 1002, 1003]
    (tmp_path / "b").mkdir(exist_ok=True)
    write(tmp_path / "b", blocked)
    out2 = stats_runs_test(spark, str(tmp_path / "b")).collect()[0]
    assert out2.n_runs == 2


def test_gap_islands_hand_sequence(spark, tmp_path):
    # healthy ids 0,1,2, 6,7, 10 ; errors consume 3-5 and 8-9
    rows = []
    for k in [0, 1, 2, 6, 7, 10]:
        rows.append(_ev(k, k, 1, "view"))
    for k in [3, 4, 5, 8, 9]:
        rows.append(_ev(k, k, 1, "error"))
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    got = [(r.gap_start, r.gap_end, r.gap_len)
           for r in dq_id_gap_islands(spark, str(tmp_path)).collect()]
    assert got == [(3, 5, 3), (8, 9, 2)]


def test_ldiversity_flags_homogeneous_group(spark, tmp_path):
    custs = []
    # group (n0, AUTO): 6 members, ALL in the same balance band -> k ok, l fails
    for i in range(6):
        custs.append(Row(c_custkey=i, c_name=f"c{i}", c_nationkey=0,
                         c_acctbal=1500.0 + i, c_mktsegment="AUTO"))
    # group (n0, BIKE): 6 members across 3 bands -> releasable
    for i in range(6):
        custs.append(Row(c_custkey=100 + i, c_name=f"d{i}", c_nationkey=0,
                         c_acctbal=1000.0 * (i % 3) + 1.0, c_mktsegment="BIKE"))
    # group (n0, SHIP): 2 members -> k fails
    custs += [
        Row(c_custkey=200, c_name="e0", c_nationkey=0, c_acctbal=1.0,
            c_mktsegment="SHIP"),
        Row(c_custkey=201, c_name="e1", c_nationkey=0, c_acctbal=9000.0,
            c_mktsegment="SHIP"),
    ]
    nations = [Row(n_nationkey=0, n_name="N0", n_regionkey=0)]
    spark.createDataFrame(custs).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(nations).write.parquet(f"{tmp_path}/nation.parquet")
    got = {r.segment: r for r in kanon_ldiversity_audit(spark, str(tmp_path)).collect()}
    assert got["AUTO"].k_ok and not got["AUTO"].l_ok and not got["AUTO"].releasable
    assert got["BIKE"].releasable
    assert not got["SHIP"].k_ok and not got["SHIP"].releasable
