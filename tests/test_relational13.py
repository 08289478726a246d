"""Hand-value and invariant tests for relational13 (Theil–Sen, Kendall
tau, chi-square independence, Zipf ranks)."""

from __future__ import annotations

import datetime as dt
import itertools

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational13 import (
    stats_chi2_independence,
    stats_kendall_tau,
    stats_theil_sen_trend,
    text_zipf_topranks,
)

SF_DIR = "/root/testdata/sf0.001"


def test_theil_sen_immune_to_one_outlier_month(spark, tmp_path):
    """A clean linear trend with ONE wild month: Theil–Sen recovers the
    true slope; the outlier would wreck OLS."""
    rows = []
    okey = 0
    for m in range(12):
        # revenue 1000 + 100*m dollars, as one order; month 6 is garbage
        rev = 99999.0 if m == 6 else 1000.0 + 100.0 * m
        rows.append(
            Row(
                o_orderkey=okey,
                o_custkey=1,
                o_orderstatus="F",
                o_totalprice=rev,
                o_orderdate=dt.datetime(2024, 1 + m % 12, 5)
                if m < 12
                else None,
                o_orderpriority="1-URGENT",
            )
        )
        okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_theil_sen_trend(spark, str(tmp_path)).collect()[0]
    assert out.n_months == 12
    assert out.n_pairs == 66
    assert abs(out.theil_sen_slope - 100.0) < 1e-6


def test_kendall_tau_perfect_and_inverted(spark, tmp_path):
    """Purchases proportional to views -> tau 1; anti-proportional -> -1."""
    rows, eid = [], 0
    base = dt.datetime(2024, 2, 1)
    views = [1, 2, 3, 4, 5, 6]
    for day, nv in enumerate(views):
        for _ in range(nv):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=day),
                            user_id=1, event_type="view", value=1.0, props="{}"))
            eid += 1
        for _ in range(nv * 2):  # perfectly concordant
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=day),
                            user_id=1, event_type="purchase", value=1.0,
                            props="{}"))
            eid += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = stats_kendall_tau(spark, str(tmp_path)).collect()[0]
    assert out.n_days == 6 and out.n_pairs == 15
    assert out.concordant == 15 and out.discordant == 0 and out.tau_a == 1.0


def test_chi2_zero_under_exact_independence(spark, tmp_path):
    """A perfectly independent 2x2 table has chi2_term == 0 everywhere."""
    rows, okey = [], 0
    for pr, st, n in [("A", "F", 10), ("A", "O", 30), ("B", "F", 20), ("B", "O", 60)]:
        for _ in range(n):
            rows.append(
                Row(o_orderkey=okey, o_custkey=1, o_orderstatus=st,
                    o_totalprice=10.0, o_orderdate=dt.datetime(2024, 1, 1),
                    o_orderpriority=pr)
            )
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_chi2_independence(spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r.chi2_term == 0.0
        assert r.expected == float(r.n)


def test_zipf_ranks_consistent(spark):
    rows = text_zipf_topranks(spark, SF_DIR).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.f for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # cumulative share strictly increases and stays <= 1
    cums = [r.cum_share for r in rows]
    assert all(a < b for a, b in zip(cums, cums[1:]))
    assert cums[-1] <= 1.0
    for a, b in itertools.pairwise(rows):
        assert a.ratio_to_next >= 1.0  # f(rank) >= f(rank+1)
