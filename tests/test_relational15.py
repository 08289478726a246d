"""Hand-value and invariant tests for relational15 (W-pattern,
Mann–Whitney, ANOVA, LSH band tuning)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational15 import (
    dedup_lsh_band_tuning,
    pattern_w_double_bottom,
    stats_anova_dow,
    stats_mann_whitney_u,
)

SF_DIR = "/root/testdata/sf0.001"


def _order(okey, day_offset, price, prio="1-URGENT"):
    return Row(o_orderkey=okey, o_custkey=1, o_orderstatus="F",
               o_totalprice=float(price),
               o_orderdate=dt.datetime(2024, 1, 1) + dt.timedelta(days=day_offset),
               o_orderpriority=prio)


def test_w_pattern_hand_series(spark, tmp_path):
    # days: 100, 40, 70, 30, 110  -> perfect W centered on day 2
    series = [100, 40, 70, 30, 110]
    rows = [_order(i, i, v) for i, v in enumerate(series)]
    # a monotone series for another priority: no W
    rows += [_order(10 + i, i, 50 + i, prio="2-HIGH") for i in range(5)]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = pattern_w_double_bottom(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.priority == "1-URGENT" and r.rev_center == 70.0
    assert r.w_depth == (100 + 110) - (40 + 30)


def test_mann_whitney_matches_scipy_formula(spark):
    """U statistic equals the direct pairwise count (ties count half)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    en = [d.n_chars for d in docs if d.lang == "en"]
    de = [d.n_chars for d in docs if d.lang == "de"]
    u1_direct = sum(
        1.0 if a > b else (0.5 if a == b else 0.0) for a in en for b in de
    )
    out = stats_mann_whitney_u(spark, SF_DIR).collect()[0]
    assert out.n1 == len(en) and out.n2 == len(de)
    assert out.u1_x2 == int(2 * u1_direct)
    assert out.u1_x2 + out.u2_x2 == 2 * len(en) * len(de)


def test_anova_matches_numpy(spark):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT isodow(o_orderdate) AS dow,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS x
            FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    groups: dict[int, list] = {}
    for dow, x in rows:
        groups.setdefault(dow, []).append(x)
    all_x = np.array([x for _, x in rows], dtype=np.float64)
    grand = all_x.mean()
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups.values())
    ssw = sum(((np.array(g, dtype=np.float64) - np.mean(g)) ** 2).sum()
              for g in groups.values())
    k, n = len(groups), len(all_x)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    out = stats_anova_dow(spark, SF_DIR).collect()[0]
    assert out.n_obs == n and out.n_groups == k
    assert abs(out.f_stat - f) < 1e-4
    assert abs(out.ss_between_dsq - ssb / 1e4) < 1.0
    assert abs(out.ss_within_dsq - ssw / 1e4) < 1.0


def test_band_tuning_monotone_in_rows_per_band(spark):
    """Fewer rows per band (more, narrower bands) can only ADD candidate
    pairs for a fixed signature: an 8-row match implies a 4-row match."""
    out = {r.rows_per_band: r for r in dedup_lsh_band_tuning(spark, SF_DIR).collect()}
    assert set(out) == {2, 4, 8}
    assert (
        out[2].n_candidate_pairs
        >= out[4].n_candidate_pairs
        >= out[8].n_candidate_pairs
    )
    for r in out.values():
        assert r.max_bucket >= 1 and r.n_colliding_buckets >= 0
