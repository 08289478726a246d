"""Round 8 batch 11: OLS via Cramer, Welch t, Bradley-Terry."""

from __future__ import annotations

import math

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_ols_cramer_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    r = QUERIES["ml_ols_cramer"](spark, SF_DIR).collect()[0]
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("y"),
            F.hour("ts").alias("x1"),
            F.weekday("ts").alias("x2"),
        )
        .collect()
    )
    X = np.array([[1.0, e.x1, e.x2] for e in ev])
    y = np.array([float(e.y) for e in ev])
    beta, res, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert r.n_obs == len(ev)
    assert math.isclose(r.beta_intercept, beta[0], rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(r.beta_hour, beta[1], rel_tol=1e-4, abs_tol=1e-3)
    assert math.isclose(r.beta_weekday, beta[2], rel_tol=1e-4, abs_tol=1e-3)
    sse = float(((X @ beta - y) ** 2).sum())
    sst = float(((y - y.mean()) ** 2).sum())
    assert math.isclose(r.r_squared, 1 - sse / sst, abs_tol=1e-4)


def test_welch_t_matches_direct_formula(spark):
    import statistics

    from pyspark.sql import functions as F

    r = QUERIES["stats_ttest_welch"](spark, SF_DIR).collect()[0]
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2 == 1).alias("t"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).alias("c"),
        )
        .collect()
    )
    g1 = [float(e.c) for e in ev if e.t]
    g2 = [float(e.c) for e in ev if not e.t]
    v1 = statistics.variance(g1) / len(g1)
    v2 = statistics.variance(g2) / len(g2)
    t = (statistics.mean(g1) - statistics.mean(g2)) / math.sqrt(v1 + v2)
    df = (v1 + v2) ** 2 / (v1**2 / (len(g1) - 1) + v2**2 / (len(g2) - 1))
    assert (r.n_treated, r.n_control) == (len(g1), len(g2))
    assert math.isclose(r.t_stat, t, rel_tol=1e-4, abs_tol=1e-5)
    assert math.isclose(r.welch_df, df, rel_tol=1e-3)


def test_bradley_terry_orders_by_strength(spark):
    rows = QUERIES["eval_pairwise_bradley_terry"](spark, SF_DIR).collect()
    assert rows and len(rows) <= 20
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    qs = [r.strength_q for r in rows]
    assert qs == sorted(qs, reverse=True)
    assert all(0 <= r.wins <= r.games for r in rows)
    # MM preserves total wins: an all-zero-wins player pins strength 0
    for r in rows:
        if r.wins == 0:
            assert r.strength_q == 0
    # the top- and bottom-ranked players' win RATES should agree in
    # direction with their strengths (BT's whole point)
    top, bot = rows[0], rows[-1]
    assert top.wins / top.games >= bot.wins / bot.games
