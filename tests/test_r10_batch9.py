"""Round 10 batch 9: Granger causality, technical indicators, Page's
trend, PromQL vector matching, Fleiss kappa, Cronbach alpha, Brier
decomposition — semantic invariants beyond the hash gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_granger_planted_causal_fixture(spark):
    rows = QUERIES["stats_granger_causality"](spark, SF_DIR).collect()
    assert {r.direction for r in rows} == {"x->y", "y->x"}
    assert all(r.f_stat is not None for r in rows)
    # planted fixture: purchase value at hour t+1 = click value at hour t
    # (strong x->y), clicks evolve independently -> F(x->y) >> F(y->x)
    ev = []
    eid = 0
    for h in range(200):
        x_val = 10.0 + (h * 37 % 50)
        ev.append((eid, "2024-01-%02d %02d:10:00" % (1 + h // 24, h % 24),
                   1, "click", x_val, None))
        eid += 1
        prev_x = 10.0 + ((h - 1) * 37 % 50) if h > 0 else 10.0
        # noisy copy of the lagged click signal (a perfect fit would make
        # rss_u = 0 and F NULL by the div-by-zero guard)
        ev.append((eid, "2024-01-%02d %02d:20:00" % (1 + h // 24, h % 24),
                   1, "purchase", prev_x + 1.0 + (h % 5) * 0.5, None))
        eid += 1
    df = spark.createDataFrame(
        ev,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = {r.direction: r for r in
               QUERIES["stats_granger_causality"](spark, td).collect()}
    assert out["x->y"].f_stat is not None
    yx = out["y->x"].f_stat if out["y->x"].f_stat is not None else 0.0
    assert out["x->y"].f_stat > 10 * max(yx, 1.0)


def test_technical_indicators_band_order(spark):
    rows = QUERIES["timeseries_technical_indicators"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bb_lower <= r.ma20 <= r.bb_upper
        if r.rsi14 is not None:
            assert 0.0 <= r.rsi14 <= 100.0


def test_page_trend_null_range(spark):
    r = QUERIES["stats_page_trend"](spark, SF_DIR).collect()[0]
    # random priority/revenue assignment -> |z| modest; L in valid range:
    # per block L contribution in [k(k+1)/2 .. sum j*rank max]
    assert r.n_blocks > 0
    assert 35 * r.n_blocks <= r.l_stat <= 55 * r.n_blocks
    assert abs(r.z_page) < 6.0


def test_vector_matching_shares_sum_to_one(spark):
    rows = QUERIES["promql_vector_matching"](spark, SF_DIR).collect()
    by_type: dict[str, float] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.share
        assert r.above_bool in (0, 1)
        assert (r.share > 0.3) == (r.above_bool == 1)
    assert all(abs(s - 1.0) < 1e-4 for s in by_type.values())


def test_fleiss_vs_krippendorff_agree(spark):
    fk = QUERIES["eval_fleiss_kappa"](spark, SF_DIR).collect()[0]
    ka = QUERIES["eval_krippendorff_alpha"](spark, SF_DIR).collect()[0]
    # same construct, different chance conventions -> close, both high
    assert 0.3 < fk.kappa < 1.0
    assert abs(fk.kappa - ka.alpha) < 0.1
    assert 0.0 < fk.p_exp < 1.0 and fk.p_obs > fk.p_exp


def test_cronbach_planted_correlated_battery(spark):
    r = QUERIES["stats_cronbach_alpha"](spark, SF_DIR).collect()[0]
    # TPC-H columns are near-independent -> alpha near 0 (can be < 0)
    assert r.alpha < 0.5
    # planted: four items all equal to quantity (+tiny offsets) -> alpha ~ 1
    # all four items proportional to quantity -> a perfect 4-item scale
    li = [(1, i, 1, 1, float(10 + i % 7), 1000.0 * (10 + i % 7),
           (10 + i % 7) / 100.0, (10 + i % 7) / 100.0,
           "N", "O", "1995-01-01") for i in range(400)]
    df = spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("date"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/lineitem.parquet")
        out = QUERIES["stats_cronbach_alpha"](spark, td).collect()[0]
    # four identical-up-to-scale items -> alpha = (4/3)(1 - 4A/16A) = 1
    assert out.alpha > 0.99


def test_brier_murphy_identity(spark):
    r = QUERIES["eval_brier_decomposition"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r.o_bar <= 1.0
    assert abs(r.unc - r.o_bar * (1 - r.o_bar)) < 1e-6
    assert r.reliability >= 0.0 and r.resolution >= 0.0
    # Murphy's 3-term form is exact for discrete forecasts; with raw
    # within-bin scores the residual = within-bin variance - 2x within-bin
    # score/outcome covariance — small either sign, bounded by binning
    wbv = r.brier_raw - (r.reliability - r.resolution + r.unc)
    assert abs(wbv) < 0.02
    assert 0.0 <= r.brier_raw <= 1.0
