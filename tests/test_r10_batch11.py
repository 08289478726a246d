"""Round 10 batch 11: weighted kappa, histogram moments, DeLong CI,
Brunner-Munzel — semantic invariants beyond the hash gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_kappa_orders(spark):
    r = QUERIES["eval_weighted_kappa"](spark, SF_DIR).collect()[0]
    # ~10% uniform-cyclic noise on 3 ordinal classes: strong agreement
    assert 0.5 < r.kappa_linear < 1.0
    assert 0.5 < r.kappa_quadratic < 1.0
    assert r.agree > 0.8 * r.n


def test_histogram_moments_sane(spark):
    rows = QUERIES["promql_histogram_moments"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 5.0 <= r.mean_est <= 500.0
        assert r.stddev_est >= 0.0
        assert r.n > 0


def test_delong_ci_contains_auc(spark):
    r = QUERIES["ml_auc_delong_ci"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r.auc <= 1.0
    assert r.se_auc > 0.0
    assert r.ci_lo <= r.auc <= r.ci_hi
    assert abs((r.auc - r.ci_lo) - 1.96 * r.se_auc) < 1e-6


def test_brunner_munzel_matches_mwu_effect(spark):
    bm = QUERIES["stats_brunner_munzel"](spark, SF_DIR).collect()[0]
    # p_hat is the SAME relative effect P(X<Y)+0.5P(X=Y) Mann-Whitney's
    # AUC reports — different variance model, identical point estimate.
    # Recompute the MWU effect from the same two samples directly:
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    e = table(spark, SF_DIR, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    )
    s = e.groupBy(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v")
    ).agg(
        F.count_if(F.col("event_type") == "click").cast("bigint").alias("a"),
        F.count_if(F.col("event_type") == "view").cast("bigint").alias("b"),
    )
    rows = sorted(s.collect(), key=lambda r: r.v)
    cum_a = 0
    num = 0.0
    for r in rows:
        num += r.b * (cum_a + 0.5 * r.a)
        cum_a += r.a
    n1 = sum(r.a for r in rows)
    n2 = sum(r.b for r in rows)
    assert abs(bm.p_hat - num / (n1 * n2)) < 1e-6
    assert bm.n1 == n1 and bm.n2 == n2
    # near-identical samples -> |W| modest
    assert bm.w_bm is None or abs(bm.w_bm) < 10.0


def test_brunner_munzel_planted_shift(spark):
    # view values shifted far above click values -> p_hat ~ 1, W large
    rows = [(i, "2024-01-01 00:%02d:%02d" % (i // 60, i % 60), 1,
             "click" if i % 2 == 0 else "view",
             float(i % 13) if i % 2 == 0 else 100.0 + (i % 7), None)
            for i in range(400)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = QUERIES["stats_brunner_munzel"](spark, td).collect()[0]
    assert out.p_hat == 1.0  # complete separation
    # complete separation makes the BM variance 0 -> W NULL by the guard
    assert out.w_bm is None
