"""Round 10 batch 7: Durbin-Watson, Cramér-von Mises, PromQL
irate/idelta + subqueries, ridge, lexical richness, burstiness, BLEU-2,
Krippendorff alpha — semantic invariants beyond the hash gate."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_durbin_watson_range_and_ar1_fixture(spark):
    rows = QUERIES["stats_durbin_watson"](spark, SF_DIR).collect()
    assert rows and all(0.0 <= r.dw_stat <= 4.0 for r in rows)
    # rho = 1 - dw/2 identity holds on the emitted (rounded) values
    for r in rows:
        assert abs(r.rho_lag1 - (1.0 - r.dw_stat / 2.0)) < 2e-6
    # a strongly positively autocorrelated fixture must push dw << 2:
    # y alternating slow sine ramp -> residuals trend together
    data = [
        ("1-URGENT", 100 + i, "1992-%02d-%02d" % (1 + i // 28, 1 + i % 28),
         1000.0 + 500.0 * math.sin(i / 20.0))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        [(k, d, p) for k, _i, d, p in data],
        "o_orderpriority string, o_orderdate string, o_totalprice double",
    ).select(
        F.monotonically_increasing_id().alias("o_orderkey"),
        F.lit(1).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/orders.parquet")
        out = QUERIES["stats_durbin_watson"](spark, td).collect()
    assert len(out) == 1 and out[0].dw_stat < 1.0  # sine-walk residuals


def test_cvm_zero_on_identical_samples(spark):
    r = QUERIES["stats_cramer_von_mises"](spark, SF_DIR).collect()[0]
    assert r.t_cvm >= 0.0 and r.n > 0 and r.m > 0
    # identical click/view distributions -> U = 0 exactly
    rows = [(i, "2024-01-01 00:%02d:%02d" % (i // 60, i % 60), 1,
             "click" if i % 2 == 0 else "view", float(i // 2 % 7), None)
            for i in range(200)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = QUERIES["stats_cramer_von_mises"](spark, td).collect()[0]
    assert out.u_scaled == 0.0 and out.t_cvm == 0.0


def test_irate_reset_rule(spark):
    df = QUERIES["promql_irate_idelta"](spark, SF_DIR)
    rows = df.collect()
    assert rows and all(r.n_win >= 2 for r in rows)
    # irate is never negative (reset rule), idelta can be
    assert all(r.irate_cents_per_s is None or r.irate_cents_per_s >= 0.0 for r in rows)
    assert any(r.idelta_cents < 0 for r in rows) or any(
        r.idelta_cents >= 0 for r in rows
    )


def test_subquery_inner_points_bounded(spark):
    rows = QUERIES["promql_subquery_maxrate"](spark, SF_DIR).collect()
    # a 2h range at 30m resolution holds at most 4 inner points
    assert rows and all(1 <= r.n_inner <= 4 for r in rows)
    assert all(r.max_rate_cents_per_s >= r.avg_rate_cents_per_s - 1e-9 for r in rows)
    assert all(r.eval_epoch_s % 21600 == 0 for r in rows)


def test_ridge_shrinks_toward_zero(spark):
    rows = {r.lam: r for r in QUERIES["ml_ridge_cramer"](spark, SF_DIR).collect()}
    assert set(rows) == {0.0, 1.0, 10.0, 100.0}
    # monotone shrinkage of the coefficient NORM along the lambda ladder
    norms = [
        rows[lam].beta_qty_cents ** 2 + rows[lam].beta_disc_cents ** 2
        for lam in (0.0, 1.0, 10.0, 100.0)
    ]
    assert all(a >= b - 1e-9 for a, b in zip(norms, norms[1:]))


def test_lexical_richness_identities(spark):
    rows = QUERIES["text_lexical_richness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.simpson_d <= 1.0
        assert 0.0 <= r.sichel_s <= 1.0
        assert r.yule_k >= 0.0
        assert r.vocab <= r.n_tokens


def test_burstiness_poisson_floor(spark):
    rows = QUERIES["text_term_burstiness"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    # VMR of a count variable is >= 1 - mean (lower bound when var>=0);
    # all must be finite and adaptation within [0,1]
    for r in rows:
        assert r.vmr >= 0.0 and 0.0 <= r.adaptation <= 1.0
        assert r.df >= rows[-1].df  # df-descending selection order


def test_bleu_self_pair_is_one(spark):
    # candidate == reference -> p1 = p2 = 1, len_ratio = 1
    docs = [
        (0, "a b c d e f", "en", "s", 11),
        (1, "a b c d e f", "en", "s", 11),
        (2, "x y z w", "de", "s", 7),
        (3, "q r s t", "de", "s", 7),  # zero overlap pair
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = {r.lang: r for r in QUERIES["eval_bleu_pairs"](spark, td).collect()}
    assert abs(out["en"].avg_bleu2_nobp - 1.0) < 1e-9
    assert abs(out["en"].avg_len_ratio - 1.0) < 1e-9
    assert out["de"].avg_bleu2_nobp == 0.0


def test_krippendorff_alpha_perfect_and_noised(spark):
    r = QUERIES["eval_krippendorff_alpha"](spark, SF_DIR).collect()[0]
    # raters are 10-14% noised copies -> strong but imperfect agreement
    assert 0.3 < r.alpha < 1.0
    assert r.n_ratings > 2 * r.n_items  # rater c present for ~80%
    assert r.agree2 > r.off2
