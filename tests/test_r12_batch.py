"""Round 12 batch: two-sample rank battery (Siegel–Tukey, Lepage,
Cucconi), normality (Jarque–Bera, D'Agostino K²), Grubbs, Cochran's Q,
k-sample Anderson–Darling, variance ratio, PACF, Theil's U, Gini
splits, AP correlation, footrule, count_values, Kish deff — semantic
invariants beyond the cross-engine hash gate."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _orders_two_groups(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate string, o_orderstatus string, o_custkey long",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))


def _write_sf(df, td, name="orders"):
    df.write.mode("overwrite").parquet(f"{td}/{name}.parquet")


def test_siegel_tukey_brute_force_parity(spark):
    """The closed-form block-sum must equal an explicit per-position
    Siegel-Tukey weight assignment with midranks over ties."""
    vals1 = [10.00, 10.00, 11.00, 12.00, 15.00, 20.00]   # group 1 (urgent)
    vals2 = [12.00, 13.00, 13.00, 14.00, 16.00]          # group 2 (low)
    rows = [
        (i, "1-URGENT", v, "1996-01-02", "F", 1) for i, v in enumerate(vals1)
    ] + [
        (100 + i, "5-LOW", v, "1996-01-02", "F", 1)
        for i, v in enumerate(vals2)
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_sf(_orders_two_groups(spark, rows), td)
        out = QUERIES["stats_siegel_tukey"](spark, td).collect()[0]

    # brute force: pooled sorted cents, alternating weights, midranks
    pooled = sorted(
        [(int(v * 100), 1) for v in vals1] + [(int(v * 100), 2) for v in vals2]
    )
    n = len(pooled)

    def st_weight(p):  # 1-indexed position
        k = n + 1 - p
        if p < k:  # lower half
            return 2 * p - 1 if p % 2 == 1 else 2 * p
        if k < p:  # upper half
            return 2 * k if k % 2 == 1 else 2 * k - 1
        return n  # exact middle, odd n

    weights = [st_weight(p) for p in range(1, n + 1)]
    # midranks over tie blocks
    by_val: dict[int, list[int]] = {}
    for pos, (v, _g) in enumerate(pooled, start=1):
        by_val.setdefault(v, []).append(pos)
    w_expected = sum(
        sum(weights[p - 1] for p in by_val[v]) / len(by_val[v])
        for (v, g) in pooled
        if g == 1
    )
    assert abs(out.w_st - w_expected) < 1e-3
    assert out.n1 == len(vals1) and out.n2 == len(vals2)


def test_siegel_tukey_detects_planted_scale_difference(spark):
    """Equal-median groups with sd ratio ~20 must push |z| far out; the
    TIGHT sample collects middle (low ST) ranks, so its W is small."""
    rows = []
    for i in range(300):
        tight = 1000.0 + ((i % 21) - 10) * 0.05
        wide = 1000.0 + ((i % 21) - 10) * 40.0
        rows.append((2 * i, "1-URGENT", tight, "1996-01-02", "F", 1))
        rows.append((2 * i + 1, "5-LOW", wide, "1996-01-02", "F", 1))
    with tempfile.TemporaryDirectory() as td:
        _write_sf(_orders_two_groups(spark, rows), td)
        out = QUERIES["stats_siegel_tukey"](spark, td).collect()[0]
    assert out.z_st > 5.0  # tight group holds the HIGH alternating ranks


def test_lepage_separates_location_from_scale(spark):
    """A pure location shift must load Z_W, not Z_AB; L >> chi2_2 1%."""
    rows = []
    for i in range(300):
        a = 1000.0 + ((i % 21) - 10) * 1.0
        b = 1400.0 + ((i % 21) - 10) * 1.0  # same spread, shifted
        rows.append((2 * i, "1-URGENT", a, "1996-01-02", "F", 1))
        rows.append((2 * i + 1, "5-LOW", b, "1996-01-02", "F", 1))
    with tempfile.TemporaryDirectory() as td:
        _write_sf(_orders_two_groups(spark, rows), td)
        out = QUERIES["stats_lepage_test"](spark, td).collect()[0]
    assert abs(out.z_w) > 10.0
    assert abs(out.z_ab) < 3.0
    assert out.lepage_l > 100.0
    assert abs(out.lepage_l - (out.z_w**2 + out.z_ab**2)) < 1e-3


def test_cucconi_nonnegative_and_scale_sensitive(spark):
    out0 = QUERIES["stats_cucconi_test"](spark, SF_DIR).collect()[0]
    assert out0.c_cucconi >= 0.0
    assert -1.0 < out0.rho < 0.0  # closed form is always in (-1, 0)
    rows = []
    for i in range(300):
        tight = 1000.0 + ((i % 21) - 10) * 0.05
        wide = 1000.0 + ((i % 21) - 10) * 40.0
        rows.append((2 * i, "1-URGENT", tight, "1996-01-02", "F", 1))
        rows.append((2 * i + 1, "5-LOW", wide, "1996-01-02", "F", 1))
    with tempfile.TemporaryDirectory() as td:
        _write_sf(_orders_two_groups(spark, rows), td)
        out = QUERIES["stats_cucconi_test"](spark, td).collect()[0]
    assert out.c_cucconi > 20.0  # planted scale difference


def test_jarque_bera_symmetric_flat_distribution(spark):
    rows = QUERIES["stats_jarque_bera"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # uniform-ish price distribution: near-zero skew, platykurtic
        assert abs(r.skewness) < 0.5
        assert -2.0 < r.ex_kurtosis < 0.0
        assert r.jb >= 0.0
        # JB identity re-check from its own reported components
        jb = r.n / 6 * (r.skewness**2 + r.ex_kurtosis**2 / 4)
        assert abs(jb - r.jb) < max(1.0, 0.01 * r.jb)


def test_dagostino_k2_identity_and_signs(spark):
    rows = QUERIES["stats_dagostino_k2"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.k2 - (r.z_skew**2 + r.z_kurt**2)) < 1e-3
        # flat distribution: strongly negative kurtosis z, k2 driven by it
        assert r.z_kurt < 0.0
        assert r.k2 >= r.z_kurt**2 - 1e-9


def test_grubbs_planted_outlier(spark):
    rows = [
        (i, "1-URGENT", 1000.0 + (i % 10), "1996-01-02", "F", 1)
        for i in range(200)
    ]
    rows.append((999, "1-URGENT", 250000.0, "1996-01-02", "F", 1))  # outlier
    with tempfile.TemporaryDirectory() as td:
        _write_sf(_orders_two_groups(spark, rows), td)
        out = QUERIES["stats_grubbs_outlier"](spark, td).collect()
    row = [r for r in out if r.grp == "1-URGENT"][0]
    assert row.g_grubbs > 10.0  # massive studentized deviation
    # max deviation in kilo-dollars ~ (250000 - ~2240) / 1000
    assert 200.0 < row.max_dev_kusd < 260.0
    # G is bounded above by (n-1)/sqrt(n) for any sample
    n = row.n
    assert row.g_grubbs <= (n - 1) / math.sqrt(n) + 1e-6


def test_cochran_q_nonnegative_and_margins(spark):
    out = QUERIES["stats_cochran_q"](spark, SF_DIR).collect()[0]
    assert out.k == 5
    assert out.q_cochran >= 0.0
    assert out.t <= out.k * out.n_users  # T is bounded by the design


def test_ad_ksample_null_magnitude(spark):
    """Under H0 E[A2] = k-1; identically-generated language groups must
    land within a loose multiple, never at the chi2-like extremes."""
    out = QUERIES["stats_ad_ksample"](spark, SF_DIR).collect()[0]
    assert out.k == 5
    assert 0.0 <= out.a2_akn < 5 * (out.k - 1)


def test_variance_ratio_identities(spark):
    out = QUERIES["timeseries_variance_ratio"](spark, SF_DIR).collect()[0]
    assert out.q == 5
    assert out.var_1 > 0.0 and out.var_q >= 0.0
    assert abs(out.vr - out.var_q / out.var_1) < 1e-3
    # z sign follows (vr - 1)
    assert (out.z_vr > 0) == (out.vr > 1.0) or abs(out.vr - 1) < 1e-9


def test_pacf_lag1_equals_acf1_and_bounds(spark):
    rows = QUERIES["timeseries_pacf_durbin_levinson"](spark, SF_DIR).collect()
    assert [r.lag for r in rows] == [1, 2, 3]
    by = {r.lag: r for r in rows}
    assert abs(by[1].acf - by[1].pacf) < 1e-9  # phi_11 = rho_1
    for r in rows:
        assert -1.000001 <= r.acf <= 1.000001
    # Durbin-Levinson phi_22 identity from the reported ACFs
    r1, r2 = by[1].acf, by[2].acf
    assert abs(by[2].pacf - (r2 - r1 * r1) / (1 - r1 * r1)) < 1e-4


def test_theil_u_bounds(spark):
    out = QUERIES["timeseries_theil_u"](spark, SF_DIR).collect()[0]
    assert 0.0 <= out.u1_theil <= 1.0
    assert out.rmse_naive >= 0.0


def test_gini_split_bounds_and_gain_sign(spark):
    rows = QUERIES["ml_gini_feature_split"](spark, SF_DIR).collect()
    assert {r.feature for r in rows} == {"priority", "year", "month"}
    for r in rows:
        assert 0.0 <= r.gini_split <= 0.5  # binary Gini is bounded by 1/2
        assert r.gini_gain >= -1e-9  # splitting never increases impurity
    by = {r.feature: r for r in rows}
    assert by["priority"].n_values == 5
    assert by["month"].n_values == 12
    # order year nearly determines fulfilled status -> dominant gain
    assert by["year"].gini_gain > by["priority"].gini_gain


def test_ap_correlation_bounds_and_footrule_sandwich(spark):
    ap = QUERIES["eval_ap_correlation"](spark, SF_DIR).collect()[0]
    fr = QUERIES["eval_spearman_footrule"](spark, SF_DIR).collect()[0]
    assert ap.n == fr.n
    assert -1.000001 <= ap.tau_ap <= 1.000001
    assert 0.0 <= fr.footrule_similarity <= 1.0
    # rankings of revenue vs order count are strongly concordant
    assert ap.tau_ap > 0.3
    assert fr.footrule <= fr.n * fr.n // 2


def test_count_values_census_totals(spark):
    df = QUERIES["promql_count_values"](spark, SF_DIR)
    total = df.agg(F.sum("n")).collect()[0][0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = ev.filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    ).count()
    assert total == expected


def test_kish_deff_bounds(spark):
    out = QUERIES["sample_kish_deff"](spark, SF_DIR).collect()[0]
    assert out.deff_kish >= 1.0 - 1e-6  # deff >= 1 by Cauchy-Schwarz
    assert out.n_effective <= out.n + 1e-6
    assert abs(out.n_effective * out.deff_kish - out.n) < 0.01 * out.n
