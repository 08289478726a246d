"""Round 12 batch 4: the normal-scores family (Fligner–Killeen, van
der Waerden, Lilliefors, Ljung–Box) and the cross-engine Φ⁻¹/Φ
rational approximations they ride — semantic invariants beyond the
cross-engine hash gate."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.relational63 import (
    normal_cdf_col,
    probit_col,
)

SF_DIR = "/root/testdata/sf0.001"


def test_probit_matches_published_quantiles(spark):
    """Acklam's approximation evaluated THROUGH Spark must hit the
    classical normal quantiles to 6 decimals (|eps| < 1.15e-9)."""
    cases = [
        (0.5, 0.0),
        (0.975, 1.959964),
        (0.995, 2.575829),
        (0.01, -2.326348),  # lower tail branch
        (0.999, 3.090232),  # upper tail branch
        (0.8, 0.841621),
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "p double")
    got = [r.z for r in df.select(probit_col(F.col("p")).alias("z")).collect()]
    for (p, want), z in zip(cases, got):
        assert abs(z - want) < 5e-6, (p, z, want)


def test_normal_cdf_matches_published_values(spark):
    cases = [(0.0, 0.5), (1.96, 0.975002), (-1.0, 0.158655), (3.0, 0.998650)]
    df = spark.createDataFrame([(x,) for x, _ in cases], "x double")
    got = [
        r.c for r in df.select(normal_cdf_col(F.col("x")).alias("c")).collect()
    ]
    for (x, want), c in zip(cases, got):
        assert abs(c - want) < 1e-6, (x, c, want)


def test_probit_cdf_roundtrip(spark):
    """Φ(Φ⁻¹(p)) ≈ p across both branch boundaries."""
    ps = [0.001, 0.02, 0.0243, 0.5, 0.9, 0.97575, 0.999]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    got = df.select(
        F.col("p"), normal_cdf_col(probit_col(F.col("p"))).alias("r")
    ).collect()
    for row in got:
        assert abs(row.r - row.p) < 2e-6


def test_fligner_killeen_null_vs_planted_scale(spark):
    """Identically-distributed languages ⇒ FK near its χ²₄ mean;
    a planted scale difference must blow it up."""
    out0 = QUERIES["stats_fligner_killeen"](spark, SF_DIR).collect()[0]
    assert out0.k == 5
    assert 0.0 <= out0.fk_statistic < 40.0  # χ²₄ 0.9999-quantile ≈ 23.5 + margin
    rows = []
    for i in range(400):
        rows.append((2 * i, "tight", "s", 1000 + ((i % 21) - 10)))
        rows.append((2 * i + 1, "wide", "s", 1000 + ((i % 21) - 10) * 40))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    ).withColumn("text", F.lit("x"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = QUERIES["stats_fligner_killeen"](spark, td).collect()[0]
    assert out.k == 2
    assert out.fk_statistic > 50.0


def test_van_der_waerden_null_vs_planted_shift(spark):
    out0 = QUERIES["stats_van_der_waerden"](spark, SF_DIR).collect()[0]
    assert out0.k == 5
    assert 0.0 <= out0.vdw_statistic < 40.0
    rows = []
    for i in range(400):
        rows.append((2 * i, "low", "s", 1000 + (i % 40)))
        rows.append((2 * i + 1, "high", "s", 1400 + (i % 40)))  # pure shift
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    ).withColumn("text", F.lit("x"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = QUERIES["stats_van_der_waerden"](spark, td).collect()[0]
    assert out.vdw_statistic > 100.0  # disjoint supports: essentially maximal


def test_lilliefors_uniform_vs_normalish(spark):
    """TPC-H prices are near-uniform ⇒ D well above the normal-fit
    critical band (~0.9/√n); D⁺/D⁻ are bounded components of D."""
    rows = QUERIES["stats_lilliefors"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.d_lilliefors <= 1.0
        assert abs(r.d_lilliefors - max(r.d_plus, r.d_minus)) < 1e-9
        # uniform data against a fitted normal: D ~ 0.06, far above
        # the 1% Lilliefors point ~ 1.03/sqrt(n)
        assert r.d_lilliefors > 1.03 / math.sqrt(r.n)


def test_ljung_box_identities_and_magnitude(spark):
    out = QUERIES["timeseries_ljung_box"](spark, SF_DIR).collect()[0]
    assert out.h == 6
    assert out.q_ljung_box >= 0.0
    # LB's (n+2)/(n-k) weights strictly dominate Box-Pierce's
    assert out.q_ljung_box >= out.q_box_pierce - 1e-9
    # and by no more than the worst-case weight ratio
    n = out.n
    worst = (n + 2) / (n - out.h)
    assert out.q_ljung_box <= out.q_box_pierce * worst + 1e-6
