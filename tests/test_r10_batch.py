"""Round 10 batch: semantic invariants beyond the hash gate for the ten
new operators (relational45 + llmdata29)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def test_assortativity_is_correlation(spark):
    r = QUERIES["graph_degree_assortativity"](spark, SF_DIR).collect()[0]
    assert r.m_edges > 0 and -1.0 <= r.assortativity <= 1.0


def test_nelson_aalen_monotone_and_dominates(spark):
    rows = QUERIES["stats_nelson_aalen"](spark, SF_DIR).collect()
    assert rows
    prev_h, prev_n = -1.0, 1 << 62
    for r in rows:
        assert r.na_hazard >= prev_h  # cumulative hazard never decreases
        assert r.n_risk <= prev_n  # risk set shrinks over time
        assert r.na_variance <= r.na_hazard + 1e-9  # d/n^2 <= d/n
        prev_h, prev_n = r.na_hazard, r.n_risk


def test_isotonic_matches_pava(spark):
    rows = QUERIES["stats_isotonic_monthly"](spark, SF_DIR).collect()
    fit = [r.iso_fit for r in rows]
    assert all(fit[i] <= fit[i + 1] + 1e-9 for i in range(len(fit) - 1))
    # PAVA reference on the same series
    y = [r.revenue_cents for r in rows]
    blocks: list[list[float]] = []
    for v in y:
        blocks.append([float(v), 1.0])
        while len(blocks) > 1 and blocks[-2][0] > blocks[-1][0]:
            v2, w2 = blocks.pop()
            v1, w1 = blocks.pop()
            blocks.append([(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2])
    pava: list[float] = []
    for v, w in blocks:
        pava += [v] * int(w)
    import math

    for got, want in zip(fit, pava):
        assert abs(got - math.floor(want / 100 * 1e6 + 0.5) / 1e6) < 1e-9


def test_conformal_coverage_near_nominal(spark):
    r = QUERIES["ml_conformal_interval"](spark, SF_DIR).collect()[0]
    assert r.q_cents > 0 and r.n_cal > 0 and r.n_test > 0
    # finite-sample conformal guarantee: coverage >= 0.9 in expectation;
    # allow sampling slack on the small fixture
    assert r.coverage >= 0.85, r


def test_business_days_bounded_by_calendar(spark):
    rows = QUERIES["date_business_day_sla"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.avg_business_days <= r.max_business_days
        # 5 weekdays per 7 calendar days
        assert r.avg_business_days <= 130  # ship lag <= ~180 calendar days


def test_increase_extrapolation_factor(spark):
    rows = QUERIES["promql_increase_extrapolated"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_samples >= 2
        # extrapolateToInterval >= sampledInterval, so the extrapolated
        # increase can only grow the raw in-range increase
        assert r.increase_extrapolated >= r.increase_cents / 100 - 1e-9


def test_kneser_ney_accounting(spark):
    r = QUERIES["text_lm_kneser_ney"](spark, SF_DIR).collect()[0]
    n_test_bigrams = (
        table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.size(F.split("text", " ")) - 1).alias("nb")
        )
        .agg(F.sum("nb"))
        .collect()[0][0]
    )
    assert r.n_scored + r.n_oov_skipped == n_test_bigrams
    assert r.perplexity > 1.0


def test_heaps_exponent_sublinear(spark):
    r = QUERIES["text_heaps_law_fit"](spark, SF_DIR).collect()[0]
    assert r.n_docs > 0
    assert 0.0 < r.beta < 1.0  # vocabulary grows sublinearly
    assert r.k_coef > 0.0


def test_cka_in_unit_interval(spark):
    r = QUERIES["embedding_cka_similarity"](spark, SF_DIR).collect()[0]
    assert r.fxx > 0 and r.fyy > 0 and r.fxy >= 0
    assert 0.0 <= r.cka_linear <= 1.0


def test_pps_draws_exactly_k(spark):
    rows = QUERIES["sample_pps_systematic"](spark, SF_DIR).collect()
    assert sum(r.n_hits for r in rows) == 50  # systematic PPS is exact-k
    for r in rows:
        assert 0.0 < r.incl_prob <= 1.0
