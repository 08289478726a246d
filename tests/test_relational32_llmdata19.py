"""Round 7 batches 2-3: PromQL semantics, SLO burn, clustering
coefficient, IVM, count-min, DP noise, naive Bayes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_histogram_quantile_promql_semantics(spark):
    """phi=0.5/0.9/0.99 per series, quantiles monotone in phi, every
    value inside [0, 500] (the +Inf bucket clamps to the top finite
    bound, never above)."""
    rows = QUERIES["promql_histogram_quantile"](spark, SF_DIR).collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.quantile)
    assert all(len(v) == 3 for v in by_type.values())
    for v in by_type.values():
        assert v == sorted(v)
        assert all(0.0 <= q <= 500.0 for q in v)


def test_rate_counter_resets_promql_invariants(spark):
    """PromQL's published reset semantics: the corrected increase is
    never below the naive last-first delta (each correction swaps a
    negative step for a non-negative one), equals it exactly on
    reset-free series, is non-negative, and never exceeds the TRUE
    unwrapped cumulative growth (the post-reset-value correction
    deliberately undercounts by the pre-reset level — PromQL's
    documented conservatism — while naive last-first can undercount by
    whole wraps)."""
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    rows = {
        r.user_id: r
        for r in QUERIES["promql_rate_counter_resets"](spark, SF_DIR).collect()
    }
    assert any(r.n_resets > 0 for r in rows.values())
    e = (
        table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
        )
        .groupBy("user_id")
        .agg(F.sum("c").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for t in e:
        r = rows[t.user_id]
        assert r.n_samples == t.n
        assert 0 <= r.increase_cents <= t.total
        assert r.increase_cents >= r.naive_delta_cents
        if r.n_resets == 0:
            assert r.increase_cents == r.naive_delta_cents


def test_slo_burn_page_requires_both_windows(spark):
    rows = QUERIES["slo_error_budget_burn"](spark, SF_DIR).collect()
    assert len(rows) > 5
    for r in rows:
        assert r.page == (r.burn_1d > 1.0 and r.burn_7d > 1.0)


def test_clustering_coefficient_range_and_cliques(spark):
    rows = QUERIES["graph_clustering_coefficient"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.coeff <= 1.0
        if r.degree < 2:
            assert r.coeff == 0.0


def test_ivm_identity_holds_everywhere(spark):
    rows = QUERIES["ivm_join_delta"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.ivm_exact for r in rows)
    assert any(r.delta_revenue > 0 for r in rows)


def test_countmin_guarantees(spark):
    rows = QUERIES["sketch_countmin_errors"](spark, SF_DIR).collect()
    assert len(rows) == 30
    assert all(r.never_underestimates for r in rows)
    assert all(r.within_eps_bound for r in rows)


def test_dp_noise_is_laplace_shaped(spark):
    """Deterministic noise: reproducible across two runs, zero-mean-ish
    over the key universe, and always finite."""
    a = QUERIES["privacy_dp_noisy_counts"](spark, SF_DIR).collect()
    b = QUERIES["privacy_dp_noisy_counts"](spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    noises = [r.n_noisy - r.n_true for r in a]
    assert all(math.isfinite(x) for x in noises)
    assert any(x > 0 for x in noises) and any(x < 0 for x in noises)


def test_naive_bayes_beats_majority_class(spark):
    """Resubstitution accuracy must beat the majority-class baseline —
    the minimum bar for 'the classifier learned something'."""
    rows = QUERIES["ml_naive_bayes_train"](spark, SF_DIR).collect()
    total = sum(r.n_docs for r in rows)
    correct = sum(r.n_docs for r in rows if r.true_source == r.pred_source)
    per_class: dict[str, int] = {}
    for r in rows:
        per_class[r.true_source] = per_class.get(r.true_source, 0) + r.n_docs
    majority = max(per_class.values()) / total
    assert correct / total > majority, (correct / total, majority)


def test_fdr_bh_step_up_property(spark):
    """BH is a step-up: everything at or below the cut rank is rejected
    (even rows above their OWN threshold), everything past it is not."""
    rows = QUERIES["stats_fdr_bh"](spark, SF_DIR).collect()
    assert len(rows) == 35
    kmax = max((r.rk for r in rows if r.rejected), default=0)
    for r in rows:
        assert r.rejected == (r.rk <= kmax)
        assert 0.0 <= r.p_cheb <= 1.0
    # the cut row itself satisfies its threshold
    if kmax:
        cut = next(r for r in rows if r.rk == kmax)
        assert cut.p_cheb <= cut.bh_threshold + 1e-12


def test_streaming_cms_matches_batch_grid(spark):
    """The stream-built CMS equals the batch grid cell-for-cell, and its
    total mass equals d x token count."""
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    rows = QUERIES["streaming_cms_fidelity"](spark, SF_DIR).collect()
    per_row: dict[int, int] = {}
    for r in rows:
        per_row[r.r] = per_row.get(r.r, 0) + r.cnt
    assert set(per_row) == {0, 1, 2, 3}
    n_tokens = (
        table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.size(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
            ).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    assert all(v == n_tokens for v in per_row.values())


def test_decontam_embedding_recovers_planted_leaks(spark):
    rows = QUERIES["decontam_embedding_neighbors"](spark, SF_DIR).collect()
    assert len(rows) == 40
    assert all(r.contaminated for r in rows)          # every probe IS a leak
    assert all(r.source_recovered for r in rows)      # and names its source
    assert all(r.max_cos >= 0.99 for r in rows)
    # background must stay quiet: no probe flags more than its two mix
    # components (+1 occasional) — the 0.9 threshold separates cleanly
    assert all(r.n_leaks <= 3 for r in rows)
