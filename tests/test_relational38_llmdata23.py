"""Round 8 batches: experimentation stats (Kaplan–Meier, CUPED,
ROC/PR, calibration ECE, predict_linear), the RAG retrieval stack
(BM25, RRF fusion, retrieval metrics), HITS, and the adaptive
dense-profile path of dedup_weighted_jaccard."""

from __future__ import annotations

import math

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_kaplan_meier_survival_curve_shape(spark):
    """S(t) is a nonincreasing step function in [0,1]; the at-risk count
    never grows with t; every reported death time has >= 1 event."""
    rows = QUERIES["stats_kaplan_meier"](spark, SF_DIR).collect()
    assert rows
    last_s, last_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.km_survival <= 1.0
        assert r.km_survival <= last_s + 1e-9
        assert r.d_events >= 1 and r.n_risk >= r.d_events
        if last_n is not None:
            assert r.n_risk <= last_n
        last_s, last_n = r.km_survival, r.n_risk


def test_cuped_reduces_variance_by_rho_squared(spark):
    """CUPED's defining identity: the variance reduction fraction is
    rho^2, and the adjusted variance is var_y*(1-rho^2) (to rounding)."""
    r = QUERIES["stats_cuped_adjustment"](spark, SF_DIR).collect()[0]
    assert r.n_users > 1
    assert 0.0 <= r.var_reduction_frac <= 1.0
    assert r.var_y_cuped <= r.var_y + 1e-9
    assert math.isclose(
        r.var_y_cuped, r.var_y * (1.0 - r.var_reduction_frac), rel_tol=1e-3
    )


def test_roc_pr_bounds_and_population(spark):
    r = QUERIES["ml_roc_pr_summary"](spark, SF_DIR).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.0 <= r.auc_roc <= 1.0
    assert 0.0 <= r.avg_precision <= 1.0
    # a random scorer sits near 0.5 / prevalence; any scorer must beat 0
    prevalence = r.n_pos / (r.n_pos + r.n_neg)
    assert r.avg_precision >= prevalence * 0.5


def test_calibration_ece_is_weighted_gap_sum(spark):
    rows = QUERIES["ml_calibration_ece"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 10
    n_total = sum(r.n for r in rows)
    ece = rows[0].ece
    assert all(r.ece == ece for r in rows)  # corpus constant on every row
    recomputed = sum(r.n * r.gap for r in rows) / n_total
    assert math.isclose(ece, recomputed, abs_tol=5e-5)
    for r in rows:
        assert 0.0 <= r.avg_pred <= 1.0 and 0.0 <= r.obs_rate <= 1.0
        assert abs(r.gap - abs(r.avg_pred - r.obs_rate)) <= 5e-6


def test_predict_linear_matches_numpy_lstsq(spark):
    """Cross-check one series' slope/prediction against a dense
    least-squares fit on the raw events."""
    import numpy as np
    from pyspark.sql import functions as F

    out = {r.user_id: r for r in QUERIES["promql_predict_linear"](spark, SF_DIR).collect()}
    assert out
    uid = min(out)
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter((F.col("user_id") == uid) & F.col("value").isNotNull())
        .select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "value")
        .collect()
    )
    t0 = min(r.us for r in ev)
    t = np.array([(r.us - t0) // 1_000_000_000 for r in ev], dtype=float)
    v = np.array([math.floor(r.value * 100 + 0.5) for r in ev], dtype=float)
    slope, intercept = np.polyfit(t, v, 1)
    r = out[uid]
    assert math.isclose(r.slope_cents_per_ks, slope, rel_tol=1e-4, abs_tol=1e-4)
    assert math.isclose(
        r.predicted_cents, intercept + slope * (t.max() + 3.6), rel_tol=1e-4, abs_tol=1e-2
    )


def test_hits_rank_and_normalization(spark):
    rows = QUERIES["graph_hits_hub_authority"](spark, SF_DIR).collect()
    by_role: dict[str, list] = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r)
    assert set(by_role) == {"authority", "hub"}
    for role, rs in by_role.items():
        rs.sort(key=lambda x: x.rk)
        assert [x.rk for x in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 20
        assert rs[0].score_norm == 1.0  # top node normalizes to exactly 1
        scores = [x.score for x in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_bm25_topk_ranking(spark):
    rows = QUERIES["text_bm25_topk"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    qs = [r.bm25_q for r in rows]
    assert qs == sorted(qs, reverse=True)
    assert len({r.doc_id for r in rows}) == len(rows)


def test_rrf_fusion_per_query_topk(spark):
    rows = QUERIES["similarity_rrf_fusion"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 8
    cap = 2 * math.floor(1e9 / 61)  # rank-1 in both retrievers
    for q, rs in by_q.items():
        rs.sort(key=lambda x: x.rk)
        assert [x.rk for x in rs] == list(range(1, len(rs) + 1))
        fused = [x.rrf_q for x in rs]
        assert fused == sorted(fused, reverse=True)
        assert all(0 < x.rrf_q <= cap for x in rs)


def test_retrieval_metrics_identities(spark):
    rows = QUERIES["eval_retrieval_metrics"](spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert math.isclose(r.recall_at10, r.n_hits / 10.0, abs_tol=1e-4)
        assert 0.0 <= r.mrr_at10 <= 1.0
        assert 0.0 <= r.ndcg_at10 <= 1.0 + 1e-9
        # hits present <=> all three metrics nonzero
        assert (r.n_hits > 0) == (r.mrr_at10 > 0) == (r.ndcg_at10 > 0)


def test_weighted_jaccard_dense_path_matches_bruteforce(spark):
    """The adaptive dense-profile path (this corpus: 31-token vocab)
    must equal a driver-side brute-force over raw token counts."""
    from collections import Counter

    from pyspark.sql import functions as F

    got = {
        (r.id_a, r.id_b): (r.sum_min, r.sum_max)
        for r in QUERIES["dedup_weighted_jaccard"](spark, SF_DIR).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    tfs = {r.doc_id: Counter(r.text.split(" ")) for r in docs}
    expect = {}
    ids = sorted(tfs)
    for i, a in enumerate(ids):
        ta = sum(tfs[a].values())
        for b in ids[i + 1 :]:
            tb = sum(tfs[b].values())
            smin = sum(min(c, tfs[b][t]) for t, c in tfs[a].items())
            if smin * 3 >= ta + tb:
                expect[(a, b)] = (smin, ta + tb - smin)
    assert got == expect
