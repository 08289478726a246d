"""Round 10 batch 4: pass@k, ROUGE-2 pairs, decision stump, balanced
sampling, TOST, quantileTiming parity, SAX motifs, t-closeness —
semantic invariants beyond the hash gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def test_pass_at_k_monotone_in_k(spark):
    rows = {r.k: r for r in QUERIES["eval_pass_at_k"](spark, SF_DIR).collect()}
    assert set(rows) == {1, 5, 10}
    # pass@k is monotone nondecreasing in k, bounded in [0, 1]
    assert 0.0 <= rows[1].pass_at_k <= rows[5].pass_at_k
    assert rows[5].pass_at_k <= rows[10].pass_at_k <= 1.0
    # all problems share one census
    assert len({r.problems for r in rows.values()}) == 1
    # pass@1 equals the mean success rate c/n (estimator reduces to it):
    prob = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("event_type") == "purchase").alias("c"),
        )
        .where(F.col("n") >= 10)
        .collect()
    )
    mean_rate = sum(
        round(r.c / r.n * 1e9) for r in prob
    ) / len(prob) / 1e9
    assert math.isclose(rows[1].pass_at_k, round(mean_rate * 1e9) / 1e9, abs_tol=1e-9)


def test_rouge2_bounded_and_self_pair_is_one(spark):
    rows = QUERIES["eval_rouge2_pairs"](spark, SF_DIR).collect()
    assert rows and all(0.0 <= r.avg_rouge2 <= 1.0 for r in rows)
    # identical ref/hyp must score exactly 1: run the same pipeline on a
    # fixture where both sides of each pair are the same text
    docs = table(spark, SF_DIR, "documents").limit(6)
    fixture = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"), "text", "lang", "source", "n_chars"
    ).unionAll(
        docs.select(
            (F.col("doc_id") * 2 + 1).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        fixture.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = QUERIES["eval_rouge2_pairs"](spark, td).collect()
    assert out and all(r.avg_rouge2 == 1.0 for r in out)


def test_decision_stump_beats_majority_and_is_optimal(spark):
    r = QUERIES["ml_decision_stump"](spark, SF_DIR).collect()[0]
    assert r.feature in {"qty", "disc", "price_k"}
    assert 0.0 <= r.gini <= 0.5 and 0.5 <= r.stump_accuracy <= 1.0
    # brute-force verify optimality on the tiny SF: no (feature, thr)
    # candidate scores a strictly lower quantized impurity
    li = table(spark, SF_DIR, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("disc"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
    ).collect()
    n = len(li)
    pos = sum(x.y for x in li)
    cands = []
    for feat in ("qty", "disc", "price_k"):
        vals = sorted({getattr(x, feat) for x in li})
        for t in vals[:-1]:
            nl = sum(1 for x in li if getattr(x, feat) <= t)
            posl = sum(x.y for x in li if getattr(x, feat) <= t)
            negl, nr = nl - posl, n - nl
            posr, negr = pos - posl, (n - nl) - (pos - posl)
            score = (nl - (posl**2 + negl**2) / nl) + (nr - (posr**2 + negr**2) / nr)
            q = math.floor(score * 1e6 + 0.5)
            cands.append((q, feat, str(t).zfill(12), t))
    q_min, feat, _, thr = min(cands)
    assert (r.feature, r.threshold) == (feat, thr)


def test_class_balanced_exact_k_per_class(spark):
    rows = QUERIES["sample_class_balanced"](spark, SF_DIR).collect()
    counts = (
        table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .count()
        .collect()
    )
    n_min = min(r["count"] for r in counts)
    assert len(rows) == len(counts)
    assert all(r.kept == n_min for r in rows)


def test_tost_is_symmetric_in_direction(spark):
    rows = QUERIES["stats_tost_equivalence"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # t_lower tests mu_diff > -delta, t_upper tests mu_diff < +delta:
        # with delta > 0 they always satisfy t_lower > t_upper
        assert r.t_lower > r.t_upper
        if r.equivalent:
            assert r.t_lower > 1.6449 and r.t_upper < -1.6449


def test_quantile_timing_bucket_grid(spark):
    rows = QUERIES["clickhouse_quantile_timing"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.qt50 <= r.qt90 <= r.qt99 <= 30000
        for v in (r.qt50, r.qt90, r.qt99):
            # every reported value sits on the CH timing grid
            assert v < 1024 or v == 30000 or (v - 1024) % 16 == 0


def test_sax_words_cover_users_with_16_events(spark):
    rows = QUERIES["timeseries_sax_motifs"](spark, SF_DIR).collect()
    assert rows
    assert all(len(r.word) == 4 and set(r.word) <= set("abcd") for r in rows)
    n_eligible = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .where(F.col("count") >= 16)
        .count()
    )
    # constant-variance users are excluded; everyone else symbolizes
    assert sum(r.users for r in rows) <= n_eligible
    assert sum(r.users for r in rows) >= n_eligible - 1


def test_tcloseness_zero_iff_group_matches_global(spark):
    rows = QUERIES["kanon_tcloseness_audit"](spark, SF_DIR).collect()
    assert rows and all(0.0 <= r.emd <= 1.0 for r in rows)
    assert all(r.violates == (r.emd > 0.15) for r in rows)
    # the customer-count census must reconcile with the groups
    n = table(spark, SF_DIR, "customer").count()
    assert sum(r.group_n for r in rows) == n
