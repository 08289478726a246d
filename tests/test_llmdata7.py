"""Hand-value and invariant tests for llmdata7 (weighted MinHash,
leakage matrix, mutual kNN, hashing trick, per-key CUSUM)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.llmdata7 import (
    _KNN_K,
    _KNN_SUBSET,
    crosssource_leakage_matrix,
    events_cusum_per_key,
    knn_mutual_graph,
    sketch_weighted_minhash,
    text_hashing_trick_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_minhash_identical_sources_score_one(spark, tmp_path):
    text = "alpha beta beta gamma gamma gamma delta"
    rows = [
        Row(doc_id=1, text=text, lang="en", source="s1", n_chars=len(text)),
        Row(doc_id=2, text=text, lang="en", source="s2", n_chars=len(text)),
        Row(doc_id=3, text="zeta eta theta", lang="en", source="s3", n_chars=14),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        (r.source_a, r.source_b): r
        for r in sketch_weighted_minhash(spark, str(tmp_path)).collect()
    }
    twin = out[("s1", "s2")]
    assert twin.exact_weighted_jaccard == 1.0
    assert twin.est_weighted_jaccard == 1.0  # identical replica sets
    # disjoint vocabularies -> 0 on both lanes
    assert out[("s1", "s3")].exact_weighted_jaccard == 0.0
    assert out[("s1", "s3")].est_weighted_jaccard == 0.0


def test_weighted_minhash_estimate_tracks_exact(spark):
    rows = sketch_weighted_minhash(spark, SF_DIR).collect()
    assert rows
    # 32-perm MinHash: per-pair deviation is binomial; allow 5 sigma at J=0.5
    for r in rows:
        assert abs(r.est_weighted_jaccard - r.exact_weighted_jaccard) <= 0.45
    mean_err = sum(
        abs(r.est_weighted_jaccard - r.exact_weighted_jaccard) for r in rows
    ) / len(rows)
    assert mean_err <= 0.12


def test_leakage_matrix_subset_containment(spark, tmp_path):
    a = "one two three four five six seven eight"
    b = a + " nine ten eleven twelve thirteen fourteen"
    rows = [
        Row(doc_id=1, text=a, lang="en", source="small", n_chars=len(a)),
        Row(doc_id=2, text=b, lang="en", source="big", n_chars=len(b)),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = crosssource_leakage_matrix(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # 'small' shingles are a strict subset of 'big' shingles
    lo, hi = sorted([r.source_a, r.source_b])
    assert (lo, hi) == ("big", "small")
    small_in_big = (
        r.containment_a_in_b if r.source_a == "small" else r.containment_b_in_a
    )
    assert small_in_big == 1.0
    assert 0.0 < r.jaccard < 1.0


def test_mutual_knn_matches_numpy_bruteforce(spark):
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(f"vec_id < {_KNN_SUBSET}")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    np.fill_diagonal(cos, -np.inf)
    qcos = np.floor(cos * 1e9)
    knn: dict[int, set[int]] = {}
    for i in range(len(ids)):
        order = sorted(
            ((-qcos[i, j], ids[j]) for j in range(len(ids)) if j != i)
        )[:_KNN_K]
        knn[ids[i]] = {v for _, v in order}
    expect = {
        (min(a, b), max(a, b))
        for a in knn
        for b in knn[a]
        if a in knn[b] and a < b
    }
    got = {
        (r.id_a, r.id_b) for r in knn_mutual_graph(spark, SF_DIR).collect()
    }
    assert got == expect


def test_hashing_trick_buckets_bounded_and_deterministic(spark):
    rows = text_hashing_trick_features(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.bucket < 1024 for r in rows)
    assert all(r.n >= r.n_tokens >= 1 for r in rows)
    again = text_hashing_trick_features(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_cusum_per_key_detects_injected_step(spark, tmp_path):
    """A flat series stays quiet; a series with a late step change
    alarms — replicating the textbook recurrence."""
    import datetime as dt

    rows = []
    eid = 0
    for day in range(30):
        ts = dt.datetime(2024, 1, 1 + day % 28, 12, 0, 0)
        # 'flat': 5 events/day. 'step': 5/day then 15/day from day 20.
        for _ in range(5):
            rows.append(
                Row(event_id=eid, ts=ts, user_id=1, event_type="flat",
                    value=1.0, props="{}")
            )
            eid += 1
        n = 5 if day < 20 else 15
        for _ in range(n):
            rows.append(
                Row(event_id=eid, ts=ts, user_id=1, event_type="step",
                    value=1.0, props="{}")
            )
            eid += 1
    # two days collide (day%28) — harmless, counts just add
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r.event_type: r for r in events_cusum_per_key(spark, str(tmp_path)).collect()
    }
    assert out["flat"].max_cusum <= 15 and out["flat"].n_alarm_days == 0
    assert out["step"].max_cusum > 15 and out["step"].n_alarm_days >= 1
    assert out["step"].peak_day is not None
