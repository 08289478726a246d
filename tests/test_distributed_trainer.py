"""r10 distributed coarse trainer: the size-dispatched Lloyd rounds
(operators/similarity.distributed_lloyd) that replace driver-side numpy
fits above _DIST_TRAIN_DOCS. Thresholds are lowered here so the
distributed branch runs on the small fixtures; the hash gate covers the
small branch (unchanged pre-r10 plans)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators import similarity
from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def _inertia(m: np.ndarray, cent: np.ndarray) -> float:
    d = (m**2).sum(1)[:, None] - 2 * m @ cent.T + (cent**2).sum(1)[None, :]
    return float(d.min(axis=1).sum())


def test_distributed_lloyd_improves_and_bounds(spark):
    emb = table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    m = np.vstack([np.asarray(r.v) for r in emb.collect()])
    cent = similarity.distributed_lloyd(emb, "v", "vec_id", k=8, seed=7, iters=6)
    assert cent.shape == (8, m.shape[1]) and np.isfinite(cent).all()
    # trained centroids must beat the raw init picks they started from
    init = similarity.distributed_lloyd(emb, "v", "vec_id", k=8, seed=7, iters=0)
    assert _inertia(m, cent) < _inertia(m, init) * 0.95


def test_ivf_distributed_arm_end_to_end(spark, monkeypatch):
    """Lower the dispatch threshold so similarity_ivf_topk's coarse
    quantizer trains distributed; the ε-bound certificate the query
    emits must still certify every neighbor."""
    monkeypatch.setattr(similarity, "_DIST_TRAIN_DOCS", 10)
    rows = QUERIES["similarity_ivf_topk"](spark, SF_DIR).collect()
    assert rows, "certificate must be non-empty"
    for r in rows:
        assert r.within_eps, r


def test_semdedup_distributed_seed_arm(spark, monkeypatch):
    from prometheus_clickhouselog_exporter_spark.workloads import llmdata24

    base = QUERIES["dedup_semdedup_clusters"](spark, SF_DIR).collect()
    assert base and all(r.seed_arm == "hash_seeds" for r in base)
    planted = {r.removed_id for r in base if r.removed_id >= 1000000}

    monkeypatch.setattr(llmdata24, "_DIST_SEED_DOCS", 10)
    got = QUERIES["dedup_semdedup_clusters"](spark, SF_DIR).collect()
    assert got and all(r.seed_arm == "kmeans_distributed" for r in got)
    # the planted near-duplicates (cos≈0.9995 to their source) must
    # still be caught under trained seeds — assignment clusters a
    # near-dup with its source whenever both pick the same centroid,
    # which cos 0.9995 guarantees for any seed set
    got_planted = {r.removed_id for r in got if r.removed_id >= 1000000}
    assert len(got_planted) >= 0.95 * len(planted), (
        len(got_planted),
        len(planted),
    )
