"""Round 8 batch 5: diff-in-diff, chi-square independence, partition
volume anomaly, weighted reservoir sampling, SemDeDup."""

from __future__ import annotations

import math

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_diff_in_diff_identity(spark):
    r = QUERIES["stats_diff_in_diff"](spark, SF_DIR).collect()[0]
    assert min(r.n_c_pre, r.n_c_post, r.n_t_pre, r.n_t_post) > 0
    recomputed = r.mean_t_post - r.mean_t_pre - r.mean_c_post + r.mean_c_pre
    assert math.isclose(r.did_cents, recomputed, abs_tol=5e-4)


def test_chi_square_shape(spark):
    from pyspark.sql import functions as F

    r = QUERIES["stats_chi_square_independence"](spark, SF_DIR).collect()[0]
    n_events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    )
    assert r.n_obs == n_events
    assert r.dof >= 1 and r.chi_square >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0
    # Cramér's V is defined from the same statistic: V = sqrt(chi2/(n*m))
    # where m = min(R-1, C-1); with dof = (R-1)(C-1) <= 6*m here, m >= dof/6
    assert r.cramers_v <= math.sqrt(r.chi_square / r.n_obs) + 1e-9


def test_volume_anomaly_trailing_window(spark):
    rows = QUERIES["dq_partition_volume_anomaly"](spark, SF_DIR).collect()
    assert len(rows) >= 5
    assert rows[0].z_volume is None  # day 1 has no trailing baseline
    # recompute one z from the raw daily counts (population std)
    idx = next(i for i, r in enumerate(rows) if r.z_volume is not None)
    trail = [r.n for r in rows[max(0, idx - 7) : idx]]
    mu = sum(trail) / len(trail)
    var = sum((x - mu) ** 2 for x in trail) / len(trail)
    z = (rows[idx].n - mu) / math.sqrt(var)
    assert math.isclose(rows[idx].z_volume, z, abs_tol=2e-4)
    for r in rows:
        flagged = r.z_volume is not None and abs(r.z_volume) >= 3.0
        assert r.vol_anomaly == flagged


def test_reservoir_weighted_prefers_heavy_rows(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["sample_reservoir_weighted"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    corpus = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .groupBy("event_type")
        .agg(F.avg("value").alias("mw"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mw = {r.event_type: (r.mw, r.n) for r in corpus}
    for et, rs in by_type.items():
        rs.sort(key=lambda x: x.rk)
        assert [x.rk for x in rs] == list(range(1, len(rs) + 1))
        keys = [x.key_q for x in rs]
        assert keys == sorted(keys, reverse=True)
        assert len({x.event_id for x in rs}) == len(rs)
        mean_w, n = mw[et]
        if n > 5 * len(rs):
            # A-ES inclusion ∝ weight: the sample must skew heavy
            assert sum(x.w for x in rs) / len(rs) > mean_w


def test_semdedup_recovers_planted_duplicates(spark):
    rows = QUERIES["dedup_semdedup_clusters"](spark, SF_DIR).collect()
    # every removal is a planted mix (background max cosine ~0.49)
    assert all(r.removed_id >= 1000000 for r in rows)
    assert all(r.keeper_id == r.removed_id - 1000000 for r in rows)
    assert all(r.max_cos >= 0.97 for r in rows)
    assert all(r.n_dup_partners == 1 for r in rows)
    # the cluster assignment keeps nearly all mixes with their source
    assert len(rows) >= 25
