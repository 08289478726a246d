"""Hand-value and invariant tests for relational12 (Mahalanobis 2D,
conversion lag, log2 histogram, xcorr lag, GROUP BY ALL, provenance
dedup)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational12 import (
    dedup_canonical_provenance,
    funnel_time_to_convert,
    hist_log2_order_value,
    stats_mahalanobis_2d,
    timeseries_xcorr_lag,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mahalanobis_matches_numpy(spark):
    """Top-20 ranking equals numpy's full-covariance computation."""
    import duckdb

    feat = duckdb.sql(
        f"""
        SELECT c.c_custkey, CAST(floor(c.c_acctbal * 100) AS BIGINT) AS x,
               coalesce(o.n, 0) AS y
        FROM '{SF_DIR}/customer.parquet' c
        LEFT JOIN (SELECT o_custkey, count(*) AS n
                   FROM '{SF_DIR}/orders.parquet' GROUP BY 1) o
          ON c.c_custkey = o.o_custkey
        """
    ).fetchall()
    ids = np.array([r[0] for r in feat])
    X = np.array([[r[1], r[2]] for r in feat], dtype=np.float64)
    mu = X.mean(axis=0)
    d = X - mu
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    order = sorted(zip(-np.floor(d2 * 1e6), ids))[:20]
    expect = [int(i) for _, i in order]
    got = [r.c_custkey for r in stats_mahalanobis_2d(spark, SF_DIR).collect()]
    # quantized rank keys agree up to 1-ulp drift in the d2 doubles; compare sets
    assert set(got) == set(expect)


def test_conversion_lag_hand_corpus(spark, tmp_path):
    rows = [
        # user 1: view at t0, purchase 100s later
        Row(event_id=1, ts=dt.datetime(2024, 1, 1, 0, 0, 0), user_id=1,
            event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=dt.datetime(2024, 1, 1, 0, 1, 40), user_id=1,
            event_type="purchase", value=1.0, props="{}"),
        # user 2: purchase BEFORE first view -> not a conversion
        Row(event_id=3, ts=dt.datetime(2024, 1, 1, 0, 0, 0), user_id=2,
            event_type="purchase", value=1.0, props="{}"),
        Row(event_id=4, ts=dt.datetime(2024, 1, 1, 1, 0, 0), user_id=2,
            event_type="view", value=1.0, props="{}"),
        # user 3: views only
        Row(event_id=5, ts=dt.datetime(2024, 1, 1, 2, 0, 0), user_id=3,
            event_type="view", value=1.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = funnel_time_to_convert(spark, str(tmp_path)).collect()[0]
    assert out.n_viewers == 3
    assert out.n_converted == 1
    assert out.p50_sec == 100 and out.p90_sec == 100 and out.max_sec == 100


def test_log2_histogram_bucket_bounds(spark):
    rows = hist_log2_order_value(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.lo_cents == 1 << (r.bucket - 1)
        assert r.hi_cents == (1 << r.bucket) - 1
    # buckets contiguous-ish and sorted
    buckets = [r.bucket for r in rows]
    assert buckets == sorted(buckets)
    assert total > 0


def test_xcorr_prefers_injected_lag(spark, tmp_path):
    """Purchases are views shifted +2 days and scaled; lag +2 must win."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    daily_views = [5, 50, 5, 5, 60, 5, 5, 5, 40, 5, 5, 5]
    for day, nv in enumerate(daily_views):
        for _ in range(nv):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=day),
                            user_id=1, event_type="view", value=1.0, props="{}"))
            eid += 1
        # purchases echo the view spike two days later
        if day >= 2:
            for _ in range(daily_views[day - 2]):
                rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=day),
                                user_id=1, event_type="purchase", value=1.0,
                                props="{}"))
                eid += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {r.lag: r for r in timeseries_xcorr_lag(spark, str(tmp_path)).collect()}
    best = [lag for lag, r in out.items() if r.is_best]
    assert best == [2]


def test_provenance_canonical_is_min_source_then_id(spark):
    rows = dedup_canonical_provenance(spark, SF_DIR).collect()
    assert rows  # prefix key guarantees groups on this corpus
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    prefix = {
        d.doc_id: (" ".join(d.text.lower().split(" ")[:5]), d.source)
        for d in docs
    }
    groups: dict[str, list] = {}
    for did, (p, src) in prefix.items():
        groups.setdefault(p, []).append((src, did))
    expect = {}
    for p, members in groups.items():
        if len(members) > 1:
            src, did = min(members)
            gid = min(d for _, d in members)
            expect[gid] = (len(members), did, src)
    got = {r.group_id: (r.n_dups, r.canonical_doc, r.canonical_source)
           for r in rows}
    assert got == expect
