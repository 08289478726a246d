"""Round 8 batch 12: streaming M4, profile drift."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_m4_equals_batch(spark):
    batch = {
        r.bkt: (r.n_points, r.y_min, r.y_min_event, r.y_max, r.y_max_event,
                r.y_first, r.y_last)
        for r in QUERIES["timeseries_m4_downsample"](spark, SF_DIR).collect()
    }
    stream = {
        r.bkt: (r.n_points, r.y_min, r.y_min_event, r.y_max, r.y_max_event,
                r.y_first, r.y_last)
        for r in QUERIES["streaming_m4_fidelity"](spark, SF_DIR).collect()
    }
    assert stream == batch and len(batch) == 30


def test_profile_drift_identities(spark):
    from pyspark.sql import functions as F

    rows = {r.col: r for r in QUERIES["dq_profile_drift"](spark, SF_DIR).collect()}
    assert set(rows) == {"user_id", "event_type", "value"}
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    for r in rows.values():
        assert r.n_ref + r.n_cur == total
        assert 0 <= r.nulls_ref <= r.n_ref and 0 <= r.nulls_cur <= r.n_cur
        assert -1.0 <= r.null_rate_delta <= 1.0
        assert r.distinct_ratio > 0
    # only value carries nulls in this corpus
    assert rows["user_id"].nulls_ref == rows["user_id"].nulls_cur == 0
    assert rows["event_type"].distinct_ref == rows["event_type"].distinct_cur == 5
