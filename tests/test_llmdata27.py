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


def test_zipf_fit_matches_numpy(spark):
    """Cross-check slope/R^2 against numpy over the quantized points."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    r = QUERIES["text_zipf_fit"](spark, SF_DIR).collect()[0]
    freq = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), "tok")
        .collect()
    )
    lr = np.array(
        [math.floor(math.log(i + 1) * 1e6 + 0.5) for i in range(len(freq))]
    )
    lf = np.array(
        [math.floor(math.log(x["count"]) * 1e6 + 0.5) for x in freq]
    )
    slope, intercept = np.polyfit(lr, lf, 1)
    assert r.vocab_size == len(freq)
    assert math.isclose(r.zipf_slope, slope, rel_tol=1e-4, abs_tol=1e-4)
    cc = np.corrcoef(lr, lf)[0, 1]
    assert math.isclose(r.r_squared, cc * cc, abs_tol=1e-4)
    assert r.zipf_slope < 0  # frequency falls with rank, always
