"""Round 8 batch 8: argMin/argMax parity, Poisson bootstrap,
randomization test."""

from __future__ import annotations

import math

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_argminmax_battery_recompute(spark):
    """Driver-side recompute of one stratum's packed-key argmin/argmax
    and first/last event."""
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in QUERIES["clickhouse_argminmax_battery"](spark, SF_DIR).collect()}
    assert len(rows) == 5
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull() & (F.col("event_type") == "click"))
        .select("user_id", "event_id", "value",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .collect()
    )
    vkey = lambda e: (math.floor(e.value * 100 + 0.5) * 1_000_000 + e.user_id)  # noqa: E731
    tkey = lambda e: ((e.us // 1_000_000) * 1_000_000_000 + e.event_id)  # noqa: E731
    r = rows["click"]
    assert r.n == len(ev)
    assert r.argmin_user == min(ev, key=vkey).user_id
    assert r.argmax_user == max(ev, key=vkey).user_id
    assert r.first_event_id == min(ev, key=tkey).event_id
    assert r.last_event_id == max(ev, key=tkey).event_id
    assert r.min_value <= r.max_value


def test_bootstrap_ci_brackets_the_contrast(spark):
    r = QUERIES["stats_bootstrap_ci_diff"](spark, SF_DIR).collect()[0]
    assert r.n_replicates == 200
    assert r.ci_lo < r.ci_hi
    # the observed contrast sits inside its own percentile interval
    assert r.ci_lo <= r.observed_diff <= r.ci_hi


def test_randomization_test_identity_and_determinism(spark):
    """The add-one p identity must hold, and the deterministic resamples
    must make back-to-back runs byte-identical (the operator's whole
    point vs an RNG permutation test)."""
    r1 = QUERIES["stats_randomization_test"](spark, SF_DIR).collect()[0]
    r2 = QUERIES["stats_randomization_test"](spark, SF_DIR).collect()[0]
    assert r1 == r2
    assert r1.n_replicates == 200
    assert 0 <= r1.n_as_extreme <= 200
    assert math.isclose(
        r1.p_value, (r1.n_as_extreme + 1) / 201, abs_tol=1e-5
    )
    # the null design (user parity) should not be wildly significant —
    # allow boundary values at the tiny SF but reject pathologies
    assert r1.p_value >= 3 / 201
