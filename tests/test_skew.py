"""AQE skew-join handling (SCALE.md global posture): a hot join key is
split into multiple reader tasks at runtime, with identical results —
the mitigation the 100 TB plan relies on for residual key skew (the
salted-aggregate workload covers the aggregation-side equivalent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONF = {
    # shrink AQE's skew thresholds so test-size data triggers the split
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
}


@pytest.fixture()
def skew_conf(spark):
    prev = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_key(spark, skew_conf):
    # 90% of the left side lands on key 0 — one shuffle partition holds
    # ~9x the median, far past factor=2.
    left = spark.range(400_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(1_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))

    joined = left.join(right, "k").select(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    row = joined.collect()[0]
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan  # AQE split the hot partition

    # identical answer from the broadcast plan (no skew possible)
    ref = (
        left.join(F.broadcast(right), "k")
        .select(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert (row["s"], row["n"]) == (ref["s"], ref["n"])
