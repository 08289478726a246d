"""Runtime bloom-filter join pruning (Spark's runtime filters): when a
selective build side can't broadcast, Spark injects a bloom-filter
subquery on the PROBE side's scan — rows that can't join die before the
shuffle. At 100 TB this is the difference between shuffling the whole
fact table and shuffling the matching slice; this suite pins that the
engine's plans actually receive the filter under the documented confs
(thresholds tuned because the sandbox tables sit below the production
defaults — on a real cluster the defaults fire on their own)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@contextmanager
def _confs(spark, kv):
    prev = {}
    for k, v in kv.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_runtime_filter_reaches_probe_scan(spark):
    with _confs(spark, _CONFS):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # the bloom Filter's predicate references l_orderkey — an
        # attribute only the lineitem (probe) branch produces, so
        # Catalyst can only have placed it on that branch — and the
        # lineitem FileScan is underneath it (preorder tree print)
        lines = plan.splitlines()
        bloom_idx = next(
            i
            for i, ln in enumerate(lines)
            if "might_contain" in ln and "l_orderkey" in ln
        )
        assert any(
            "FileScan" in ln and "lineitem" in ln
            for ln in lines[bloom_idx + 1 :]
        ), plan[:2000]
        # and results are unchanged by the rewrite
        with_filter = {tuple(r) for r in j.collect()}
    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
                F.col("o_totalprice") > 400000
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .count()
    )
    assert {tuple(r) for r in base.collect()} == with_filter


def test_bloom_filter_absent_when_disabled(spark):
    off = dict(_CONFS)
    off["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
    with _confs(spark, off):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "l_returnflag"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" not in plan
