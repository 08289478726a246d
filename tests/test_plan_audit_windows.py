"""The bounded-global-window invariant guard (tools/plan_audit.py):
the detector must stay green on representative registered plans and go
red on a seeded fact-table global window — so a future edit can't
silently move a Window.orderBy onto corpus-sized rows."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import unbounded_global_windows  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_red_on_seeded_fact_table_global_window(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bad = e.withColumn("rn", F.row_number().over(Window.orderBy("ts")))
    hits = unbounded_global_windows(_plan(bad))
    assert len(hits) == 1 and hits[0].startswith("Window ")


def test_green_on_aggregated_global_window(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    agg = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    good = agg.withColumn("rk", F.rank().over(Window.orderBy("n")))
    assert unbounded_global_windows(_plan(good)) == []


def test_green_on_partitioned_window(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ok = e.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("ts"))
    )
    assert unbounded_global_windows(_plan(ok)) == []


def test_green_on_limited_input(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    top = e.orderBy("ts").limit(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("ts"))
    )
    assert unbounded_global_windows(_plan(top)) == []


def test_rewritten_rank_stats_are_green(spark):
    """The two fixed rank statistics must window only over aggregated
    distinct-value frames."""
    from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

    for name in ("stats_mann_whitney_u", "stats_spearman_rho"):
        df = QUERIES[name](spark, SF_DIR)
        assert unbounded_global_windows(_plan(df)) == [], name


def test_red_survives_codegen_prefixes():
    """A finalized plan (AQE off / post-execution) prefixes codegen'd
    nodes with '*(n) '; the detector must still trace the
    Window -> Sort -> Exchange SinglePartition -> scan chain through
    them (regression pin for the prefix-stripping in _parse_tree)."""
    plan = """*(3) Project [ts#1, rn#7]
+- Window [row_number() windowspecdefinition(ts#1 ASC NULLS FIRST)], [ts#1 ASC NULLS FIRST]
   +- *(2) Sort [ts#1 ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=8]
         +- *(1) ColumnarToRow
            +- FileScan parquet [ts#1] Batched: true, Format: Parquet
"""
    hits = unbounded_global_windows(plan)
    assert len(hits) == 1 and hits[0].startswith("Window ")


def test_green_codegen_aggregate_chain():
    plan = """Window [rank(n#9L)], [n#9L ASC NULLS FIRST]
+- *(2) Sort [n#9L ASC NULLS FIRST], false, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=29]
      +- *(1) HashAggregate(keys=[event_type#3], functions=[count(1)])
         +- Exchange hashpartitioning(event_type#3, 4)
            +- *(1) HashAggregate(keys=[event_type#3], functions=[partial_count(1)])
               +- FileScan parquet [event_type#3] Batched: true
"""
    assert unbounded_global_windows(plan) == []
