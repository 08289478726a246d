"""Physical-plan assertions backing SCALE.md's claims: dimension joins
broadcast, filters reach the parquet scan, projections prune the read
schema. These are the properties that decide 100 TB behavior; asserting
them in CI keeps a refactor from silently de-optimizing a plan that still
returns correct rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_dimensions_broadcast(spark):
    """region/nation/customer/supplier never shuffle the fact table —
    every dim join in the 6-table Q5 plan is a broadcast join."""
    plan = _final_plan(QUERIES["q5_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing fell back to a fact shuffle


def test_filter_pushdown_and_column_pruning(spark):
    li = (
        table(spark, SF, "lineitem")
        .filter(F.col("l_shipdate") >= "1995-01-01")
        .select("l_orderkey", "l_extendedprice")
    )
    plan = _final_plan(li)
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # predicate reached the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in scan
    # read schema carries ONLY the 3 referenced columns of lineitem's 16
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_shipdate:timestamp_ntz>" in scan
    assert "l_comment" not in scan


def test_q7_dual_dims_broadcast_single_fact_shuffle(spark):
    """Q7's supplier-side and customer-side nation enrichments both
    broadcast; the only sort-merge/shuffled join permitted is
    lineitem⋈orders on orderkey."""
    plan = _final_plan(QUERIES["q7_nation_volume"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    # at most the single fact-fact join is non-broadcast
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q14_part_broadcast_and_single_row_agg(spark):
    plan = _final_plan(QUERIES["q14_promo_effect"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q10_topk_is_take_ordered(spark):
    """The final ORDER BY + LIMIT 20 must plan as TakeOrderedAndProject
    (per-partition heaps), never a global Sort."""
    plan = _final_plan(QUERIES["q10_returned_items"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_topk_window_uses_group_limit(spark):
    """Top-K per group runs below the shuffle (WindowGroupLimit), so only
    K rows per group per mapper move."""
    plan = _final_plan(QUERIES["window_topk_orders_per_segment"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_partition_pruning_on_date_layout(spark, tmp_path):
    """A hive-partitioned layout (the 100 TB norm: partition by ingest
    date) must prune at planning time: a one-month predicate on the
    partition column reads that month's directories only."""
    src = table(spark, SF, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month")
    src.write.partitionBy("o_month").parquet(path)

    df = spark.read.parquet(path).filter(F.col("o_month") == "1997-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # the partition predicate is applied to the directory listing...
    assert "PartitionFilters: [isnotnull(o_month" in scan
    # ...and the matching row count equals a full-scan filter's
    full = spark.read.parquet(path).where(F.col("o_month") == "1997-03").count()
    base = src.where(F.col("o_month") == "1997-03").count()
    assert full == base > 0


def test_q6_pure_scan_agg_no_join_no_wide_shuffle(spark):
    """Q6 is the pushdown benchmark: no join anywhere, and the only
    exchange is the single-group partial+final aggregate."""
    plan = _final_plan(QUERIES["q6_forecast_revenue"](spark, SF))
    assert "Join" not in plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # date window reached parquet (PushedFilters list may be truncated in
    # the rendered plan, so match the prefix)
    assert "GreaterThanOrEqual(l_shipda" in scan.split("PushedFilters")[1]


def test_q2_correlated_min_is_single_window_not_subplan(spark):
    """Q2's correlated MIN decorrelates to ONE window over partkey —
    no nested subquery execution, supplier/nation/region broadcast."""
    plan = _final_plan(QUERIES["q2_min_cost_supplier"](spark, SF))
    assert plan.count("Window") >= 1
    assert "BroadcastHashJoin" in plan


def test_q19_disjunction_prunes_both_scans(spark):
    """Q19's OR-branches: the quantity envelope pushes to the lineitem
    scan and the brand/size union to the part scan."""
    plan = _final_plan(QUERIES["q19_disjunctive_revenue"](spark, SF))
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    li = next(s for s in scans if "l_quantity" in s)
    assert "PushedFilters" in li and "l_quantity" in li.split("PushedFilters")[1]
    assert "SortMergeJoin" not in plan  # part broadcasts


def test_q21_topk_is_take_ordered_and_dims_broadcast(spark):
    plan = _final_plan(QUERIES["q21_waiting_supplier"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_er_distinct_first_broadcasts_back_to_records(spark):
    """er_blocked_name_match's record table must NOT ride a shuffle: pair
    work happens on the distinct-name table and per-name stats broadcast
    back (SCALE.md distinct-first note). The only exchanges allowed are
    the tiny distinct-name aggregations."""
    plan = _final_plan(QUERIES["er_blocked_name_match"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # the record-level join must not be a shuffled join
    assert "SortMergeJoin" not in plan


def test_zscore_stats_broadcast_no_event_shuffle(spark):
    """events_anomaly_zscore: the 5-row per-type stats join back onto the
    event scan as a broadcast — the event stream itself never shuffles."""
    plan = _final_plan(QUERIES["events_anomaly_zscore"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantization_dim_stats_broadcast(spark):
    """embedding_scalar_quantization: the 64-row dimension stats broadcast
    back onto the posexploded scan; no shuffled join of the dim stream."""
    plan = _final_plan(QUERIES["embedding_scalar_quantization"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_single_window_exchange(spark):
    """ewma_user_value: rank + per-user count + the final aggregation all
    reuse ONE hash partitioning on user_id — exactly one exchange beyond
    the scan (plus AQE reads), no second user_id shuffle."""
    plan = _final_plan(QUERIES["ewma_user_value"](spark, SF))
    # AQE prints the final plan followed by "== Initial Plan ==" — count
    # exchanges only in the final section.
    final = plan.split("== Initial Plan ==")[0]
    n_exchanges = final.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 hash exchange, plan has {n_exchanges}"


def test_tfidf_topk_uses_window_group_limit(spark):
    """text_tfidf_topterms' per-doc top-3 must plan as WindowGroupLimit —
    map-side top-N below the doc shuffle, not a full rank-then-filter."""
    plan = _final_plan(QUERIES["text_tfidf_topterms"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL (ORDER BY + LIMIT per nation row) must
    decorrelate into WindowGroupLimit + a broadcast nation side — not
    re-execute the customer scan per outer row."""
    plan = _final_plan(QUERIES["lateral_topk_customers_per_nation"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_cdc_latest_wins_is_window_group_limit(spark):
    """cdc_apply_latest_changes' rn=1 must plan as WindowGroupLimit —
    one candidate row per key forwarded map-side, not each key's whole
    change history through the shuffle."""
    plan = _final_plan(QUERIES["cdc_apply_latest_changes"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_corr_moments_single_exchange_no_join(spark):
    """stats_corr_moments is ONE partial+final aggregate: exact moment
    sums merge map-side; no join, no second scan. Counted on the
    pre-AQE physical plan (AQE's stage wrappers re-print exchange
    nodes, double-counting them in the executed string)."""
    df = QUERIES["stats_corr_moments"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_basket_pairs_single_fact_pass(spark):
    """basket_pair_lift materializes baskets ONCE (localCheckpoint): the
    final plan must contain NO parquet rescans of lineitem — all three
    consumers (pair counts, item counts, order count) read the
    checkpointed baskets, and the small sides broadcast."""
    df = QUERIES["basket_pair_lift"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan  # leaf is the checkpoint, not the table
    assert "SortMergeJoin" not in plan


def test_rfm_single_fact_pass(spark):
    """rfm_customer_segments checkpoints the per-customer aggregate; the
    unpivot branches and scoring scan must not rescan orders."""
    df = QUERIES["rfm_customer_segments"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert "SortMergeJoin" not in plan


def test_pit_lookup_no_range_join(spark):
    """scd2_pit_asof_lookup is the linear as-of recipe: union + ordered
    windows — never a range/theta join (BroadcastNestedLoop or
    cartesian), which is the quadratic form the oracle states."""
    df = QUERIES["scd2_pit_asof_lookup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" not in plan  # pure union + window + aggregate


def test_rolling_distinct_is_linear_explode(spark):
    """window_rolling_distinct_users must plan the bounded ×7 explode +
    equi-join form, not a range join against the day list."""
    df = QUERIES["window_rolling_distinct_users"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_join_strategy_hints_honored(spark):
    """The three join-strategy hints must each land their physical
    operator — the knob a 100 TB tuning session reaches for when AQE's
    choice is wrong."""
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer")
    cases = {
        "broadcast": "BroadcastHashJoin",
        "shuffle_hash": "ShuffledHashJoin",
        "merge": "SortMergeJoin",
    }
    for hint, op in cases.items():
        df = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert op in plan, (hint, plan[:400])


def test_bitmap_distinct_no_expand(spark):
    """agg_bitmap_distinct_exact must NOT plan the COUNT(DISTINCT)
    Expand — the whole point is bitmap partials instead of raw-id
    shuffles."""
    df = QUERIES["agg_bitmap_distinct_exact"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "bitmap_construct_agg" in plan or "bitmap_or_agg" in plan


def test_salted_join_lands_on_sort_merge(spark):
    """join_salted_user_enrich forces the shuffle path (merge hint) and
    salts the key 8 ways: the plan must contain a SortMergeJoin keyed on
    (user_id, _salt) and an explode-based build-side replication — a
    silently-broadcast salted join would demonstrate nothing."""
    df = QUERIES["join_salted_user_enrich"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:400]
    assert "_salt" in plan
    assert "Generate explode" in plan or "explode(sequence" in plan
