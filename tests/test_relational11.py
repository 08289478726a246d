"""Hand-value and invariant tests for relational11 (engine surface +
warehouse closed forms)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads.relational11 import (
    agg_bitmap_distinct_exact,
    collation_lcase_aggregation,
    dq_benford_first_digit,
    inventory_clamped_balance,
    recursive_cte_subtree_rollup,
    stats_skew_kurtosis_moments,
    udtf_lateral_bigrams,
)

SF_DIR = "/root/testdata/sf0.001"


def test_recursive_cte_counts_every_customer_once(spark):
    rows = recursive_cte_subtree_rollup(spark, SF_DIR).collect()
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r.n_desc for r in rows) == n_cust  # each chain ends exactly once
    assert all(0 <= r.root < 10 for r in rows)
    # depth really is the digit count: max custkey at sf0.001 is 4 digits
    assert 2 <= max(r.max_depth for r in rows) <= 7


def test_bitmap_distinct_equals_count_distinct(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expect = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    expect["__all__"] = ev.select("user_id").distinct().count()
    got = {
        r.event_type: r.distinct_users
        for r in agg_bitmap_distinct_exact(spark, SF_DIR).collect()
    }
    assert got == expect


def test_collation_groups_merge_case_variants(spark):
    rows = collation_lcase_aggregation(spark, SF_DIR).collect()
    # every emitted key is already lower-case, and keys are unique
    keys = [r.ptype_ci for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    assert all(k == k.lower() for k in keys)
    # the deterministic mixed-casing guarantees both variants exist for
    # any type that has parts on both parities -> n_case_variants == 2
    assert any(r.n_case_variants == 2 for r in rows)


def test_udtf_bigrams_match_native_expansion(spark):
    """The Python-UDTF lane must agree with the native split+explode
    recipe (the fast path every dedup operator uses)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.lower(F.col("text")).alias("text")
    )
    toks = docs.select(F.split("text", " ").alias("t"))
    native = (
        toks.select(
            F.posexplode("t").alias("i", "w"),
            F.col("t"),
        )
        .filter((F.col("i") < F.size("t") - 1))
        .select(
            F.col("w").alias("a"),
            F.element_at("t", F.col("i") + 2).alias("b"),
        )
        .filter((F.col("a") != "") & (F.col("b") != ""))
        .select(F.concat_ws(" ", "a", "b").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
        .collect()
    )
    got = udtf_lateral_bigrams(spark, SF_DIR).collect()
    assert [(r.bigram, r.n) for r in got] == [(r.bigram, r.n) for r in native]


def test_clamped_balance_matches_sequential_replay(spark, tmp_path):
    """The window closed form equals the per-row recurrence
    level_k = max(0, level_{k-1} + delta_k) on a hand corpus."""
    import datetime as dt

    moves = [  # one part, deltas +5 -10 +3 -1 +2  (clamps at step 2)
        (5, "N"),
        (10, "R"),
        (3, "N"),
        (1, "R"),
        (2, "N"),
    ]
    rows = [
        Row(
            l_partkey=7,
            l_quantity=float(q),
            l_returnflag=f,
            l_shipdate=dt.datetime(2024, 1, 1 + i),
            l_orderkey=i,
            l_linenumber=1,
        )
        for i, (q, f) in enumerate(moves)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = inventory_clamped_balance(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # replay: 5 -> 0 -> 3 -> 2 -> 4 ; peak 5, one stockout
    assert r.n_moves == 5 and r.max_level == 5 and r.n_stockouts == 1


def test_skew_kurtosis_symmetric_distribution(spark, tmp_path):
    """A symmetric distribution has ~0 skewness; a two-point ±1 mass has
    excess kurtosis exactly -2."""
    rows = [
        Row(c_mktsegment="SYM", c_acctbal=float(v))
        for v in (-1.0, 1.0) * 500  # equal mass at ±1
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/customer.parquet")
    out = stats_skew_kurtosis_moments(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r.skewness) < 1e-9
    assert abs(r.excess_kurtosis - (-2.0)) < 1e-9


def test_benford_shares_sum_to_one_and_constants(spark):
    rows = dq_benford_first_digit(spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    for r in rows:
        expect = math.floor(math.log10(1 + 1 / r.digit) * 1e6 + 0.5) / 1e6
        assert r.benford_expect == expect
        assert r.chi2_term >= 0.0
