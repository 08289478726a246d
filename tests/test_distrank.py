"""operators/distrank: the distributed rank must equal the no-partition
window forms it replaces (row_number / ntile), including weighted
prefixes, descending order, negative keys, and ragged ntile buckets."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.distrank import (
    exclusive_prefix,
    ntile_from_rank,
)


def _keys(spark, n, stride, offset=0):
    # sparse keys spanning multiple 4096-buckets and super-buckets
    return spark.range(n).select(
        (F.col("id") * stride + offset).alias("k"),
        (F.col("id") % 7 + 1).alias("w"),
    )


def test_exclusive_prefix_matches_row_number(spark):
    df = _keys(spark, 500, 3271, offset=-400_000)
    got = exclusive_prefix(df, "k").select("k", (F.col("pre") + 1).alias("rn"))
    want = df.select("k", F.row_number().over(Window.orderBy("k")).alias("rn"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_exclusive_prefix_weighted_descending(spark):
    df = _keys(spark, 300, 17_000_001)  # spans several super-buckets
    got = exclusive_prefix(df, "k", weight="w", ascending=False)
    w = (
        Window.orderBy(F.desc("k")).rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.select(
        "k", F.coalesce(F.sum("w").over(w), F.lit(0)).cast("bigint").alias("pre")
    )
    assert got.select("k", "pre").exceptAll(want).count() == 0


def test_ntile_from_rank_matches_ntile(spark):
    for n, buckets in [(500, 10), (37, 10), (9, 10), (100, 7)]:
        df = _keys(spark, n, 13)
        want = df.select(
            "k", F.ntile(buckets).over(Window.orderBy("k")).alias("t")
        )
        ranked = exclusive_prefix(df, "k").crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias("n")))
        )
        got = ranked.select(
            "k", ntile_from_rank(F.col("pre") + 1, F.col("n"), buckets).alias("t")
        )
        assert got.exceptAll(want).count() == 0, (n, buckets)


def test_exclusive_prefix_recursive_tier_wide_span(spark):
    # >100k occupied super-buckets (span ~2.4e12) forces the data-driven
    # recursive tier (no driver-fold cap, no fail-loud ceiling); the
    # result must still equal the no-partition row_number.
    df = _keys(spark, 120_000, 20_000_017, offset=-7)
    got = exclusive_prefix(df, "k").select("k", (F.col("pre") + 1).alias("rn"))
    want = df.select("k", F.row_number().over(Window.orderBy("k")).alias("rn"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_exclusive_prefix_exact_past_double_precision(spark):
    # keys > 2^53: the old floor(key/4096.0) double path merged buckets;
    # the shiftright path must keep ranks exact at full bigint magnitude.
    base = (1 << 61) - 5
    df = spark.range(64).select((F.lit(base) + F.col("id") * 4096 + F.col("id") % 3).alias("k"))
    got = exclusive_prefix(df, "k").select("k", (F.col("pre") + 1).alias("rn"))
    want = df.select("k", F.row_number().over(Window.orderBy("k")).alias("rn"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_ntile_from_rank_misuse_fails_loud(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    df = spark.range(1).select(F.lit(5).cast("bigint").alias("rank"), F.lit(3).cast("bigint").alias("n"))
    bad = df.select(ntile_from_rank(F.col("rank"), F.col("n"), 10).alias("t"))
    with _pytest.raises(Exception):
        bad.collect()
