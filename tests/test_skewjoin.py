"""Salted equi-join: on a pathologically skewed key distribution (one
key holding half the fact rows) the salted join's RESULT must be
row-identical to the plain join — salting may only change placement,
never semantics — and every salt slot of the hot key must actually
receive probe rows (the spread that is the operator's entire point)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.skewjoin import (
    salted_equi_join,
)


def _skewed(spark):
    # key 1 holds 500 of 1000 rows; keys 2..501 hold one each
    rows = [(i, 1 if i < 500 else i - 498) for i in range(1000)]
    fact = spark.createDataFrame(rows, "row_id long, k long")
    dim = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(1, 502)], "k long, attr string"
    )
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = {
        (r.row_id, r.attr)
        for r in fact.join(dim, "k").select("row_id", "attr").collect()
    }
    salted = {
        (r.row_id, r.attr)
        for r in salted_equi_join(
            fact, dim, key="k", salt_src=F.col("row_id"), n_salts=8
        )
        .select("row_id", "attr")
        .collect()
    }
    assert salted == plain and len(plain) == 1000


def test_salt_spreads_the_hot_key(spark):
    fact, _ = _skewed(spark)
    spread = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.col("row_id"), F.lit(8)).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    # all 8 salt slots occupied, each with ~500/8 rows
    assert len(spread) == 8
    assert all(40 <= r["count"] <= 90 for r in spread)


def test_outer_salted_join_keeps_unmatched_probe_rows(spark):
    fact, dim = _skewed(spark)
    extra = fact.unionByName(
        spark.createDataFrame([(9999, 777)], "row_id long, k long")
    )
    out = salted_equi_join(
        extra, dim, key="k", salt_src=F.col("row_id"), n_salts=8, how="left"
    )
    r = out.filter(F.col("row_id") == 9999).collect()
    assert len(r) == 1 and r[0].attr is None
