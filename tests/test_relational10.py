"""Hand-value and invariant tests for relational10 (outliers, LTV, HHI)."""

from __future__ import annotations

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational10 import (
    cohort_ltv_curves,
    embedding_outlier_zdist,
    market_hhi_by_brand,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hhi_monopoly_and_duopoly(spark, tmp_path):
    lines = [
        # brand B1: one supplier -> HHI 10000 (monopoly)
        Row(l_partkey=1, l_suppkey=1, l_extendedprice=100.0),
        Row(l_partkey=1, l_suppkey=1, l_extendedprice=50.0),
        # brand B2: two equal suppliers -> HHI 5000
        Row(l_partkey=2, l_suppkey=1, l_extendedprice=75.0),
        Row(l_partkey=2, l_suppkey=2, l_extendedprice=75.0),
    ]
    parts = [Row(p_partkey=1, p_brand="B1"), Row(p_partkey=2, p_brand="B2")]
    spark.createDataFrame(lines).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(parts).write.parquet(f"{tmp_path}/part.parquet")
    out = {r.brand: r for r in market_hhi_by_brand(spark, str(tmp_path)).collect()}
    assert out["B1"].hhi == 10000.0 and out["B1"].n_suppliers == 1
    assert out["B2"].hhi == 5000.0 and out["B2"].n_suppliers == 2


def test_ltv_monotone_per_cohort(spark):
    rows = cohort_ltv_curves(spark, SF_DIR).collect()
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append((r.age, r.cum_revenue))
    assert by_cohort
    for series in by_cohort.values():
        series.sort()
        revs = [v for _, v in series]
        assert all(a <= b for a, b in zip(revs, revs[1:]))  # cumulative


def test_outliers_ranked_desc_and_stable(spark):
    rows = embedding_outlier_zdist(spark, SF_DIR).collect()
    assert len(rows) == 20
    dists = [r.qdist for r in rows]
    assert dists == sorted(dists, reverse=True)
    rows2 = embedding_outlier_zdist(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]
