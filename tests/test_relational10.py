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


def test_cusum_closed_form_equals_recursion(spark, tmp_path):
    import datetime

    from prometheus_clickhouselog_exporter_spark.workloads.relational10 import (
        events_cusum_changepoint,
    )

    # daily counts: 3,3,3,30,30,3 -> mean 12 -> k=13; recursion:
    # S = max(0, S + c - k): 0,0,0,17,34,24
    counts = [3, 3, 3, 30, 30, 3]
    rows = []
    eid = 0
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=datetime.datetime(2024, 1, day, 12), user_id=1)
            )
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # recursion peak 34; days with S>20 are day5 (34) and day6 (24)
    assert r.max_cusum == 34 and r.n_alarm_days == 2 and r.n_days == 6


def test_video_scene_cut_finds_true_boundary_first(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata6 import (
        multimodal_video_scene_cuts,
    )

    rows = multimodal_video_scene_cuts(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # the injected scene change at nf//2 is always the FIRST detection;
        # later threshold crossings (mod-wrap artifacts) may follow.
        assert r.cut_at == r.n_frames // 2
        assert r.n_cuts >= 1 and r.cut_motion > 60.0
