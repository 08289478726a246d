"""Hand-value and invariant tests for pipeline_ops5 (fuzzy ER join,
rolling distinct, weighted median, Poisson-bootstrap CI)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops5 import (
    er_fuzzy_levenshtein_join,
    stats_bootstrap_ci_mean,
    stats_weighted_median,
    window_rolling_distinct_users,
)

SF_DIR = "/root/testdata/sf0.001"


def test_fuzzy_join_hand_values(spark, tmp_path):
    rows = [
        Row(p_partkey=1, p_brand="B1", p_name="cold widget"),
        Row(p_partkey=2, p_brand="B1", p_name="bold widget"),  # dist 1 to "cold"
        Row(p_partkey=3, p_brand="B1", p_name="colossal widget"),  # dist 5, cut
        Row(p_partkey=4, p_brand="B1", p_name="cold bolt"),  # other block
        Row(p_partkey=5, p_brand="B2", p_name="cold widget"),  # other brand
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/part.parquet")
    out = er_fuzzy_levenshtein_join(spark, str(tmp_path)).collect()
    assert [(r.pk_a, r.pk_b, r.dist) for r in out] == [(1, 2, 1)]


def test_rolling_distinct_hand_values(spark, tmp_path):
    def ev(eid, day, user):
        return Row(
            event_id=eid,
            ts=datetime.datetime(2024, 1, day, 12, 0, 0),
            user_id=user,
        )

    rows = [ev(1, 1, 100), ev(2, 5, 200), ev(3, 9, 100), ev(4, 9, 100)]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r.day: r.n_users_7d
        for r in window_rolling_distinct_users(spark, str(tmp_path)).collect()
    }
    # day 1: {100}; day 5: {100 (d1 within 7d), 200}; day 9: {200 (d5), 100}
    assert out == {"2024-01-01": 1, "2024-01-05": 2, "2024-01-09": 2}


def test_weighted_median_hand_values(spark, tmp_path):
    rows = [
        Row(l_returnflag="A", l_extendedprice=10.0, l_quantity=1.0, l_orderkey=1, l_linenumber=1),
        Row(l_returnflag="A", l_extendedprice=20.0, l_quantity=1.0, l_orderkey=2, l_linenumber=1),
        Row(l_returnflag="A", l_extendedprice=30.0, l_quantity=2.0, l_orderkey=3, l_linenumber=1),
        # flag B: single heavy row IS the median
        Row(l_returnflag="B", l_extendedprice=99.0, l_quantity=5.0, l_orderkey=4, l_linenumber=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.flag: r for r in stats_weighted_median(spark, str(tmp_path)).collect()}
    # A: total weight 4, running weights 1,2,4 — first 2*cw >= 4 is price 20
    assert out["A"].total_weight == 4 and out["A"].weighted_median == 20.0
    assert out["B"].total_weight == 5 and out["B"].weighted_median == 99.0


def test_bootstrap_ci_brackets_mean(spark):
    r = stats_bootstrap_ci_mean(spark, SF_DIR).collect()[0]
    assert r.b_used == 100
    assert r.ci_lo < r.ci_hi
    # the 95% interval of a 100-replicate bootstrap brackets the sample mean
    assert r.ci_lo <= r.sample_mean <= r.ci_hi


def test_multivar_ols_matches_numpy(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops5 import (
        stats_multivar_ols_2f,
    )

    rows = {r.lang: r for r in stats_multivar_ols_2f(spark, SF_DIR).collect()}
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["lang", "text", "n_chars"]
    ).to_pandas()
    for lang, grp in tbl.groupby("lang"):
        toks = grp["text"].str.split(" ")
        x1 = toks.str.len().to_numpy(dtype=float)
        x2 = toks.apply(lambda t: len(set(t))).to_numpy(dtype=float)
        y = grp["n_chars"].to_numpy(dtype=float)
        X = np.column_stack([np.ones_like(x1), x1, x2])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        r = rows[lang]
        assert abs(r.intercept - beta[0]) < 1e-6 * max(1, abs(beta[0]))
        assert abs(r.beta_tokens - beta[1]) < 1e-6 * max(1, abs(beta[1]))
        assert abs(r.beta_distinct - beta[2]) < 1e-6 * max(1, abs(beta[2]))


def test_seasonal_decomposition_centers_on_one(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational9 import (
        timeseries_decompose_trend_seasonal,
    )

    rows = timeseries_decompose_trend_seasonal(spark, SF_DIR).collect()
    assert len(rows) == 12
    mean_idx = sum(r.seasonal_index for r in rows) / len(rows)
    assert 0.9 < mean_idx < 1.1  # multiplicative indices center on ~1
