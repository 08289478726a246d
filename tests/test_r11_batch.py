"""Round 11 batch: Bartlett, Mood's median, Kuiper/Watson uniformity,
ESD rounds, Kendall's W, STL strength, Platt scaling, holt_winters,
k-truss — semantic invariants beyond the cross-engine hash gate."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_bartlett_planted_unequal_variances(spark):
    """Two planted groups with sd ratio ~10 must drive T far past the
    chi2_1 1% point (6.63); equal-variance groups must stay small."""
    rows = []
    for i in range(400):
        tight = 1000.0 + ((i * 7) % 21 - 10) * 0.5     # sd ~ 3
        wide = 1000.0 + ((i * 13) % 21 - 10) * 30.0    # sd ~ 180
        rows.append((2 * i, "1-URGENT", tight, "1996-01-02"))
        rows.append((2 * i + 1, "2-HIGH", wide, "1996-01-02"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/orders.parquet")
        out = QUERIES["stats_bartlett_test"](spark, td).collect()[0]
    assert out.n_groups == 2 and out.df == 1
    assert out.t_bartlett > 100.0  # massively unequal variances


def test_moods_median_partition_and_chi2(spark):
    rows = QUERIES["stats_moods_median"](spark, SF_DIR).collect()
    assert len(rows) == 5  # languages
    chi2 = rows[0].chi2
    assert all(r.chi2 == chi2 for r in rows)  # constant column
    assert chi2 >= 0.0
    for r in rows:
        assert 0 <= r.n_above <= r.n
        # expected count under H0 stays inside the group size
        assert 0.0 <= r.e_above <= r.n


def test_kuiper_and_watson_uniform_hash_pass(spark):
    kp = QUERIES["stats_kuiper_uniformity"](spark, SF_DIR).collect()[0]
    wu = QUERIES["stats_watson_u2"](spark, SF_DIR).collect()[0]
    assert kp.v_kuiper >= max(kp.d_plus, kp.d_minus) - 1e-12
    assert abs(kp.v_kuiper - (kp.d_plus + kp.d_minus)) < 2e-9
    assert kp.pass_1pct  # the md5 hash family IS uniform
    assert wu.u2_watson >= 0.0
    assert wu.u2_watson <= wu.w2_cvm + 1e-9  # U2 = W2 - n(ubar-1/2)^2
    assert wu.pass_1pct


def test_esd_rounds_shrink_and_are_distinct(spark):
    rows = QUERIES["stats_esd_outlier_rounds"](spark, SF_DIR).collect()
    assert [r.step for r in rows] == [1, 2, 3]
    assert rows[0].n_before == rows[1].n_before + 1 == rows[2].n_before + 2
    assert len({r.removed_day for r in rows}) == 3
    assert all(r.r_stat > 0 for r in rows)


def test_kendalls_w_bounds_and_chi2_identity(spark):
    out = QUERIES["eval_kendalls_w"](spark, SF_DIR).collect()[0]
    assert out.n_items == 25 and out.m_raters == 3
    assert 0.0 <= out.w_kendall <= 1.0
    # chi2 = m (n-1) W, both frounded at 1e-6 from the same W
    assert abs(out.chi2 - 3 * 24 * out.w_kendall) < 2e-4


def test_stl_strength_bounds(spark):
    out = QUERIES["timeseries_stl_strength"](spark, SF_DIR).collect()[0]
    assert 0.0 <= out.f_trend <= 1.0
    assert 0.0 <= out.f_seasonal <= 1.0
    assert out.var_remainder >= 0.0
    assert out.n_days_used > 100


def test_platt_targets_regularize(spark):
    """Platt's soft targets keep probabilities strictly inside (0,1):
    a perfectly separable planted score must NOT saturate to 0/1e6 —
    that is the feature distinguishing this from plain logistic."""
    rows = []
    for i in range(300):
        # quantity 1..10 -> never returned; 41..50 -> always returned
        rows.append((2 * i, "N", float(1 + i % 10)))
        rows.append((2 * i + 1, "R", float(41 + i % 10)))
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_quantity double"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/lineitem.parquet")
        out = QUERIES["ml_platt_scaling"](spark, td).collect()[0]
    assert out.n_pos == 300
    assert out.b1_q > 0  # higher score -> higher P(returned)
    assert 0 < out.p_at_25_q < 1_000_000


def test_holt_winters_constant_series_is_fixed_point(spark):
    """A constant series is a fixed point of the recurrence: smoothed
    equals the constant and trend is 0 for every series."""
    rows = []
    for i in range(240):
        ts = "2024-01-%02d %02d:15:00" % (1 + i // 24, i % 24)
        rows.append((2 * i, ts, 1, "click", 42.0, None))
        rows.append((2 * i + 1, ts, 1, "view", 7.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = {
            r.event_type: r
            for r in QUERIES["promql_holt_winters"](spark, td).collect()
        }
    assert out["click"].smoothed == 42.0 and out["click"].trend == 0.0
    assert out["view"].smoothed == 7.0 and out["view"].trend == 0.0
    assert out["click"].n_points == 240


def test_ktruss_corpus_invariants(spark):
    rows = QUERIES["graph_ktruss_edges"](spark, SF_DIR).collect()
    assert rows, "name-similarity graph has no blocks at sf0.001?"
    for r in rows:
        assert r.n_edges_truss <= r.n_edges_0
        assert r.converged  # 4 rounds reached the fixpoint at this SF


def test_ktruss_planted_clique_vs_chain(spark):
    """Planted 4-clique must survive 4-truss peeling; a triangle-free
    chain must peel to nothing. Blocks come from the SECOND name token,
    so the stem varies and the block token is shared."""
    clique = ["u1 c", "u2 c", "u3 c", "u4 c"]
    # pairwise lev(ui, uj) = 1 <= 2: all 6 edges, every edge in 2
    # triangles -> survives 4-truss
    chain = ["w1111 d", "w1122 d", "w2222 d", "w2233 d", "w3333 d"]
    # consecutive lev = 2, skip-pairs lev = 4 > 2: path graph, no
    # triangles -> peels to nothing
    df = spark.createDataFrame(
        [(n,) for n in clique + chain], "p_name string"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/part.parquet")
        out = {
            r.blk: r for r in QUERIES["graph_ktruss_edges"](spark, td).collect()
        }
    assert out["c"].n_edges_0 == 6 and out["c"].n_edges_truss == 6
    assert out["c"].converged
    assert out["d"].n_edges_0 == 4 and out["d"].n_edges_truss == 0
    assert out["d"].converged


def test_conover_planted_unequal_variances(spark):
    """Same planted two-group fixture as Bartlett: the rank-based scale
    test must also reject equality decisively."""
    rows = []
    for i in range(400):
        tight = 1000.0 + ((i * 7) % 21 - 10) * 0.5
        wide = 1000.0 + ((i * 13) % 21 - 10) * 30.0
        rows.append((2 * i, "1-URGENT", tight, "1996-01-02"))
        rows.append((2 * i + 1, "2-HIGH", wide, "1996-01-02"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/orders.parquet")
        out = QUERIES["stats_conover_squared_ranks"](spark, td).collect()[0]
    assert out.n_groups == 2 and out.df == 1
    assert out.t_conover > 50.0


def test_pettitt_planted_step_change(spark):
    """A level shift at a known day must be located exactly and be
    overwhelmingly significant."""
    rows = []
    oid = 0
    for day in range(1, 29):  # Jan 1..28, one order per day
        level = 100.0 if day <= 14 else 10000.0
        rows.append((oid, "1-URGENT", level, "1996-01-%02d" % day))
        oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/orders.parquet")
        out = QUERIES["stats_pettitt_changepoint"](spark, td).collect()[0]
    assert out.n_days == 28
    assert out.change_day == "1996-01-14"  # last day of the low regime
    assert out.significant
    # prefix ranks are LOW before an upward shift -> U_t negative
    assert not out.shift_down


def test_skeleton_blocking_vowel_typos_share_blocks(spark):
    """Vowel-level typos must land in one skeleton block and verify;
    consonant-different names must not be candidates at all."""
    names = ["green metal", "grean metal", "blue steel", "blae steel",
             "red brick"]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/part.parquet")
        out = QUERIES["er_consonant_skeleton_blocking"](spark, td).collect()[0]
    assert out.n_names == 5
    # green/grean -> 'grnmtl', blue/blae -> 'blstl': exactly 2 candidate
    # pairs, both within levenshtein 2
    assert out.candidate_pairs == 2
    assert out.verified_pairs == 2
    assert out.precision_q == 1.0
