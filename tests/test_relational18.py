"""Hand-value and invariant tests for relational18 (pipe syntax,
Brown–Forsythe, keyness)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.relational18 import (
    sql_pipe_syntax_surface,
    stats_levene_bf,
    text_keyness_chi2,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pipe_equals_classic_q1_shape(spark):
    """The pipe form must equal the classic DataFrame form row-for-row."""
    from pyspark.sql import functions as F
    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    li = table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") < 45)
    classic = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    piped = sql_pipe_syntax_surface(spark, SF_DIR).collect()
    assert [tuple(r) for r in piped] == [tuple(r) for r in classic]


def test_brown_forsythe_matches_scipy_formula(spark):
    """W equals the textbook computation replayed in numpy."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT c_mktsegment, CAST(floor(c_acctbal * 100) AS BIGINT)
            FROM '{SF_DIR}/customer.parquet'"""
    ).fetchall()
    groups: dict[str, list] = {}
    for seg, x in rows:
        groups.setdefault(seg, []).append(x)
    z_groups = []
    for seg in groups:
        xs = np.array(sorted(groups[seg]), dtype=np.int64)
        med = xs[(len(xs) + 1) // 2 - 1]  # lower median, the rank rule
        z_groups.append(np.abs(np.array(groups[seg]) - med).astype(np.float64))
    k = len(z_groups)
    nt = sum(len(z) for z in z_groups)
    grand = sum(z.sum() for z in z_groups) / nt
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in z_groups)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in z_groups)
    w = (ssb / (k - 1)) / (ssw / (nt - k))
    out = stats_levene_bf(spark, SF_DIR).collect()[0]
    assert out.n_obs == nt and out.n_groups == k
    assert abs(out.bf_w - w) < 1e-3


def test_keyness_hand_corpus(spark, tmp_path):
    """A token exclusive to one source and frequent must key for it."""
    rows = []
    common = "alpha beta gamma delta " * 20
    for i in range(30):
        rows.append(Row(doc_id=i, text=common.strip(), lang="en",
                        source="plain", n_chars=1))
    for i in range(30, 60):
        rows.append(Row(doc_id=i, text=(common + "zebra " * 10).strip(),
                        lang="en", source="spiky", n_chars=1))
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = text_keyness_chi2(spark, str(tmp_path)).collect()
    spiky_top = [r.token for r in out if r.source == "spiky" and r.rank == 1]
    assert spiky_top == ["zebra"]
    for r in out:
        assert r.chi2 >= 0 and 1 <= r.rank <= 3


def test_autocorr_detects_weekly_cycle(spark, tmp_path):
    """A strict 7-day periodic series must peak ACF at lag 7."""
    import datetime as dt
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.relational19 import (
        timeseries_autocorr_daily,
    )

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for day in range(49):
        n = 20 if day % 7 == 0 else 3
        for _ in range(n):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=day),
                            user_id=1, event_type="view", value=1.0, props="{}"))
            eid += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {r.lag: r.acf for r in timeseries_autocorr_daily(spark, str(tmp_path)).collect()}
    assert out[7] == max(out.values())
    assert out[7] > 0.9
    assert out[1] < 0.2


def test_duplicate_event_screen_hand_corpus(spark, tmp_path):
    import datetime as dt
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.relational19 import (
        dq_duplicate_event_screen,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=t + dt.timedelta(seconds=30), user_id=1,
            event_type="view", value=1.0, props="{}"),       # dup pair (1,2)
        Row(event_id=3, ts=t + dt.timedelta(hours=2), user_id=1,
            event_type="view", value=1.0, props="{}"),       # too late
        Row(event_id=4, ts=t, user_id=1, event_type="click",
            value=1.0, props="{}"),                          # other type
        Row(event_id=5, ts=t, user_id=2, event_type="view",
            value=1.0, props="{}"),                          # other user
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    got = [(r.event_a, r.event_b, r.gap_sec)
           for r in dq_duplicate_event_screen(spark, str(tmp_path)).collect()]
    assert got == [(1, 2, 30)]


def test_cohens_d_zero_for_identical_groups(spark, tmp_path):
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.relational19 import (
        stats_cohens_d,
    )

    rows = [
        Row(c_custkey=i, c_name=f"c{i}", c_nationkey=0,
            c_acctbal=float(100 + (i // 2) % 10), c_mktsegment="X")
        for i in range(200)  # parity pairs share the same value
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/customer.parquet")
    out = stats_cohens_d(spark, str(tmp_path)).collect()[0]
    assert out.n_a == out.n_b == 100
    assert out.mean_a == out.mean_b
    assert out.cohens_d == 0.0


def test_copurchase_degree_buckets_consistent(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational19 import (
        graph_copurchase_degree,
    )

    rows = graph_copurchase_degree(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (1 << (r.bucket - 1)) <= r.min_deg <= r.max_deg < (1 << r.bucket)


def test_interarrival_cv_poisson_vs_scheduled(spark, tmp_path):
    """A perfectly regular series has CV ~= 0; the real corpus is near
    1 (Poisson-ish synthetic arrivals)."""
    import datetime as dt
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata10 import (
        events_interarrival_cv,
    )

    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i),
            user_id=1, event_type="cron", value=1.0, props="{}")
        for i in range(50)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = events_interarrival_cv(spark, str(tmp_path)).collect()[0]
    assert out.event_type == "cron" and out.n == 49
    assert out.cv == 0.0 and out.mean_gap_sec == 600
    real = {r.event_type: r.cv for r in events_interarrival_cv(spark, SF_DIR).collect()}
    assert all(0.5 < cv < 2.0 for cv in real.values())


def test_collocation_lift_finds_glued_pair(spark, tmp_path):
    """A bigram that ALWAYS co-occurs ('new york') outranks free pairs."""
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata10 import (
        text_collocations_lift,
    )

    words = ["the", "cat", "sat", "on", "mat", "near", "dog", "and", "bird"]
    rows = []
    for i in range(20):
        # rotate the filler per doc so filler adjacencies VARY while
        # 'new york' is always glued
        rot = words[i % len(words):] + words[: i % len(words)]
        text = " ".join(rot) + " new york " + " ".join(reversed(rot)) + " new york"
        rows.append(Row(doc_id=i, text=text, lang="en", source="s", n_chars=1))
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = text_collocations_lift(spark, str(tmp_path)).collect()
    assert out[0].bigram == "new york"
    assert out[0].lift == max(r.lift for r in out)


def test_sla_quantiles_ordered_and_bounded(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational20 import (
        sla_ship_delay_quantiles,
    )

    rows = sla_ship_delay_quantiles(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days <= r.max_days
        assert r.n_lines > 0


def test_audience_overlap_matches_set_algebra(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational20 import (
        audience_overlap_matrix,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    sets: dict[str, set] = {}
    for e in ev:
        sets.setdefault(e.event_type, set()).add(e.user_id)
    got = {(r.type_a, r.type_b): (r.n_a, r.n_b, r.n_both)
           for r in audience_overlap_matrix(spark, SF_DIR).collect()}
    types = sorted(sets)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            assert got[(a, b)] == (
                len(sets[a]), len(sets[b]), len(sets[a] & sets[b])
            )


def test_bag_semantics_multiplicity_hand_corpus(spark, tmp_path):
    """intersectAll keeps min multiplicity; exceptAll keeps the excess."""
    import datetime as dt
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.relational20 import (
        setops_bag_semantics,
    )

    rows = []
    okey = 0
    # part 1: 3 'R' rows, 1 'F' row -> intersect 1 copy, except 2 copies
    for flag, status, cnt in [("R", "O", 3), ("N", "F", 1)]:
        for _ in range(cnt):
            rows.append(Row(l_orderkey=okey, l_partkey=1, l_suppkey=1,
                            l_linenumber=1, l_quantity=1.0,
                            l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                            l_returnflag=flag, l_linestatus=status,
                            l_shipdate=dt.datetime(2024, 1, 1)))
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.op: r for r in setops_bag_semantics(spark, str(tmp_path)).collect()}
    assert out["intersect_all"].n_rows == 1
    assert out["except_all"].n_rows == 2  # 3 R-copies minus 1 F-copy
    assert out["except_all"].n_keys == 1


def test_loo_encoding_excludes_own_target(spark, tmp_path):
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.relational20 import (
        ml_target_encoding_loo,
    )

    rows = [
        Row(c_custkey=1, c_name="a", c_nationkey=0, c_acctbal=10.0,
            c_mktsegment="X"),
        Row(c_custkey=2, c_name="b", c_nationkey=0, c_acctbal=20.0,
            c_mktsegment="X"),
        Row(c_custkey=3, c_name="c", c_nationkey=0, c_acctbal=60.0,
            c_mktsegment="X"),
        Row(c_custkey=4, c_name="d", c_nationkey=0, c_acctbal=5.0,
            c_mktsegment="SOLO"),  # singleton -> dropped
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/customer.parquet")
    got = {r.c_custkey: r.loo_encoding
           for r in ml_target_encoding_loo(spark, str(tmp_path)).collect()}
    assert got == {1: 40.0, 2: 35.0, 3: 15.0}


def test_wilcoxon_balanced_and_shifted(spark, tmp_path):
    """Symmetric growth/decline -> W+ ~ W-; uniform growth -> W- == 0."""
    import datetime as dt
    from pyspark.sql import Row
    from prometheus_clickhouselog_exporter_spark.workloads.relational20 import (
        stats_wilcoxon_signed_rank,
    )

    rows, okey = [], 0
    lo, hi = dt.datetime(2024, 1, 1), dt.datetime(2024, 12, 31)
    for cust in range(20):
        # first half: 100; second half: 100 + (cust+1)*10 -> ALL grow
        for ts, amt in [(lo, 100.0), (hi, 100.0 + (cust + 1) * 10)]:
            rows.append(Row(o_orderkey=okey, o_custkey=cust, o_orderstatus="F",
                            o_totalprice=amt, o_orderdate=ts,
                            o_orderpriority="1-URGENT"))
            okey += 1
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = stats_wilcoxon_signed_rank(spark, str(tmp_path)).collect()[0]
    assert out.n_pairs == 20
    assert out.w_minus_x2 == 0 and out.w_plus_share == 1.0
    # doubled rank sums total n(n+1)
    assert out.w_plus_x2 + out.w_minus_x2 == 20 * 21
