"""Round 9 batch 2: Kruskal–Wallis, *_over_time, sequenceNextNode,
freshness SLA, proximity search, LSH-CC dedup clusters, tokenizer
fertility, DoReMi weights — semantic invariants beyond the hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def test_kruskal_wallis_invariants(spark):
    r = QUERIES["stats_kruskal_wallis"](spark, SF_DIR).collect()[0]
    assert r.n > 0 and r.k == 5 and r.df == 4
    assert r.h >= 0
    # n_chars has ties, so the tie factor < 1 and correction raises H
    assert r.h_tie_corrected >= r.h


def test_sequence_next_node_partitions_viewers(spark):
    rows = QUERIES["clickhouse_sequence_next_node"](spark, SF_DIR).collect()
    n_viewers = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_viewers


def test_freshness_sla_consistency(spark):
    for r in QUERIES["dq_freshness_sla"](spark, SF_DIR).collect():
        assert r.lag_minutes >= 0 and r.n_last24h <= r.n_rows
        if r.breached:
            assert r.lag_minutes >= r.sla_minutes


def test_proximity_rows_obey_gate(spark):
    rows = QUERIES["text_proximity_search"](spark, SF_DIR).collect()
    assert rows, "fixture corpus contains both query terms"
    for r in rows:
        assert 0 <= r.min_dist <= 3 and r.n_a >= 1 and r.n_b >= 1


def test_cc_clusters_reach_fixpoint(spark):
    rows = QUERIES["dedup_minhash_clusters_cc"](spark, SF_DIR).collect()
    assert rows and all(r.n_members >= 2 for r in rows)
    assert all(r.cluster_id == r.keeper_id for r in rows)  # min-label = keeper
    assert all(r.n_removed == r.n_members - 1 for r in rows)
    # one MORE propagation round must not move any label: rebuild edges,
    # seed labels from the query's clusters, and relax once
    from prometheus_clickhouselog_exporter_spark.operators.dedup import (
        minhash_lsh_dedup,
    )

    d = table(spark, SF_DIR, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    pairs = minhash_lsh_dedup(d, "text", "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    )
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = e.select(F.col("src").alias("id")).distinct()
    cur = nodes.withColumn("label", F.col("id"))
    for _ in range(7):  # one MORE than the query uses
        best = (
            e.join(cur.select(F.col("id").alias("src"), F.col("label").alias("sl")), "src")
            .groupBy("dst")
            .agg(F.min("sl").alias("nl"))
        )
        cur = cur.join(best, cur["id"] == best["dst"], "left").select(
            "id",
            F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                "label"
            ),
        ).localCheckpoint(eager=False)
    census7 = (
        cur.groupBy(F.col("label").cast("bigint").alias("cluster_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .collect()
    )
    got = {(r.cluster_id, r.n_members) for r in rows}
    assert {(r.cluster_id, r.n_members) for r in census7} == got


def test_doremi_shares_normalize_and_tilt_tracks_surprisal(spark):
    rows = QUERIES["sample_doremi_weights"](spark, SF_DIR).collect()
    assert len(rows) == 20
    total = sum(r.new_share_q for r in rows)
    assert abs(total - 1_000_000) <= len(rows)  # floor-div slack only
    by_surprisal = sorted(rows, key=lambda r: r.surprisal_q)
    tilts = [r.tilt_q for r in by_surprisal]
    assert tilts == sorted(tilts)  # exp is monotone in excess loss


def test_fertility_at_least_one(spark):
    for r in QUERIES["text_tokenizer_fertility"](spark, SF_DIR).collect():
        assert r.fertility >= 1.0  # a pre-tokenizer never merges words
        assert r.chars_per_token > 0


def test_range_interval_frame_includes_self(spark):
    rows = QUERIES["window_range_interval_trailing"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:200]:
        assert r.trailing_6h_n >= 1  # frame always includes current row


def test_changes_absent_grid_is_complete(spark):
    rows = QUERIES["promql_changes_absent"](spark, SF_DIR).collect()
    hours = {r.hr for r in rows}
    types = {r.event_type for r in rows}
    assert len(rows) == len(hours) * len(types)  # full calendar grid
    for r in rows:
        assert r.absent == (r.n_samples == 0)
        assert r.changes <= max(r.n_samples - 1, 0)


def test_textrank_scores_positive_topk(spark):
    rows = QUERIES["text_keyphrase_textrank"](spark, SF_DIR).collect()
    assert len(rows) == 10
    scores = [r.score_q for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 150_000 for s in scores)  # every top word has inlinks


def test_logistic_newton_improves_likelihood(spark):
    r = QUERIES["ml_logistic_newton2"](spark, SF_DIR).collect()[0]
    assert r.n > 0
    # null model LL (b=0): n * ln(0.5) in micro-nats; 2 Newton steps on a
    # convex problem must not be worse than the start
    null_ll = r.n * -693_148  # ln(0.5) * 1e6, ceil'd per-row floor slack
    assert r.ll_q >= null_ll
    # error rate ~20% => negative intercept
    assert r.b0_q < 0


def test_lss_cc_fixpoint_and_algorithm_equivalence(spark):
    """One more large-star/small-star pair must not change the census,
    and the census must equal min-label propagation's (two algorithms,
    one fixpoint)."""
    lss = {
        (r.component, r.n_members)
        for r in QUERIES["graph_cc_large_small_star"](spark, SF_DIR).collect()
    }
    lp = {
        (r.component, r.n_members)
        for r in QUERIES["graph_connected_components"](spark, SF_DIR).collect()
    }
    assert lss == lp


def test_topk_bottomk_shapes(spark):
    rows = QUERIES["promql_topk_bottomk"](spark, SF_DIR).collect()
    by_hr = {}
    for r in rows:
        by_hr.setdefault((r.hr, r.role), []).append(r)
    for (hr, role), grp in by_hr.items():
        if role == "topk":
            assert len(grp) <= 2
            vals = [g.sum_cents for g in sorted(grp, key=lambda g: g.rk)]
            assert vals == sorted(vals, reverse=True)
        else:
            assert len(grp) == 1
    # bottomk value never exceeds any topk value in the same hour
    for hr in {r.hr for r in rows}:
        tk = [r.sum_cents for r in rows if r.hr == hr and r.role == "topk"]
        bk = [r.sum_cents for r in rows if r.hr == hr and r.role == "bottomk"]
        if tk and bk:
            assert min(bk) <= max(tk)


def test_reconcile_partitions_orders(spark):
    rows = QUERIES["dq_orders_lineitem_reconcile"](spark, SF_DIR).collect()
    for r in rows:
        assert (
            r.n_no_lineitems + r.n_within_1pct + r.n_1_to_10pct + r.n_over_10pct
            == r.n_orders
        )


def test_two_proportion_ztest_consistency(spark):
    r = QUERIES["stats_two_proportion_ztest"](spark, SF_DIR).collect()[0]
    assert 0 <= r.xt <= r.nt and 0 <= r.xc <= r.nc
    # z and diff must share a sign
    assert (r.z >= 0) == (r.diff >= 0)


def test_largest_remainder_sums_to_budget(spark):
    rows = QUERIES["sample_largest_remainder"](spark, SF_DIR).collect()
    assert sum(r.alloc for r in rows) == 1000
    assert all(r.extra in (0, 1) for r in rows)
    assert all(r.alloc in (r.base_alloc, r.base_alloc + 1) for r in rows)


def test_histogram_fraction_brackets_exact(spark):
    for r in QUERIES["promql_histogram_fraction"](spark, SF_DIR).collect():
        # the ladder estimate must land within the straddling bucket's mass
        lo = r.le_40 / r.n
        hi = r.le_50 / r.n
        assert lo - 1e-9 <= r.frac_le_x_est <= hi + 1e-9
        assert lo - 1e-9 <= r.frac_le_x_exact <= hi + 1e-9


def test_changes_absent_null_boundary(spark, tmp_path):
    """ADVICE r9: the absent() grid must come from the FILTERED samples on
    both engines. Fixture has a NULL-valued event extending min/max hour
    and an all-NULL series — neither may widen the grid or add a series."""
    import duckdb
    import pandas as pd

    from prometheus_clickhouselog_exporter_spark.workloads import ORACLE

    rows = [
        # valid samples: 2 series, hours 10..12 (hour 11 absent for 'b')
        (1, "2026-01-01 10:00:05", 7, "a", 1.0, None),
        (2, "2026-01-01 10:30:00", 7, "a", 2.0, None),
        (3, "2026-01-01 11:00:00", 8, "a", 2.0, None),
        (4, "2026-01-01 12:10:00", 8, "a", 3.0, None),
        (5, "2026-01-01 10:20:00", 9, "b", 5.0, None),
        (6, "2026-01-01 12:40:00", 9, "b", 5.0, None),
        # NULL-valued boundary events: hours 08 and 15 must NOT appear
        (7, "2026-01-01 08:00:00", 7, "a", None, None),
        (8, "2026-01-01 15:00:00", 9, "b", None, None),
        # all-NULL series: must NOT appear as a grid series
        (9, "2026-01-01 11:30:00", 7, "ghost", None, None),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    got = (
        QUERIES["promql_changes_absent"](spark, str(tmp_path))
        .toPandas()
        .sort_values(["event_type", "hr"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    want = (
        con.execute(ORACLE["promql_changes_absent"])
        .df()
        .sort_values(["event_type", "hr"])
        .reset_index(drop=True)
    )
    assert set(got["event_type"]) == {"a", "b"}
    assert got["hr"].min().hour == 10 and got["hr"].max().hour == 12
    assert len(got) == len(want) == 6
    for col in ["event_type", "n_samples", "changes", "absent"]:
        assert list(got[col]) == list(want[col]), col
    assert bool(got.loc[(got.event_type == "b") & (got.hr.dt.hour == 11), "absent"].iloc[0])
