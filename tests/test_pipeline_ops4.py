"""Unit tests for the round-3 batch-3 operators: retention triangle on a
hand-built timeline, attribution frame semantics (no self-attribution,
'direct' fallback), split determinism under repartitioning, MAD on known
values, and the Morton-curve prefix/bounds properties."""

from __future__ import annotations

import datetime as dt

from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops4 import (
    text_boilerplate_chunk_df,
    text_bpe_merge_candidates,
    attribution_last_touch,
    cohort_retention_events,
    layout_zorder_manifest,
    split_train_valid_test,
    stats_robust_mad,
)

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    from conftest import write_events_parquet

    write_events_parquet(tmp_path / "events.parquet", rows)
    return str(tmp_path)


def test_cohort_retention_triangle(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12)  # Monday; week of 2024-01-01
    rows = [
        # user 1: first week 0, active weeks 0 and 2
        (1, t0, 1, "view", 1.0),
        (2, t0 + dt.timedelta(days=1), 1, "click", 1.0),  # same week, dedup
        (3, t0 + dt.timedelta(days=14), 1, "view", 1.0),
        # user 2: cohort one week later, active only then
        (4, t0 + dt.timedelta(days=7), 2, "view", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort_week, r.week_offset): r.n_active
        for r in cohort_retention_events(spark, sf).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_attribution_no_self_and_direct(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click then purchase → 'click' credited, not the later view
        (1, t0, 1, "click", 0.0),
        (2, t0 + dt.timedelta(minutes=1), 1, "purchase", 10.0),
        (3, t0 + dt.timedelta(minutes=2), 1, "view", 0.0),
        # user 2: purchase with no prior touch → 'direct', even though a
        # click exists LATER on the same timeline
        (4, t0, 2, "purchase", 5.0),
        (5, t0 + dt.timedelta(minutes=1), 2, "click", 0.0),
        # user 3: view then click then purchase → LAST touch wins
        (6, t0, 3, "view", 0.0),
        (7, t0 + dt.timedelta(minutes=1), 3, "click", 0.0),
        (8, t0 + dt.timedelta(minutes=2), 3, "purchase", 7.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.channel: (r.n_purchases, float(r.total_value))
        for r in attribution_last_touch(spark, sf).collect()
    }
    assert got == {"click": (2, 17.0), "direct": (1, 5.0)}


def test_split_deterministic_and_ratioed(spark):
    got = {
        (r.split, r.source): r.n_docs
        for r in split_train_valid_test(spark, SF).collect()
    }
    total = sum(got.values())
    train = sum(n for (s, _), n in got.items() if s == "train")
    # 96% target with hash noise on a small corpus
    assert 0.90 <= train / total <= 1.0
    # Pure function of content: identical manifest on a fresh run.
    again = {
        (r.split, r.source): r.n_docs
        for r in split_train_valid_test(spark, SF).collect()
    }
    assert got == again


def test_mad_known_values(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    # values 1..5 → median 3, |dev| = 2,1,0,1,2 → MAD 1; outlier needs
    # |v-3| > 3 → none. Add 100 → median 3.5, recompute by hand below.
    rows = [(i, t0, 1, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    sf = _write_events(spark, tmp_path, rows)
    r = stats_robust_mad(spark, sf).collect()[0]
    assert r.event_type == "a"
    assert r.median_value == 3.0 and r.mad_value == 1.0
    assert r.n_events == 5 and r.n_outliers == 0

    rows.append((99, t0, 1, "a", 100.0))
    sf = _write_events(spark, tmp_path, rows)
    r = stats_robust_mad(spark, sf).collect()[0]
    # 1,2,3,4,5,100 → median 3.5; |dev| = 2.5,1.5,0.5,0.5,1.5,96.5 →
    # MAD 1.5; threshold 4.5 → only 100 is an outlier.
    assert r.median_value == 3.5 and r.mad_value == 1.5
    assert r.n_outliers == 1


def test_zorder_prefix_is_tile_and_bounds_nested(spark):
    rows = layout_zorder_manifest(spark, SF).collect()
    assert rows, "manifest must be non-empty"
    for r in rows:
        # The tile id IS the z-prefix of every z in the tile.
        assert r.z_min >> 12 == r.tile and r.z_max >> 12 == r.tile
        assert 0 <= r.x_min <= r.x_max <= 255
        assert 0 <= r.y_min <= r.y_max <= 255
        # A 4-bit prefix of a 16-bit Morton code fixes the top 2 bits of
        # each dimension → each tile spans at most a 64-wide slab per axis.
        assert r.x_max - r.x_min <= 63
        assert r.y_max - r.y_min <= 63


def test_zorder_no_join_no_window(spark):
    plan = (
        layout_zorder_manifest(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan


def test_mad_stats_side_broadcasts(spark):
    plan = (
        stats_robust_mad(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def _write_docs(spark, tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_merge_candidates_hand_counts(spark, tmp_path):
    # vocabulary: "abab" x3, "ab" x2, "z" (dropped: len<2)
    sf = _write_docs(spark, tmp_path, ["abab abab ab z", "abab ab"])
    got = {r.pair: (r.total, r.n_words) for r in
           text_bpe_merge_candidates(spark, sf).collect()}
    # "abab": pairs ab,ba,ab → ab twice per occurrence; freq 3.
    # "ab": pair ab once; freq 2.
    assert got["ab"] == (3 * 2 + 2 * 1, 2)
    assert got["ba"] == (3, 1)
    assert set(got) == {"ab", "ba"}


def test_boilerplate_df_threshold(spark, tmp_path):
    boiler = "w1 w2 w3 w4 w5 w6 w7 w8"  # one aligned 8-token chunk
    uniq = ["u%d" % i for i in range(8)]
    # boiler chunk in 3 docs → flagged; the pairwise-shared chunk (docs
    # 3+4) has df=2 → NOT flagged at threshold 3.
    shared2 = "p1 p2 p3 p4 p5 p6 p7 p8"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            boiler + " " + " ".join(uniq),
            boiler,
            boiler,
            shared2,
            shared2,
        ],
    )
    r = text_boilerplate_chunk_df(spark, sf).collect()[0]
    assert r.n_docs == 5
    assert r.n_chunks == 6  # doc0: boiler+unique = 2; docs 1-4: 1 each
    assert r.n_boilerplate == 3  # the boiler chunk's 3 instances only
    assert r.n_boilerplate_distinct == 1


def test_bfs_distances_properties(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational5 import (
        graph_bfs_name_distances,
    )

    rows = graph_bfs_name_distances(spark, SF).collect()
    assert rows
    by_blk = {}
    for r in rows:
        by_blk.setdefault(r.blk, []).append(r)
    for blk, members in by_blk.items():
        dists = sorted(m.dist for m in members)
        # exactly one source at distance 0 per block
        assert dists.count(0) == 1
        # the source is the lexicographic minimum name of the block
        src = min(m.p_name for m in members)
        assert next(m.dist for m in members if m.p_name == src) == 0
        # distances are in {-1, 0..3}; no value exceeds the round count
        assert all(d == -1 or 0 <= d <= 3 for d in dists)


def test_epoch_shuffle_plans_window_group_limit_and_decorrelates(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops4 import (
        sample_epoch_shuffle,
    )

    df = sample_epoch_shuffle(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r.doc_id)
    assert set(by_epoch) == {0, 1, 2}
    # each epoch contributes exactly 5 positions and the permutations differ
    assert all(len(v) == 5 for v in by_epoch.values())
    assert by_epoch[0] != by_epoch[1] or by_epoch[1] != by_epoch[2]


def test_padding_efficiency_identity(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops4 import (
        pack_padding_efficiency,
    )

    for r in pack_padding_efficiency(spark, SF).collect():
        assert r.padded_len % 64 == 0
        assert r.padded_tokens == r.padded_len * r.n_docs
        assert 0.0 <= r.waste_ratio < 1.0
        assert r.real_tokens <= r.padded_tokens


def test_cdc_tombstone_not_resurrected(spark, tmp_path):
    """A key whose LATEST change is a delete must vanish even though an
    older upsert exists — the classic CDC-merge resurrection bug."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from prometheus_clickhouselog_exporter_spark.workloads.relational5 import (
        cdc_apply_latest_changes,
    )

    rows = [
        # key 1: U then D (latest) → gone
        (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "P1"),
        (2, 1, "F", 11.0, dt.datetime(2024, 1, 2), "P1"),
        # key 2: D then U (latest) → survives with the upsert payload
        (3, 2, "F", 20.0, dt.datetime(2024, 1, 1), "P2"),
        (4, 2, "O", 21.0, dt.datetime(2024, 1, 2), "P2"),
        # key 3: same-date tie broken by orderkey — higher key wins
        (5, 3, "O", 30.0, dt.datetime(2024, 1, 1), "P3"),
        (6, 3, "O", 31.0, dt.datetime(2024, 1, 1), "P3"),
    ]
    cols = list(zip(*rows))
    t = pa.table(
        {
            "o_orderkey": pa.array(cols[0], pa.int64()),
            "o_custkey": pa.array(cols[1], pa.int64()),
            "o_orderstatus": pa.array(cols[2], pa.string()),
            "o_totalprice": pa.array(cols[3], pa.float64()),
            "o_orderdate": pa.array(cols[4], pa.timestamp("us")),
            "o_orderpriority": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = {
        r.priority: (r.n_keys, r.total_price)
        for r in cdc_apply_latest_changes(spark, str(tmp_path)).collect()
    }
    assert got == {"P2": (1, 21.0), "P3": (1, 31.0)}


def test_share_of_total_sums_to_one(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational5 import (
        window_share_of_total,
    )

    rows = window_share_of_total(spark, SF).collect()
    by_region = {}
    g_total = 0.0
    for r in rows:
        by_region.setdefault(r.region, 0.0)
        by_region[r.region] += r.share_in_region
        g_total += r.share_global
    # fround(4) truncation: shares sum to 1 within rounding slack per group
    for region, s in by_region.items():
        assert abs(s - 1.0) < 0.002, (region, s)
    assert abs(g_total - 1.0) < 0.005
    # ranks are a permutation of 1..n within each region
    ranks = {}
    for r in rows:
        ranks.setdefault(r.region, []).append(r.rank_in_region)
    for region, ks in ranks.items():
        assert sorted(ks) == list(range(1, len(ks) + 1))


def test_ccnet_buckets_tercile_balance(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops4 import (
        quality_ccnet_buckets,
    )

    rows = quality_ccnet_buckets(spark, SF).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, {})[r.bucket] = r.n_docs
    for lang, b in per_lang.items():
        total = sum(b.values())
        # terciles: no bucket may hold more than ~60% unless scores tie heavily
        if total >= 9:
            assert max(b.values()) <= 0.67 * total + 2, (lang, b)


def test_spatial_pairs_profile(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational5 import (
        spatial_grid_proximity_join,
    )

    rows = {r.cheb: r.n_pairs for r in spatial_grid_proximity_join(spark, SF).collect()}
    assert set(rows) <= {1, 2} and rows, rows
    # ring growth: radius-2 shell has ~2x the sites of radius-1 on a dense grid
    if 1 in rows and 2 in rows:
        assert rows[2] > rows[1]


def test_quantile_disc_hand_values(spark, tmp_path):
    from prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops4 import (
        quantile_disc_doclen,
    )

    # lang 'a': lengths 10,20,30,40 → ceil(.25*4)=1 → 10; ceil(.5*4)=2 → 20;
    # ceil(.75*4)=3 → 30. lang 'b': single doc → all quantiles = it.
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["x", "x", "x", "x", "y"]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["a", "a", "a", "a", "b"], pa.string()),
            "source": pa.array(["s"] * 5, pa.string()),
            "n_chars": pa.array([10, 20, 30, 40, 7], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = {r.lang: (r.n_docs, r.p25, r.p50, r.p75)
           for r in quantile_disc_doclen(spark, str(tmp_path)).collect()}
    assert got == {"a": (4, 10, 20, 30), "b": (1, 7, 7, 7)}
