"""Round 7 batch 7: ClickHouse analytic-function parity.

The reference exports ClickHouse server logs (SURVEY §0) — its users
are ClickHouse users, and the analytics they run on event streams lean
on ClickHouse's signature parametric aggregates. This module
re-expresses the published semantics of the two most-used ones —
``windowFunnel`` (max consecutive funnel stage reached, all stages
inside a window anchored at the first stage) and ``retention`` (array
of "did condition_1 AND condition_i" flags) plus ``uniqUpTo(N)`` — as
pure DataFrame plans, so a ClickHouse user's funnel/retention queries
port over with the same answers.

windowFunnel is deliberately LINEAR: instead of joining every anchor
to every candidate next stage (quadratic per key), each event row
carries "earliest strictly-later click ts" / "earliest strictly-later
purchase ts" via reverse-ordered per-user window minima; stage 3 needs
the future-purchase value AT the chosen click row, recovered by one
equi-join on (user, click ts) — the published semantics, zero range
joins. (ClickHouse's own implementation is a per-key in-memory sweep;
this is the shuffle-friendly rendering of the same sweep.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_W_SECONDS = 3600  # funnel window, anchored at the stage-1 event


@query(
    "clickhouse_window_funnel",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_type, event_id FROM events
    ),
    fut AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase
      FROM e
    ),
    anchors AS (
      SELECT a.user_id, a.ts AS t1, a.next_click AS t2,
             c.next_purchase AS t3
      FROM fut a
      LEFT JOIN fut c
        ON c.user_id = a.user_id AND c.ts = a.next_click
       AND c.event_type = 'click'
      WHERE a.event_type = 'view'
    ),
    lvl AS (
      SELECT user_id,
             CASE
               WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL {_W_SECONDS} SECOND
                AND t3 IS NOT NULL AND t3 <= t1 + INTERVAL {_W_SECONDS} SECOND
               THEN 3
               WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL {_W_SECONDS} SECOND
               THEN 2
               ELSE 1
             END AS level
      FROM anchors
    )
    SELECT user_id, CAST(max(level) AS BIGINT) AS funnel_level
    FROM lvl GROUP BY user_id ORDER BY user_id
    """,
)
def clickhouse_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600)(ts, type='view', type='click',
    type='purchase')`` semantics: per user, the deepest funnel stage
    reachable by SOME view anchor such that the later stages occur in
    order, each within 3600 s OF THE ANCHOR (not of the previous
    stage — the documented ClickHouse contract). Default (non-strict)
    mode: intervening events of other types are ignored.

    100 TB: one user-keyed shuffle for the reverse-min windows, one
    (user, ts) equi-join to read the click row's future-purchase
    minimum, one aggregate — per-key cost linear in events, never
    anchor×candidate quadratic."""
    e = table(spark, sf_dir, "events")
    wfut = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    fut = e.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
        .over(wfut)
        .alias("next_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(wfut)
        .alias("next_purchase"),
    ).localCheckpoint(eager=False)  # anchor side + click-row side of the join
    a = fut.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("t1"), F.col("next_click").alias("t2")
    )
    c = fut.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t2"),
        F.col("next_purchase").alias("t3"),
    )
    win = F.expr(f"INTERVAL {_W_SECONDS} SECONDS")
    anchors = a.join(c, ["user_id", "t2"], "left")
    in2 = F.col("t2").isNotNull() & (F.col("t2") <= F.col("t1") + win)
    in3 = F.col("t3").isNotNull() & (F.col("t3") <= F.col("t1") + win)
    lvl = anchors.select(
        "user_id",
        F.when(in2 & in3, F.lit(3)).when(in2, F.lit(2)).otherwise(F.lit(1)).alias(
            "level"
        ),
    )
    return (
        lvl.groupBy("user_id")
        .agg(F.max("level").cast("bigint").alias("funnel_level"))
        .orderBy("user_id")
    )


@query(
    "clickhouse_retention_battery",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 5 AS cohort,
             count_if(event_type = 'signup') > 0 AS r1,
             count_if(event_type = 'click') > 0 AS c2,
             count_if(event_type = 'purchase') > 0 AS c3,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events GROUP BY user_id
    )
    SELECT cohort,
           CAST(count_if(r1) AS BIGINT) AS r1_users,
           CAST(count_if(r1 AND c2) AS BIGINT) AS r2_users,
           CAST(count_if(r1 AND c3) AS BIGINT) AS r3_users,
           floor(CAST(count_if(r1 AND c2) AS DOUBLE)
                 / nullif(count_if(r1), 0) * 1e6 + 0.5) / 1e6 AS r2_rate,
           floor(CAST(count_if(r1 AND c3) AS DOUBLE)
                 / nullif(count_if(r1), 0) * 1e6 + 0.5) / 1e6 AS r3_rate,
           CAST(sum(least(n_types, 3) + CASE WHEN n_types > 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS uniq_up_to_3_sum
    FROM per_user GROUP BY cohort ORDER BY cohort
    """,
)
def clickhouse_retention_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, ...)`` + ``uniqUpTo(N)``
    semantics per cohort: retention's documented contract is that the
    FIRST condition anchors — element i of the array is
    cond1 AND cond_i, NOT a consecutive chain — so r2/r3 rates divide
    the anchored user count. uniqUpTo(3) reports the exact distinct
    count while ≤ 3 and saturates at 4 (= N+1) beyond, summed per
    cohort (the ClickHouse recipe for 'many distinct, stop counting'
    cardinality screens).

    100 TB: one user-keyed aggregate then a cohort-keyed fold —
    map-side combine both times; no window, no join."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        (F.col("user_id") % 5).alias("cohort"),
        (F.count_if(F.col("event_type") == "signup") > 0).alias("r1"),
        (F.count_if(F.col("event_type") == "click") > 0).alias("c2"),
        (F.count_if(F.col("event_type") == "purchase") > 0).alias("c3"),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
    )
    r1n = F.count_if(F.col("r1"))
    uniq_up_to = F.least(F.col("n_types"), F.lit(3)) + F.when(
        F.col("n_types") > 3, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        per_user.groupBy("cohort")
        .agg(
            r1n.cast("bigint").alias("r1_users"),
            F.count_if(F.col("r1") & F.col("c2")).cast("bigint").alias("r2_users"),
            F.count_if(F.col("r1") & F.col("c3")).cast("bigint").alias("r3_users"),
            fround(
                F.count_if(F.col("r1") & F.col("c2")).cast("double")
                / F.nullif(r1n, F.lit(0)),
                6,
            ).alias("r2_rate"),
            fround(
                F.count_if(F.col("r1") & F.col("c3")).cast("double")
                / F.nullif(r1n, F.lit(0)),
                6,
            ).alias("r3_rate"),
            F.sum(uniq_up_to).cast("bigint").alias("uniq_up_to_3_sum"),
        )
        .orderBy("cohort")
    )


@query(
    "streaming_window_funnel_fidelity",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_type, event_id FROM events
    ),
    fut AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase
      FROM e
    ),
    anchors AS (
      SELECT a.user_id, a.ts AS t1, a.next_click AS t2,
             c.next_purchase AS t3
      FROM fut a
      LEFT JOIN fut c
        ON c.user_id = a.user_id AND c.ts = a.next_click
       AND c.event_type = 'click'
      WHERE a.event_type = 'view'
    ),
    lvl AS (
      SELECT user_id,
             CASE
               WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL {_W_SECONDS} SECOND
                AND t3 IS NOT NULL AND t3 <= t1 + INTERVAL {_W_SECONDS} SECOND
               THEN 3
               WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL {_W_SECONDS} SECOND
               THEN 2
               ELSE 1
             END AS level
      FROM lvl_src
    )
    SELECT user_id, CAST(max(level) AS BIGINT) AS funnel_level
    FROM lvl GROUP BY user_id ORDER BY user_id
    """.replace("FROM lvl_src", "FROM anchors"),
)
def streaming_window_funnel_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``windowFunnel(3600)`` run AS A REAL STREAM (24th
    fidelity member): streaming/cep.window_funnel_stream keeps, per
    user, only the still-resolvable anchors — open views awaiting their
    earliest later click and open level-2 anchors awaiting their
    earliest later purchase, both pruned EXACTLY at the W horizon (an
    anchor past its deadline can never be rescued: the earliest later
    event is already too late) — so state is bounded by one window's
    event rate, the same bound ClickHouse's in-memory sweep carries.
    Final per-user levels hash-match the batch windowFunnel plan.

    100 TB/streaming: the anchor-resolution fold is the NFA a CEP
    engine compiles the funnel to; watermark-less because the funnel
    never un-resolves. The batch twin stays the plan of choice for
    historical scans; this is the live-dashboard form."""
    from ..streaming.cep import window_funnel_stream
    from .llmdata11 import (
        _cached_corpus,
        _fidelity_tmp,
        _materialize,
        _run_stream_to_memory,
    )

    tmp = _fidelity_tmp("funnel-fidelity-")  # per-run ckpt/sink only
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    corpus = _cached_corpus(
        ("winfunnel", sf_dir),
        lambda p: ev.repartition(4)
        .write.mode("overwrite")
        .parquet(f"{p}/in"),
    )
    # NOTE: multi-file parquet with maxFilesPerTrigger would deliver
    # batches in FILE order, not time order — the guard/retention folds
    # are order-insensitive across batches, the funnel fold is NOT
    # (earliest-after semantics). One batch per the sequential-monitor
    # precedent (llmdata11._sequential_fidelity); the in-group sort
    # restores event order.
    stream = window_funnel_stream(
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        ).parquet(f"{corpus}/in")
    )
    out = _run_stream_to_memory(spark, stream, tmp)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    final = (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "funnel_level")
        .orderBy("user_id")
    )
    return _materialize(
        spark, tmp, final, "user_id bigint, funnel_level bigint"
    )


@query(
    "clickhouse_sequence_match",
    oracle="""
    WITH fut AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click
      FROM events
    ),
    views AS (
      SELECT user_id,
             count(*) AS n_views,
             count_if(next_click IS NOT NULL
                      AND next_click <= ts + INTERVAL 3600 SECOND)
               AS n_matched_anchors
      FROM fut WHERE event_type = 'view' GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_views AS BIGINT) AS n_views,
           CAST(n_matched_anchors AS BIGINT) AS n_matched_anchors,
           n_matched_anchors > 0 AS seq_matched
    FROM views ORDER BY user_id
    """,
)
def clickhouse_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)')(ts, view,
    click)`` semantics: does SOME view→click pair exist within 3600 s,
    per user — the boolean little sibling of windowFunnel (sequenceMatch
    answers 'did the pattern happen', windowFunnel 'how deep did it
    go'). Also reports how many view anchors match (sequenceCount's
    contract, the other member of the CH sequence family). Same linear
    reverse-min plan as the funnel — no anchor×candidate join.

    100 TB: one user-keyed window pass + one aggregate."""
    e = table(spark, sf_dir, "events")
    wfut = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    fut = e.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
        .over(wfut)
        .alias("next_click"),
    )
    matched = F.col("next_click").isNotNull() & (
        F.col("next_click") <= F.col("ts") + F.expr("INTERVAL 3600 SECONDS")
    )
    return (
        fut.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_views"),
            F.count_if(matched).cast("bigint").alias("n_matched_anchors"),
        )
        .withColumn("seq_matched", F.col("n_matched_anchors") > 0)
        .orderBy("user_id")
    )


@query(
    "clickhouse_argminmax_battery",
    oracle="""
    WITH keyed AS (
      SELECT event_type, user_id, event_id, value,
             CAST(floor(value * 100 + 0.5) AS BIGINT) * 1000000 + user_id
               AS vkey,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) * 1000000000 + event_id
               AS tkey
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(arg_min(user_id, vkey) AS BIGINT) AS argmin_user,
           CAST(arg_max(user_id, vkey) AS BIGINT) AS argmax_user,
           CAST(arg_min(event_id, tkey) AS BIGINT) AS first_event_id,
           CAST(arg_max(event_id, tkey) AS BIGINT) AS last_event_id,
           floor(min(value) * 100 + 0.5) / 100 AS min_value,
           floor(max(value) * 100 + 0.5) / 100 AS max_value
    FROM keyed GROUP BY event_type ORDER BY event_type
    """,
)
def clickhouse_argminmax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMin``/``argMax`` parity (Spark ``min_by``/
    ``max_by``, DuckDB ``arg_min``/``arg_max``), tie-safe: ClickHouse's
    argMin on a tied key is engine-arbitrary, so the battery packs the
    tie-break INTO the key — value quantized to integer cents ×1e6 +
    user_id gives one BIGINT key that is unique per row (the documented
    cross-engine rule: DuckDB's arg_min binds NO tuple key, so every
    composite key must pack into one integer). first/last per type use
    epoch-seconds ×1e9 + event_id (fits int64 through 2262; sub-second
    order is delegated to the event_id tie-break, stated semantics).
    This is the `any`/`anyLast`-adjacent surface every ClickHouse
    dashboard query leans on, rendered deterministic.

    100 TB: one map-side-combining aggregate; min_by/max_by fold
    per-partition then merge — no shuffle beyond the |event_type|-row
    exchange."""
    keyed = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "user_id",
            "event_id",
            "value",
            (
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
                * F.lit(1000000)
                + F.col("user_id")
            ).alias("vkey"),
            (
                F.expr(
                    "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"
                ).cast("bigint")
                * F.lit(1000000000)
                + F.col("event_id")
            ).alias("tkey"),
        )
    )
    return (
        keyed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min_by("user_id", "vkey").cast("bigint").alias("argmin_user"),
            F.max_by("user_id", "vkey").cast("bigint").alias("argmax_user"),
            F.min_by("event_id", "tkey").cast("bigint").alias("first_event_id"),
            F.max_by("event_id", "tkey").cast("bigint").alias("last_event_id"),
            (F.floor(F.min("value") * 100 + F.lit(0.5)) / 100).alias("min_value"),
            (F.floor(F.max("value") * 100 + F.lit(0.5)) / 100).alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "clickhouse_window_funnel_modes",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_type, event_id FROM events
      UNION ALL
      SELECT * FROM (VALUES
        (CAST(-1 AS BIGINT), TIMESTAMP '2024-01-10 00:00:00', 'view',
         CAST(-101 AS BIGINT)),
        (-1, TIMESTAMP '2024-01-10 00:00:10', 'click', -102),
        (-1, TIMESTAMP '2024-01-10 00:00:20', 'click', -103),
        (-1, TIMESTAMP '2024-01-10 00:00:30', 'purchase', -104),
        (-2, TIMESTAMP '2024-01-10 00:00:00', 'view', -201),
        (-2, TIMESTAMP '2024-01-10 00:00:10', 'signup', -202),
        (-2, TIMESTAMP '2024-01-10 00:00:20', 'click', -203),
        (-2, TIMESTAMP '2024-01-10 00:00:30', 'purchase', -204)
      ) v(user_id, ts, event_type, event_id)
    ),
    fut AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'click' THEN ts END)
               OVER w AS next_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER w AS next_purchase,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER w AS next_view,
             lead(event_type) OVER o AS nxt_type,
             lead(ts) OVER o AS nxt_ts
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
             o AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    anchors AS (
      SELECT a.user_id, a.ts AS t1,
             a.next_click AS t2, c.next_purchase AS t3,
             a.next_view AS dup_v_a, c.next_view AS dup_v_c,
             c.next_click AS dup_c_c,
             a.nxt_type AS a_nxt_type, a.nxt_ts AS a_nxt_ts,
             c.nxt_type AS c_nxt_type, c.nxt_ts AS c_nxt_ts
      FROM fut a
      LEFT JOIN fut c
        ON c.user_id = a.user_id AND c.ts = a.next_click
       AND c.event_type = 'click'
      WHERE a.event_type = 'view'
    ),
    lvl AS (
      SELECT user_id,
        CASE WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL {_W_SECONDS} SECOND
             THEN CASE WHEN t3 IS NOT NULL
                        AND t3 <= t1 + INTERVAL {_W_SECONDS} SECOND
                       THEN 3 ELSE 2 END
             ELSE 1 END AS lv_base,
        CASE WHEN a_nxt_type = 'click'
              AND a_nxt_ts <= t1 + INTERVAL {_W_SECONDS} SECOND
             THEN CASE WHEN c_nxt_type = 'purchase'
                        AND c_nxt_ts <= t1 + INTERVAL {_W_SECONDS} SECOND
                        AND t2 = a_nxt_ts
                       THEN 3 ELSE 2 END
             ELSE 1 END AS lv_strict_order,
        CASE WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL {_W_SECONDS} SECOND
              AND t2 < coalesce(dup_v_a, TIMESTAMP '9999-01-01')
             THEN CASE WHEN t3 IS NOT NULL
                        AND t3 <= t1 + INTERVAL {_W_SECONDS} SECOND
                        AND t3 < coalesce(dup_v_c, TIMESTAMP '9999-01-01')
                        AND t3 < coalesce(dup_c_c, TIMESTAMP '9999-01-01')
                       THEN 3 ELSE 2 END
             ELSE 1 END AS lv_strict_dedup
      FROM anchors
    )
    SELECT user_id,
           CAST(max(lv_base) AS BIGINT) AS funnel_level,
           CAST(max(lv_strict_order) AS BIGINT) AS funnel_strict_order,
           CAST(max(lv_strict_dedup) AS BIGINT) AS funnel_strict_dedup
    FROM lvl GROUP BY user_id ORDER BY user_id
    """,
)
def clickhouse_window_funnel_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel`` MODE parity, all three modes from ONE
    per-user window frame: base (intervening events ignored),
    ``strict_order`` (the next funnel stage must be the IMMEDIATELY
    next event of any type — one interleaving event aborts the chain;
    rendered with lead()), and ``strict_deduplication`` (a repeat of
    any chain event type between stages aborts — rendered by requiring
    the next stage to precede the next duplicate view/click). Per the
    published contract every stage must land within the window OF THE
    ANCHOR. Reports max level per user under each mode, so the modes'
    ordering (strict ≤ base) is visible per row.

    100 TB: identical shuffle shape to clickhouse_window_funnel — one
    user-keyed window pass, one (user, ts) equi-join, one aggregate;
    the two extra modes ride the same frame for free.

    Signal plant (the decontam/SemDeDup fixture discipline): the
    corpus' natural event spacing never triggers the strict aborts
    (verified 0/1500 users at sf0.1), so two synthetic users are
    unioned in-plan — user −1 (view,click,click,purchase @10 s) trips
    strict_dedup's duplicate-click abort AND strict_order's
    non-immediate stage; user −2 (view,signup,click,purchase) trips
    strict_order only, proving the two modes differ — keeping every
    decision branch live on both oracle sides at every SF."""
    planted = spark.sql(
        """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(ts AS TIMESTAMP_NTZ) AS ts,
               event_type,
               CAST(event_id AS BIGINT) AS event_id
        FROM VALUES
          (-1, TIMESTAMP '2024-01-10 00:00:00', 'view', -101),
          (-1, TIMESTAMP '2024-01-10 00:00:10', 'click', -102),
          (-1, TIMESTAMP '2024-01-10 00:00:20', 'click', -103),
          (-1, TIMESTAMP '2024-01-10 00:00:30', 'purchase', -104),
          (-2, TIMESTAMP '2024-01-10 00:00:00', 'view', -201),
          (-2, TIMESTAMP '2024-01-10 00:00:10', 'signup', -202),
          (-2, TIMESTAMP '2024-01-10 00:00:20', 'click', -203),
          (-2, TIMESTAMP '2024-01-10 00:00:30', 'purchase', -204)
          AS v(user_id, ts, event_type, event_id)
        """
    )
    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "event_id")
        .unionByName(planted)
    )
    wfut = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    ).over(wfut)
    fut = e.select(
        "user_id",
        "ts",
        "event_type",
        nxt("click").alias("next_click"),
        nxt("purchase").alias("next_purchase"),
        nxt("view").alias("next_view"),
        F.lead("event_type").over(wo).alias("nxt_type"),
        F.lead("ts").over(wo).alias("nxt_ts"),
    ).localCheckpoint(eager=False)  # anchor side + click side of the join
    a = fut.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("t1"),
        F.col("next_click").alias("t2"),
        F.col("next_view").alias("dup_v_a"),
        F.col("nxt_type").alias("a_nxt_type"),
        F.col("nxt_ts").alias("a_nxt_ts"),
    )
    c = fut.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t2"),
        F.col("next_purchase").alias("t3"),
        F.col("next_view").alias("dup_v_c"),
        F.col("next_click").alias("dup_c_c"),
        F.col("nxt_type").alias("c_nxt_type"),
        F.col("nxt_ts").alias("c_nxt_ts"),
    )
    anchors = a.join(c, ["user_id", "t2"], "left")
    win = F.expr(f"INTERVAL {_W_SECONDS} SECONDS")
    far = F.lit("9999-01-01").cast("timestamp")
    in_w = lambda col: col.isNotNull() & (col <= F.col("t1") + win)  # noqa: E731
    lv_base = F.when(
        in_w(F.col("t2")),
        F.when(in_w(F.col("t3")), F.lit(3)).otherwise(F.lit(2)),
    ).otherwise(F.lit(1))
    so2 = (F.col("a_nxt_type") == "click") & (
        F.col("a_nxt_ts") <= F.col("t1") + win
    )
    so3 = (
        (F.col("c_nxt_type") == "purchase")
        & (F.col("c_nxt_ts") <= F.col("t1") + win)
        & (F.col("t2") == F.col("a_nxt_ts"))
    )
    lv_so = F.when(
        so2, F.when(so3, F.lit(3)).otherwise(F.lit(2))
    ).otherwise(F.lit(1))
    sd2 = in_w(F.col("t2")) & (F.col("t2") < F.coalesce(F.col("dup_v_a"), far))
    sd3 = (
        in_w(F.col("t3"))
        & (F.col("t3") < F.coalesce(F.col("dup_v_c"), far))
        & (F.col("t3") < F.coalesce(F.col("dup_c_c"), far))
    )
    lv_sd = F.when(
        sd2, F.when(sd3, F.lit(3)).otherwise(F.lit(2))
    ).otherwise(F.lit(1))
    return (
        anchors.select(
            "user_id",
            lv_base.alias("b"),
            lv_so.alias("so"),
            lv_sd.alias("sd"),
        )
        .groupBy("user_id")
        .agg(
            F.max("b").cast("bigint").alias("funnel_level"),
            F.max("so").cast("bigint").alias("funnel_strict_order"),
            F.max("sd").cast("bigint").alias("funnel_strict_dedup"),
        )
        .orderBy("user_id")
    )
