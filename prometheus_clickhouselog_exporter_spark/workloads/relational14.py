"""Relational battery, round 3 batch 14: forward as-of join, the
Wald–Wolfowitz runs test, ID-gap islands, and an l-diversity audit.

Four short gaps in otherwise-covered families. The FORWARD as-of join
mirrors asof_join_click_before_purchase (which looks backward): for
each purchase, the next click strictly after it — the "what did the
user do next" direction, same conditional-extremum window recipe, no
pair-materializing join. The runs test is the classic
is-this-sequence-random screen whose statistic is pure integer
counting. Gap islands generalize dedup_substring_spans' gaps-and-
islands trick to the DQ question every ingestion pipeline asks: which
ID ranges are missing? l-diversity extends kanon_group_suppression
(which enforces group SIZE) to the diversity of the SENSITIVE value
within each group — k-anonymity without l-diversity is a privacy
false comfort.

Float discipline per workloads/core.py; every statistic here is exact
integer arithmetic until a final frounded ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "asof_join_next_click_forward",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    nxt AS (
      SELECT user_id, event_id, event_type, us,
             min(CASE WHEN event_type = 'click' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click_us
      FROM seq
    )
    SELECT user_id, event_id AS purchase_id,
           CAST(next_click_us - us AS BIGINT) AS followup_lag_us
    FROM nxt
    WHERE event_type = 'purchase' AND next_click_us IS NOT NULL
    ORDER BY user_id, purchase_id
    """,
)
def asof_join_next_click_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every purchase, the first click strictly
    AFTER it (post-purchase re-engagement) — the mirror of
    asof_join_click_before_purchase and the second half of a complete
    as-of surface (backward = last-before, forward = first-after). Same
    plan recipe: a conditional MIN over a 1-FOLLOWING..UNBOUNDED frame
    on the per-user timeline — one sort, NO join, so there is no
    purchase×click pair blow-up to prune. Ties are impossible in the
    frame key because (us, event_id) is a total order.

    Scale: one shuffle on user_id; the window and the filter share it.
    The merge-join formulation of as-of needs a range join Spark lacks
    natively — the window form is strictly better here.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select("user_id", "event_id", "event_type", us.alias("us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = seq.withColumn(
        "next_click_us",
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).over(w),
    )
    return (
        nxt.filter(
            (F.col("event_type") == "purchase")
            & F.col("next_click_us").isNotNull()
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            (F.col("next_click_us") - F.col("us"))
            .cast("bigint")
            .alias("followup_lag_us"),
        )
        .orderBy("user_id", "purchase_id")
    )


@query(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    med AS (
      SELECT rev AS m
      FROM (SELECT rev, row_number() OVER (ORDER BY rev, d) AS rn,
                   count(*) OVER () AS n
            FROM daily)
      WHERE rn = (n + 1) // 2
    ),
    signs AS (
      SELECT d, CASE WHEN rev > med.m THEN 1 ELSE 0 END AS above
      FROM daily, med WHERE rev <> med.m
    ),
    runs AS (
      SELECT above,
             CASE WHEN lag(above) OVER (ORDER BY d) IS NULL
                       OR lag(above) OVER (ORDER BY d) <> above
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    )
    SELECT CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(above) AS BIGINT) AS n_above,
           CAST(count(*) - sum(above) AS BIGINT) AS n_below,
           CAST(sum(new_run) AS BIGINT) AS n_runs,
           floor((1.0 + ((2.0 * CAST(sum(above) AS DOUBLE))
                         * CAST(count(*) - sum(above) AS DOUBLE))
                        / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS expected_runs
    FROM runs
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily-revenue sequence: count
    maximal runs of above/below-median days — too FEW runs means
    clustering/trend, too MANY means oscillation; either way the
    series isn't i.i.d., which invalidates naive confidence intervals
    downstream. The run count is a lag-transition sum (exact
    integers); the expected count 1 + 2·n₊·n₋/n is a ratio of exact
    integers, frounded. Median-equal days drop, per the textbook test.

    Scale: the fact table folds to daily rows; the median comes from
    rank arithmetic and the run counting is one lag window over the
    bounded series — same sweep-line shape as timeseries_active_backlog.
    """
    o = table(spark, sf_dir, "orders")
    from .core import money

    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
        .localCheckpoint(eager=False)  # days-sized; feeds median + signs
    )
    ranked = daily.select(
        "rev",
        F.row_number().over(Window.orderBy("rev", "d")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        F.col("rev").alias("m")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select("d", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("above"))
    )
    lagged = signs.select(
        "above",
        F.when(
            F.lag("above").over(Window.orderBy("d")).isNull()
            | (F.lag("above").over(Window.orderBy("d")) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    na = F.sum("above").cast("double")
    nn = F.count(F.lit(1)).cast("double")
    return lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("above").cast("bigint").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("above")).cast("bigint").alias("n_below"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
        fround(F.lit(1.0) + ((F.lit(2.0) * na) * (nn - na)) / nn, 6).alias(
            "expected_runs"
        ),
    )


@query(
    "dq_id_gap_islands",
    oracle="""
    WITH ids AS (
      SELECT DISTINCT event_id AS k FROM events WHERE event_type <> 'error'
    ),
    nxt AS (
      SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM ids
    )
    SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
           CAST(nk - k - 1 AS BIGINT) AS gap_len
    FROM nxt WHERE nk IS NOT NULL AND nk - k > 1
    ORDER BY gap_len DESC, gap_start LIMIT 20
    """,
)
def dq_id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-ID range detection — the ingestion-completeness audit:
    contiguous ID ranges absent from the HEALTHY event stream (errors
    excluded — the ranges the error lane consumed or a loader
    dropped), largest first. One lead window over the distinct sorted
    keys turns the gaps-and-islands problem into pure integer
    arithmetic (the same trick dedup_substring_spans uses to coalesce
    duplicate spans); a gap row (start, end, length) is emitted
    wherever consecutive surviving keys differ by more than one.

    Scale: distinct keys shuffle once; the global-order lead window is
    the sweep-line shape (bounded by key cardinality, and in practice
    partitionable by key-range with per-range boundary stitching).
    Top-20 is TakeOrdered.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") != "error")
    ids = ev.select(F.col("event_id").alias("k")).distinct()
    nxt = ids.select("k", F.lead("k").over(Window.orderBy("k")).alias("nk"))
    return (
        nxt.filter(F.col("nk").isNotNull() & ((F.col("nk") - F.col("k")) > 1))
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
            (F.col("nk") - F.col("k") - 1).cast("bigint").alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(20)
    )


@query(
    "kanon_ldiversity_audit",
    oracle="""
    WITH g AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS k_size,
             CAST(count(DISTINCT CAST(floor(c.c_acctbal / 1000) AS BIGINT))
                  AS BIGINT) AS l_diversity
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT nation, segment, k_size, l_diversity,
           (k_size >= 5) AS k_ok,
           (l_diversity >= 3) AS l_ok,
           (k_size >= 5 AND l_diversity >= 3) AS releasable
    FROM g ORDER BY nation, segment
    """,
)
def kanon_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit on top of k-anonymity: for each quasi-
    identifier group (nation × segment), the group size (k) AND the
    number of distinct sensitive-value classes inside it (balance
    bands of 1000) — a group can be k-anonymous yet reveal everyone's
    balance band if all members share one (the homogeneity attack
    kanon_group_suppression cannot see). Emits both gates and the
    release decision per group, all exact integers/booleans.

    Scale: one aggregate keyed by the quasi-identifier; the distinct
    count rides the same shuffle (Spark plans the expand). Policy
    thresholds (k≥5, l≥3) are literals — swap per release regime.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    g = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_size"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 1000).cast("bigint")
            )
            .cast("bigint")
            .alias("l_diversity"),
        )
    )
    return g.select(
        "nation",
        "segment",
        "k_size",
        "l_diversity",
        (F.col("k_size") >= 5).alias("k_ok"),
        (F.col("l_diversity") >= 3).alias("l_ok"),
        ((F.col("k_size") >= 5) & (F.col("l_diversity") >= 3)).alias("releasable"),
    ).orderBy("nation", "segment")
