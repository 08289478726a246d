"""Relational battery, round 4: PER-KEY renderings of the rank
statistics (the partitioned recipe their global docstrings promised),
the Nemenyi post-hoc completing the Friedman test, and the
DataFrame.observe() pipeline-health surface.

Per-key discipline: every window in this module is PARTITIONED — the
bounded-global-window invariant tools/plan_audit.py enforces — and all
rank/ECDF arithmetic stays exact-integer with one final frounded float,
the workloads/core.py cross-engine rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table


@query(
    "stats_theil_sen_by_priority",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority AS pri,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS t,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.pri, a.t AS t1, b.t AS t2,
             (CAST(b.rev AS DOUBLE) - CAST(a.rev AS DOUBLE))
               / CAST(b.t - a.t AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b ON a.pri = b.pri AND a.t < b.t
    ),
    ranked AS (
      SELECT pri, slope,
             row_number() OVER (PARTITION BY pri ORDER BY slope, t1, t2) AS rn,
             count(*) OVER (PARTITION BY pri) AS n
      FROM slopes
    ),
    m AS (SELECT pri, CAST(count(*) AS BIGINT) AS n_months FROM monthly GROUP BY 1)
    SELECT r.pri AS priority, m.n_months,
           CAST(max(r.n) AS BIGINT) AS n_pairs,
           floor(max(CASE WHEN rn = (n + 1) // 2 THEN slope END) * 1e4 + 0.5) / 1e4
             AS theil_sen_slope,
           floor(max(CASE WHEN rn = (n + 9) // 10 THEN slope END) * 1e4 + 0.5) / 1e4
             AS slope_p10,
           floor(max(CASE WHEN rn = (9 * n + 9) // 10 THEN slope END) * 1e4 + 0.5) / 1e4
             AS slope_p90
    FROM ranked r JOIN m ON m.pri = r.pri
    GROUP BY r.pri, m.n_months
    ORDER BY priority
    """,
)
def stats_theil_sen_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend PER ORDER PRIORITY — the partitioned
    rendering the global stats_theil_sen_trend's docstring promised:
    same exact-DECIMAL monthly fold, same O(m²) pair join and rank
    arithmetic, but every window carries PARTITION BY priority, so the
    five per-key series rank independently and in parallel (5 × ~80
    months → ~3k pairs each — estimator cost is series-sized per key,
    never data-sized).
    """
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.col("o_orderpriority").alias("pri"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("t"),
        )
        .agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
        .localCheckpoint(eager=False)  # (priority, month)-sized; 3 consumers
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(
        b, (F.col("a.pri") == F.col("b.pri")) & (F.col("a.t") < F.col("b.t"))
    ).select(
        F.col("a.pri").alias("pri"),
        F.col("a.t").alias("t1"),
        F.col("b.t").alias("t2"),
        (
            (F.col("b.rev").cast("double") - F.col("a.rev").cast("double"))
            / (F.col("b.t") - F.col("a.t")).cast("double")
        ).alias("slope"),
    )
    wp = Window.partitionBy("pri")
    ranked = slopes.select(
        "pri",
        "slope",
        F.row_number().over(wp.orderBy("slope", "t1", "t2")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    m = monthly.groupBy("pri").agg(F.count(F.lit(1)).alias("n_months"))
    pick = lambda cond: F.max(F.when(cond, F.col("slope")))  # noqa: E731
    stats = ranked.groupBy("pri").agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        fround(pick(F.col("rn") == F.expr("(n + 1) DIV 2")), 4).alias(
            "theil_sen_slope"
        ),
        fround(pick(F.col("rn") == F.expr("(n + 9) DIV 10")), 4).alias("slope_p10"),
        fround(pick(F.col("rn") == F.expr("(9 * n + 9) DIV 10")), 4).alias(
            "slope_p90"
        ),
    )
    return (
        stats.join(m, "pri")
        .select(
            F.col("pri").alias("priority"),
            F.col("n_months").cast("bigint").alias("n_months"),
            "n_pairs",
            "theil_sen_slope",
            "slope_p10",
            "slope_p90",
        )
        .orderBy("priority")
    )


@query(
    "stats_ks_source_vs_rest",
    oracle="""
    WITH g AS (
      SELECT n_chars, CAST(count(*) AS BIGINT) AS tot
      FROM documents GROUP BY 1
    ),
    a AS (
      SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2
    ),
    srcs AS (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n1 FROM a GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM documents),
    grid AS (
      SELECT s.source, g.n_chars, coalesce(a.cnt, 0) AS ac, g.tot - coalesce(a.cnt, 0) AS bc
      FROM srcs s CROSS JOIN g
      LEFT JOIN a ON a.source = s.source AND a.n_chars = g.n_chars
    ),
    ecdf AS (
      SELECT source, n_chars,
             sum(ac) OVER (PARTITION BY source ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
             sum(bc) OVER (PARTITION BY source ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      FROM grid
    ),
    scored AS (
      SELECT e.source, e.n_chars, s.n1, n.nt - s.n1 AS n2,
             abs(e.c1 * (n.nt - s.n1) - e.c2 * s.n1) AS dn
      FROM ecdf e JOIN srcs s ON s.source = e.source CROSS JOIN n
    ),
    top AS (
      SELECT * FROM (SELECT *, max(dn) OVER (PARTITION BY source) AS dm FROM scored)
      WHERE dn = dm
    )
    SELECT source, max(n1) AS n1, max(n2) AS n2,
           CAST(max(dn) AS BIGINT) AS d_numerator,
           CAST(min(n_chars) AS BIGINT) AS d_at_value,
           floor((CAST(max(dn) AS DOUBLE)
                  / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS ks_d
    FROM top GROUP BY source ORDER BY source
    """,
)
def stats_ks_source_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-KEY Kolmogorov-Smirnov: each source's document-length
    distribution against the REST of the corpus (one-vs-rest) — the
    per-source drift screen a curation pipeline runs to catch a feed
    whose length profile silently shifted. Same float-free ECDF
    arithmetic as the global stats_ks_two_sample (sup |F₁−F₂| located
    by the integer cross-multiply |c₁·n₂ − c₂·n₁|), but the step grid
    is sources × distinct values and every window is PARTITION BY
    source — value-cardinality per key, all keys in parallel.

    Scale: two value-grouped folds (global + per-source), one
    |sources|×|values| grid join, partitioned sweep windows. Nothing
    is corpus-sized past the first fold; the one-vs-rest trick reuses
    the single global count table for every key's complement.
    """
    d = table(spark, sf_dir, "documents")
    # ONE corpus scan: the (source, value) count table is the sufficient
    # statistic — global counts, per-source sizes, and the corpus total
    # all fold from it (checkpoint-once rule, SCALE.md).
    a = (
        d.groupBy("source", "n_chars")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    g = a.groupBy("n_chars").agg(F.sum("cnt").alias("tot"))
    srcs = a.groupBy("source").agg(F.sum("cnt").alias("n1"))
    nt = a.agg(F.sum("cnt").alias("nt"))
    grid = (
        srcs.crossJoin(g)
        .join(a, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "n1",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("ac"),
            (F.col("tot") - F.coalesce(F.col("cnt"), F.lit(0))).alias("bc"),
        )
    )
    ws = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = grid.select(
        "source",
        "n_chars",
        "n1",
        F.sum("ac").over(ws).alias("c1"),
        F.sum("bc").over(ws).alias("c2"),
    )
    scored = ecdf.crossJoin(F.broadcast(nt)).select(
        "source",
        "n_chars",
        "n1",
        (F.col("nt") - F.col("n1")).alias("n2"),
        F.abs(
            F.col("c1") * (F.col("nt") - F.col("n1")) - F.col("c2") * F.col("n1")
        ).alias("dn"),
    )
    top = scored.withColumn(
        "dm", F.max("dn").over(Window.partitionBy("source"))
    ).filter(F.col("dn") == F.col("dm"))
    return (
        top.groupBy("source")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max("dn").cast("bigint").alias("d_numerator"),
            F.min("n_chars").cast("bigint").alias("d_at_value"),
            fround(
                F.max("dn").cast("double")
                / (F.max("n1").cast("double") * F.max("n2").cast("double")),
                6,
            ).alias("ks_d"),
        )
        .orderBy("source")
    )


@query(
    "stats_nemenyi_quarters",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(quarter(o_orderdate) AS INT) AS q,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS s
      FROM orders GROUP BY 1, 2
    ),
    complete AS (
      SELECT o_custkey FROM spend GROUP BY o_custkey HAVING count(*) = 4
    ),
    ranked AS (
      SELECT s.o_custkey, s.q,
             2 * rank() OVER (PARTITION BY s.o_custkey ORDER BY s.s)
               + count(*) OVER (PARTITION BY s.o_custkey, s.s) - 1 AS r2
      FROM spend s JOIN complete c ON s.o_custkey = c.o_custkey
    ),
    sums AS (
      SELECT q, CAST(sum(r2) AS BIGINT) AS rsum2 FROM ranked GROUP BY q
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM complete)
    SELECT CAST(a.q AS INT) AS q_lo, CAST(b.q AS INT) AS q_hi,
           floor((abs(CAST(a.rsum2 - b.rsum2 AS DOUBLE)) / (2.0 * n.n))
                 * 1e6 + 0.5) / 1e6 AS mean_rank_diff,
           floor((2.569 * sqrt(20.0 / (6.0 * n.n))) * 1e6 + 0.5) / 1e6
             AS critical_distance,
           floor((abs(CAST(a.rsum2 - b.rsum2 AS DOUBLE)) / (2.0 * n.n))
                 * 1e6 + 0.5) / 1e6
             > floor((2.569 * sqrt(20.0 / (6.0 * n.n))) * 1e6 + 0.5) / 1e6
             AS significant
    FROM sums a JOIN sums b ON a.q < b.q CROSS JOIN n
    ORDER BY q_lo, q_hi
    """,
)
def stats_nemenyi_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nemenyi post-hoc for the Friedman test (stats_friedman_quarters):
    WHICH quarter pairs differ, not just whether any does. Mean-rank
    difference per pair |R̄_i − R̄_j| = |R'_i − R'_j|/(2n) from the same
    doubled integer rank sums, against the critical distance
    CD = q_α·√(k(k+1)/(6n)) with the k=4, α=0.05 studentized-range
    constant q = 2.569 folded in as a shared literal. Significance
    compares the two FROUNDED doubles, so the boolean is deterministic
    across engines (both sides compute identical grids).

    Scale: identical plumbing to Friedman — (customer, quarter) fold,
    complete-block semi-join, 4-row rank windows — plus a 4×4 pair join
    over FOUR aggregate rows. The post-hoc is free once the test ran.
    """
    o = table(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey", F.quarter("o_orderdate").cast("int").alias("q"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("s"))
        .localCheckpoint(eager=False)  # (customer, quarter)-sized; 2 consumers
    )
    complete = (
        spend.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nq"))
        .filter(F.col("nq") == 4)
        .select("o_custkey")
        .localCheckpoint(eager=False)
    )
    ranked = spend.join(complete, "o_custkey").select(
        "q",
        (
            F.lit(2)
            * F.rank().over(Window.partitionBy("o_custkey").orderBy("s"))
            + F.count(F.lit(1)).over(Window.partitionBy("o_custkey", "s"))
            - 1
        ).alias("r2"),
    )
    sums = ranked.groupBy("q").agg(F.sum("r2").cast("bigint").alias("rsum2"))
    n = complete.agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = sums.select(F.col("q").alias("q_lo"), F.col("rsum2").alias("ra"))
    b = sums.select(F.col("q").alias("q_hi"), F.col("rsum2").alias("rb"))
    diff = fround(
        F.abs((F.col("ra") - F.col("rb")).cast("double")) / (F.lit(2.0) * F.col("n")),
        6,
    )
    cd = fround(F.lit(2.569) * F.sqrt(F.lit(20.0) / (F.lit(6.0) * F.col("n"))), 6)
    return (
        a.join(b, F.col("q_lo") < F.col("q_hi"))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("q_lo").cast("int").alias("q_lo"),
            F.col("q_hi").cast("int").alias("q_hi"),
            diff.alias("mean_rank_diff"),
            cd.alias("critical_distance"),
            (diff > cd).alias("significant"),
        )
        .orderBy("q_lo", "q_hi")
    )


@query(
    "pipeline_observe_health",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_value,
           CAST(sum(CASE WHEN value IS NOT NULL
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS sum_value_cents,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events
    """,
)
def pipeline_observe_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.observe() pipeline-health metrics — the zero-extra-scan
    instrumentation surface: the aggregates ride the SAME job that
    materializes the frame (here a count() action), collected via the
    Observation listener rather than a second query. This is how a
    production pipeline exports row counts / null rates / checksums per
    stage without doubling its scans; the oracle recomputes the metrics
    independently, certifying the listener path end to end. Quantized
    value checksum keeps the sum exact-integer (cross-engine fround
    discipline).

    100 TB: observed metrics are accumulator-style — map-side partials
    folded on the driver, no extra shuffle, no second pass.
    """
    from pyspark.sql import Observation

    obs = Observation("health")
    e = table(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_value"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.floor(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("sum_value_cents"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )
    e.count()  # the action the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_value"],
                m["sum_value_cents"],
                m["min_event_id"],
                m["max_event_id"],
            )
        ],
        "n_rows bigint, n_null_value bigint, sum_value_cents bigint, "
        "min_event_id bigint, max_event_id bigint",
    )


@query(
    "session_window_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 300
                  WHEN event_type = 'error' THEN 60
                  ELSE 1800 END AS gap_s
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id, gap_s,
             CASE WHEN ts >= coalesce(
                    max(ts + INTERVAL 1 SECOND * gap_s)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    TIMESTAMP '1970-01-01')
                  THEN 1 ELSE 0 END AS new_session
      FROM g
    ),
    sessions AS (
      SELECT user_id, ts, gap_s,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts + INTERVAL 1 SECOND * gap_s) AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT dynamic gap — purchases close
    their session in 5 minutes, errors in 1, everything else in 30
    (`session_window` with a Column gap, the Spark-3.2+ surface the
    fixed-gap `session_window_events` doesn't touch). Semantics under
    merge: each event spans [ts, ts+gap); overlapping spans fuse, so
    the session END is the max span end, NOT last-event + constant —
    the oracle therefore needs the RUNNING-MAX-OF-ENDS islands rewrite
    (a lag(ts)+g test, valid for constant g, would split sessions a
    long-gap event should have held open).

    100 TB: identical shape to the fixed-gap form — one shuffle on
    user_id, merge inside the session-window aggregation node; the gap
    expression is scan-stage."""
    e = table(spark, sf_dir, "events")
    # gap as a STRING column — session_window's dynamic-gap surface
    # requires CalendarIntervalType (duration strings), not the ANSI
    # DayTimeIntervalType INTERVAL literals produce.
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("300 seconds"))
        .when(F.col("event_type") == "error", F.lit("60 seconds"))
        .otherwise(F.lit("1800 seconds"))
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
