"""Relational battery, round 3 batch 7: point-in-time dimension lookup
against SCD2 history, and the IGNORE NULLS window-function surface.

The PIT join is the consumption side of scd2_customer_priority_history
(diagnostics.py): given versioned dimension intervals, find the regime
effective at each fact row's date — implemented the SCALE-shaped way
(union + ordered window carry-forward, one shuffle) while the oracle
states the naive interval range-join. The IGNORE NULLS battery covers
first_value/last_value/nth_value/lag-with-default — the sparse-column
carry semantics every gap-fill and "latest known value" query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import money, query, table


@query(
    "scd2_pit_asof_lookup",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    hist AS (
      SELECT o_custkey AS k, o_orderpriority AS priority,
             o_orderdate AS valid_from,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS version
      FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
    ),
    pit AS (
      SELECT o.o_orderkey, o.o_custkey, max(h.version) AS version
      FROM orders o JOIN hist h
        ON h.k = o.o_custkey AND h.valid_from <= o.o_orderdate
      GROUP BY o.o_orderkey, o.o_custkey
    )
    SELECT h.priority, CAST(pit.version AS INT) AS version,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM pit JOIN hist h ON h.k = pit.o_custkey AND h.version = pit.version
    GROUP BY h.priority, pit.version
    ORDER BY priority, version
    """,
)
def scd2_pit_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each order resolves the SCD2
    priority regime (scd2_customer_priority_history) effective at its
    order date — max version whose valid_from ≤ date — then rolls up to
    (priority, version) cells. This is the fact-to-versioned-dimension
    join every warehouse and every training-data snapshot
    reconstruction ("what did the label say AT THE TIME") performs.

    Scale shape: the oracle states the naive interval range join +
    argmax; the Spark plan is the linear as-of recipe instead — UNION
    the version-start rows with the probe rows, ONE (custkey, date,
    kind) sort, and a running last(version IGNORE NULLS) carries the
    effective regime onto every probe. No range join, no per-probe
    rescan: one exchange on the natural key, same recipe as
    asof_join_click_before_purchase. History rows sort BEFORE probes on
    the same date (kind 0 < 1), so a regime starting the day of the
    order applies to it — matching the oracle's `valid_from <= date`
    with max(version) for same-day version stacks.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderpriority",
            "o_orderdate",
            F.lag("o_orderpriority").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("d"),
            F.row_number().over(w).alias("version"),
        )
    )
    starts = hist.select(
        "k", "d", F.lit(0).alias("kind"), "version", "priority",
        F.lit(None).cast("long").alias("okey"),
    )
    probes = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("int").alias("version"),
        F.lit(None).cast("string").alias("priority"),
        F.col("o_orderkey").alias("okey"),
    )
    wa = (
        Window.partitionBy("k")
        .orderBy("d", "kind", "version")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = starts.unionByName(probes).select(
        "kind",
        F.last("version", ignorenulls=True).over(wa).alias("version"),
        F.last("priority", ignorenulls=True).over(wa).alias("priority"),
    )
    return (
        carried.filter(F.col("kind") == 1)
        .groupBy("priority", "version")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority", "version")
    )


@query(
    "abc_pareto_revenue_classes",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS pk,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    cum AS (
      SELECT pk, r,
             sum(r) OVER (ORDER BY r DESC, pk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             sum(r) OVER () AS t
      FROM rev
    ),
    classed AS (
      SELECT pk, r,
             CASE WHEN c * 5 <= t * 4 THEN 'A'
                  WHEN c * 20 <= t * 19 THEN 'B'
                  ELSE 'C' END AS abc
      FROM cum
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(r) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY abc ORDER BY abc
    """,
)
def abc_pareto_revenue_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory analysis: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B = to 95%, C = the
    tail — the classic 80/20 stock-control classification. Class
    boundaries are integer-exact DECIMAL cross-multiplies (5·cum ≤
    4·total, 20·cum ≤ 19·total), so no float decides a class and both
    engines cut identically even when a part sits exactly on 80%.

    Scale: revenue-per-part is the only fact-sized shuffle; the running
    share windows over DIMENSION-cardinality rows (|parts|). For
    corpus-cardinality ranking the same cumulative-share selection runs
    on range-partitioned prefix sums (the total-order recipe) — same
    degrade path as the discrete-quantile family.
    """
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(money(F.col("l_extendedprice"))).alias("r")
    )
    wc = Window.orderBy(F.col("r").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy()
    cum = rev.select(
        "r", F.sum("r").over(wc).alias("c"), F.sum("r").over(wt).alias("t")
    )
    classed = cum.select(
        "r",
        F.when(F.col("c") * 5 <= F.col("t") * 4, "A")
        .when(F.col("c") * 20 <= F.col("t") * 19, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("abc")
    )


@query(
    "events_trigram_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys: consecutive event-type trigrams
    per user (lead ×2 on one ordered window), counted corpus-wide — the
    sequence-mining extension of events_markov_transitions (bigram
    transition matrix) toward full clickstream path analysis.

    Scale: ONE window shuffle on user_id (both leads ride the same
    (ts, event_id) sort), then a map-side-combined count to
    |event_types|³ rows at most; the top-20 is TakeOrdered. The
    (n DESC, path) tie-break makes the cut deterministic.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@query(
    "scd2_incremental_merge",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate
      FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
    ),
    hist AS (
      SELECT o_custkey, o_orderpriority AS priority,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS valid_to,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS version
      FROM changes
    )
    SELECT o_custkey, priority,
           CAST(valid_from AS VARCHAR) AS valid_from,
           CAST(valid_to AS VARCHAR) AS valid_to,
           CAST(version AS INT) AS version,
           valid_to IS NULL AS is_current
    FROM hist
    """,
)
def scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 maintenance, certified equal to a full rebuild:
    the fact log is split at a cutoff date; history is built from the
    base half, then the delta half is MERGED in — each customer's
    current regime becomes a seed row, delta orders change-detect
    against it, and new versions append with offset numbering — without
    ever re-reading the base facts. The oracle rebuilds from the FULL
    log, so a hash match proves incremental == rebuild, the property
    that lets a 100 TB dimension update from a day's delta instead of a
    full-history recompute (the warehouse MERGE INTO pattern, stated as
    pure windows).

    Why it's sound: change detection only needs the PREVIOUS order's
    priority, and the previous order of the first delta row is exactly
    the base regime's priority (a regime IS its last order's priority);
    all base rows precede all delta rows in (date, key) order, so
    version offsets add. The cross-boundary valid_to closes via one
    lead() over the unioned history — history-sized, not fact-sized.

    Scale: base-history build shuffles base facts once on the natural
    key; the merge shuffles ONLY delta facts + history-sized seeds.
    """
    split = "1996-01-01"
    o = table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderdate") < F.lit(split).cast("timestamp"))
    delta = o.filter(F.col("o_orderdate") >= F.lit(split).cast("timestamp"))

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    base_changes = (
        base.select(
            "o_custkey",
            "o_orderkey",
            "o_orderpriority",
            "o_orderdate",
            F.lag("o_orderpriority").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("vfrom"),
            F.row_number().over(w).alias("version"),
        )
        .localCheckpoint(eager=False)  # feeds seeds, offsets, and the union
    )
    base_cur = base_changes.groupBy("k").agg(
        F.max("version").alias("base_v"),
        F.max_by("priority", "version").alias("cur_prio"),
    )
    seed = base_cur.select(
        "k",
        F.lit("1900-01-01").cast("timestamp").alias("d"),
        F.lit(0).alias("kind"),
        F.col("cur_prio").alias("priority"),
        F.lit(None).cast("long").alias("okey"),
    )
    du = seed.unionByName(
        delta.select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.lit(1).alias("kind"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("okey"),
        )
    )
    wd = Window.partitionBy("k").orderBy("d", "kind", "okey")
    new_changes = (
        du.withColumn("prev", F.lag("priority").over(wd))
        .filter(
            (F.col("kind") == 1)
            & (F.col("prev").isNull() | (F.col("prev") != F.col("priority")))
        )
        .select(
            "k",
            "priority",
            F.col("d").alias("vfrom"),
            F.row_number().over(wd).alias("rn"),
        )
        .join(base_cur.select("k", "base_v"), "k", "left")
        .select(
            "k",
            "priority",
            "vfrom",
            (F.col("rn") + F.coalesce(F.col("base_v"), F.lit(0))).alias("version"),
        )
    )
    hist = base_changes.unionByName(new_changes)
    wh = Window.partitionBy("k").orderBy("version")
    return hist.select(
        F.col("k").alias("o_custkey"),
        "priority",
        F.col("vfrom").cast("string").alias("valid_from"),
        F.lead("vfrom").over(wh).cast("string").alias("valid_to"),
        F.col("version").cast("int").alias("version"),
        F.lead("vfrom").over(wh).isNull().alias("is_current"),
    )


@query(
    "window_ignore_nulls_battery",
    oracle="""
    WITH x AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             CASE WHEN o_orderstatus = 'F'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END AS fprice
      FROM orders
    ),
    win AS (
      SELECT o_custkey,
             row_number() OVER w_ord AS rn,
             count(*) OVER w_all AS n_orders,
             first_value(fprice IGNORE NULLS) OVER w_all AS first_f,
             last_value(fprice IGNORE NULLS) OVER w_all AS last_f,
             nth_value(fprice, 2 IGNORE NULLS) OVER w_all AS second_f,
             lag(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS prev_price
      FROM x
      WINDOW
        w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        w_all AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT o_custkey,
           CAST(n_orders AS BIGINT)      AS n_orders,
           CAST(first_f AS DOUBLE)       AS first_f,
           CAST(last_f AS DOUBLE)        AS last_f,
           CAST(second_f AS DOUBLE)      AS second_f,
           CAST(prev_price AS DOUBLE)    AS last_prev_price
    FROM win WHERE rn = n_orders
    ORDER BY o_custkey
    """,
)
def window_ignore_nulls_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window surface: first/last/nth non-null value of a
    sparse column (price of 'F'-status orders) over a full-partition
    frame, plus lag with an explicit default — evaluated at each
    customer's final order row. This is the "latest known value" /
    sparse-carry semantics that forward-fill, gap-fill, and SCD
    consumption all build on; NULL-sensitive evaluation order is a
    classic cross-engine divergence, pinned here value-exact.

    Plan shape: both windows share one (custkey, date, orderkey) sort —
    one exchange, one sort, four window functions; the rn = n_orders
    filter reduces to one row per customer without a second shuffle.
    100 TB: partition-bounded windows over the natural key — the same
    single-exchange recipe as the SCD2 builders.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("v8_orders")
    return spark.sql(
        """
        WITH x AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                 CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(18,2)) END AS fprice
          FROM v8_orders
        ),
        win AS (
          SELECT o_custkey,
                 row_number() OVER w_ord AS rn,
                 count(*) OVER w_all AS n_orders,
                 first_value(fprice) IGNORE NULLS OVER w_all AS first_f,
                 last_value(fprice) IGNORE NULLS OVER w_all AS last_f,
                 nth_value(fprice, 2) IGNORE NULLS OVER w_all AS second_f,
                 lag(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS prev_price
          FROM x
          WINDOW
            w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            w_all AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        )
        SELECT o_custkey,
               CAST(n_orders AS BIGINT)      AS n_orders,
               CAST(first_f AS DOUBLE)       AS first_f,
               CAST(last_f AS DOUBLE)        AS last_f,
               CAST(second_f AS DOUBLE)      AS second_f,
               CAST(prev_price AS DOUBLE)    AS last_prev_price
        FROM win WHERE rn = n_orders
        ORDER BY o_custkey
        """
    )
