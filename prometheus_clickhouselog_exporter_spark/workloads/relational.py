"""Relational operator battery (SURVEY §2.2) over the synthetic star schema.

These are the standard operator categories the reference does NOT implement
(it has no joins/aggs/windows — SURVEY §2.2 cites the absence); the engine
provides them as Catalyst-planned DataFrame operators, each oracle-checked
against DuckDB. Scale notes per query are in the docstrings: the constant
design rules are (a) dims region/nation/supplier/part are broadcast — no
shuffle of the fact side for those joins; (b) fact-fact joins shuffle on the
join key once and AQE coalesces; (c) every scan projects and filters at the
parquet reader (PushedFilters in the plan).

Float discipline (see workloads/core.py): money aggregates run in exact
DECIMAL on both engines; ratios use deterministic floor-rounding. Plain
``round(double)`` is never used on a value that can sit at a half-boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import fround, money, query, table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)      AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(5,2)))
                          * (1 + CAST(l_tax AS DECIMAL(5,2)))), 2) AS DOUBLE)    AS sum_charge,
           floor(sum(l_quantity) / count(*) * 10000 + 0.5) / 10000               AS avg_qty,
           floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000                               AS avg_price,
           floor(CAST(sum(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000                               AS avg_disc,
           count(*)                                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped scan + filter + 8-agg hash aggregate.

    100 TB: pure map-side-partial hash agg on 6 grouped values — shuffle is
    a few KB regardless of input size; the scan reads 7 of 11 columns with
    the shipdate predicate pushed to parquet row groups. Money sums run in
    DECIMAL (exact, and Spark's decimal sum is still whole-stage codegen).
    """
    l = table(spark, sf_dir, "lineitem")
    price = money(F.col("l_extendedprice"))
    disc = F.col("l_discount").cast("decimal(5,2)")
    tax = F.col("l_tax").cast("decimal(5,2)")
    disc_price = price * (F.lit(1) - disc)
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(money(F.col("l_quantity"))), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (F.lit(1) + tax)), 2).cast("double").alias("sum_charge"),
            fround(F.sum("l_quantity") / n, 4).alias("avg_qty"),
            fround(F.sum(price).cast("double") / n, 4).alias("avg_price"),
            fround(F.sum(disc).cast("double") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped multi-way join: fact×fact plus broadcast dims.

    100 TB: region/nation/customer stay broadcast (the ASIA filter shrinks
    customer before the hint applies); the only shuffle is lineitem⋈orders
    on orderkey, which AQE skew-splits if needed.
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    revenue = money(F.col("l_extendedprice")) * (F.lit(1) - F.col("l_discount").cast("decimal(5,2)"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0), 2) AS DOUBLE)
             AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders.

    100 TB: shuffle join on custkey (both sides large); count(col) vs
    count(*) distinction matters for the null-extended rows.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum(money(F.col("o_totalprice"))), F.lit(0)), 2)
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "join_semi_anti_customers",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders
    """,
)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) and left_anti (NOT EXISTS) in one row.

    100 TB: semi/anti joins ship only the join key of the right side;
    Catalyst rewrites to broadcast variants when the keys fit.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count(F.lit(1)).alias("with_orders"))
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count(F.lit(1)).alias("without_orders"))
    return semi.crossJoin(anti)


@query(
    "window_topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ) WHERE rk <= 5
    """,
)
def window_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window (deterministic tiebreak).

    100 TB: Spark pushes a per-partition top-K (WindowGroupLimit) below the
    shuffle, so only K rows per segment per mapper move.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


@query(
    "agg_distinct_priorities",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(DISTINCT o_custkey)       AS n_customers,
           count(*)                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate (expand + two-phase agg under the hood)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "rollup_order_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grouping-sets family)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(money(F.col("o_totalprice"))), 2).cast("double").alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@query(
    "setops_part_brands",
    oracle="""
    SELECT 'large_only' AS src, p_brand FROM
      (SELECT DISTINCT p_brand FROM part WHERE p_size >= 30
       EXCEPT SELECT DISTINCT p_brand FROM part WHERE p_size < 10)
    UNION ALL
    SELECT 'both' AS src, p_brand FROM
      (SELECT DISTINCT p_brand FROM part WHERE p_size >= 30
       INTERSECT SELECT DISTINCT p_brand FROM part WHERE p_size < 10)
    """,
)
def setops_part_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL composition.

    Each distinct brand list feeds BOTH set ops, so both are
    localCheckpoint'd once (checkpoint-once doctrine, SCALE.md): the
    distinct agg runs once per side over the pruned (p_brand, p_size)
    scan, and EXCEPT/INTERSECT consume the O(brands) checkpoints —
    without it the part table is scanned 4×."""
    p = table(spark, sf_dir, "part")
    large = (
        p.filter(F.col("p_size") >= 30).select("p_brand").distinct()
        .localCheckpoint(eager=False)
    )
    small = (
        p.filter(F.col("p_size") < 10).select("p_brand").distinct()
        .localCheckpoint(eager=False)
    )
    return (
        large.exceptAll(small).distinct().select(F.lit("large_only").alias("src"), "p_brand")
        .unionAll(large.intersect(small).select(F.lit("both").alias("src"), "p_brand"))
    )


@query(
    "scalar_string_date_math",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 3)) AS priority_name,
           length(o_orderpriority)           AS prio_len,
           year(o_orderdate)                 AS order_year,
           month(o_orderdate)                AS order_month,
           floor((o_totalprice * 1.1) * 100 + 0.5) / 100   AS price_with_tax,
           floor(ln(o_totalprice + 1) * 10000 + 0.5) / 10000 AS log_price,
           o_orderkey % 7                    AS key_mod
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery: string/date/math expressions, all codegen'd.

    Per-row products of money × 1.1 land on half-boundaries by construction,
    so this uses the deterministic floor-round (see core.py) — a regression
    here is exactly the cross-engine rounding bug the harness exists for.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return o.select(
        "o_orderkey",
        F.upper(F.expr("substr(o_orderpriority, 3)")).alias("priority_name"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        fround(F.col("o_totalprice") * 1.1, 2).alias("price_with_tax"),
        fround(F.log(F.col("o_totalprice") + 1), 4).alias("log_price"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@query(
    "json_events_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           floor(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE))
                 / count(CAST(json_extract_string(props, '$.k') AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction over the events.props string column."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        fround(F.sum(k) / F.count(k), 4).alias("avg_k"),
    )


@query(
    "window_sliding_events",
    oracle="""
    SELECT CAST(to_timestamp(CAST((floor(epoch(ts) / 43200) - k) * 43200 AS BIGINT)) AS TIMESTAMP)
             AS window_start,
           event_type,
           count(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) t(k)
    GROUP BY 1, 2
    """,
)
def window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window (1 day long, sliding every 12 h): each
    event lands in exactly duration/slide = 2 windows. Same grouping
    expression Structured Streaming uses; the oracle derives the two
    epoch-aligned window starts arithmetically. 100 TB: the Expand that
    multiplies rows by windows-per-event happens BEFORE the shuffle, so
    the exchange carries partial aggregates, not duplicated events.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 day", "12 hours").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_valid,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)   AS sum_k,
           count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VariantType: ``try_parse_json``
    → binary variant → typed ``try_variant_get`` path extraction.

    Versus ``get_json_object`` (json_events_extract): the variant is
    parsed ONCE into a binary-encoded form and every path access is a
    field lookup, not a re-parse — the difference between O(paths) JSON
    scans and one, which is what makes wide semi-structured columns
    viable at 100 TB. Malformed documents become NULL (try_ semantics),
    matching the engine's count-and-skip posture.
    """
    e = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n_valid"),
        F.sum("k").alias("sum_k"),
        F.count_distinct("k").alias("distinct_k"),
    )


@query(
    "window_tumbling_events",
    oracle="""
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400) AS TIMESTAMP)
             AS window_start,
           event_type,
           count(*) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time window (batch rendering of the streaming
    `window()` operator — same grouping expression Structured Streaming
    uses, so the plan carries over to readStream unchanged)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").getField("start").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), fround(F.sum("value"), 2).alias("total_value"))
    )
