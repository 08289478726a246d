"""Relational battery, round 3 batch 18: BOM explosion (recursion with
arithmetic state) and calendar-dimension generation.

Second recursive-CTE row: recursive_cte_subtree_rollup walks chains
upward carrying constant state; the bill-of-materials explosion walks
a DAG downward MULTIPLYING per-edge quantities along every path — the
use case recursion exists for in manufacturing/planning engines (the
closure cannot be expressed as a join chain of fixed depth). The
calendar dimension generator is the warehouse's most-built table,
done engine-side from a single sequence expansion — every attribute
pure integer/date arithmetic so both engines agree to the day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import query, table


@query(
    "recursive_bom_explosion",
    oracle="""
    WITH RECURSIVE
    edges AS (
      -- synthetic acyclic BOM over part keys: binary tree, child > parent
      SELECT p_partkey AS parent, 2 * p_partkey + 1 AS child,
             1 + (2 * p_partkey + 1) % 3 AS qty
      FROM part WHERE 2 * p_partkey + 1 < 200
      UNION ALL
      SELECT p_partkey, 2 * p_partkey + 2, 1 + (2 * p_partkey + 2) % 3
      FROM part WHERE 2 * p_partkey + 2 < 200
    ),
    walk AS (
      SELECT parent AS root, child AS node, CAST(qty AS BIGINT) AS total_qty,
             1 AS depth
      FROM edges WHERE parent < 4
      UNION ALL
      SELECT w.root, e.child, w.total_qty * e.qty, w.depth + 1
      FROM walk w JOIN edges e ON e.parent = w.node
    )
    SELECT CAST(root AS BIGINT) AS root,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(max(depth) AS INT) AS max_depth,
           CAST(sum(total_qty) AS BIGINT) AS total_units
    FROM walk GROUP BY root ORDER BY root
    """,
)
def recursive_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion — recursion with MULTIPLICATIVE
    state: a synthetic acyclic BOM (binary tree over part keys, child
    key > parent key guarantees termination) is walked from the first
    four roots, multiplying each edge's quantity into the path total,
    then rolled up per root (component count, depth, total leaf-units
    per assembled unit). This is the second recursive-CTE row: the
    subtree rollup carried CONSTANT state; this one exercises the
    accumulating-join form (walk ⋈ edges each iteration) that fixed-
    depth join chains cannot express. All integers.

    Scale: iterations = DAG depth (log₂ of the key space here); each
    step joins the frontier against the edge table on the child key —
    the frontier, not the closure, is the working set. DuckDB runs the
    identical recursion.
    """
    p = table(spark, sf_dir, "part")
    e1 = p.filter(2 * F.col("p_partkey") + 1 < 200).select(
        F.col("p_partkey").alias("parent"),
        (2 * F.col("p_partkey") + 1).alias("child"),
        (1 + (2 * F.col("p_partkey") + 1) % 3).alias("qty"),
    )
    e2 = p.filter(2 * F.col("p_partkey") + 2 < 200).select(
        F.col("p_partkey").alias("parent"),
        (2 * F.col("p_partkey") + 2).alias("child"),
        (1 + (2 * F.col("p_partkey") + 2) % 3).alias("qty"),
    )
    e1.unionByName(e2).createOrReplaceTempView("bom_edges")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT parent AS root, child AS node, CAST(qty AS BIGINT) AS total_qty,
                 1 AS depth
          FROM bom_edges WHERE parent < 4
          UNION ALL
          SELECT w.root, e.child, w.total_qty * e.qty, w.depth + 1
          FROM walk w JOIN bom_edges e ON e.parent = w.node
        )
        SELECT CAST(root AS BIGINT) AS root,
               CAST(count(*) AS BIGINT) AS n_components,
               CAST(max(depth) AS INT) AS max_depth,
               CAST(sum(total_qty) AS BIGINT) AS total_units
        FROM walk GROUP BY root ORDER BY root
        """
    )


@query(
    "gen_calendar_dim",
    oracle="""
    WITH span AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo,
             CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    ),
    dim AS (
      SELECT d,
             CAST(year(d) AS INT) AS y,
             CAST(month(d) AS INT) AS m,
             CAST(isodow(d) AS INT) AS dow,
             CAST(quarter(d) AS INT) AS q,
             (isodow(d) >= 6) AS is_weekend,
             (d = last_day(d)) AS is_month_end,
             CAST(CASE WHEN (year(d) % 4 = 0 AND year(d) % 100 <> 0)
                            OR year(d) % 400 = 0
                       THEN 1 ELSE 0 END AS INT) AS leap
      FROM days
    )
    SELECT y, q,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN is_weekend THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekend,
           CAST(sum(CASE WHEN is_month_end THEN 1 ELSE 0 END) AS BIGINT)
             AS n_month_ends,
           CAST(max(leap) AS INT) AS in_leap_year,
           CAST(min(d) AS VARCHAR) AS first_day,
           CAST(max(d) AS VARCHAR) AS last_day
    FROM dim GROUP BY y, q ORDER BY y, q
    """,
)
def gen_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generation — the warehouse's most-rebuilt
    table, produced ENGINE-SIDE from one sequence expansion spanning
    the fact table's date range: per (year, quarter) the day count,
    weekend count, month-end count, leap flag, and boundary days.
    Every attribute is integer/date arithmetic (ISO dow, last_day,
    the Gregorian leap rule spelled out) — the Spark↔DuckDB calendar
    parity check at generation time rather than lookup time
    (scalar_datetime_battery's complement).

    Scale: the grid is |days| rows from ONE broadcast span row —
    a generate-and-aggregate with no fact-table join at all; the fact
    scan contributes exactly min/max. The full dimension (the `dim`
    stage) is what a pipeline would persist; the rollup here keeps
    the oracle row set bounded.
    """
    o = table(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    days = span.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    isodow = ((F.dayofweek("d") + 5) % 7) + 1
    y = F.year("d")
    dim = days.select(
        "d",
        y.cast("int").alias("y"),
        F.month("d").cast("int").alias("m"),
        isodow.cast("int").alias("dow"),
        F.quarter("d").cast("int").alias("q"),
        (isodow >= 6).alias("is_weekend"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
        F.when(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0), 1)
        .otherwise(0)
        .cast("int")
        .alias("leap"),
    )
    return (
        dim.groupBy("y", "q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.when(F.col("is_weekend"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_weekend"),
            F.sum(F.when(F.col("is_month_end"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_month_ends"),
            F.max("leap").cast("int").alias("in_leap_year"),
            F.min("d").cast("string").alias("first_day"),
            F.max("d").cast("string").alias("last_day"),
        )
        .orderBy("y", "q")
    )
