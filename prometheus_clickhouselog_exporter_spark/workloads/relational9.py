"""Relational battery, round 3 batch 8: seasonal indices, late-arriving
dimensions, interval backlog curves, and deletion-propagation manifests.

Four warehouse-operations staples: the multiplicative month-of-year
seasonality index every demand forecast starts from; the UNKNOWN-member
fallback for facts whose dimension row hasn't arrived yet; the
concurrent-interval backlog curve via +1/-1 delta events (linear, never
pair-materializing); and the right-to-be-forgotten deletion manifest
that enumerates blast radius across tables before a wipe.

Cross-engine discipline as everywhere (workloads/core.py): DECIMAL for
money, single-division doubles, rank-exact selections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table


@query(
    "seasonality_month_index",
    oracle="""
    WITH monthly AS (
      SELECT CAST(month(o_orderdate) AS INT) AS m,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             count(*) AS n
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(rev) AS trev, sum(n) AS tn FROM monthly)
    SELECT m,
           CAST(n AS BIGINT) AS n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev * tot.tn AS DOUBLE) / CAST(tot.trev * monthly.n AS DOUBLE)
             AS seasonal_index
    FROM monthly, tot
    ORDER BY m
    """,
)
def seasonality_month_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative month-of-year seasonality: per-order-month revenue
    per order relative to the overall revenue per order — index > 1 =
    hot month. The index is ONE double division of exact DECIMAL/BIGINT
    cross-products (rev·N_total) / (rev_total·n_month), so no
    intermediate average introduces a float.

    Scale: a 12-row aggregate with map-side partials and a 1-row
    broadcast total — the cheapest possible shape; the real content is
    the exactness discipline on the ratio.
    """
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.month("o_orderdate").cast("int").alias("m")).agg(
        F.sum(money(F.col("o_totalprice"))).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = monthly.agg(F.sum("rev").alias("trev"), F.sum("n").alias("tn"))
    return (
        monthly.crossJoin(F.broadcast(tot))
        .select(
            "m",
            F.col("n").alias("n_orders"),
            F.col("rev").cast("double").alias("revenue"),
            (
                (F.col("rev") * F.col("tn")).cast("double")
                / (F.col("trev") * F.col("n")).cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("m")
    )


@query(
    "dim_late_arriving_unknown",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT coalesce(d.c_name, '__UNKNOWN__') AS member,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o LEFT JOIN dim d ON d.c_custkey = o.o_custkey
    GROUP BY 1
    ORDER BY n_orders DESC, member
    LIMIT 50
    """,
)
def dim_late_arriving_unknown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling: facts whose dimension row hasn't
    landed yet (simulated by withholding every 13th customer) fall back
    to the '__UNKNOWN__' member instead of silently dropping from an
    inner join — the warehouse pattern that keeps revenue totals honest
    while the dimension catches up; the UNKNOWN bucket's size is the
    data-latency health metric.

    Scale: broadcast LEFT join (dimension-sized build side), coalesce at
    scan stage, one rollup. The UNKNOWN row aggregates ALL orphan facts,
    so it dominates the top-50 cut — which is exactly the operational
    signal the report exists to surface.
    """
    o = table(spark, sf_dir, "orders")
    dim = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 13 != 0)
        .select("c_custkey", "c_name")
    )
    return (
        o.join(F.broadcast(dim), o.o_custkey == dim.c_custkey, "left")
        .groupBy(F.coalesce("c_name", F.lit("__UNKNOWN__")).alias("member"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money(F.col("o_totalprice"))).cast("double").alias("revenue"),
        )
        .orderBy(F.col("n_orders").desc(), "member")
        .limit(50)
    )


@query(
    "timeseries_active_backlog",
    oracle="""
    WITH spans AS (
      SELECT o_orderkey,
             min(CAST(o_orderdate AS DATE)) AS d0,
             max(CAST(l_shipdate AS DATE)) AS d1
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey
    ),
    deltas AS (
      SELECT d0 AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT d1, -1 FROM spans
    ),
    daily AS (SELECT d, sum(delta) AS net FROM deltas GROUP BY d),
    curve AS (
      SELECT d, sum(net) OVER (ORDER BY d
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS backlog
      FROM daily
    )
    SELECT strftime(d, '%Y-%m') AS month,
           CAST(max(backlog) AS BIGINT) AS peak_backlog,
           CAST(min(backlog) AS BIGINT) AS min_backlog
    FROM curve GROUP BY 1 ORDER BY month
    """,
)
def timeseries_active_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval backlog curve: each order is active from its
    order date until its last line ships; the number of simultaneously
    active orders per day comes from +1/-1 DELTA events and one running
    sum — the linear sweep-line recipe for "how many X were open at
    time t", where the naive form (day × interval range join) is
    quadratic. Rolled up to monthly peak/trough for a bounded result.

    Scale: one fact join to build spans, a 2-row-per-order delta union,
    a date-keyed count, and a running sum over |days| rows. The running
    sum's global order window runs on DAY-cardinality data (bounded);
    for finer-grained event time the same prefix sum runs
    range-partitioned (the total-order recipe). The month rollup makes
    the output O(months).
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("d0"),
            F.max(F.col("l_shipdate").cast("date")).alias("d1"),
        )
    )
    deltas = spans.select(F.col("d0").alias("d"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("d1"), F.lit(-1))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily.select("d", F.sum("net").over(w).alias("backlog"))
    return (
        curve.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.max("backlog").alias("peak_backlog"),
            F.min("backlog").alias("min_backlog"),
        )
        .orderBy("month")
    )


@query(
    "timeseries_decompose_trend_seasonal",
    oracle="""
    WITH monthly AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
             CAST(month(o_orderdate) AS INT) AS moy,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    trended AS (
      SELECT ym, moy, rev,
             CAST(sum(rev) OVER w AS DOUBLE) / count(*) OVER w AS trend,
             count(*) OVER w AS wn
      FROM monthly
      WINDOW w AS (ORDER BY ym ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
    ),
    ratios AS (
      SELECT moy, CAST(rev AS DOUBLE) / trend AS ratio
      FROM trended WHERE wn = 13
    )
    SELECT moy,
           CAST(count(*) AS BIGINT) AS n_months,
           floor((sum(ratio) / count(*)) * 1e6 + 0.5) / 1e6 AS seasonal_index
    FROM ratios GROUP BY moy ORDER BY moy
    """,
)
def timeseries_decompose_trend_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative decomposition, step one and two: trend =
    centered 13-month moving average over the monthly revenue series
    (full windows only — the edge months with truncated frames are
    excluded exactly as textbook STL does), seasonal index = the mean
    detrended ratio per calendar month. Index > 1 months sell above
    their local trend — the demand-planning input seasonality_month_index
    approximates without detrending.

    Determinism: the series is exact DECIMAL; trend is one division of
    an exact frame sum; the per-month ratio mean is a SMALL-N double sum
    (≤7 ratios) absorbed by fround(6) — the drift_psi discipline, fine
    because the hash compares rounded values. Scale: the series is
    MONTH-cardinality (bounded), so the global-order window is a few
    dozen rows riding one exchange; all fact-scale work is the monthly
    rollup with map-side partials.
    """
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.month("o_orderdate").cast("int").alias("moy"),
    ).agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
    wf = Window.orderBy("ym").rowsBetween(-6, 6)
    trended = monthly.select(
        "moy",
        "rev",
        (F.sum("rev").over(wf).cast("double") / F.count(F.lit(1)).over(wf)).alias(
            "trend"
        ),
        F.count(F.lit(1)).over(wf).alias("wn"),
    )
    ratios = trended.where(F.col("wn") == 13).select(
        "moy", (F.col("rev").cast("double") / F.col("trend")).alias("ratio")
    )
    return (
        ratios.groupBy("moy")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            fround(F.sum("ratio") / F.count(F.lit(1)), 6).alias("seasonal_index"),
        )
        .orderBy("moy")
    )


@query(
    "compliance_delete_manifest",
    oracle="""
    WITH doomed AS (
      SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT t.tbl,
           CAST(t.n_rows_to_delete AS BIGINT) AS n_rows_to_delete,
           CAST(t.n_keys AS BIGINT) AS n_keys
    FROM (
      SELECT 'customer' AS tbl, count(*) AS n_rows_to_delete,
             count(DISTINCT c_custkey) AS n_keys
      FROM customer WHERE c_custkey IN (SELECT k FROM doomed)
      UNION ALL
      SELECT 'orders', count(*), count(DISTINCT o_custkey)
      FROM orders WHERE o_custkey IN (SELECT k FROM doomed)
      UNION ALL
      SELECT 'lineitem', count(*), count(DISTINCT o_custkey)
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_custkey IN (SELECT k FROM doomed)
      UNION ALL
      SELECT 'events', count(*), count(DISTINCT user_id)
      FROM events WHERE user_id IN (SELECT k FROM doomed)
    ) t
    ORDER BY tbl
    """,
)
def compliance_delete_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten blast radius: given a deletion key set
    (every 97th customer), enumerate per table how many rows and how
    many distinct keys a wipe would touch — including the TRANSITIVE
    reach through the fact graph (lineitem has no customer key; it is
    doomed via its order). This manifest is what a deletion job audits
    and signs off on BEFORE any data is mutated, and re-running it after
    the wipe (all zeros) is the verification step.

    Scale: the doomed set is key-cardinality → broadcast semi-joins at
    every probe; the lineitem reach is a two-hop broadcast chain
    (doomed→orders→lineitem). Counts fold map-side; output is
    O(tables). The deterministic key predicate stands in for the real
    request queue so the oracle can replay it.
    """
    doomed = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("k"))
        .localCheckpoint(eager=False)  # one key-set build for all 4 probes
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    def probe(df: DataFrame, key, tbl: str, key_out=None) -> DataFrame:
        hit = df.join(F.broadcast(doomed), key == F.col("k"), "leftsemi")
        key_col = key_out if key_out is not None else key
        return hit.agg(
            F.count(F.lit(1)).alias("n_rows_to_delete"),
            F.countDistinct(key_col).alias("n_keys"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows_to_delete", "n_keys")

    doomed_li = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        probe(cust, F.col("c_custkey"), "customer")
        .unionByName(probe(orders, F.col("o_custkey"), "orders"))
        .unionByName(probe(doomed_li, F.col("o_custkey"), "lineitem"))
        .unionByName(probe(ev, F.col("user_id"), "events"))
        .select("tbl", "n_rows_to_delete", "n_keys")
        .orderBy("tbl")
    )
