"""Relational battery IV — the remaining 13 TPC-H shapes (Q2, Q6, Q8, Q9,
Q11, Q12, Q15, Q16, Q17, Q19, Q20, Q21, Q22), completing the full 22-query
battery together with relational.py (Q1/Q3/Q5/Q18) and relational3.py
(Q4/Q7/Q10/Q13/Q14).

Adaptation rules to the driver's star schema (no partsupp / shipmode /
commitdate / receiptdate / phone / container columns):
- partsupp stands in as the DISTINCT (l_partkey, l_suppkey) pairs of
  lineitem (the "who supplies what" relation actually observed), and
  supply cost as p_retailprice.
- "late delivery" (Q21) = l_shipdate > o_orderdate + 60 days.
- Q22's phone country code = c_nationkey % 7.
Each query keeps its defining *shape* — the scalar correlated subquery
(Q2/Q15/Q17), HAVING vs a global scalar (Q11), nested INs (Q20),
exists/not-exists against the same fact (Q21), disjunctive multi-column
pushdown (Q19) — because the shape is what exercises the engine.

The reference implements none of these (its whole operator surface is
query.go:47-79 — regex dispatch, no joins/aggregation); this battery is
engine capability, oracle-checked vs DuckDB.

Scale rules as everywhere: dims broadcast, fact-fact joins shuffle once on
the join key, correlated subqueries decorrelate to window functions or one
extra aggregate (never a per-row subplan), money math in DECIMAL, ratios
via fround(). Scalar aggregates ride a broadcast nested-loop join of a
1-row DataFrame — never .collect() into the driver program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import fround, money, query, table


def _revenue():
    return money(F.col("l_extendedprice")) * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,2)")
    )


def _dec_round_double(col, digits: int = 2):
    return F.round(col, digits).cast("double")


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp stand-in: observed (partkey, suppkey) supply pairs.

    100 TB: one shuffle on (partkey, suppkey) with map-side partial
    distinct; output cardinality is the supply relation (~4 pairs/part in
    TPC-H), orders of magnitude below lineitem."""
    return (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey"))
        .dropDuplicates(["ps_partkey", "ps_suppkey"])
    )


_PARTSUPP_SQL = "(SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)"


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_type
    FROM part p
    JOIN {_PARTSUPP_SQL} ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM {_PARTSUPP_SQL} ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_name
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: cheapest supplier per part (correlated scalar MIN,
    here on s_acctbal standing in for ps_supplycost), region-restricted.

    Decorrelation: the correlated MIN becomes a window min over partkey on
    the already-joined (part ⨝ ps ⨝ supplier-in-region) relation — one
    shuffle on partkey replaces a per-part subplan; the filter is then a
    row-local comparison. Dims (supplier/nation/region) broadcast.
    """
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    joined = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    best = joined.withColumn("_min_bal", F.min("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("_min_bal")
    )
    return (
        best.select("s_acctbal", "s_name", "nation", "p_partkey", "p_type")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(20)
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(5,2))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6: pure scan-filter-aggregate — the pushdown benchmark. All
    three predicates reach the parquet scan (date window prunes row
    groups); no join, no shuffle beyond the single-group partial+final
    (two decimals per task on the wire)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    amount = money(F.col("l_extendedprice")) * F.col("l_discount").cast("decimal(5,2)")
    return l.agg(_dec_round_double(F.sum(amount)).alias("revenue"))


@query(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(5,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           floor(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) * 10000 + 0.5) / 10000 AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of regional volume per year — a
    conditional-sum / sum ratio over a 7-table join.

    100 TB: every dim side (part, supplier+nation, customer+nation+region)
    broadcasts after its own filter; the one real shuffle is
    lineitem⋈orders on orderkey. Both sums stay DECIMAL until the single
    double division (fround 4) — the only cross-engine-stable ratio form.
    """
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n1 = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == n1.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp = s.join(F.broadcast(n2), s.s_nationkey == F.col("_sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(supp), l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("volume", _revenue())
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)).alias("_n"),
        F.sum("volume").alias("_d"),
    )
    share = F.col("_n").cast("double") / F.col("_d").cast("double")
    return agg.select("o_year", fround(share, 4).alias("mkt_share"))


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
                          - CAST(p.p_retailprice AS DECIMAL(18,2))
                            * CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: profit per supplier-nation per year over a LIKE-
    filtered part set; cost = p_retailprice × quantity standing in for
    ps_supplycost (no partsupp table).

    100 TB: part (LIKE-filtered) and supplier⨝nation broadcast; the
    orderkey shuffle is the only wide exchange. Profit arithmetic stays
    DECIMAL end-to-end; one round+cast at the end.
    """
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    profit = _revenue() - money(F.col("p_retailprice")) * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(supp), l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    return joined.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        _dec_round_double(F.sum(profit)).alias("sum_profit")
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH supply AS (
      SELECT ps.ps_partkey, CAST(p.p_retailprice AS DECIMAL(18,2)) AS val
      FROM {_PARTSUPP_SQL} ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(round(sum(val), 2) AS DOUBLE) AS stock_value
    FROM supply
    GROUP BY ps_partkey
    HAVING sum(val) > (SELECT sum(val) * 0.001 FROM supply)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: per-part stock value within one nation, keeping
    only parts above a FRACTION OF THE GLOBAL TOTAL — a HAVING clause
    against a scalar subquery over the same relation.

    Decorrelation: the global total is a 1-row aggregate broadcast-nested-
    loop-joined onto the per-part aggregate (never collected); the
    threshold compare is then row-local. The supply relation is computed
    ONCE and reused for both aggregates (Catalyst reuses the exchange).

    100 TB: partsupp-pairs shuffle on (partkey,suppkey), per-part agg
    shuffles on partkey; the scalar side is one extra reduce over the
    same exchange output.
    """
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    supply = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select("ps_partkey", money(F.col("p_retailprice")).alias("val"))
    )
    per_part = supply.groupBy("ps_partkey").agg(F.sum("val").alias("_sum"))
    total = supply.agg((F.sum("val") * F.lit(0.001)).alias("_threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_sum") > F.col("_threshold"))
        .select("ps_partkey", _dec_round_double(F.col("_sum")).alias("stock_value"))
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: conditional counts of high/low-priority orders per
    shipping class (l_linestatus standing in for l_shipmode). The year
    filter prunes the lineitem scan before the orderkey shuffle; the
    aggregate is two conditional sums over a 2-group key."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    ).select("l_orderkey", "l_linestatus")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: quarterly revenue per supplier, then the
    supplier(s) achieving the MAX — a scalar subquery over a derived
    relation (the original's CREATE VIEW).

    The max is a 1-row aggregate broadcast onto the per-supplier rows;
    equality on DECIMAL-rounded doubles is exact cross-engine, so ties
    (all maxima) surface identically in both engines.

    100 TB: one suppkey shuffle for the per-supplier agg; the max is a
    second reduce over that agg's (small) output; supplier dim broadcasts.
    """
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dec_round_double(F.sum(_revenue())).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_variety",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM {_PARTSUPP_SQL} ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 200)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: supplier variety per (brand, type, size) with a
    NOT-IN supplier exclusion (low-acctbal standing in for the complaints
    LIKE). NOT IN decorrelates to a broadcast left-anti join — the
    exclusion list is tiny and never shuffles the pair relation.

    100 TB: pair relation shuffles once for distinct, once for the
    count-distinct agg (both on related keys); part dim broadcasts.
    """
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 200).select(
        F.col("s_suppkey").alias("_bad_key")
    )
    ps = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(bad_supp), F.col("ps_suppkey") == F.col("_bad_key"), "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
    )
    return ps.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("ps_suppkey").alias("supplier_cnt")
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5' AND p.p_size = 10
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: revenue from abnormally-small orders — a per-part
    correlated AVG threshold (p_size stands in for container).

    Decorrelation: avg quantity per part is a window aggregate over
    partkey computed on the part-filtered lineitem — valid because the
    correlated subquery's own predicate is only the partkey equality, and
    window-avg over ALL lines of that part equals the subquery (lineitem
    is not otherwise filtered). quantity is an integral double, so the avg
    is bit-exact in both engines; the 0.2× compare is then deterministic.

    100 TB: the Brand# filter broadcasts a small part set; one partkey
    shuffle computes the window; the final agg is single-group.
    """
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_size") == 10)
    ).select("p_partkey")
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    small = lp.withColumn("_avg_q", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("_avg_q")
    )
    total = small.agg(F.sum(money(F.col("l_extendedprice"))).alias("_sum"))
    return total.select(
        F.round(F.col("_sum").cast("double") / F.lit(7.0), 2).cast("double").alias("avg_yearly")
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: three OR-branches mixing dim (brand, size) and
    fact (quantity) predicates — the disjunctive-pushdown benchmark.

    Catalyst extracts the common sub-predicates per side: the brand/size
    union pushes to the (broadcast) part scan and the quantity envelope
    (1..30) to the lineitem scan, so the join sees pre-filtered inputs and
    the full disjunction is evaluated post-join as a residual.
    """
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return j.filter(branch).agg(_dec_round_double(F.sum(_revenue())).alias("revenue"))


@query(
    "q20_part_promotion",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_2'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 100)
    ORDER BY s.s_name
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: suppliers who moved real volume of a LIKE-named
    part family in a year — nested IN subqueries (part-set → shipped-
    volume HAVING → supplier semi-join).

    Decorrelation: inner IN = broadcast semi join of lineitem against the
    filtered part keys; the HAVING = suppkey agg; outer IN = semi join of
    the (tiny) qualifying-supplier set, broadcast. No subplan executes
    per row anywhere.

    100 TB: one suppkey shuffle on the year+part-filtered lineitem slice;
    everything else broadcasts.
    """
    parts = table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%")).select(
        "p_partkey"
    )
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    movers = (
        l.join(F.broadcast(parts), l.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(movers), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_4' AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order (late = shipped >60 days after the
    order date, standing in for receipt>commit).

    Decorrelation: EXISTS + NOT-EXISTS against the same fact collapse to
    ONE per-order aggregate — n_suppliers and n_late_suppliers — joined
    back to the late lines; the conditions become row-local
    (n_suppliers > 1 AND n_late_suppliers == 1). Two orderkey shuffles
    total (agg + join), vs the naive four self-joins.

    The two distinct counts run as a two-level aggregate — first
    (orderkey, suppkey) with max(late), then plain counts per orderkey —
    instead of multi-column count_distincts, which would plan an Expand
    (2x every input row before the exchange). The second level reuses the
    first's partitioning: orderkey is a prefix of (orderkey, suppkey), so
    no extra exchange appears.

    100 TB: both shuffles are on orderkey so AQE can coalesce them; the
    supplier/nation dims broadcast; top-20 is TakeOrderedAndProject.
    """
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    # _late_lines (not just any_late): Q21's numwait counts every
    # qualifying late LINE l1, so a supplier with two late lines on one
    # order contributes 2 — deduping to one per (order, supplier) diverges
    # once the data has multi-late-line pairs (first seen at sf0.1).
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("_late").alias("_any_late"),
        F.count(F.when(F.col("_late"), 1)).alias("_late_lines"),
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.count(F.when(F.col("_any_late"), 1)).alias("_n_late"),
    )
    late_pairs = per_pair.filter(F.col("_any_late")).select(
        "l_orderkey", "l_suppkey", "_late_lines"
    )
    sole_late = (
        late_pairs.join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        sole_late.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_global_sales",
    oracle="""
    WITH wealthy AS (
      SELECT c_custkey, c_nationkey % 7 AS cntrycode,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
      WHERE c_nationkey % 7 IN (1, 2, 4)
        AND c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (1, 2, 4))
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(round(sum(bal), 2) AS DOUBLE) AS totacctbal
    FROM wealthy w
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = w.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY cntrycode
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: above-average-balance customers gone inactive (no
    orders in the final year — this generator gives every customer SOME
    order, so the original's lifetime NOT-EXISTS would be vacuous),
    bucketed by country code (c_nationkey % 7 standing in for the phone
    prefix) — a scalar AVG subquery plus a date-windowed anti join.

    The threshold avg is computed as exact-decimal sum ÷ count in ONE
    double division (a DuckDB/Spark avg(double) would disagree in the last
    ulp under different reduction orders and flip boundary customers).

    100 TB: the anti join shuffles customers once against the orders
    custkey projection; the scalar threshold broadcasts; final agg groups
    on 3 codes.
    """
    code = F.col("c_nationkey") % 7
    c = table(spark, sf_dir, "customer").filter(code.isin(1, 2, 4)).select(
        "c_custkey", code.alias("cntrycode"), money(F.col("c_acctbal")).alias("bal")
    )
    pos = table(spark, sf_dir, "customer").filter(
        ((F.col("c_nationkey") % 7).isin(1, 2, 4)) & (F.col("c_acctbal") > 0.0)
    )
    thresh = pos.agg(
        (F.sum(money(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2001-01-01 00:00:00"))
    ).select("o_custkey")
    wealthy = c.join(F.broadcast(thresh)).filter(
        F.col("bal").cast("double") > F.col("_avg_bal")
    )
    no_orders = wealthy.join(o, wealthy.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        _dec_round_double(F.sum("bal")).alias("totacctbal"),
    )
