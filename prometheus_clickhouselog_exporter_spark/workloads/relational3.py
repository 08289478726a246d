"""Relational battery III — the harder TPC-H shapes (SURVEY §2.2), adapted
to the driver's star schema (no partsupp/commitdate/comment columns, so
predicates are re-targeted at existing columns while keeping each query's
defining *shape*: Q4's EXISTS decorrelation, Q7's dual-dimension join with
a disjunctive cross-nation predicate, Q10's group-then-top-k, Q13's outer
join feeding a second aggregate, Q14's conditional-aggregate ratio).

The reference implements none of these (SURVEY §2.2 cites the absence —
it has no joins or aggregations at all, query.go:47-79 is its whole
operator surface); they are engine capability, oracle-checked vs DuckDB.

Scale rules as in relational.py: dims broadcast, fact-fact joins shuffle
once on the join key, money math in DECIMAL, ratios via fround().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import fround, money, query, table


def _revenue():
    return money(F.col("l_extendedprice")) * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,2)")
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS decorrelated to a left-semi join
    with a non-equi residual (l_shipdate > o_orderdate stands in for the
    reference benchmark's commitdate < receiptdate, absent here).

    100 TB: the quarter filter pushes to the orders scan (row-group prune
    on o_orderdate); the semi join shuffles both sides on orderkey but the
    semi form keeps at most one output row per order and never widens
    rows with lineitem columns. AQE handles orderkey skew.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE)
             AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bilateral trade volume — lineitem enriched with BOTH
    a supplier-side and a customer-side nation, a disjunctive cross-nation
    predicate, yearly revenue roll-up.

    100 TB: supplier⨝nation and customer⨝nation are broadcast (both dims
    tiny); the single real shuffle is lineitem⋈orders on orderkey. The
    disjunctive nation filter is applied on the broadcast-joined sides
    BEFORE that shuffle, so only qualifying rows move.
    """
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    )
    supp = s.join(F.broadcast(n1), s.s_nationkey == F.col("_n1k")).select(
        "s_suppkey", "supp_nation"
    )
    cust = c.join(F.broadcast(n2), c.c_nationkey == F.col("_n2k")).select(
        "c_custkey", "cust_nation"
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    joined = (
        l.join(F.broadcast(supp), l.l_suppkey == supp.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .filter(pair_ok)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: revenue lost to returns per customer, top 20.
    Group-by-high-cardinality-key then global top-k — the aggregate
    output (one row per customer) feeds TakeOrderedAndProject, so the
    final "sort" never materializes a full sort at scale.

    The ORDER BY carries an explicit c_custkey tie-break: top-k on a
    possibly-tied measure is otherwise nondeterministic across engines,
    and the driver compares the row SET.

    100 TB: returnflag + the date window prune both fact scans before the
    orderkey shuffle; customer⨝nation broadcasts; top-k is per-partition
    heap + driver merge of 20-row partials, not a global sort.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01 00:00:00")))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", F.col("n_name").alias("nation")
    )
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "nation")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )
    return agg.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: customer order-count distribution. The defining
    features survive the adaptation (priority filter stands in for the
    comment NOT LIKE): the filter lives in the LEFT JOIN's ON clause (a
    WHERE would silently turn the join inner and drop 0-order customers),
    and the output of one aggregate is the grouping key of the next.

    100 TB: join + first agg share one shuffle on custkey (Catalyst reuses
    the child partitioning for the groupBy); the second agg's key space is
    tiny (distinct order counts) so its shuffle is negligible. Customers
    with zero orders survive via the outer side — the histogram's 0 bucket
    is the point of the query.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_effect",
    oracle="""
    SELECT floor(
             100.0
             * CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l_discount AS DECIMAL(5,2)))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promo revenue share — conditional aggregate over a
    broadcast dim attribute, two sums collapsing to ONE scalar ratio.

    Both sums run exact DECIMAL so the quotient's operands are identical
    across engines; the division happens once, in double, then floor-
    rounds (fround) — the only cross-engine-safe way to hash a ratio.

    100 TB: part broadcasts (or, if part outgrows the broadcast threshold,
    a bucketed/shuffled hash join on partkey); the shipdate window prunes
    the lineitem scan; the aggregate is a single-group partial+final —
    bytes on the wire: two decimals per task.
    """
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-06-01 00:00:00")))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    zero = F.lit(0).cast("decimal(18,2)")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("_promo"),
        F.sum(rev).alias("_total"),
    )
    pct = F.lit(100.0) * F.col("_promo").cast("double") / F.col("_total").cast("double")
    return agg.select(fround(pct, 4).alias("promo_revenue_pct"))
