"""Relational battery, round 3 batch 5: market-basket lift, RFM
segmentation, union-by-name set semantics, try_* error-safe arithmetic,
equi-width histograms, and NOT IN null-semantics.

These extend the engine-category surface (SURVEY §2.2) with the
warehouse-analytics staples a reference user migrating a general OLAP
workload would reach for: association-rule mining (support/confidence/
lift), customer segmentation by rank-derived quartiles, schema-evolving
UNION BY NAME, ANSI-mode-safe try_* arithmetic, fixed-width value
histograms (the batch analog of the exporter's bucketed histograms,
metrics.go:27-52), and the classic NOT IN vs NOT EXISTS NULL trap.

Cross-engine discipline as everywhere else (workloads/core.py): exact
integer/DECIMAL arithmetic wherever a comparison or ordering depends on
it; the only doubles that cross the driver hash are single-division
ratios of exact integers (one IEEE op ⇒ bit-identical both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import money, query, table


@query(
    "basket_pair_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
    item_counts AS (SELECT pk, count(*) AS n_item FROM items GROUP BY pk),
    pairs AS (
      SELECT a.pk AS pk_a, b.pk AS pk_b, count(*) AS pair_orders
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.pk < b.pk
      GROUP BY a.pk, b.pk
      HAVING count(*) >= 2
    )
    SELECT pk_a, pk_b, pair_orders,
           ia.n_item AS a_orders, ib.n_item AS b_orders,
           CAST(pair_orders * n.n_orders AS DOUBLE)
             / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift,
           CAST(pair_orders AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
             AS confidence_a_to_b
    FROM pairs
    JOIN item_counts ia ON ia.pk = pairs.pk_a
    JOIN item_counts ib ON ib.pk = pairs.pk_b
    CROSS JOIN n
    ORDER BY lift DESC, pk_a, pk_b
    LIMIT 100
    """,
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: co-occurrence support, confidence
    and lift for part pairs bought in the same order, top-100 by lift.

    The fact table is read ONCE: baskets materialize as one sorted
    distinct-parts array per order (a single groupBy shuffle,
    localCheckpoint so the three consumers — pair counts, item counts,
    order count — never rescan the 100 TB input; this is the
    transaction-list build every FP-growth first pass does). Pairs then
    come from a double in-row explode bounded by the per-basket item
    count (C(k,2), k ≤ ~13 here), NOT by the corpus; item/pair counts
    fold map-side and the item-count joins key on partkey
    (dimension-sized ⇒ broadcast under AQE). Lift and confidence are
    each ONE double division of exact integer products — bit-identical
    across engines, so the top-100 cut (lift DESC, then pair key) is
    deterministic.

    Reference analog: none (exporter has no joins); this is an
    engine-category row — the standard FP-growth-lite first pass every
    retail/co-occurrence pipeline runs before rule mining.
    """
    baskets = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=False)
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    item_counts = (
        baskets.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = (
        baskets.select(F.explode("parts").alias("pk_a"), "parts")
        .select("pk_a", F.explode("parts").alias("pk_b"))
        .where(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .where(F.col("pair_orders") >= 2)
    )
    ia = item_counts.select(F.col("pk").alias("pk_a"), F.col("n_item").alias("a_orders"))
    ib = item_counts.select(F.col("pk").alias("pk_b"), F.col("n_item").alias("b_orders"))
    return (
        pairs.join(ia, "pk_a")
        .join(ib, "pk_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pk_a",
            "pk_b",
            "pair_orders",
            "a_orders",
            "b_orders",
            (
                (F.col("pair_orders") * F.col("n_orders")).cast("double")
                / (F.col("a_orders") * F.col("b_orders")).cast("double")
            ).alias("lift"),
            (
                F.col("pair_orders").cast("double") / F.col("a_orders").cast("double")
            ).alias("confidence_a_to_b"),
        )
        .orderBy(F.desc("lift"), "pk_a", "pk_b")
        .limit(100)
    )


@query(
    "rfm_customer_segments",
    oracle="""
    WITH m AS (
      SELECT o_custkey AS k,
             date_diff('day', max(CAST(o_orderdate AS DATE)),
                       DATE '1998-12-01')                    AS r,
             count(*)                                        AS f,
             sum(CAST(o_totalprice AS DECIMAL(18,2)))        AS mon
      FROM orders GROUP BY o_custkey
    ),
    u AS (
      SELECT k, 'r' AS metric, CAST(r AS DECIMAL(18,2)) AS v FROM m
      UNION ALL
      SELECT k, 'f', CAST(f AS DECIMAL(18,2)) FROM m
      UNION ALL
      SELECT k, 'm', mon FROM m
    ),
    ranked AS (
      SELECT metric, v,
             row_number() OVER (PARTITION BY metric ORDER BY v, k) AS rn,
             count(*) OVER (PARTITION BY metric) AS n
      FROM u
    ),
    cuts AS (
      SELECT metric,
             max(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN v END) AS c25,
             max(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN v END) AS c50,
             max(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN v END) AS c75
      FROM ranked GROUP BY metric
    ),
    one AS (
      SELECT
        max(CASE WHEN metric = 'r' THEN c25 END) AS rc25,
        max(CASE WHEN metric = 'r' THEN c50 END) AS rc50,
        max(CASE WHEN metric = 'r' THEN c75 END) AS rc75,
        max(CASE WHEN metric = 'f' THEN c25 END) AS fc25,
        max(CASE WHEN metric = 'f' THEN c50 END) AS fc50,
        max(CASE WHEN metric = 'f' THEN c75 END) AS fc75,
        max(CASE WHEN metric = 'm' THEN c25 END) AS mc25,
        max(CASE WHEN metric = 'm' THEN c50 END) AS mc50,
        max(CASE WHEN metric = 'm' THEN c75 END) AS mc75
      FROM cuts
    ),
    scored AS (
      SELECT
        1 + CAST(CAST(m.r AS DECIMAL(18,2)) > one.rc25 AS INT)
          + CAST(CAST(m.r AS DECIMAL(18,2)) > one.rc50 AS INT)
          + CAST(CAST(m.r AS DECIMAL(18,2)) > one.rc75 AS INT) AS r_score,
        1 + CAST(CAST(m.f AS DECIMAL(18,2)) > one.fc25 AS INT)
          + CAST(CAST(m.f AS DECIMAL(18,2)) > one.fc50 AS INT)
          + CAST(CAST(m.f AS DECIMAL(18,2)) > one.fc75 AS INT) AS f_score,
        1 + CAST(m.mon > one.mc25 AS INT)
          + CAST(m.mon > one.mc50 AS INT)
          + CAST(m.mon > one.mc75 AS INT) AS m_score,
        m.mon
      FROM m CROSS JOIN one
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(mon) AS DOUBLE) AS monetary_sum
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days before a
    fixed anchor), frequency, and monetary value, each scored 1-4 by
    rank-derived quartile cutoffs (score ascends with the raw value, so
    r_score is "staleness"), then rolled up to segment cells.

    The cutoffs use the float-free discrete-quantile recipe
    (quantile_disc_doclen): quartile = the DECIMAL value at row
    ceil(q·n) of the (value, custkey)-ordered metric — integer-exact, no
    interpolation, so segment boundaries are bit-reproducible. All
    three metrics share ONE unpivoted window (partitioned by metric
    name) instead of three global sorts; the 9 cutoffs collapse to a
    one-row broadcast and scoring is a scan-stage comparison chain.

    100 TB: the per-customer aggregate is the only data-cardinality
    shuffle; the metric window partitions 3 ways over customer-count
    rows — for corpus-scale cardinalities swap in the range-partitioned
    offset lookup or the GK sketch (sketch_quantile_tokens), same
    degrade path as the quantile family.
    """
    o = table(spark, sf_dir, "orders")
    # one fact pass: the per-customer aggregate feeds the three unpivot
    # branches AND the scoring scan — checkpoint it instead of 4 rescans.
    m = (
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.datediff(
                F.lit("1998-12-01").cast("date"),
                F.max(F.col("o_orderdate").cast("date")),
            ).alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum(money(F.col("o_totalprice"))).alias("mon"),
        )
        .localCheckpoint(eager=False)
    )
    dec = "decimal(18,2)"
    u = (
        m.select("k", F.lit("r").alias("metric"), F.col("r").cast(dec).alias("v"))
        .unionAll(m.select("k", F.lit("f"), F.col("f").cast(dec)))
        .unionAll(m.select("k", F.lit("m"), F.col("mon").cast(dec)))
    )
    w = Window.partitionBy("metric").orderBy("v", "k")
    wc = Window.partitionBy("metric")
    ranked = u.select(
        "metric",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def pick(p: float):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * p).cast("long"), F.col("v"))
        )

    cuts = ranked.groupBy("metric").agg(
        pick(0.25).alias("c25"), pick(0.50).alias("c50"), pick(0.75).alias("c75")
    )

    def metric_cut(name: str, col: str):
        return F.max(F.when(F.col("metric") == name, F.col(col)))

    one = cuts.agg(
        *[
            metric_cut(mn, c).alias(f"{mn}c{c[1:]}")
            for mn in ("r", "f", "m")
            for c in ("c25", "c50", "c75")
        ]
    )

    def score(value_col, prefix: str):
        return (
            F.lit(1)
            + (value_col > F.col(f"{prefix}c25")).cast("int")
            + (value_col > F.col(f"{prefix}c50")).cast("int")
            + (value_col > F.col(f"{prefix}c75")).cast("int")
        )

    scored = m.crossJoin(F.broadcast(one)).select(
        score(F.col("r").cast(dec), "r").alias("r_score"),
        score(F.col("f").cast(dec), "f").alias("f_score"),
        score(F.col("mon").cast(dec), "m").alias("m_score"),
        "mon",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("mon").cast("double").alias("monetary_sum"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "setops_union_by_name",
    oracle="""
    WITH unioned AS (
      SELECT p_brand AS brand, p_size AS size,
             CAST(p_retailprice AS DECIMAL(18,2)) AS price,
             p_type AS ptype
      FROM part WHERE p_size <= 25
      UNION ALL BY NAME
      SELECT p_type AS ptype,
             CAST(p_retailprice AS DECIMAL(18,2)) AS price,
             p_brand AS brand,
             NULL AS size
      FROM part WHERE p_size > 25
    )
    SELECT brand,
           CAST(count(*) AS BIGINT)            AS n_rows,
           CAST(count(size) AS BIGINT)         AS n_with_size,
           CAST(sum(price) AS DOUBLE)          AS price_sum,
           CAST(count(DISTINCT ptype) AS BIGINT) AS n_types
    FROM unioned GROUP BY brand ORDER BY brand
    """,
)
def setops_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION BY NAME with schema drift: two projections of the same table
    with different column ORDER and one side missing a column entirely —
    resolved positionally-by-name with NULL fill (Spark
    ``unionByName(allowMissingColumns=True)`` ≡ DuckDB
    ``UNION ALL BY NAME``). The aggregate proves column alignment: if
    union matched by position instead of name, brand/ptype would
    swap and every group would diverge.

    This is the schema-evolution workhorse for multi-epoch ingestion
    (old parquet epochs lacking newly added columns) — same muscle as
    the mergeSchema read proof (test_sources), but as a query-level set
    operation. 100 TB: unionAll is a zero-shuffle plan concatenation;
    the only exchange is the final brand rollup.
    """
    p = table(spark, sf_dir, "part")
    lo = p.where(F.col("p_size") <= 25).select(
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
        money(F.col("p_retailprice")).alias("price"),
        F.col("p_type").alias("ptype"),
    )
    hi = p.where(F.col("p_size") > 25).select(
        F.col("p_type").alias("ptype"),
        money(F.col("p_retailprice")).alias("price"),
        F.col("p_brand").alias("brand"),
    )
    unioned = lo.unionByName(hi, allowMissingColumns=True)
    return (
        unioned.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("size").alias("n_with_size"),
            F.sum("price").cast("double").alias("price_sum"),
            F.countDistinct("ptype").alias("n_types"),
        )
        .orderBy("brand")
    )


@query(
    "scalar_try_arithmetic",
    oracle="""
    WITH probed AS (
      SELECT
        l_extendedprice / nullif(l_quantity - l_quantity, 0) AS div_zero,
        l_extendedprice / nullif(l_quantity, 0)              AS div_ok,
        try_cast(l_returnflag AS INTEGER)                    AS bad_int,
        try_cast(l_linestatus || '-' || l_returnflag AS TIMESTAMP) AS bad_ts,
        [l_linenumber, l_linenumber * 2][5]                  AS oob_elem,
        [l_linenumber, l_linenumber * 2][2]                  AS ok_elem
      FROM lineitem
    )
    SELECT
      CAST(count(*) AS BIGINT)                 AS n_rows,
      CAST(count(div_zero) AS BIGINT)          AS n_div_zero_ok,
      CAST(count(div_ok) AS BIGINT)            AS n_div_ok,
      CAST(count(bad_int) AS BIGINT)           AS n_int_parsed,
      CAST(count(bad_ts) AS BIGINT)            AS n_ts_parsed,
      CAST(count(oob_elem) AS BIGINT)          AS n_oob_elem,
      CAST(sum(ok_elem) AS BIGINT)             AS sum_ok_elem,
      CAST(sum(CAST(floor(div_ok) AS BIGINT)) AS BIGINT) AS sum_div_floor
    FROM probed
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* error-safe arithmetic under ANSI mode: division by zero,
    unparseable int/timestamp casts, and out-of-bounds array access all
    yield NULL instead of raising — the counts prove each lane nulls
    exactly where it should (n_div_zero_ok = 0, n_int_parsed = 0,
    n_ts_parsed = 0, n_oob_elem = 0; every non-error lane full).

    Spark 4 ships ANSI mode ON, so these are the load-bearing forms for
    any user-data cast (SKILL/SCALE note): `try_divide`, `try_cast`,
    `try_to_timestamp`, `try_element_at`. DuckDB mirrors with
    nullif-guarded division, try_cast, and its NULL-on-out-of-bounds
    list indexing. No raw double crosses the hash: the division lane is
    summed as floor() integers (double→DECIMAL rounding of arbitrary
    ratios is the known half-boundary trap). 100 TB: pure scan-stage
    expressions folding to
    one aggregate row — no shuffle beyond the final single-row agg.
    """
    li = table(spark, sf_dir, "lineitem")
    arr = F.array(F.col("l_linenumber"), F.col("l_linenumber") * 2)
    probed = li.select(
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")).alias(
            "div_zero"
        ),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")).alias("div_ok"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999")).cast("int").alias(
            "bad_int"
        ),
        F.try_to_timestamp(
            F.concat_ws("-", F.col("l_linestatus"), F.col("l_returnflag"))
        ).alias("bad_ts"),
        F.try_element_at(arr, F.lit(5)).alias("oob_elem"),
        F.try_element_at(arr, F.lit(2)).alias("ok_elem"),
    )
    return probed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("div_zero").alias("n_div_zero_ok"),
        F.count("div_ok").alias("n_div_ok"),
        F.count("bad_int").alias("n_int_parsed"),
        F.count("bad_ts").alias("n_ts_parsed"),
        F.count("oob_elem").alias("n_oob_elem"),
        F.sum("ok_elem").alias("sum_ok_elem"),
        F.sum(F.floor("div_ok").cast("long")).cast("long").alias("sum_div_floor"),
    )


@query(
    "hist_equiwidth_events",
    oracle="""
    SELECT CAST(floor(value / 20.0) AS BIGINT) + 1       AS bucket,
           CAST(floor(value / 20.0) AS BIGINT) * 20      AS lo,
           CAST(floor(value / 20.0) AS BIGINT) * 20 + 20 AS hi,
           CAST(count(*) AS BIGINT)                      AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2, 3 ORDER BY bucket
    """,
)
def hist_equiwidth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram (SQL width_bucket semantics, written as
    explicit `floor(v/step)+1` arithmetic): fixed 20-unit buckets over
    the event value domain with per-bucket counts and exact DECIMAL
    sums. The explicit form is deliberate — engines differ in the
    internal op ORDER of width_bucket ((v-lo)·n/(hi-lo) vs (v-lo)/step),
    which can flip a boundary value's bucket in the last ulp; a single
    shared division is bit-identical everywhere and is the same recipe
    the exporter's bucketed histograms use batch-side
    (functions/histogram.py, metrics.go:27-52 analog).

    100 TB: the classic one-pass histogram — map-side partial counts per
    bucket, O(buckets) result rows; the scan stage does one division per
    row and the shuffle carries only bucket ids.
    """
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = F.floor(F.col("value") / 20.0).cast("long")
    return (
        ev.select(
            (b + 1).alias("bucket"),
            (b * 20).alias("lo"),
            (b * 20 + 20).alias("hi"),
            money(F.col("value")).alias("v"),
        )
        .groupBy("bucket", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("value_sum"),
        )
        .orderBy("bucket")
    )


@query(
    "subquery_not_in_null_semantics",
    oracle="""
    WITH ok AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_custkey % 7 <> 0
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM ok))            AS not_in_count,
      (SELECT CAST(count(*) AS BIGINT) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM ok WHERE ok.k = c.c_custkey))
                                                              AS not_exists_count,
      (SELECT CAST(count(*) AS BIGINT) FROM customer
        WHERE c_custkey IN (SELECT k FROM ok))                AS in_count,
      (SELECT CAST(count(*) AS BIGINT) FROM ok WHERE k IS NULL) AS n_nulls
    """,
)
def subquery_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, certified: a subquery list containing even
    ONE NULL makes `x NOT IN (list)` UNKNOWN for every non-member row,
    so not_in_count is 0 while the NOT EXISTS form (NULLs simply never
    match the equality) returns the real complement — the single most
    common silent-wrong-answer migration bug between engines with
    different null-handling shortcuts. The query emits both counts side
    by side plus the membership count and the null count that triggers
    the trap, all three-valued-logic-exact in both engines.

    Plan shape: Spark compiles NOT IN to a null-aware anti join (a
    broadcast of the build side's null bit) and NOT EXISTS to a plain
    left-anti hash join — both shuffle-free here with a broadcast-sized
    inner. The four side-by-side membership forms are semantically
    required (the comparison IS the query), but the SCANS are not:
    the `ok` key list and the 1-column customer projection are each
    localCheckpoint'd once (checkpoint-once doctrine, SCALE.md) so the
    four consumers read materialized keys instead of re-scanning
    orders 4× / customer 3×. 100 TB: null-aware anti join requires a
    non-null-guarded build side to stay broadcastable; prefer NOT
    EXISTS (or an explicit IS NOT NULL guard) at scale, which is
    exactly what this row documents.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("v7_orders")
    ok = spark.sql(
        """
        SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
        FROM v7_orders WHERE o_custkey % 7 <> 0
        """
    ).localCheckpoint(eager=False)
    ok.createOrReplaceTempView("v7_ok")
    cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey")
        .localCheckpoint(eager=False)
    )
    cust.createOrReplaceTempView("v7_cust_keys")
    return spark.sql(
        """
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM v7_cust_keys
            WHERE c_custkey NOT IN (SELECT k FROM v7_ok))            AS not_in_count,
          (SELECT CAST(count(*) AS BIGINT) FROM v7_cust_keys c
            WHERE NOT EXISTS (SELECT 1 FROM v7_ok WHERE v7_ok.k = c.c_custkey))
                                                                     AS not_exists_count,
          (SELECT CAST(count(*) AS BIGINT) FROM v7_cust_keys
            WHERE c_custkey IN (SELECT k FROM v7_ok))                AS in_count,
          (SELECT CAST(count(*) AS BIGINT) FROM v7_ok WHERE k IS NULL) AS n_nulls
        """
    )
