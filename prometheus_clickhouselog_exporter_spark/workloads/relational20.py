"""Relational battery, round 3 batch 23: service-level ship-delay
quantiles and the audience-overlap matrix.

The SLA report is the operations staple: how long after the order do
lines actually ship, by priority, at the percentiles the contract
names? Exact integer-day quantiles by rank arithmetic. The audience
matrix computes |A∩B| for every pair of event types WITHOUT ever
materializing user sets pairwise: the bitmap lane
(agg_bitmap_distinct_exact) gives exact |A|, |B|, and |A∪B| by OR,
and inclusion–exclusion does the rest — set algebra on fixed-size
sketches with zero error, the audience-planning primitive.

Float discipline per workloads/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "sla_ship_delay_quantiles",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority AS priority,
             CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) AS delay
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ranked AS (
      SELECT priority, delay,
             row_number() OVER (PARTITION BY priority
                                ORDER BY delay, priority) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM d
    )
    SELECT priority, CAST(max(n) AS BIGINT) AS n_lines,
           CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN delay END) AS BIGINT) AS p50_days,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN delay END) AS BIGINT) AS p90_days,
           CAST(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                         THEN delay END) AS BIGINT) AS p99_days,
           CAST(max(delay) AS BIGINT) AS max_days
    FROM ranked GROUP BY priority ORDER BY priority
    """,
)
def sla_ship_delay_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-level ship-delay report: days from order to line
    shipment, by priority, at the contract percentiles (p50/p90/p99)
    — exact discrete quantiles by rank arithmetic over integer days
    (the quantile_disc/funnel_time_to_convert recipe, partitioned).
    The per-priority tail (p99, max) is the SLA breach evidence a
    sampled sketch could misplace — exactness is the point here.

    Scale: one fact join (orders side broadcast-eligible per AQE), one
    shuffle on priority shared by the rank window and the aggregate.
    Rank selection needs no second pass — the CASE-at-rank trick reads
    the quantile off the same window.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay"),
    )
    w = Window.partitionBy("priority").orderBy("delay", "priority")
    ranked = d.select(
        "priority",
        "delay",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("delay"))
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n_lines"),
            pick(0.5).cast("bigint").alias("p50_days"),
            pick(0.9).cast("bigint").alias("p90_days"),
            pick(0.99).cast("bigint").alias("p99_days"),
            F.max("delay").cast("bigint").alias("max_days"),
        )
        .orderBy("priority")
    )


@query(
    "audience_overlap_matrix",
    oracle="""
    WITH u AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sz AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, za.n AS n_a, zb.n AS n_b, i.n_both,
           floor((CAST(i.n_both AS DOUBLE)
                  / CAST(za.n + zb.n - i.n_both AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS jaccard
    FROM inter i
    JOIN sz za ON za.event_type = i.type_a
    JOIN sz zb ON zb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types — exact |A∩B| for every
    type pair WITHOUT a pairwise join over users: per-type bitmaps
    (the agg_bitmap_distinct_exact lane) give |A| and, OR-merged
    pairwise, |A∪B|; inclusion–exclusion yields the intersection —
    set algebra on fixed-size binaries with zero error. The oracle
    computes the same matrix the naive way (distinct user self-join),
    certifying the bitmap algebra end to end.

    Scale: ONE distinct pass builds |types|·|buckets| bitmap rows;
    every pair's union is bucket-aligned OR over those rows — the
    shuffle carries bitmaps, never user ids, and adding a type costs
    one column of bitmaps, not a rescan. |types|² stays tiny while
    |users| is the big number — exactly the asymmetry bitmaps exploit.
    """
    ev = table(spark, sf_dir, "events")
    per = (
        ev.groupBy("event_type", F.expr("bitmap_bucket_number(user_id)").alias("b"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
        )
        .localCheckpoint(eager=False)  # bitmap rows; sizes + both pair sides
    )
    sz = per.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n")
    )
    ta = sz.select(F.col("event_type").alias("type_a"))
    tb = sz.select(F.col("event_type").alias("type_b"))
    pairs = ta.crossJoin(tb).filter(F.col("type_a") < F.col("type_b"))
    # tag every bitmap row with each pair it belongs to (a bitmap row
    # joins at most |types|-1 pairs), then OR per (pair, bucket): buckets
    # present in only one member still carry their bits into the union
    expanded = per.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    union = (
        expanded.groupBy("type_a", "type_b", "b")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .select(
            "type_a", "type_b", F.expr("bitmap_count(bm)").alias("cnt")
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("cnt").cast("bigint").alias("n_union"))
    )
    za = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    zb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    n_both = (F.col("n_a") + F.col("n_b") - F.col("n_union")).cast("bigint")
    return (
        union.join(F.broadcast(za), "type_a")
        .join(F.broadcast(zb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            n_both.alias("n_both"),
            fround(n_both.cast("double") / F.col("n_union").cast("double"), 6).alias(
                "jaccard"
            ),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "setops_bag_semantics",
    oracle="""
    WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
    b AS (SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F'),
    ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
    ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
    FROM ia
    UNION ALL
    SELECT 'except_all' AS op, CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT k) AS BIGINT),
           CAST(min(k) AS BIGINT), CAST(max(k) AS BIGINT)
    FROM ea
    ORDER BY op
    """,
)
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations — INTERSECT ALL and EXCEPT ALL
    over two overlapping multisets of part keys: INTERSECT ALL keeps
    min(m_a, m_b) copies per key and EXCEPT ALL keeps m_a − m_b — the
    multiplicity arithmetic that DISTINCT-flavored set ops erase (and
    that the earlier setops rows never certified: relational.py uses
    exceptAll but immediately distincts it). Row counts vs distinct
    key counts in the output expose the multiplicities directly.

    Scale: Spark plans both as aggregate-count-then-replicate on the
    key — one shuffle each, no pair join; multiplicities travel as
    counts, not duplicated rows, until the final generate.
    """
    li = table(spark, sf_dir, "lineitem")
    a = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_partkey").alias("k"))
        .localCheckpoint(eager=False)  # 1-column side; both set ops read it
    )
    b = (
        li.filter(F.col("l_linestatus") == "F")
        .select(F.col("l_partkey").alias("k"))
        .localCheckpoint(eager=False)
    )

    def stats(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("k").cast("bigint").alias("n_keys"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        ).select(F.lit(op).alias("op"), "n_rows", "n_keys", "min_k", "max_k")

    return (
        stats(a.intersectAll(b), "intersect_all")
        .unionByName(stats(a.exceptAll(b), "except_all"))
        .orderBy("op")
    )


@query(
    "ml_target_encoding_loo",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s
      FROM customer GROUP BY 1
    ),
    enc AS (
      SELECT c.c_custkey, c.c_mktsegment AS seg,
             CAST(c.c_acctbal AS DECIMAL(18,2)) AS y,
             g.n, g.s
      FROM customer c JOIN g ON c.c_mktsegment = g.seg
    )
    SELECT c_custkey, seg,
           floor((CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                 * 1e4 + 0.5) / 1e4 AS loo_encoding
    FROM enc WHERE n > 1
    ORDER BY c_custkey
    """,
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the ML featurizer that replaces
    a categorical (market segment) with the mean target (balance) of
    its OTHER members: (S_g − y_i)/(n_g − 1). LOO is the leakage-aware
    form — plain mean encoding leaks each row's own target into its
    feature, inflating validation scores. Group sums ride exact
    DECIMAL, so every per-row encoding divides exact quantities,
    frounded.

    Scale: one group aggregate + one broadcast join back — the
    encoding never shuffles the fact table twice; singleton groups
    drop (undefined LOO), matching every production implementation.
    """
    c = table(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
    )
    enc = c.join(
        F.broadcast(g), c.c_mktsegment == F.col("seg")
    ).select(
        "c_custkey",
        "seg",
        F.col("c_acctbal").cast("decimal(18,2)").alias("y"),
        "n",
        "s",
    )
    return (
        enc.filter(F.col("n") > 1)
        .select(
            "c_custkey",
            "seg",
            fround(
                (F.col("s") - F.col("y")).cast("double")
                / (F.col("n") - 1).cast("double"),
                4,
            ).alias("loo_encoding"),
        )
        .orderBy("c_custkey")
    )


@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    halves AS (
      SELECT o_custkey,
             CASE WHEN epoch_us(o_orderdate) * 2
                       <= epoch_us(b.lo) + epoch_us(b.hi)
                  THEN 1 ELSE 2 END AS half,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders, bounds b
    ),
    spend AS (
      SELECT o_custkey,
             sum(CASE WHEN half = 1 THEN cents ELSE 0 END) AS s1,
             sum(CASE WHEN half = 2 THEN cents ELSE 0 END) AS s2
      FROM halves GROUP BY o_custkey
      HAVING sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) > 0
    ),
    diffs AS (
      SELECT o_custkey, s2 - s1 AS d, abs(s2 - s1) AS ad
      FROM spend WHERE s2 <> s1
    ),
    ranked AS (
      SELECT d,
             2 * rank() OVER (ORDER BY ad)
               + count(*) OVER (PARTITION BY ad) - 1 AS r2
      FROM diffs
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w_plus_x2,
           CAST(sum(CASE WHEN d < 0 THEN r2 ELSE 0 END) AS BIGINT) AS w_minus_x2,
           floor((CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS DOUBLE)
                  / CAST(sum(r2) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS w_plus_share
    FROM ranked
    """,
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test — the PAIRED member of the rank-test
    family (Mann–Whitney compares independent samples; this compares
    each customer's second-half spend against their OWN first half):
    rank |d| with the doubled tie-averaged ranks (2r+c−1, exact
    integers), sum ranks by sign of d. W⁺ ≈ W⁻ under no shift;
    w_plus_share far from 0.5 signals systematic growth/decline.
    Zero diffs drop per the textbook procedure; doubled rank sums
    keep everything BIGINT.

    Scale: one (customer, half) aggregate, one global rank window
    over the customer-sized diff set (bounded-series discipline),
    three conditional sums.
    """
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    halves = o.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.when(us("o_orderdate") * 2 <= us("lo") + us("hi"), 1)
        .otherwise(2)
        .alias("half"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    spend = (
        halves.groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("half") == 1, F.col("cents")).otherwise(0)).alias(
                "s1"
            ),
            F.sum(F.when(F.col("half") == 2, F.col("cents")).otherwise(0)).alias(
                "s2"
            ),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("n2"),
        )
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
    )
    diffs = spend.filter(F.col("s2") != F.col("s1")).select(
        (F.col("s2") - F.col("s1")).alias("d"),
        F.abs(F.col("s2") - F.col("s1")).alias("ad"),
    )
    ranked = diffs.select(
        "d",
        (
            F.lit(2) * F.rank().over(Window.orderBy("ad"))
            + F.count(F.lit(1)).over(Window.partitionBy("ad"))
            - 1
        ).alias("r2"),
    )
    wp = F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(0))
    wm = F.sum(F.when(F.col("d") < 0, F.col("r2")).otherwise(0))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        wp.cast("bigint").alias("w_plus_x2"),
        wm.cast("bigint").alias("w_minus_x2"),
        fround(wp.cast("double") / F.sum("r2").cast("double"), 6).alias(
            "w_plus_share"
        ),
    )


@query(
    "agg_filter_clause_battery",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_open,
           CAST(max(CAST(o_orderdate AS DATE))
                FILTER (WHERE o_orderstatus = 'P') AS VARCHAR) AS last_pending,
           CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)
                AS BIGINT) AS big_spenders
    FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
)
def agg_filter_clause_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2003 FILTER (WHERE ...) aggregate modifier — five
    filtered aggregates (count/sum/max/count-distinct) in ONE pass
    over one grouping, the declarative form of the CASE-WHEN
    conditional-aggregate idiom used across this repo
    (agg_conditional_battery is the CASE spelling; this row certifies
    the modifier itself, identical text on both engines). A NULL
    filtered-max (no 'P' rows in a group) must survive the hash as
    NULL — part of the semantics under test.

    Scale: desugars to the same partial+final aggregate as the CASE
    form — one scan, one shuffle, per-group state per aggregate.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("fc_orders")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS n_f,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_open,
               CAST(max(CAST(o_orderdate AS DATE))
                    FILTER (WHERE o_orderstatus = 'P') AS STRING)
                 AS last_pending,
               CAST(count(DISTINCT o_custkey)
                    FILTER (WHERE o_totalprice > 100000) AS BIGINT)
                 AS big_spenders
        FROM fc_orders GROUP BY o_orderpriority ORDER BY priority
        """
    )


@query(
    "generator_outer_explode",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN []
                  ELSE string_split(lower(text), ' ')[1:3] END AS toks
      FROM documents WHERE doc_id < 200
    ),
    exploded AS (
      SELECT d.doc_id, u.tok
      FROM docs d LEFT JOIN LATERAL unnest(d.toks) AS u(tok) ON true
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(tok) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty_docs,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM exploded
    """,
)
def generator_outer_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator semantics: explode_outer keeps a NULL row for
    documents whose token array is EMPTY (every 7th doc here, by
    construction) — the left-join-lateral behavior plain explode
    silently violates by DROPPING those parents, which corrupts any
    downstream per-document aggregate ('docs with zero entities'
    becomes 'docs that vanished'). The counts prove the contract:
    n_docs is the full input count, n_rows = n_tokens + n_empty_docs.
    Companion to generator_posexplode_terms (which certified ordinal
    parity on the non-empty path).

    Scale: Generate runs scan-stage either way; OUTER adds only the
    null-row branch.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
        )
        .otherwise(F.slice(F.split(F.lower("text"), " "), 1, 3))
        .alias("toks"),
    )
    exploded = docs.select(
        "doc_id", F.explode_outer(F.col("toks")).alias("tok")
    )
    return exploded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("tok").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("tok").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty_docs"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
