"""Relational battery II (SURVEY §2.2 long tail): non-equi joins (range,
as-of), cube / pivot / unpivot, window frames (lag/lead/running), global
sort+limit, array functions, session windows, approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.lookup import packed_lookup
from .core import fround, money, query, table


@query(
    "range_join_value_neighbors",
    oracle="""
    SELECT a.event_id, count(b.event_id) AS n_neighbors
    FROM events a JOIN events b
      ON b.value BETWEEN a.value - 5 AND a.value + 5
     AND a.event_id <> b.event_id
    GROUP BY a.event_id
    """,
)
def range_join_value_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) self-join, COUNT form: how many events lie within ±5
    of each event's value. DuckDB's oracle runs its native IEJoin on the
    raw predicate.

    A pair-materializing bucket join is quadratic in dense regions —
    at sf0.1 the ±5 windows overlap into ~10^9 pairs (59 s; 10^13 at
    sf10) — so counts are computed WITHOUT enumerating pairs, by rank
    arithmetic over the value CDF:

        n(v) = C(v+5) − C<(v−5) − 1       (−1 removes the event itself)

    with C split two-level like a distributed searchsorted: (a) a
    bucket-summary prefix sum giving C at each bucket boundary; (b) one
    narrow-bucket equi-join counting the residual strictly inside the
    probe's bucket, so join work is Σ probes×occupancy of ONE bucket,
    linear in n for fixed density. Measured at sf0.1: 59 s (pair join)
    → 1.5 s.

    Step (a) has TWO interchangeable engines (``_neighbor_counts``):
    a dense driver-side CDF embedded as a packed binary plan literal
    (bounded by the VALUE RANGE — the fast path while range/width ≤
    4e6 buckets), and a fully distributed multi-tier prefix sum for
    unbounded value domains (``range_join_value_neighbors_distributed``
    certifies it against the same oracle). Neither stage is
    super-linear at 100 TB.
    """
    e = table(spark, sf_dir, "events").select("event_id", "value").filter(
        F.col("value").isNotNull()
    )
    return _neighbor_counts(spark, e, radius=5.0, bw=0.01)


@query(
    "range_join_value_neighbors_distributed",
    oracle="""
    SELECT a.event_id, count(b.event_id) AS n_neighbors
    FROM events a JOIN events b
      ON b.value BETWEEN a.value - 5 AND a.value + 5
     AND a.event_id <> b.event_id
    GROUP BY a.event_id
    """,
)
def range_join_value_neighbors_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The UNBOUNDED-DOMAIN path of `range_join_value_neighbors`,
    force-selected (dense_cap=0) so the driver value-hashes the
    distributed multi-tier prefix sum against the identical pair-join
    oracle. Same semantics, different CDF engine: no driver-side dense
    array exists at any point, so a single ±1e9 outlier value cannot
    OOM the driver — the case the default query auto-falls-back on
    (its span pre-check is one min/max aggregate, not a collect).
    """
    e = table(spark, sf_dir, "events").select("event_id", "value").filter(
        F.col("value").isNotNull()
    )
    return _neighbor_counts(spark, e, radius=5.0, bw=0.01, dense_cap=0)


_PREFIX_FANOUT = 4096  # branching factor per level of the distributed CDF


def _cum_before_distributed(vals: DataFrame, probes: DataFrame) -> DataFrame:
    """Exclusive value-CDF at arbitrary bucket boundaries — distributed
    multi-tier prefix sum, no dense driver array.

    `vals` is (v, vb) (one row per value, vb = its bucket); `probes`
    must expose a `pb` bucket column. Returns (pb, cumb) with
    cumb = count of values in buckets strictly below pb, for every
    distinct probe bucket.

    Shape: probe boundaries are unioned into the occupied-bucket count
    table as zero-weight rows sorting BEFORE any same-bucket counts
    (the searchsorted-by-cogroup trick), then the exclusive prefix is
    assembled from FOUR tiers — intra-group (Window partitioned by
    g = vb/4096, bounded frames), group-level (Window partitioned by
    sg = g/4096 over group TOTALS — ≤4096 rows per partition),
    super-group-level (Window partitioned by ssg = sg/4096 over
    super-group totals), and a driver-folded top prefix over
    super-super-group totals (≤ range/4096³ rows, capped fail-loud at
    4e6 ≈ a 2.7e17-bucket span — wider than any value domain a double
    at this bucket width can express occupying). Every Window is
    partitioned; the only collect is the tiny top tier.

    100 TB: two shuffles over occupied-bucket-cardinality rows (≤
    distinct values, ≪ rows) plus one row-count-sized equi-join back —
    nothing scales with the VALUE RANGE, which is the whole point.
    """
    spark = vals.sparkSession
    bc = (
        vals.groupBy("vb")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit(1))
    )
    pq = (
        probes.select(F.col("pb").alias("vb"))
        .distinct()
        .withColumn("n", F.lit(0).cast("long"))
        .withColumn("kind", F.lit(0))
    )
    u = bc.select("vb", "n", "kind").unionByName(pq.select("vb", "n", "kind"))
    u = u.withColumn("g", F.floor(F.col("vb") / _PREFIX_FANOUT))
    # tier 1: exclusive prefix inside each 4096-bucket group. Probe rows
    # (kind 0) sort before the occupied row of the SAME bucket, so a
    # boundary at an occupied bucket excludes that bucket's own count —
    # exactly "values strictly below".
    w1 = (
        Window.partitionBy("g")
        .orderBy("vb", "kind")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u = u.withColumn("intra", F.coalesce(F.sum("n").over(w1), F.lit(0)))
    # tier 2: exclusive prefix of group totals inside each super-group.
    gt = (
        u.groupBy("g")
        .agg(F.sum("n").alias("gn"))
        .withColumn("sg", F.floor(F.col("g") / _PREFIX_FANOUT))
    )
    w2 = (
        Window.partitionBy("sg")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gt = gt.withColumn("gpre", F.coalesce(F.sum("gn").over(w2), F.lit(0)))
    # tier 3: exclusive prefix of super-group totals inside each
    # super-super-group (≤4096 rows per partition).
    st_df = (
        gt.groupBy("sg")
        .agg(F.sum("gn").alias("sn"))
        .withColumn("ssg", F.floor(F.col("sg") / _PREFIX_FANOUT))
    )
    w3 = (
        Window.partitionBy("ssg")
        .orderBy("sg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    st_df = st_df.withColumn(
        "sgpre", F.coalesce(F.sum("sn").over(w3), F.lit(0))
    ).localCheckpoint(eager=False)
    # tier 4 (top): super-super-group totals — range/4096³ rows,
    # driver-folded. Guard BEFORE the collect: the cap exists to protect
    # the driver, so the row count is checked with a cheap aggregate
    # first, never discovered by OOM.
    top_df = st_df.groupBy("ssg").agg(F.sum("sn").alias("tn")).localCheckpoint(
        eager=False
    )
    n_top = top_df.count()
    if n_top > 4_000_000:
        raise ValueError(
            f"_cum_before_distributed: {n_top} occupied super-super-groups "
            f"exceeds the 4e6 driver-fold cap (value span > ~2.7e17 "
            f"buckets); widen the bucket width or add a fourth prefix tier"
        )
    top = sorted((r["ssg"], r["tn"]) for r in top_df.collect())
    acc, top_rows = 0, []
    for ssgv, tn in top:
        top_rows.append((ssgv, acc))
        acc += tn
    top_pre = spark.createDataFrame(top_rows or [(0, 0)], "ssg long, tpre long")
    return (
        u.filter(F.col("kind") == 0)
        .join(gt.select("g", "sg", "gpre"), "g")
        .join(st_df.select("sg", "ssg", "sgpre"), "sg")
        .join(F.broadcast(top_pre), "ssg")
        .select(
            F.col("vb").alias("pb"),
            (F.col("tpre") + F.col("sgpre") + F.col("gpre") + F.col("intra")).alias(
                "cumb"
            ),
        )
    )


def _neighbor_counts(
    spark: SparkSession,
    e: DataFrame,
    radius: float,
    bw: float,
    dense_cap: int = 4_000_000,
) -> DataFrame:
    """Rank-arithmetic ±radius neighbor counts over `e` (event_id,
    value): n(v) = C(v+r) − C<(v−r) − 1, with the boundary CDF C from
    either the dense packed-literal path (occupied span ≤ dense_cap
    buckets) or the distributed multi-tier prefix sum (beyond it — or
    force it with dense_cap=0). Both paths share the probe explode and
    the in-bucket residual join, so they are bit-identical."""
    # checkpoint-once: vals/probes/span all derive from this two-column
    # frame; without the cut the distributed path re-scans the parquet
    # 7x (span agg, bucket counts, probe-distinct, residual join sides).
    e = e.localCheckpoint(eager=False)
    bk = F.floor(F.col("value") / bw).cast("long")
    vals = e.select(F.col("value").alias("v"), bk.alias("vb"))
    hi, lo = F.col("value") + radius, F.col("value") - radius
    hb, lb = F.floor(hi / bw).cast("long"), F.floor(lo / bw).cast("long")
    probes = e.select(
        "event_id",
        F.explode(
            F.array(
                F.struct(hi.alias("x"), hb.alias("pb"), F.lit(1).alias("s")),
                F.struct(lo.alias("x"), lb.alias("pb"), F.lit(-1).alias("s")),
            )
        ).alias("p"),
    ).select("event_id", "p.x", "p.pb", "p.s")

    span = vals.agg(F.min("vb").alias("lo"), F.max("vb").alias("hi")).first()
    if span["lo"] is None:
        return spark.createDataFrame([], "event_id long, n_neighbors long")
    min_bk = span["lo"]
    nb = span["hi"] - min_bk + 1

    if nb <= dense_cap:
        # dense path: bucket counts collected once, cumulative array
        # embedded as a packed binary plan literal (operators/lookup.py)
        # — bounded by the VALUE RANGE (≤ dense_cap entries), evaluated
        # scan-side with zero joins for the boundary term.
        rows = sorted(
            (r["vb"], r["n"])
            for r in vals.groupBy("vb").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        dense = [0] * nb
        for b, n in rows:
            dense[b - min_bk] = n
        cum = [0] * (nb + 1)  # cum[i] = # values in buckets < min_bk + i
        for i, n in enumerate(dense):
            cum[i + 1] = cum[i] + n

        def cum_before(bucket_col):
            # packed_lookup, not F.lit(cum): a plain list literal pays py4j
            # per-element conversion (~1.5 s for 2k entries) per invocation.
            idx = F.greatest(F.least(bucket_col - min_bk, F.lit(nb)), F.lit(0))
            return packed_lookup(cum, idx)

        base = e.select(
            "event_id", (cum_before(hb) - cum_before(lb)).alias("cum_net")
        )
    else:
        cum_map = _cum_before_distributed(vals, probes)
        base = (
            probes.join(cum_map, "pb")
            .groupBy("event_id")
            .agg(F.sum(F.col("s") * F.col("cumb")).alias("cum_net"))
        )

    # in-bucket residual: +count(v ≤ hi in B(hi)) − count(v < lo in B(lo)).
    inb = (
        probes.join(vals, probes["pb"] == vals["vb"])
        .filter(
            F.when(F.col("s") == 1, F.col("v") <= F.col("x")).otherwise(F.col("v") < F.col("x"))
        )
        .groupBy("event_id")
        .agg(F.sum("s").alias("inb_net"))
    )
    return (
        base.join(inb, "event_id", "left")
        .select(
            "event_id",
            (F.col("cum_net") + F.coalesce(F.col("inb_net"), F.lit(0)) - 1).alias("n_neighbors"),
        )
        .filter(F.col("n_neighbors") > 0)
    )


@query(
    "asof_join_click_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
             AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def asof_join_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent click at-or-before it
    by the same user.

    Rendered as a single ordered window over the unioned event stream
    (running max of click timestamps) — one shuffle on user_id, no
    correlated subquery, no per-row probe. This is the merge-asof plan
    shape that scales; `pd.merge_asof` via applyInPandas is the fallback
    for exotic tolerances.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_last = e.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return with_last.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


@query(
    "cube_returnflag_status",
    oracle="""
    SELECT coalesce(l_returnflag, '*') AS returnflag,
           coalesce(l_linestatus, '*') AS linestatus,
           count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(money(F.col("l_quantity"))), 2).cast("double").alias("qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("*")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("*")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order status counts per priority.

    Explicit pivot values keep it one pass (no distinct-values pre-query).
    """
    o = table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, val FROM (
      SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice', p_retailprice FROM part
    )
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack()."""
    p = table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (measure, val)",
    )


@query(
    "order_limit_top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def order_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit: Spark plans TakeOrderedAndProject — per-
    partition top-50 then a driver-side merge of 50×partitions rows, never
    a full global sort. Deterministic via the orderkey tiebreak."""
    o = table(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(50).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_spend,
           lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_order,
           lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS next_order,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame battery: running decimal sum, lag, lead, rank over one
    (partition, order) spec — Catalyst evaluates all four in a single
    Window node (one shuffle + one sort)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(money(F.col("o_totalprice"))).over(frame), 2).cast("double").alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.rank().over(w).alias("rk"),
    )


@query(
    "groupingsets_priority_status",
    oracle="""
    SELECT coalesce(o_orderpriority, '*') AS priority,
           coalesce(o_orderstatus, '*')   AS status,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT)
             AS gid,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def groupingsets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (Spark 4 DataFrame.groupingSets) — the
    asymmetric form rollup/cube can't express: (priority, status),
    (priority), and grand total, but NOT (status) alone. grouping_id
    disambiguates a real NULL group key from a rolled-up one — the only
    correct way to consume these results.

    100 TB: Catalyst plans one Expand (3×) + one hash aggregate — the
    same single-shuffle shape as rollup; the set list controls the
    expansion factor, so pruning unneeded sets is a direct scan-cost
    lever."""
    o = table(spark, sf_dir, "orders")
    gs = o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(money(F.col("o_totalprice"))), 2).cast("double").alias("revenue"),
    )
    return gs.select(
        F.coalesce(F.col("o_orderpriority"), F.lit("*")).alias("priority"),
        F.coalesce(F.col("o_orderstatus"), F.lit("*")).alias("status"),
        F.col("gid").cast("long").alias("gid"),
        "n",
        "revenue",
    )


@query(
    "map_functions_events",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id % 5 AS dec, count(*) AS n
      FROM events GROUP BY event_type, user_id % 5
    )
    SELECT event_type,
           coalesce(string_agg(CASE WHEN (n + dec) % 3 = 0
                                    THEN dec || ':' || (n + dec) END,
                               ';' ORDER BY dec) || ';', '')
             || '9:' || CAST(sum(n) AS BIGINT)           AS map_str,
           CAST(count(*) FILTER (WHERE (n + dec) % 3 = 0) + 1 AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT)                         AS total
    FROM c GROUP BY event_type
    """,
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function battery: map_from_entries (order-preserving),
    transform_values, map_filter, map_concat, map_entries — per event
    type, a user-decile→count map is built from sorted entries,
    transformed (v+k), filtered ((v+k)%3==0), merged with a sentinel
    total entry, and serialized deterministically (entry order = sorted
    build order, which map_entries preserves) so the DuckDB oracle can
    reproduce the exact string without a MAP type.

    100 TB: maps here are per-GROUP aggregates (5 entries), so the map
    HOFs — which evaluate interpreted, see SCALE.md — run once per
    group, not per row; the heavy lifting stays in the hash aggregate
    below them."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", (F.col("user_id") % 5).alias("dec")
    ).agg(F.count(F.lit(1)).alias("n"))
    per_type = c.groupBy("event_type").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("dec", "n")))
        ).alias("m"),
        F.sum("n").alias("total"),
    )
    m2 = F.map_filter(
        F.transform_values(F.col("m"), lambda k, v: v + k), lambda k, v: v % 3 == 0
    )
    merged = F.map_concat(m2, F.create_map(F.lit(9).cast("long"), F.col("total")))
    entries = F.transform(
        F.map_entries(merged),
        lambda kv: F.concat(kv["key"].cast("string"), F.lit(":"), kv["value"].cast("string")),
    )
    return per_type.select(
        "event_type",
        F.array_join(entries, ";").alias("map_str"),
        F.size(F.map_entries(merged)).cast("long").alias("n_keys"),
        F.col("total").cast("long").alias("total"),
    )


@query(
    "window_range_rolling_revenue",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_orderpriority
                       ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
                       RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS roll_spend,
           count(*) OVER (PARTITION BY o_orderpriority
                          ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
                          RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
             AS roll_orders
    FROM orders
    """,
)
def window_range_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per-priority
    30-day rolling revenue and order count, ordered by order date. RANGE
    frames differ from ROWS under ties — every same-date peer is in every
    peer's frame — so the result is deterministic with NO tiebreak
    column, which is exactly why rolling-time metrics use them. Date
    keys become day ordinals (datediff from an epoch) so the frame bound
    is a plain integer offset in both engines.

    100 TB: one shuffle on the partition key; the running frame is a
    single sort + sliding aggregate per partition (Spark's bounded-frame
    WindowExec keeps only the 30-day buffer, not the partition)."""
    o = table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = Window.partitionBy("o_orderpriority").orderBy(days.alias("d")).rangeBetween(-29, 0)
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.sum(money(F.col("o_totalprice"))).over(w), 2)
        .cast("double")
        .alias("roll_spend"),
        F.count(F.lit(1)).over(w).alias("roll_orders"),
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ntile(4) OVER w                                            AS quartile,
           dense_rank() OVER w                                        AS drk,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000     AS prk,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000        AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family battery: ntile quartiles, dense_rank, percent_rank and
    cume_dist over one (partition, order) spec — all four evaluate in a
    single Window node (one exchange + one sort). c_custkey breaks
    acctbal ties because ntile, unlike the rank functions, depends on
    the physical order WITHIN ties; the ratios floor-round at 1e-6 (the
    fround discipline) since (rank−1)/(n−1) is the only float here."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drk"),
        fround(F.percent_rank().over(w), 6).alias("prk"),
        fround(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "array_functions_part",
    oracle="""
    SELECT p_type,
           array_to_string(list_sort(list_distinct(list(p_size))), ',') AS sizes,
           len(list_distinct(list(p_size)))                             AS n_sizes,
           CAST(list_sum(list_distinct(list(p_size))) AS BIGINT)        AS size_sum
    FROM part GROUP BY p_type
    """,
)
def array_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery: collect_set → sort → HOF aggregate → join to
    string (string output keeps the cross-engine hash representation-
    independent)."""
    p = table(spark, sf_dir, "part")
    sizes = F.array_sort(F.collect_set("p_size"))
    return p.groupBy("p_type").agg(
        F.array_join(sizes, ",").alias("sizes"),
        F.size(sizes).alias("n_sizes"),
        F.aggregate(sizes, F.lit(0), lambda a, x: a + x).alias("size_sum"),
    )


@query(
    "session_window_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts >= coalesce(
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    TIMESTAMP '1970-01-01')
                  + INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           floor(sum(value) * 100 + 0.5) / 100 AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (1h inactivity gap) in batch — the same
    `session_window` operator Structured Streaming uses for streaming
    sessionization; the oracle is the classic gaps-and-islands rewrite.

    100 TB: one shuffle on user_id; Spark merges overlapping windows in
    the session-window aggregation node.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), fround(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_customers_ok,
           TRUE AS approx_median_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) + percentile_approx per order
    status, emitted as ERROR-BOUND VALIDATIONS so the driver can value-hash
    the result: raw sketch values are engine-specific, but the claims
    "HLL estimate within 3·rsd of the exact distinct count" and "GK median
    within the exact p45..p55 band" are deterministic booleans DuckDB can
    assert as literal TRUE. The pytest suite still checks the raw sketch
    values against tolerance (tests/test_sources.py).

    The sketch branch and the exact branch aggregate SEPARATELY and join
    on the 3-row status key: mixing count(DISTINCT) with object
    aggregates triggers Catalyst's distinct-rewrite, which re-keys the
    whole aggregate by (status, custkey) and drags a 10k-entry percentile
    buffer through a per-customer shuffle — measured 16.5s → 0.6s at
    sf0.1 from this split. The sketches' partial states merge map-side;
    the exact branch carries a count and two interpolated percentiles."""
    o = table(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median_price"),
    )
    ex = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.expr("percentile(o_totalprice, 0.45)").alias("_p45"),
        F.expr("percentile(o_totalprice, 0.55)").alias("_p55"),
    )
    # HLL++ default rsd = 0.05; 3 sigma = 15% relative error, floor of 1.
    # percentile_approx default accuracy 10000 → rank error 1e-4, far inside
    # the p45..p55 band.
    return sk.join(ex, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= F.greatest(F.lit(1.0), 0.15 * F.col("exact_customers"))
        ).alias("approx_customers_ok"),
        (
            (F.col("approx_median_price") >= F.col("_p45"))
            & (F.col("approx_median_price") <= F.col("_p55"))
        ).alias("approx_median_ok"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: selective dim filter → fact join → agg → top-10.

    100 TB: the BUILDING customer subset broadcasts; lineitem⋈orders is
    the one shuffle; TakeOrderedAndProject caps the sort at 10 rows per
    partition.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1995-03-15 00:00:00"))
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15 00:00:00"))
    )
    revenue = money(F.col("l_extendedprice")) * (F.lit(1) - F.col("l_discount").cast("decimal(5,2)"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: IN-subquery over a grouped HAVING, rendered as a
    semi-join against the aggregated key set.

    100 TB: the HAVING aggregate reduces lineitem to qualifying orderkeys
    first (small), which then semi-joins — Catalyst plans the same shape
    from the SQL form; both aggregations share the orderkey partitioning.
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.round(F.sum(money(F.col("l_quantity"))), 2).cast("double").alias("total_qty"))
    )


@query(
    "correlated_above_nation_avg",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)
def correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance — decorrelated into a window aggregate (one shuffle on
    nationkey, no per-row probe), the rewrite Catalyst itself applies to
    the SQL form.

    The comparison uses raw doubles on both sides: avg() appears only in a
    predicate, never in output, so engine rounding differences cannot leak
    into the hash (a boundary-straddling acctbal would need the two
    engines' avgs to differ by >1e-12 relative — they sum ≤150 values).
    """
    from pyspark.sql.window import Window

    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return (
        c.withColumn("_nation_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("_nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "scalar_battery2",
    oracle="""
    SELECT p_partkey,
           concat_ws('-', p_brand, p_type)            AS brand_type,
           CASE WHEN regexp_matches(p_name, '[aeiou]{2}') THEN 1 ELSE 0 END AS double_vowel,
           CAST(p_size AS VARCHAR)                    AS size_str,
           abs(p_size - 25)                           AS size_dist,
           greatest(p_size, 10)                       AS size_floor10,
           least(p_size, 40)                          AS size_cap40,
           floor(sqrt(CAST(p_size AS DOUBLE)) * 10000 + 0.5) / 10000 AS size_sqrt,
           CAST(power(2, CAST(p_size % 10 AS DOUBLE)) AS BIGINT) AS pow2,
           replace(lower(p_brand), 'brand', 'b')      AS brand_short,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0')   AS key_padded,
           substr(reverse(p_name), 1, 5)              AS name_rev5
    FROM part
    """,
)
def scalar_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second scalar battery: string manipulation, regexp predicate,
    greatest/least, math — all codegen'd row-local expressions."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").rlike("[aeiou]{2}"), 1).otherwise(0).alias("double_vowel"),
        F.col("p_size").cast("string").alias("size_str"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.least("p_size", F.lit(40)).alias("size_cap40"),
        fround(F.sqrt(F.col("p_size").cast("double")), 4).alias("size_sqrt"),
        F.pow(F.lit(2), (F.col("p_size") % 10).cast("double")).cast("long").alias("pow2"),
        F.replace(F.lower("p_brand"), F.lit("brand"), F.lit("b")).alias("brand_short"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.substring(F.reverse(F.col("p_name")), 1, 5).alias("name_rev5"),
    )


@query(
    "salted_skew_aggregate",
    oracle="""
    SELECT event_type, count(*) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS total
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern, oracle-proven equivalent to the direct
    aggregate: 5 hot keys over the whole table would hash to 5 reducers,
    so phase 1 salts the key (×16), aggregates partials, and phase 2
    merges — every reducer gets work, the result is identical.

    (At this SF Spark's map-side partial aggregation already handles the
    skew; the workload exists to certify the technique's correctness for
    the cases — e.g. collect_list / exact median — where partials don't
    apply. AQE skew-join handles the join-side analog automatically.)
    """
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    salted = e.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        fround(F.sum("pv"), 2).alias("total"),
    )
