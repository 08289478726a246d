"""Relational battery, round 3 batch 25: Nemenyi post-hoc and
per-key Theil–Sen — the promised per-key/post-hoc follow-ups.

Friedman (relational21) answers 'is SOME quarter different?'; Nemenyi
is the textbook post-hoc that says WHICH pairs differ, by comparing
mean-rank differences to the critical distance q·√(k(k+1)/6n) — the q
constant is a Python-injected shared literal (the Benford discipline),
so no studentized-range table is evaluated engine-side. Per-key
Theil–Sen executes the claim every bounded-series docstring makes
('per-key: partition the pair join and the windows') — robust trend
per order priority from ONE partitioned plan.

Float discipline per workloads/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table

# studentized range q(alpha=0.05, k=4, inf)/sqrt(2) — the Nemenyi constant,
# injected identically into both plans so neither engine computes it
_NEMENYI_Q4 = 2.569 / (2**0.5)


@query(
    "stats_nemenyi_posthoc",
    oracle=f"""
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
      SELECT q, CAST(sum(r2) AS BIGINT) AS rsum2,
             CAST(count(*) AS BIGINT) AS n
      FROM ranked GROUP BY q
    )
    SELECT a.q AS q_a, b.q AS q_b,
           floor((abs(CAST(a.rsum2 - b.rsum2 AS DOUBLE)) / (2.0 * a.n))
                 * 1e6 + 0.5) / 1e6 AS mean_rank_diff,
           floor(({_NEMENYI_Q4!r} * sqrt((4.0 * 5.0) / (6.0 * a.n)))
                 * 1e6 + 0.5) / 1e6 AS critical_distance,
           ((abs(CAST(a.rsum2 - b.rsum2 AS DOUBLE)) / (2.0 * a.n))
            > ({_NEMENYI_Q4!r} * sqrt((4.0 * 5.0) / (6.0 * a.n))))
             AS significant
    FROM sums a JOIN sums b ON a.q < b.q
    ORDER BY q_a, q_b
    """,
)
def stats_nemenyi_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nemenyi post-hoc for the Friedman design: pairwise quarter
    mean-rank differences against the critical distance
    q·√(k(k+1)/6n) — WHICH quarters differ, after Friedman says some
    do. Mean ranks derive from the same doubled integer rank sums as
    stats_friedman_quarters (÷2n only at the end); the studentized-
    range constant is a Python literal shared by both plans, so the
    significance booleans compare identically-computed doubles.

    Scale: everything after the (customer, quarter) aggregate is
    4-row arithmetic; the pair join is 4×4.
    """
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey", F.quarter("o_orderdate").cast("int").alias("q")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("s")
    ).localCheckpoint(eager=False)
    complete = (
        spend.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nq"))
        .filter(F.col("nq") == 4)
        .select("o_custkey")
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
    sums = ranked.groupBy("q").agg(
        F.sum("r2").cast("bigint").alias("rsum2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)  # 4 rows; both pair sides
    a, b = sums.alias("a"), sums.alias("b")
    diff = F.abs((F.col("a.rsum2") - F.col("b.rsum2")).cast("double")) / (
        F.lit(2.0) * F.col("a.n")
    )
    cd = F.lit(_NEMENYI_Q4) * F.sqrt(F.lit(4.0 * 5.0) / (F.lit(6.0) * F.col("a.n")))
    return (
        a.join(b, F.col("a.q") < F.col("b.q"))
        .select(
            F.col("a.q").alias("q_a"),
            F.col("b.q").alias("q_b"),
            fround(diff, 6).alias("mean_rank_diff"),
            fround(cd, 6).alias("critical_distance"),
            (diff > cd).alias("significant"),
        )
        .orderBy("q_a", "q_b")
    )


@query(
    "stats_theil_sen_per_key",
    oracle="""
    WITH monthly AS (
      SELECT o_orderpriority AS priority,
             (year(o_orderdate) * 12 + month(o_orderdate)) AS t,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.priority, a.t AS t1, b.t AS t2,
             (CAST(b.rev AS DOUBLE) - CAST(a.rev AS DOUBLE))
               / CAST(b.t - a.t AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b
        ON a.priority = b.priority AND a.t < b.t
    ),
    ranked AS (
      SELECT priority, slope,
             row_number() OVER (PARTITION BY priority
                                ORDER BY slope, t1, t2) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM slopes
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n_pairs,
           floor(max(CASE WHEN rn = (n + 1) // 2 THEN slope END)
                 * 1e4 + 0.5) / 1e4 AS theil_sen_slope
    FROM ranked GROUP BY priority ORDER BY priority
    """,
)
def stats_theil_sen_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Theil–Sen — the partitioned form every bounded-series
    docstring promises: the robust monthly revenue trend PER ORDER
    PRIORITY, from one plan whose pair join and rank windows all key
    on the priority. Five independent robust trends, one shuffle
    family.

    Scale: the pair join condition gains the key, so each priority's
    O(m²) pairs stay within its own partition (~80 months → 3k pairs
    per key); the median window partitions identically. The fleet-of-
    trends shape — |keys| grows, per-key cost doesn't.
    """
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("t"),
        )
        .agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
        .localCheckpoint(eager=False)  # (key, month)-sized; both pair sides
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(
        b,
        (F.col("a.priority") == F.col("b.priority")) & (F.col("a.t") < F.col("b.t")),
    ).select(
        F.col("a.priority").alias("priority"),
        F.col("a.t").alias("t1"),
        F.col("b.t").alias("t2"),
        (
            (F.col("b.rev").cast("double") - F.col("a.rev").cast("double"))
            / (F.col("b.t") - F.col("a.t")).cast("double")
        ).alias("slope"),
    )
    ranked = slopes.select(
        "priority",
        "slope",
        F.row_number()
        .over(Window.partitionBy("priority").orderBy("slope", "t1", "t2"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n_pairs"),
            fround(
                F.max(
                    F.when(
                        F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("slope")
                    )
                ),
                4,
            ).alias("theil_sen_slope"),
        )
        .orderBy("priority")
    )


@query(
    "stats_ks_per_source",
    oracle="""
    WITH steps AS (
      SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars
    ),
    totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM steps GROUP BY source
    ),
    grand AS (SELECT CAST(sum(c) AS BIGINT) AS ng FROM steps),
    allsteps AS (
      SELECT n_chars, CAST(sum(c) AS BIGINT) AS ca FROM steps GROUP BY n_chars
    ),
    -- per (source, pooled support point): source ECDF count and rest ECDF count
    grid AS (
      SELECT t.source, a.n_chars, t.ns, g.ng,
             (SELECT coalesce(sum(s2.c), 0) FROM steps s2
              WHERE s2.source = t.source AND s2.n_chars <= a.n_chars) AS cs,
             (SELECT coalesce(sum(a2.ca), 0) FROM allsteps a2
              WHERE a2.n_chars <= a.n_chars) AS call
      FROM totals t, allsteps a, grand g
    ),
    scored AS (
      SELECT source, ns, (ng - ns) AS nr,
             abs(cs * (ng - ns) - (call - cs) * ns) AS dn
      FROM grid
    ),
    best AS (
      SELECT source, ns, nr, max(dn) AS dmax
      FROM scored GROUP BY source, ns, nr
    )
    SELECT source, ns AS n_source,
           CAST(dmax AS BIGINT) AS d_numerator,
           floor((CAST(dmax AS DOUBLE)
                  / (CAST(ns AS DOUBLE) * CAST(nr AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS ks_d
    FROM best ORDER BY source
    """,
)
def stats_ks_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KS drift screen: each source's document-length
    distribution against the REST of the corpus — the one-vs-rest
    generalization of stats_ks_two_sample, run for every source in
    one plan (the curation question: which sources are shaped unlike
    the collection they feed?). Rest-ECDF counts derive from the
    corpus ECDF minus the source's own (call − cs), so the fleet costs
    ONE pooled support grid; the supremum stays the integer
    cross-multiply.

    Scale: the grid is |sources|·|distinct values| rows built from
    value-grouped counts (never raw docs); per-source running counts
    ride windows partitioned by source over that bounded grid. The
    oracle states the correlated-subquery form; the Spark plan uses
    the window form — same arithmetic.
    """
    d = table(spark, sf_dir, "documents")
    steps = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # (source, value)-sized; grid + totals
    totals = steps.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    grand = steps.agg(F.sum("c").cast("bigint").alias("ng"))
    allsteps = steps.groupBy("n_chars").agg(
        F.sum("c").cast("bigint").alias("ca")
    )
    wall = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    all_ecdf = allsteps.select(
        "n_chars", F.sum("ca").over(wall).alias("call")
    )
    # dense grid: every source x every pooled support point, with the
    # source's own step counts joined in (0 where absent)
    grid = (
        totals.crossJoin(all_ecdf)
        .join(steps, ["source", "n_chars"], "left")
        .na.fill({"c": 0})
        .crossJoin(F.broadcast(grand))
    )
    ws = Window.partitionBy("source").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scored = grid.select(
        "source",
        "ns",
        (F.col("ng") - F.col("ns")).alias("nr"),
        F.abs(
            F.sum("c").over(ws) * (F.col("ng") - F.col("ns"))
            - (F.col("call") - F.sum("c").over(ws)) * F.col("ns")
        ).alias("dn"),
    )
    return (
        scored.groupBy("source", "ns", "nr")
        .agg(F.max("dn").alias("dmax"))
        .select(
            "source",
            F.col("ns").alias("n_source"),
            F.col("dmax").cast("bigint").alias("d_numerator"),
            fround(
                F.col("dmax").cast("double")
                / (F.col("ns").cast("double") * F.col("nr").cast("double")),
                6,
            ).alias("ks_d"),
        )
        .orderBy("source")
    )


@query(
    "stats_lorenz_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    dec AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM spend
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(rev) AS drev
      FROM dec GROUP BY decile
    ),
    cum AS (
      SELECT decile, n_customers, drev,
             sum(drev) OVER (ORDER BY decile
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS crev,
             sum(drev) OVER () AS trev
      FROM g
    )
    SELECT CAST(decile AS INT) AS decile, n_customers,
           CAST(drev AS DOUBLE) AS decile_revenue,
           floor((CAST(crev AS DOUBLE) / CAST(trev AS DOUBLE)) * 1e6 + 0.5)
             / 1e6 AS cum_share
    FROM cum ORDER BY decile
    """,
)
def stats_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve points: customers sorted by spend into deciles, with
    each decile's exact DECIMAL revenue and the cumulative share — the
    curve behind keyskew_gini_customers' scalar (the Gini is twice the
    area between this curve and the diagonal; dashboards want the
    POINTS). ntile ties break on customer id for a total order;
    shares round once from exact sums.

    Scale: one customer aggregate, one rank window over
    customer-cardinality rows, a 10-row rollup.
    """
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(money(F.col("o_totalprice"))).alias("rev")
    )
    dec = spend.select(
        "rev",
        F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").alias("drev"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "decile",
        "n_customers",
        "drev",
        F.sum("drev").over(wc).alias("crev"),
        F.sum("drev").over(Window.partitionBy()).alias("trev"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        "n_customers",
        F.col("drev").cast("double").alias("decile_revenue"),
        fround(F.col("crev").cast("double") / F.col("trev").cast("double"), 6).alias(
            "cum_share"
        ),
    ).orderBy("decile")


@query(
    "stats_mcnemar_halves",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    act AS (
      SELECT c.c_custkey,
             max(CASE WHEN o.o_orderkey IS NOT NULL
                       AND epoch_us(o.o_orderdate) * 2
                           <= epoch_us(b.lo) + epoch_us(b.hi)
                      THEN 1 ELSE 0 END) AS h1,
             max(CASE WHEN o.o_orderkey IS NOT NULL
                       AND epoch_us(o.o_orderdate) * 2
                           > epoch_us(b.lo) + epoch_us(b.hi)
                      THEN 1 ELSE 0 END) AS h2
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      CROSS JOIN bounds b
      GROUP BY c.c_custkey
    )
    SELECT CAST(sum(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both,
           CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned,
           CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_acquired,
           CAST(sum(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_never,
           floor((
             (CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                   - sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                   AS DOUBLE)
              * CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                     - sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                     AS DOUBLE))
             / CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                    + sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mcnemar_chi2
    FROM act
    """,
)
def stats_mcnemar_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired binary outcomes: each customer's
    activity flag in the first vs second half of the window — did the
    active population CHANGE composition (churn vs acquisition), not
    just size? The statistic (b−c)²/(b+c) uses only the DISCORDANT
    counts — exact integers — and the 2×2 paired table (both/churned/
    acquired/never) is the retention summary on its own. Completes the
    paired-test pair: Wilcoxon for magnitudes, McNemar for binaries.

    Scale: one left join + per-customer conditional-max aggregate;
    the statistic is 1-row arithmetic.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    bounds = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    first_half = us("o_orderdate") * 2 <= us("lo") + us("hi")
    act = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .crossJoin(F.broadcast(bounds))
        .groupBy("c_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderkey").isNotNull() & first_half, 1).otherwise(0)
            ).alias("h1"),
            F.max(
                F.when(F.col("o_orderkey").isNotNull() & ~first_half, 1).otherwise(0)
            ).alias("h2"),
        )
    )
    cnt = lambda p: F.sum(F.when(p, 1).otherwise(0))  # noqa: E731
    b = cnt((F.col("h1") == 1) & (F.col("h2") == 0))
    cc = cnt((F.col("h1") == 0) & (F.col("h2") == 1))
    return act.agg(
        cnt((F.col("h1") == 1) & (F.col("h2") == 1)).cast("bigint").alias("n_both"),
        b.cast("bigint").alias("n_churned"),
        cc.cast("bigint").alias("n_acquired"),
        cnt((F.col("h1") == 0) & (F.col("h2") == 0)).cast("bigint").alias("n_never"),
        fround(
            ((b - cc).cast("double") * (b - cc).cast("double"))
            / (b + cc).cast("double"),
            6,
        ).alias("mcnemar_chi2"),
    )
