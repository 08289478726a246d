"""Relational battery, round 3 batch 13: rank-based robust statistics
— Theil–Sen trend, Kendall concordance, chi-square independence, and
Zipf rank-frequency structure.

The robust-statistics lane so far has MAD, winsorization, weighted
medians, and bootstrap CIs; this batch adds the two classic RANK
estimators (Theil–Sen's median-of-slopes trend and Kendall's tau),
which are exactly the ones whose naive forms are O(n²) — made
tractable here by running them over PRE-AGGREGATED bounded series
(monthly revenue, daily event counts), the shape they're actually
used in: robust trend on a dashboard series, not on raw facts. The
pairwise stage is |series|²-bounded no matter how many fact rows feed
it. Chi-square independence completes the χ² pair started by
dq_benford_first_digit (goodness-of-fit). Zipf top-ranks audits the
token rank-frequency curve — the sanity check before any vocabulary
truncation — with exact ratio columns instead of a libm log-log fit.

Float discipline per workloads/core.py: every pairwise statistic
(concordances, slope numerators/denominators) is exact
integer/decimal; only final ratios touch doubles, frounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table


@query(
    "stats_theil_sen_trend",
    oracle="""
    WITH monthly AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS t,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    slopes AS (
      SELECT a.t AS t1, b.t AS t2,
             (CAST(b.rev AS DOUBLE) - CAST(a.rev AS DOUBLE))
               / CAST(b.t - a.t AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b ON a.t < b.t
    ),
    ranked AS (
      SELECT slope, row_number() OVER (ORDER BY slope, t1, t2) AS rn,
             count(*) OVER () AS n
      FROM slopes
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST((SELECT count(*) FROM monthly) AS BIGINT) AS n_months,
           floor(max(CASE WHEN rn = (n + 1) // 2 THEN slope END)
                 * 1e4 + 0.5) / 1e4 AS theil_sen_slope,
           floor(max(CASE WHEN rn = (n + 9) // 10 THEN slope END)
                 * 1e4 + 0.5) / 1e4 AS slope_p10,
           floor(max(CASE WHEN rn = (9 * n + 9) // 10 THEN slope END)
                 * 1e4 + 0.5) / 1e4 AS slope_p90
    FROM ranked
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly revenue: the MEDIAN of all
    pairwise slopes — the trend estimator a single anomalous month
    cannot drag (OLS's weakness, stats_grouped_ols). Slopes divide
    exact DECIMAL revenue deltas by integer month gaps, the median and
    the p10/p90 slope band come from rank arithmetic with a total
    order (slope, t1, t2), and only the already-selected values are
    frounded — no accumulation of doubles anywhere.

    Scale: the fact table folds to ≤|months| rows FIRST; the O(m²)
    pair join is over that bounded series (~80 months → ~3k pairs) —
    the estimator's textbook cost is paid at series size, never data
    size. Same shape per-key: partition the pair join and windows.
    """
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("t")
        )
        .agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
        .localCheckpoint(eager=False)  # months-sized; both sides of the pair join
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(b, F.col("a.t") < F.col("b.t")).select(
        F.col("a.t").alias("t1"),
        F.col("b.t").alias("t2"),
        (
            (F.col("b.rev").cast("double") - F.col("a.rev").cast("double"))
            / (F.col("b.t") - F.col("a.t")).cast("double")
        ).alias("slope"),
    )
    ranked = slopes.select(
        "slope",
        F.row_number().over(Window.orderBy("slope", "t1", "t2")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    n_months = monthly.agg(F.count(F.lit(1)).alias("m"))
    pick = lambda cond: F.max(F.when(cond, F.col("slope")))  # noqa: E731
    # aggregate the (possibly empty) pair set ALONE — always one row —
    # then attach the month count, so a 1-month corpus still reports it
    stats = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        fround(pick(F.col("rn") == F.expr("(n + 1) DIV 2")), 4).alias(
            "theil_sen_slope"
        ),
        fround(pick(F.col("rn") == F.expr("(n + 9) DIV 10")), 4).alias("slope_p10"),
        fround(pick(F.col("rn") == F.expr("(9 * n + 9) DIV 10")), 4).alias(
            "slope_p90"
        ),
    )
    return F.broadcast(n_months).crossJoin(stats).select(
        "n_pairs",
        F.col("m").cast("bigint").alias("n_months"),
        "theil_sen_slope",
        "slope_p10",
        "slope_p90",
    )


@query(
    "stats_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (x.a - y.a) * (x.b - y.b) > 0 THEN 1 ELSE 0 END AS c,
             CASE WHEN (x.a - y.a) * (x.b - y.b) < 0 THEN 1 ELSE 0 END AS dd
      FROM daily x JOIN daily y ON x.d < y.d
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(c) AS BIGINT) AS concordant,
           CAST(sum(dd) AS BIGINT) AS discordant,
           CAST(count(*) - sum(c) - sum(dd) AS BIGINT) AS ties,
           floor((CAST(sum(c) - sum(dd) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS tau_a
    FROM pairs
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a between the daily view series and the daily
    purchase series: the nonparametric concordance coefficient —
    do days with more views also see more purchases, regardless of
    scale or outliers? Concordant/discordant pair counts are EXACT
    integers (sign of an integer product), so tau is a ratio of exact
    counts — the statistic cannot flake, unlike Pearson r on raw
    doubles (stats_corr_moments needed decimal moments for that).

    Scale: the fact scan folds to |days| rows with both measures in
    ONE conditional aggregate pass; the O(d²) concordance join runs on
    the bounded series. Per-key variants partition the same plan.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("b"),
        )
        .localCheckpoint(eager=False)  # days-sized; both sides + the count
    )
    x, y = daily.alias("x"), daily.alias("y")
    prod = (F.col("x.a") - F.col("y.a")) * (F.col("x.b") - F.col("y.b"))
    pairs = x.join(y, F.col("x.d") < F.col("y.d")).select(
        F.when(prod > 0, 1).otherwise(0).alias("c"),
        F.when(prod < 0, 1).otherwise(0).alias("dd"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("ndays"))
    # pair aggregate alone (always one row, even with <2 days), then the
    # always-1-row day count attaches — no NULL n_days on tiny series
    stats = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("c").cast("bigint").alias("concordant"),
        F.sum("dd").cast("bigint").alias("discordant"),
        (F.count(F.lit(1)) - F.sum("c") - F.sum("dd")).cast("bigint").alias("ties"),
        fround(
            (F.sum("c") - F.sum("dd")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("tau_a"),
    )
    return F.broadcast(nd).crossJoin(stats).select(
        F.col("ndays").cast("bigint").alias("n_days"),
        "n_pairs",
        "concordant",
        "discordant",
        "ties",
        "tau_a",
    )


@query(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    tots AS (
      SELECT priority, status, n,
             sum(n) OVER (PARTITION BY priority) AS row_tot,
             sum(n) OVER (PARTITION BY status) AS col_tot,
             sum(n) OVER () AS tot
      FROM cells
    )
    SELECT priority, status, n,
           floor((CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                  / CAST(tot AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS expected,
           floor((((CAST(n AS DOUBLE)
                    - (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                       / CAST(tot AS DOUBLE)))
                   * (CAST(n AS DOUBLE)
                      - (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                         / CAST(tot AS DOUBLE))))
                  / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                     / CAST(tot AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS chi2_term
    FROM tots ORDER BY priority, status
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the priority × status
    contingency table — the categorical-drift screen: are order
    priorities distributed independently of status? Per-cell expected
    counts and χ² terms come from window totals over the AGGREGATED
    table, all derived from exact integers, frounded once. (Benford
    covered goodness-of-fit against fixed expectations; this is the
    two-margin independence form.) Consumers sum chi2_term and compare
    to the (r−1)(c−1) critical value.

    Scale: one fact aggregate to r·c cells; the three margin windows
    ride those cells. Adding a drift dimension (week, source) is one
    more key on the SAME single pass.
    """
    o = table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tots = cells.select(
        "priority",
        "status",
        "n",
        F.sum("n").over(Window.partitionBy("priority")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy("status")).alias("col_tot"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("tot").cast("double")
    )
    diff = F.col("n").cast("double") - expected
    return tots.select(
        "priority",
        "status",
        "n",
        fround(expected, 6).alias("expected"),
        fround((diff * diff) / expected, 6).alias("chi2_term"),
    ).orderBy("priority", "status")


@query(
    "text_zipf_topranks",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f
      FROM tok WHERE w <> '' GROUP BY w
    ),
    ranked AS (
      SELECT w, f,
             row_number() OVER (ORDER BY f DESC, w) AS rank,
             sum(f) OVER () AS tot,
             sum(f) OVER (ORDER BY f DESC, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             lead(f) OVER (ORDER BY f DESC, w) AS next_f
      FROM freq
    )
    SELECT CAST(rank AS INT) AS rank, w AS token, f,
           floor((CAST(f AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS share,
           floor((CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS cum_share,
           floor((CAST(f AS DOUBLE) / CAST(next_f AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS ratio_to_next
    FROM ranked WHERE rank <= 30 ORDER BY rank
    """,
)
def text_zipf_topranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit of the token distribution: the top-30
    ranks with share, cumulative share, and the frequency ratio to the
    next rank — the vocabulary-shape sanity check before truncation or
    BPE budgeting (a healthy corpus shows ratio_to_next → 1 down the
    ranks; a spammy one shows cliffs). Exact counts, exact ratio
    inputs, frounded outputs — no log-log fit and thus no libm on the
    hash path; the ratio columns carry the same diagnostic signal.

    Scale: one token-count aggregate (map-side combinable); the rank/
    cumulative windows ride the vocabulary-sized result, and the
    top-30 cut bounds the output regardless of vocabulary size.
    """
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    wo = Window.orderBy(F.desc("f"), "w")
    ranked = freq.select(
        "w",
        "f",
        F.row_number().over(wo).alias("rank"),
        F.sum("f").over(Window.partitionBy()).alias("tot"),
        F.sum("f").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.lead("f").over(wo).alias("next_f"),
    )
    return (
        ranked.filter(F.col("rank") <= 30)
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("token"),
            "f",
            fround(F.col("f").cast("double") / F.col("tot").cast("double"), 6).alias(
                "share"
            ),
            fround(F.col("cum").cast("double") / F.col("tot").cast("double"), 6).alias(
                "cum_share"
            ),
            fround(
                F.col("f").cast("double") / F.col("next_f").cast("double"), 6
            ).alias("ratio_to_next"),
        )
        .orderBy("rank")
    )
