"""Pipeline ops, round 3 batch 6: fuzzy entity resolution, rolling
exact-distinct windows, weighted medians, and Poisson-bootstrap
confidence intervals.

Four operators a training-data / analytics pipeline needs beyond the
exact-match families already shipped: edit-distance record linkage
(blocked, never all-pairs), sliding-window COUNT(DISTINCT) done the
linear way (distinct-pair interval explosion instead of a quadratic
range join), order-statistics with weights, and resampled uncertainty
bounds that are bit-reproducible because the "randomness" is md5
content addressing (operators/sampling.py), not an RNG.

Cross-engine discipline (workloads/core.py): every comparison that
decides a row's fate is integer/DECIMAL exact; the only doubles that
cross the driver hash are single divisions of exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import query, table


@query(
    "er_fuzzy_levenshtein_join",
    oracle="""
    WITH p AS (
      SELECT p_partkey AS pk, p_brand AS brand,
             split_part(p_name, ' ', 1) AS adj,
             split_part(p_name, ' ', 2) AS noun
      FROM part
    )
    SELECT a.pk AS pk_a, b.pk AS pk_b, a.brand AS brand,
           a.adj AS adj_a, b.adj AS adj_b,
           CAST(levenshtein(a.adj, b.adj) AS INT) AS dist
    FROM p a JOIN p b
      ON a.brand = b.brand AND a.noun = b.noun AND a.pk < b.pk
    WHERE levenshtein(a.adj, b.adj) <= 2
    ORDER BY dist, pk_a, pk_b
    LIMIT 100
    """,
)
def er_fuzzy_levenshtein_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution by blocked edit distance: part records are
    candidate duplicates when they share a blocking key (brand + the
    name's noun) and their adjectives are within Levenshtein distance 2.
    dist 0 = exact-name duplicates under different keys; 1-2 = typo-class
    variants — the classic record-linkage ladder.

    Scale shape: the join is BLOCKED — equi-keys (brand, noun) carry the
    shuffle and the O(n²) edit-distance kernel runs only inside a block
    (bounded by the brand×noun vocabulary, not the corpus), which is the
    standard-blocking recipe every ER system uses instead of the
    quadratic all-pairs scan. Levenshtein itself is the textbook DP —
    identical integers in any engine — so the (dist, pk_a, pk_b) top-100
    cut is deterministic. Compare er_blocked_name_match (exact-key
    blocking); this row adds the approximate-comparator stage.
    """
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.col("p_brand").alias("brand"),
        F.split(F.col("p_name"), " ").getItem(0).alias("adj"),
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
    )
    a = p.select(
        F.col("pk").alias("pk_a"), "brand", F.col("adj").alias("adj_a"), "noun"
    )
    b = p.select(
        F.col("pk").alias("pk_b"), "brand", F.col("adj").alias("adj_b"), "noun"
    )
    return (
        a.join(b, ["brand", "noun"])
        .where(F.col("pk_a") < F.col("pk_b"))
        .withColumn("dist", F.levenshtein("adj_a", "adj_b").cast("int"))
        .where(F.col("dist") <= 2)
        .select("pk_a", "pk_b", "brand", "adj_a", "adj_b", "dist")
        .orderBy("dist", "pk_a", "pk_b")
        .limit(100)
    )


@query(
    "window_rolling_distinct_users",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    pairs AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(days.d AS VARCHAR) AS day,
           CAST(count(DISTINCT p.u) AS BIGINT) AS n_users_7d
    FROM days JOIN pairs p ON p.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d ORDER BY day
    """,
)
def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day EXACT distinct users per day — the sliding-window
    COUNT(DISTINCT) that window frames cannot express (distinct isn't
    frame-decomposable) and sketches only approximate.

    The linear recipe: reduce events to distinct (user, day) pairs, then
    EXPLODE each pair into the ≤7 window-end days it contributes to and
    count distinct pairs per covered day — O(pairs·7) rows of two longs,
    shuffled once on the day key. The oracle states the same thing as
    the quadratic day×pair range join (fine for DuckDB's IEJoin at test
    scale); at 100 TB the range join materializes |days|·|pairs| while
    the explode form stays linear in the event log with a bounded ×7
    fan-out — same trick as the interval-overlap and gap-fill rows.
    Days at the tail (no events within 7 days prior — impossible here)
    and beyond the data's edge are excluded by the semi-join with
    observed days, keeping both forms aligned.
    """
    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).distinct()
    days = pairs.select("d").distinct().withColumnRenamed("d", "day")
    cover = pairs.select(
        "u", F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day")
    ).distinct()
    return (
        cover.join(days, "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_users_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "n_users_7d")
        .orderBy("day")
    )


@query(
    "stats_weighted_median",
    oracle="""
    WITH rows_w AS (
      SELECT l_returnflag AS flag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l_quantity AS BIGINT) AS w,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
                        l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT flag,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN cw * 2 >= tw THEN price END) AS DOUBLE)
             AS weighted_median
    FROM rows_w GROUP BY flag ORDER BY flag
    """,
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per return flag: the smallest price whose running
    quantity-weight reaches half the group's total — order statistics
    with weights, which percentile()/median() (unweighted) and
    percentile_approx (sketched) don't cover.

    Integer-exact end to end: weights are BIGINT, prices DECIMAL, and
    the crossing test is `2·cumweight ≥ total` in integer space — no
    division, so no float boundary to disagree on. One partitioned
    window (running sum and group total ride the same sort) then a
    conditional-min rollup to O(flags) rows, the same shape as the
    discrete-quantile family (quantile_disc_doclen). 100 TB: groups here
    are low-cardinality; for data-cardinality groups the same selection
    degrades to range-partitioned offset lookup or the GK sketch.
    """
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    wq = F.col("l_quantity").cast("long")
    w = Window.partitionBy("l_returnflag").orderBy(
        price, "l_orderkey", "l_linenumber"
    )
    wp = Window.partitionBy("l_returnflag")
    rows_w = li.select(
        F.col("l_returnflag").alias("flag"),
        price.alias("price"),
        F.sum(wq).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum(wq).over(wp).alias("tw"),
    )
    return (
        rows_w.groupBy("flag")
        .agg(
            F.max("tw").cast("long").alias("total_weight"),
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("price")))
            .cast("double")
            .alias("weighted_median"),
        )
        .orderBy("flag")
    )


@query(
    "stats_grouped_ols",
    oracle="""
    WITH xy AS (
      SELECT lang,
             CAST(n_chars AS BIGINT) AS x,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS y
      FROM documents
    ),
    m AS (
      SELECT lang, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM xy GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept,
           (CAST(n * sxy - sx * sy AS DOUBLE)
              * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS r_squared
    FROM m ORDER BY lang
    """,
)
def stats_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (token count ~ char count per
    language) from EXACT integer moment sums — slope, intercept, and R²
    each become one or two double operations on exact BIGINT
    cross-products, the regression analog of stats_corr_moments: the
    built-in regr_slope/corr aggregates hash-diverge under reduction
    order, the moment form cannot. This is the per-segment trend fit
    every dashboard "fit a line per group" feature needs.

    Scale: ONE partial+final aggregate over the fact scan (five sums and
    a count fold map-side); no window, no join. Moments are the
    mergeable form — per-partition sums combine associatively, the same
    property the sketch rows certify.
    """
    d = table(spark, sf_dir, "documents")
    xy = d.select(
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.split("text", " ")).cast("long").alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / den.cast("double")
    return m.select(
        "lang",
        F.col("n").alias("n_docs"),
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        (
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * deny.cast("double"))
        ).alias("r_squared"),
    ).orderBy("lang")


@query(
    "stats_multivar_ols_2f",
    oracle="""
    WITH xy AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x2,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
    ),
    m AS (
      SELECT lang, count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
             sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM xy GROUP BY lang
    ),
    c AS (
      SELECT lang, n, s1, s2, sy,
             CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a,
             CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS b,
             CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cc,
             CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS d1,
             CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS d2
      FROM m
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           (cc * d1 - b * d2) / (a * cc - b * b) AS beta_tokens,
           (a * d2 - b * d1) / (a * cc - b * b) AS beta_distinct,
           (CAST(sy AS DOUBLE)
             - ((cc * d1 - b * d2) / (a * cc - b * b)) * CAST(s1 AS DOUBLE)
             - ((a * d2 - b * d1) / (a * cc - b * b)) * CAST(s2 AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept
    FROM c ORDER BY lang
    """,
)
def stats_multivar_ols_2f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-feature least squares per language (chars ~ tokens + distinct
    tokens) solved in closed form from exact integer moments: the 2×2
    normal-equation inverse is expressible as plain arithmetic
    ((C·D1−B·D2)/(AC−B²) …), so multivariate regression — normally an
    MLlib/sklearn job — runs as ONE aggregate + scalar math, and the
    oracle replays it exactly. Centered cross-moments are combined in
    double (n·Σx² overflows BIGINT where DuckDB would silently promote
    to HUGEINT — the stats_grouped_ols lesson applied from the start).

    Scale: identical shape to stats_grouped_ols — one partial+final
    aggregate of 9 sums + count, mergeable moments, no shuffle beyond
    the group key. The d-feature generalization reduces to a d² moment
    matrix per group with the solve on the driver (the power-iteration /
    Lloyd driver-solve pattern).
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    xy = d.select(
        "lang",
        F.size(toks).cast("long").alias("x1"),
        F.size(F.array_distinct(toks)).cast("long").alias("x2"),
        F.col("n_chars").cast("long").alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )

    def dd(c):
        return F.col(c).cast("double")

    a = dd("n") * dd("s11") - dd("s1") * dd("s1")
    b = dd("n") * dd("s12") - dd("s1") * dd("s2")
    cc = dd("n") * dd("s22") - dd("s2") * dd("s2")
    d1 = dd("n") * dd("s1y") - dd("s1") * dd("sy")
    d2 = dd("n") * dd("s2y") - dd("s2") * dd("sy")
    det = a * cc - b * b
    beta1 = (cc * d1 - b * d2) / det
    beta2 = (a * d2 - b * d1) / det
    return m.select(
        "lang",
        F.col("n").alias("n_docs"),
        beta1.alias("beta_tokens"),
        beta2.alias("beta_distinct"),
        (
            (dd("sy") - beta1 * dd("s1") - beta2 * dd("s2")) / dd("n")
        ).alias("intercept"),
    ).orderBy("lang")


@query(
    "stats_ab_test_zscore",
    oracle="""
    WITH assigned AS (
      SELECT user_id, user_id % 2 AS grp,
             max(CASE WHEN event_type = 'purchase' AND value > 200
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT grp, count(*) AS n, sum(converted) AS conv
      FROM assigned GROUP BY grp
    ),
    w AS (
      SELECT
        max(CASE WHEN grp = 0 THEN n END) AS n0,
        max(CASE WHEN grp = 0 THEN conv END) AS c0,
        max(CASE WHEN grp = 1 THEN n END) AS n1,
        max(CASE WHEN grp = 1 THEN conv END) AS c1
      FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
           CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate_control,
           CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate_treat,
           (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / sqrt(
               (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
               * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
               * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
             ) AS z_score
    FROM w
    """,
)
def stats_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B split (user-id parity as the
    deterministic assignment; conversion = any high-value purchase): pooled
    standard error, exact conversion counts, and a z statistic built
    from the same literal float expression both engines evaluate on
    identical exact inputs — reproducible experiment readouts, the md5
    assignment discipline's consumer.

    Scale: per-user conversion folds in one user-keyed aggregate, the
    arm rollup is 2 rows, the statistic is scalar arithmetic. The
    assignment column in production comes from the content-addressed
    bucketing (operators/sampling.py) — same determinism argument.
    """
    ev = table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("grp"), "converted")
    g = assigned.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("c1"),
    )
    n0d, c0d = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1d, c1d = F.col("n1").cast("double"), F.col("c1").cast("double")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    return w.select(
        F.col("n0").alias("n_control"),
        F.col("c0").alias("conv_control"),
        F.col("n1").alias("n_treat"),
        F.col("c1").alias("conv_treat"),
        (c0d / n0d).alias("rate_control"),
        (c1d / n1d).alias("rate_treat"),
        (
            (c1d / n1d - c0d / n0d)
            / F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n0d + F.lit(1.0) / n1d))
        ).alias("z_score"),
    )


# Cumulative Poisson(1) thresholds scaled to 1e6: P(X <= k) for k = 0..6;
# a uniform md5 bucket below threshold k yields count k (else 7). Both
# engines evaluate the SAME literal CASE chain, so resample weights are
# bit-identical — this is the Poisson bootstrap (counts ~ Poisson(1)
# approximate multinomial resampling and, crucially for 100 TB, need no
# global coordination: each row draws its own weight independently).
_POIS = (367879, 735759, 919699, 980966, 996340, 999406, 999917)
_B = 100  # bootstrap replicates


def _pois_case_sql(bucket_expr: str) -> str:
    clauses = " ".join(
        f"WHEN {bucket_expr} < {t} THEN {k}" for k, t in enumerate(_POIS)
    )
    return f"CASE {clauses} ELSE 7 END"


@query(
    "stats_bootstrap_ci_mean",
    oracle=f"""
    WITH draws AS (
      SELECT t.b AS b, d.n_chars AS v,
             {_pois_case_sql("CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(t.b AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000000")} AS k
      FROM documents d, range({_B}) t(b)
    ),
    means AS (
      SELECT b,
             CAST(sum(k * v) AS DOUBLE) / CAST(sum(k) AS DOUBLE) AS m
      FROM draws GROUP BY b
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means
    )
    SELECT
      CAST({_B} AS BIGINT) AS b_used,
      (SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) FROM documents)
        AS sample_mean,
      (SELECT m FROM ranked WHERE rn = {max(1, int(_B * 0.025))}) AS ci_lo,
      (SELECT m FROM ranked WHERE rn = {int(_B * 0.975)}) AS ci_hi
    """,
)
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% confidence interval for the mean document length via
    the POISSON bootstrap: every (row, replicate) pair draws a weight
    k ~ Poisson(1) from an md5-derived uniform, replicate means are
    sum(k·v)/sum(k), and the CI bounds are rank-selected from the B
    replicate means. Because the "randomness" is content-addressed
    (md5 of doc_id:replicate), the whole interval is bit-reproducible
    across runs, partitionings, and engines — the property that makes
    resampled error bars auditable in a published data card.

    Scale shape: the Poisson bootstrap is THE distributed bootstrap —
    no replicate needs to see the whole sample (classic multinomial
    resampling does), so the plan is scan → explode(×B) → one groupBy(b)
    with map-side partial sums → B rows. v is integer (n_chars), the
    sums are exact BIGINTs, and each replicate mean is ONE double
    division — deterministic ordering for the rank selection.
    """
    d = table(spark, sf_dir, "documents")
    draws = d.select(
        F.col("n_chars").alias("v"),
        F.col("doc_id"),
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("b"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    k = F.lit(7)
    for kk, t in reversed(list(enumerate(_POIS))):
        k = F.when(bucket < t, F.lit(kk)).otherwise(k)
    means = (
        draws.withColumn("k", k)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("k") * F.col("v")).cast("double")
                / F.sum("k").cast("double")
            ).alias("m")
        )
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rn")
    )
    lo_rn = max(1, int(_B * 0.025))
    hi_rn = int(_B * 0.975)
    bounds = ranked.agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("m"))).alias("ci_hi"),
    )
    grand = d.agg(
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("sample_mean")
    )
    return (
        grand.crossJoin(bounds)
        .select(
            F.lit(_B).cast("long").alias("b_used"),
            "sample_mean",
            "ci_lo",
            "ci_hi",
        )
    )
