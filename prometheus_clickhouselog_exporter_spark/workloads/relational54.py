"""Round 10 batch: weighted Cohen's kappa, histogram bucket moments,
DeLong AUC confidence interval, and the Brunner–Munzel test —
DuckDB-oracle-checked, census-exact.

Reference parity note: the histogram-moments row consumes the SAME
cumulative `le` bucket shape the reference exports (metrics.go:39-45);
the rest is §2.3 north-star. Methods are public: Cohen 1968 (weighted
kappa), Prometheus histogram docs, DeLong et al. 1988 (scipy/pROC
convention), Brunner & Munzel 2000 (scipy convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, fround, md5_long, query, table

# --- weighted Cohen's kappa -----------------------------------------------------

_H = MD5_SQL.format


def _wkappa_sql() -> str:
    hb = _H(x="('b|' || o_orderkey)")
    return f"""
    WITH base AS (
      SELECT CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 2
                  WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1
                  ELSE 0 END AS ia,
             {hb} % 10 AS hb
      FROM orders
    ),
    lab AS (
      SELECT ia,
             CASE WHEN hb = 0 THEN (ia + 1) % 3 ELSE ia END AS ib
      FROM base
    ),
    conf AS (
      SELECT ia, ib, CAST(count(*) AS BIGINT) AS o
      FROM lab GROUP BY ia, ib
    ),
    marg AS (
      SELECT ia, ib, o,
             CAST(sum(o) OVER (PARTITION BY ia) AS BIGINT) AS row_n,
             CAST(sum(o) OVER (PARTITION BY ib) AS BIGINT) AS col_n,
             CAST(sum(o) OVER () AS BIGINT) AS n
      FROM conf
    ),
    agg AS (
      SELECT max(n) AS n,
             CAST(sum(abs(ia - ib) * o) AS BIGINT) AS lin_o,
             CAST(sum((ia - ib) * (ia - ib) * o) AS BIGINT) AS quad_o,
             CAST(sum(CASE WHEN ia = ib THEN o ELSE 0 END) AS BIGINT)
               AS agree,
             sum(CAST(abs(ia - ib) AS HUGEINT) * row_n * col_n) AS lin_e,
             sum(CAST((ia - ib) * (ia - ib) AS HUGEINT) * row_n * col_n)
               AS quad_e
      FROM marg
    )
    SELECT n, agree,
           floor((1.0 - CAST(n AS DOUBLE) * lin_o / CAST(lin_e AS DOUBLE))
                 * 1e9 + 0.5) / 1e9 AS kappa_linear,
           floor((1.0 - CAST(n AS DOUBLE) * quad_o / CAST(quad_e AS DOUBLE))
                 * 1e9 + 0.5) / 1e9 AS kappa_quadratic
    FROM agg
    """


@query("eval_weighted_kappa", oracle=_wkappa_sql())
def eval_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Cohen's kappa (Cohen 1968) between the true ordinal
    class (lo<mid<hi from priority) and its 10%-hash-noised copy:
    κ_w = 1 − Σv_ij O_ij / Σv_ij E_ij with linear (|i−j|) and quadratic
    ((i−j)²) penalties — ordinal disagreement two steps apart costs
    more than one, which the unweighted twin (stats_cohens_kappa)
    cannot express. Both kappas are exact integer ratios: observed
    penalties are integer sums, expected penalties Σv·rowᵢ·colⱼ stay
    integers (HUGEINT/DECIMAL), and 1 − N·O/E is one double division.

    100 TB: one scan → 9-cell confusion census; marginals are windows
    over the 9-row frame behind the aggregate; the kappa is constant
    work."""
    o = table(spark, sf_dir, "orders")
    first = F.substring("o_orderpriority", 1, 1)
    ia = (
        F.when(first.isin("1", "2"), F.lit(2))
        .when(first == "3", F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    hb = md5_long(
        F.concat(F.lit("b|"), F.col("o_orderkey").cast("string"))
    ) % 10
    lab = o.select(
        ia.alias("ia"),
        F.when(hb == 0, (ia + 1) % 3).otherwise(ia).cast("bigint").alias("ib"),
    )
    conf = lab.groupBy("ia", "ib").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    wr = Window.partitionBy("ia")
    wc = Window.partitionBy("ib")
    wn = Window.partitionBy()
    marg = conf.select(
        "ia",
        "ib",
        "o",
        F.sum("o").over(wr).cast("bigint").alias("row_n"),
        F.sum("o").over(wc).cast("bigint").alias("col_n"),
        F.sum("o").over(wn).cast("bigint").alias("n"),
    )
    dec = "decimal(38,0)"
    lin = F.abs(F.col("ia") - F.col("ib"))
    quad = (F.col("ia") - F.col("ib")) * (F.col("ia") - F.col("ib"))
    agg = marg.agg(
        F.max("n").alias("n"),
        F.sum(lin * F.col("o")).cast("bigint").alias("lin_o"),
        F.sum(quad * F.col("o")).cast("bigint").alias("quad_o"),
        F.sum(F.when(F.col("ia") == F.col("ib"), F.col("o")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
        F.sum(lin.cast(dec) * F.col("row_n") * F.col("col_n")).alias("lin_e"),
        F.sum(quad.cast(dec) * F.col("row_n") * F.col("col_n")).alias(
            "quad_e"
        ),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "n",
        "agree",
        fround(
            1.0 - nd * F.col("lin_o") / F.col("lin_e").cast("double"), 9
        ).alias("kappa_linear"),
        fround(
            1.0 - nd * F.col("quad_o") / F.col("quad_e").cast("double"), 9
        ).alias("kappa_quadratic"),
    )


# --- histogram bucket moments ------------------------------------------------------

_HBOUNDS = [10.0, 50.0, 100.0, 500.0]
_HMIDS = [5.0, 30.0, 75.0, 300.0, 500.0]  # (lo+hi)/2; +Inf -> top bound

_HMOM_ORACLE = """
    WITH h AS (
      SELECT event_type,
             CAST(count_if(value <= 10.0) AS BIGINT) AS c1,
             CAST(count_if(value <= 50.0) AS BIGINT) AS c2,
             CAST(count_if(value <= 100.0) AS BIGINT) AS c3,
             CAST(count_if(value <= 500.0) AS BIGINT) AS c4,
             CAST(count(value) AS BIGINT) AS cinf
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    d AS (
      SELECT event_type, cinf,
             c1 AS b1, c2 - c1 AS b2, c3 - c2 AS b3, c4 - c3 AS b4,
             cinf - c4 AS b5
      FROM h
    )
    SELECT event_type, cinf AS n,
           floor((5.0 * b1 + 30.0 * b2 + 75.0 * b3 + 300.0 * b4
                  + 500.0 * b5) / cinf * 1e6 + 0.5) / 1e6 AS mean_est,
           floor(sqrt((25.0 * b1 + 900.0 * b2 + 5625.0 * b3
                       + 90000.0 * b4 + 250000.0 * b5) / cinf
                      - ((5.0 * b1 + 30.0 * b2 + 75.0 * b3 + 300.0 * b4
                          + 500.0 * b5) / cinf)
                        * ((5.0 * b1 + 30.0 * b2 + 75.0 * b3 + 300.0 * b4
                            + 500.0 * b5) / cinf))
                 * 1e6 + 0.5) / 1e6 AS stddev_est
    FROM d ORDER BY event_type
    """


@query("promql_histogram_moments", oracle=_HMOM_ORACLE)
def promql_histogram_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stddev estimated FROM the cumulative `le` bucket ladder the
    reference exports (metrics.go:39-45) — the moment twin of
    histogram_quantile: decumulate the buckets, place each count at its
    bucket midpoint ((lo+hi)/2, +Inf clamped to the top finite bound per
    the quantile convention), and read mean and population stddev off
    the midpoint mixture. The whole computation is ONE expression tree
    over the per-series wide bucket counts, so no float reduction
    exists anywhere — the error vs the true moments is the binning, not
    the engine.

    100 TB: identical scan shape to promql_histogram_quantile — one
    map-side-combined fold into |buckets|+1 counters per series."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    aggs = [
        F.count_if(F.col("value") <= b).cast("bigint").alias(f"c{i+1}")
        for i, b in enumerate(_HBOUNDS)
    ] + [F.count("value").cast("bigint").alias("cinf")]
    h = e.groupBy("event_type").agg(*aggs)
    bs = [
        F.col("c1"),
        F.col("c2") - F.col("c1"),
        F.col("c3") - F.col("c2"),
        F.col("c4") - F.col("c3"),
        F.col("cinf") - F.col("c4"),
    ]
    mean = None
    m2 = None
    for mid, b in zip(_HMIDS, bs):
        t1 = F.lit(mid) * b
        t2 = F.lit(mid * mid) * b
        mean = t1 if mean is None else mean + t1
        m2 = t2 if m2 is None else m2 + t2
    mean = mean / F.col("cinf")
    return h.select(
        "event_type",
        F.col("cinf").alias("n"),
        fround(mean, 6).alias("mean_est"),
        fround(F.sqrt(m2 / F.col("cinf") - mean * mean), 6).alias(
            "stddev_est"
        ),
    ).orderBy("event_type")


# --- DeLong AUC confidence interval ----------------------------------------------

_DELONG_ORACLE = """
    WITH minmax AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    scored AS (
      SELECT CAST(floor((value - vmin) / (vmax - vmin) * 1e6 + 0.5) AS BIGINT)
               AS s_q,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events CROSS JOIN minmax WHERE value IS NOT NULL
    ),
    census AS (
      SELECT s_q, CAST(count_if(y = 1) AS BIGINT) AS p,
             CAST(count_if(y = 0) AS BIGINT) AS q
      FROM scored GROUP BY s_q
    ),
    cum AS (
      SELECT s_q, p, q,
             CAST(coalesce(sum(q) OVER (ORDER BY s_q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS qlt,
             CAST(coalesce(sum(p) OVER (ORDER BY s_q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS plt,
             CAST(sum(p) OVER () AS BIGINT) AS m,
             CAST(sum(q) OVER () AS BIGINT) AS nn
      FROM census
    ),
    terms AS (
      SELECT m, nn,
             CAST(sum(p * (2 * qlt + q)) AS BIGINT) AS a10,
             sum(CAST(p AS HUGEINT) * (2 * qlt + q) * (2 * qlt + q)) AS b10,
             CAST(sum(q * (2 * (m - plt - p) + p)) AS BIGINT) AS a01,
             sum(CAST(q AS HUGEINT) * (2 * (m - plt - p) + p)
                 * (2 * (m - plt - p) + p)) AS b01
      FROM cum GROUP BY m, nn
    )
    SELECT m AS n_pos, nn AS n_neg,
           floor(CAST(a10 AS DOUBLE) / (2.0 * m * nn) * 1e9 + 0.5) / 1e9
             AS auc,
           floor(sqrt(
             (CAST(b10 AS DOUBLE) / (4.0 * nn * nn)
              - m * (CAST(a10 AS DOUBLE) / (2.0 * m * nn))
                  * (CAST(a10 AS DOUBLE) / (2.0 * m * nn)))
             / (m - 1) / m
             + (CAST(b01 AS DOUBLE) / (4.0 * m * m)
                - nn * (CAST(a01 AS DOUBLE) / (2.0 * m * nn))
                    * (CAST(a01 AS DOUBLE) / (2.0 * m * nn)))
               / (nn - 1) / nn) * 1e9 + 0.5) / 1e9 AS se_auc,
           floor((CAST(a10 AS DOUBLE) / (2.0 * m * nn)
                  - 1.96 * sqrt(
             (CAST(b10 AS DOUBLE) / (4.0 * nn * nn)
              - m * (CAST(a10 AS DOUBLE) / (2.0 * m * nn))
                  * (CAST(a10 AS DOUBLE) / (2.0 * m * nn)))
             / (m - 1) / m
             + (CAST(b01 AS DOUBLE) / (4.0 * m * m)
                - nn * (CAST(a01 AS DOUBLE) / (2.0 * m * nn))
                    * (CAST(a01 AS DOUBLE) / (2.0 * m * nn)))
               / (nn - 1) / nn)) * 1e9 + 0.5) / 1e9 AS ci_lo,
           floor((CAST(a10 AS DOUBLE) / (2.0 * m * nn)
                  + 1.96 * sqrt(
             (CAST(b10 AS DOUBLE) / (4.0 * nn * nn)
              - m * (CAST(a10 AS DOUBLE) / (2.0 * m * nn))
                  * (CAST(a10 AS DOUBLE) / (2.0 * m * nn)))
             / (m - 1) / m
             + (CAST(b01 AS DOUBLE) / (4.0 * m * m)
                - nn * (CAST(a01 AS DOUBLE) / (2.0 * m * nn))
                    * (CAST(a01 AS DOUBLE) / (2.0 * m * nn)))
               / (nn - 1) / nn)) * 1e9 + 0.5) / 1e9 AS ci_hi
    FROM terms
    """


@query("ml_auc_delong_ci", oracle=_DELONG_ORACLE)
def ml_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong confidence interval for the ROC AUC (DeLong et al. 1988):
    the structural components V₁₀(positive) = F̂_neg-midrank and
    V₀₁(negative) = 1−F̂_pos-midrank fold onto the score-value census —
    per distinct score, 2n·V₁₀ = 2·neg_below + neg_at (an exact
    integer), so AUC, S₁₀, S₀₁ and Var(AUC) = S₁₀/m + S₀₁/n all derive
    from four integer sums. The 95% CI is the published normal
    interval. Same score/label construction as the ECE/Brier family —
    the AUC here matches ml_roc_pr_summary's with an honest standard
    error attached.

    100 TB: one scan → score census; two cumulative windows over value
    cardinality behind the aggregate; four integer reductions."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    minmax = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    norm = (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin"))
    scored = e.crossJoin(F.broadcast(minmax)).select(
        F.floor(norm * 1e6 + F.lit(0.5)).cast("bigint").alias("s_q"),
        F.when(F.col("event_type") == "error", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    census = scored.groupBy("s_q").agg(
        F.count_if(F.col("y") == 1).cast("bigint").alias("p"),
        F.count_if(F.col("y") == 0).cast("bigint").alias("q"),
    )
    wlt = Window.orderBy("s_q").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("s_q").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = census.select(
        "p",
        "q",
        F.coalesce(F.sum("q").over(wlt), F.lit(0)).cast("bigint").alias("qlt"),
        F.coalesce(F.sum("p").over(wlt), F.lit(0)).cast("bigint").alias("plt"),
        F.sum("p").over(wall).cast("bigint").alias("m"),
        F.sum("q").over(wall).cast("bigint").alias("nn"),
    )
    dec = "decimal(38,0)"
    v10x2n = 2 * F.col("qlt") + F.col("q")  # 2n * V10 at this score
    v01x2m = 2 * (F.col("m") - F.col("plt") - F.col("p")) + F.col("p")
    terms = cum.groupBy("m", "nn").agg(
        F.sum(F.col("p") * v10x2n).cast("bigint").alias("a10"),
        F.sum(F.col("p").cast(dec) * v10x2n * v10x2n).alias("b10"),
        F.sum(F.col("q") * v01x2m).cast("bigint").alias("a01"),
        F.sum(F.col("q").cast(dec) * v01x2m * v01x2m).alias("b01"),
    )
    md, nd = F.col("m").cast("double"), F.col("nn").cast("double")
    auc = F.col("a10").cast("double") / (2.0 * F.col("m") * F.col("nn"))
    s10 = (
        F.col("b10").cast("double") / (4.0 * F.col("nn") * F.col("nn"))
        - F.col("m") * auc * auc
    ) / (F.col("m") - 1) / F.col("m")
    s01 = (
        F.col("b01").cast("double") / (4.0 * F.col("m") * F.col("m"))
        - F.col("nn") * (F.col("a01").cast("double") / (2.0 * F.col("m") * F.col("nn")))
        * (F.col("a01").cast("double") / (2.0 * F.col("m") * F.col("nn")))
    ) / (F.col("nn") - 1) / F.col("nn")
    se = F.sqrt(s10 + s01)
    return terms.select(
        F.col("m").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        fround(auc, 9).alias("auc"),
        fround(se, 9).alias("se_auc"),
        fround(auc - 1.96 * se, 9).alias("ci_lo"),
        fround(auc + 1.96 * se, 9).alias("ci_hi"),
    )


# --- Brunner–Munzel test ------------------------------------------------------------

_BM_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             CAST(count_if(event_type = 'click') AS BIGINT) AS a,
             CAST(count_if(event_type = 'view') AS BIGINT) AS b
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')
      GROUP BY 1
    ),
    cum AS (
      SELECT v, a, b,
             CAST(coalesce(sum(a + b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS clt,
             CAST(coalesce(sum(a) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS alt,
             CAST(coalesce(sum(b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS blt,
             CAST(sum(a) OVER () AS BIGINT) AS n1,
             CAST(sum(b) OVER () AS BIGINT) AS n2
      FROM s
    ),
    -- doubled midranks: combined 2R = 2*clt + (a+b) + 1; within-group
    -- 2r1 = 2*alt + a + 1 (likewise group 2); D = 2R - 2r is even-exact
    terms AS (
      SELECT n1, n2,
             CAST(sum(a * ((2 * clt + a + b + 1) - (2 * alt + a + 1)))
                  AS BIGINT) AS d1,
             sum(CAST(a AS HUGEINT)
                 * ((2 * clt + a + b + 1) - (2 * alt + a + 1))
                 * ((2 * clt + a + b + 1) - (2 * alt + a + 1))) AS e1,
             CAST(sum(b * ((2 * clt + a + b + 1) - (2 * blt + b + 1)))
                  AS BIGINT) AS d2,
             sum(CAST(b AS HUGEINT)
                 * ((2 * clt + a + b + 1) - (2 * blt + b + 1))
                 * ((2 * clt + a + b + 1) - (2 * blt + b + 1))) AS e2
      FROM cum GROUP BY n1, n2
    )
    SELECT n1, n2,
           floor(CAST(d2 AS DOUBLE) / 2 / n2 / n1 * 1e9 + 0.5) / 1e9
             AS p_hat,
           CASE WHEN (CAST(e1 AS DOUBLE) / 4
                      - n1 * (CAST(d1 AS DOUBLE) / 2 / n1)
                          * (CAST(d1 AS DOUBLE) / 2 / n1)) / (n1 - 1) * n1
                     + (CAST(e2 AS DOUBLE) / 4
                        - n2 * (CAST(d2 AS DOUBLE) / 2 / n2)
                            * (CAST(d2 AS DOUBLE) / 2 / n2)) / (n2 - 1) * n2
                     > 0 THEN
             floor(CAST(n1 AS DOUBLE) * n2
                   * ((CAST(d2 AS DOUBLE) / 2 / n2)
                      - (CAST(d1 AS DOUBLE) / 2 / n1))
                   / (n1 + n2)
                   / sqrt((CAST(e1 AS DOUBLE) / 4
                           - n1 * (CAST(d1 AS DOUBLE) / 2 / n1)
                               * (CAST(d1 AS DOUBLE) / 2 / n1)) / (n1 - 1)
                            * n1
                          + (CAST(e2 AS DOUBLE) / 4
                             - n2 * (CAST(d2 AS DOUBLE) / 2 / n2)
                                 * (CAST(d2 AS DOUBLE) / 2 / n2)) / (n2 - 1)
                            * n2)
                   * 1e6 + 0.5) / 1e6
           END AS w_bm
    FROM terms
    """


@query("stats_brunner_munzel", oracle=_BM_ORACLE)
def stats_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner–Munzel test (Brunner & Munzel 2000, the scipy
    convention): the heteroskedasticity-robust replacement for
    Mann–Whitney — W = n₁n₂(R̄₂−R̄₁) / ((n₁+n₂)·√(n₁S₁²+n₂S₂²)) where
    Sₖ² is the variance of the rank DIFFERENCE Dᵢₖ = Rᵢₖ−rᵢₖ (combined
    midrank minus within-group midrank). Everything folds on the value
    census at DOUBLED-rank scale: 2R = 2·below+at+1, so D is an exact
    even integer per value, and ΣD, ΣD² are exact integer sums (the ½
    factors resolve in the final double expression). p̂ = D̄₂/(2n₂n₁)
    is the relative effect P(X<Y)+½P(X=Y) — identical to the MWU AUC
    but with the BM variance attached.

    100 TB: the same census-rank shape as Mann–Whitney/CvM — one
    map-side value fold, cumulative windows over value cardinality
    behind the aggregate, four integer reductions."""
    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    )
    s = e.groupBy(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v")
    ).agg(
        F.count_if(F.col("event_type") == "click").cast("bigint").alias("a"),
        F.count_if(F.col("event_type") == "view").cast("bigint").alias("b"),
    )
    wlt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = s.select(
        "a",
        "b",
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(wlt), F.lit(0))
        .cast("bigint")
        .alias("clt"),
        F.coalesce(F.sum("a").over(wlt), F.lit(0)).cast("bigint").alias("alt"),
        F.coalesce(F.sum("b").over(wlt), F.lit(0)).cast("bigint").alias("blt"),
        F.sum("a").over(wall).cast("bigint").alias("n1"),
        F.sum("b").over(wall).cast("bigint").alias("n2"),
    )
    dec = "decimal(38,0)"
    da = (2 * F.col("clt") + F.col("a") + F.col("b") + 1) - (
        2 * F.col("alt") + F.col("a") + 1
    )
    db = (2 * F.col("clt") + F.col("a") + F.col("b") + 1) - (
        2 * F.col("blt") + F.col("b") + 1
    )
    terms = cum.groupBy("n1", "n2").agg(
        F.sum(F.col("a") * da).cast("bigint").alias("d1"),
        F.sum(F.col("a").cast(dec) * da * da).alias("e1"),
        F.sum(F.col("b") * db).cast("bigint").alias("d2"),
        F.sum(F.col("b").cast(dec) * db * db).alias("e2"),
    )
    d1m = F.col("d1").cast("double") / 2 / F.col("n1")
    d2m = F.col("d2").cast("double") / 2 / F.col("n2")
    s1n1 = (
        (F.col("e1").cast("double") / 4 - F.col("n1") * d1m * d1m)
        / (F.col("n1") - 1)
        * F.col("n1")
    )
    s2n2 = (
        (F.col("e2").cast("double") / 4 - F.col("n2") * d2m * d2m)
        / (F.col("n2") - 1)
        * F.col("n2")
    )
    w = (
        F.col("n1").cast("double")
        * F.col("n2")
        * (d2m - d1m)
        / (F.col("n1") + F.col("n2"))
        / F.sqrt(s1n1 + s2n2)
    )
    return terms.select(
        "n1",
        "n2",
        fround(d2m / F.col("n1"), 9).alias("p_hat"),
        F.when(s1n1 + s2n2 > 0, fround(w, 6)).alias("w_bm"),
    )
