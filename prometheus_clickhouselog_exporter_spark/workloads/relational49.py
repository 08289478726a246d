"""Round 10 batch: Durbin–Watson residual autocorrelation, two-sample
Cramér–von Mises, PromQL irate()/idelta(), PromQL subquery semantics
(max_over_time(rate(...)[2h:30m])), and closed-form ridge regression —
all integer-moment exact, DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) exports Prometheus histograms/counters but has no
query engine; the PromQL rows here implement the PUBLISHED PromQL
evaluation semantics over the reference's metric shapes (§2.3
north-star). Methods are public: Durbin & Watson 1950, Anderson 1962
(two-sample CvM), Prometheus query docs (irate/idelta/subqueries),
Hoerl & Kennard 1970 (ridge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Durbin–Watson over daily revenue residuals ----------------------------

_DW_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS pri,
             CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
               AS x,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1, o_orderdate
    ),
    mo AS (
      SELECT pri,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy
      FROM daily GROUP BY pri
    ),
    fit AS (
      SELECT pri, n,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM mo
    ),
    res AS (
      SELECT d.pri, d.x,
             CAST(floor((CAST(d.y AS DOUBLE)
                         - (f.syd - f.b * f.sxd) / f.n
                         - f.b * d.x) + 0.5) AS BIGINT) AS e
      FROM daily d JOIN fit f ON d.pri = f.pri
    ),
    lagged AS (
      SELECT pri, e,
             e - lag(e) OVER (PARTITION BY pri ORDER BY x) AS de
      FROM res
    ),
    dw AS (
      SELECT pri,
             CAST(count(*) AS BIGINT) AS n_days,
             sum(CAST(e AS HUGEINT) * e) AS see,
             sum(CAST(de AS HUGEINT) * de) AS sdd
      FROM lagged GROUP BY pri
    )
    SELECT d.pri AS o_orderpriority, d.n_days,
           floor(f.b * 1e6 + 0.5) / 1e6 AS slope_cents_per_day,
           floor(CAST(d.sdd AS DOUBLE) / CAST(d.see AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS dw_stat,
           floor((1.0 - CAST(d.sdd AS DOUBLE) / CAST(d.see AS DOUBLE) / 2.0)
                 * 1e6 + 0.5) / 1e6 AS rho_lag1
    FROM dw d JOIN fit f ON d.pri = f.pri
    ORDER BY o_orderpriority
    """


@query("stats_durbin_watson", oracle=_DW_ORACLE)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson d (Durbin & Watson 1950) on the residuals of a
    per-priority OLS of daily revenue vs time: d = Σ(eₜ−eₜ₋₁)²/Σeₜ²,
    with ρ̂ ≈ 1−d/2 the implied lag-1 residual autocorrelation — the
    canonical "is the trend fit missing serial structure" diagnostic.
    The fit uses exact DECIMAL moments (cents × day index) and a Cramer
    slope; residuals are quantized to whole cents BEFORE the squared
    sums, so both engines reduce exact integers in any order.

    100 TB: one groupBy(priority, date) census bounds everything
    downstream to calendar cardinality; the lag window rides that
    aggregate (5 × |days| rows); moments join back via a 5-row
    broadcast. No corpus-sized window, no float reduction anywhere."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.sum(cents).cast("bigint").alias("y"))
        .localCheckpoint(eager=False)  # consumers: moments + residual pass
    )
    dec = "decimal(38,0)"
    mo = daily.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    fit = mo.select(
        "pri",
        "n",
        (
            (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("b"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    )
    res = daily.join(F.broadcast(fit), "pri").select(
        "pri",
        "x",
        F.floor(
            F.col("y").cast("double")
            - (F.col("syd") - F.col("b") * F.col("sxd")) / F.col("n")
            - F.col("b") * F.col("x")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("e"),
        "b",
    )
    w = Window.partitionBy("pri").orderBy("x")
    lagged = res.select(
        "pri", "e", "b", (F.col("e") - F.lag("e").over(w)).alias("de")
    )
    dw = lagged.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("e").cast(dec) * F.col("e")).alias("see"),
        F.sum(F.col("de").cast(dec) * F.col("de")).alias("sdd"),
        F.any_value("b").alias("b"),
    )
    ratio = F.col("sdd").cast("double") / F.col("see").cast("double")
    return dw.select(
        F.col("pri").alias("o_orderpriority"),
        "n_days",
        fround(F.col("b"), 6).alias("slope_cents_per_day"),
        fround(ratio, 6).alias("dw_stat"),
        fround(F.lit(1.0) - ratio / 2.0, 6).alias("rho_lag1"),
    ).orderBy("o_orderpriority")


# --- two-sample Cramér–von Mises (census form) ------------------------------

_CVM_ORACLE = """
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
             CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
             CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb,
             CAST(sum(a) OVER () AS BIGINT) AS n,
             CAST(sum(b) OVER () AS BIGINT) AS m
      FROM s
    ),
    term AS (
      SELECT n, m,
             sum(CAST(a + b AS HUGEINT)
                 * (m * ca - n * cb)
                 * (m * ca - n * cb)) AS u
      FROM cum
      GROUP BY n, m
    )
    SELECT n, m,
           CAST(u AS DOUBLE) AS u_scaled,
           floor(CAST(u AS DOUBLE)
                 / (CAST(n AS DOUBLE) * m * (n + m) * (n + m) * (n + m))
                 * CAST(n + m AS DOUBLE) * 1e9 + 0.5) / 1e9 AS t_cvm
    FROM term
    """


@query("stats_cramer_von_mises", oracle=_CVM_ORACLE)
def stats_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises statistic (Anderson 1962, ECDF form
    with ties): T = nm/N² · Σ_observations (F̂(z)−Ĝ(z))², folded over the
    VALUE CENSUS — at each distinct cent value with counts (a,b) and
    inclusive cumulatives (A,B), all a+b observations contribute the
    same (A/n − B/m)², kept exact as (mA − nB)²/(n²m²) in DECIMAL(38).
    Complements the KS battery (sup-norm) with the integrated-square
    distance between the click and view value distributions.

    100 TB: the corpus folds map-side to per-cent-value census rows;
    the single cumulative window runs over value cardinality (bounded,
    behind the aggregate — the plan_audit invariant); scalars (n,m)
    enter via the whitelisted 1-row broadcast. Zero float reductions —
    the only doubles are the final two divisions."""
    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    )
    s = e.groupBy(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v")
    ).agg(
        F.count_if(F.col("event_type") == "click").cast("bigint").alias("a"),
        F.count_if(F.col("event_type") == "view").cast("bigint").alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # totals ride the SAME single sorted exchange as the cumulatives —
    # one WindowExec computes all four frames, no rescan, no cross join
    cum = s.select(
        "a",
        "b",
        F.sum("a").over(w).cast("bigint").alias("ca"),
        F.sum("b").over(w).cast("bigint").alias("cb"),
        F.sum("a").over(wall).cast("bigint").alias("n"),
        F.sum("b").over(wall).cast("bigint").alias("m"),
    )
    dec = "decimal(38,0)"
    diff = F.col("m") * F.col("ca") - F.col("n") * F.col("cb")
    term = cum.groupBy("n", "m").agg(
        F.sum((F.col("a") + F.col("b")).cast(dec) * diff * diff).alias("u")
    )
    nd, md = F.col("n").cast("double"), F.col("m").cast("double")
    big_n = nd + md
    return term.select(
        "n",
        "m",
        F.col("u").cast("double").alias("u_scaled"),
        fround(
            F.col("u").cast("double") / (nd * md * big_n * big_n * big_n) * big_n,
            9,
        ).alias("t_cvm"),
    )


# --- PromQL irate() / idelta() ----------------------------------------------

_IRATE_ORACLE = """
    WITH s AS (
      SELECT event_type, ts, event_id, epoch_us(ts) AS us,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS g,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY ts, event_id)
               % 50000000 AS c
      FROM events WHERE value IS NOT NULL
    ),
    eligible AS (
      SELECT *, date_trunc('hour', ts) + INTERVAL 1 HOUR AS h
      FROM s WHERE minute(ts) >= 30
    ),
    rn AS (
      SELECT *, row_number() OVER (PARTITION BY event_type, h
                                   ORDER BY ts DESC, event_id DESC) AS r
      FROM eligible
    ),
    win AS (
      SELECT event_type, h,
             CAST(count(*) AS BIGINT) AS n_win,
             max(CASE WHEN r = 1 THEN c END) AS c1,
             max(CASE WHEN r = 2 THEN c END) AS c2,
             max(CASE WHEN r = 1 THEN g END) AS g1,
             max(CASE WHEN r = 2 THEN g END) AS g2,
             max(CASE WHEN r = 1 THEN us END) AS t1,
             max(CASE WHEN r = 2 THEN us END) AS t2
      FROM rn GROUP BY event_type, h
    )
    SELECT event_type, h AS eval_ts, n_win,
           CAST(g1 - g2 AS BIGINT) AS idelta_cents,
           CASE WHEN t1 > t2 THEN
             floor(CAST(CASE WHEN c1 - c2 < 0 THEN c1 ELSE c1 - c2 END
                        AS DOUBLE) * 1e6 / (t1 - t2) * 1e6 + 0.5) / 1e6
           END AS irate_cents_per_s
    FROM win WHERE c2 IS NOT NULL
    ORDER BY event_type, eval_ts
    """


@query("promql_irate_idelta", oracle=_IRATE_ORACLE)
def promql_irate_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``irate()`` / ``idelta()`` (published semantics: the LAST
    TWO samples in the lookback window, not the window endpoints) at an
    hourly eval grid with a 30-minute lookback: idelta = gauge last−prev;
    irate = counter (last−prev)/Δt with the documented reset rule (a
    drop means restart-from-zero, so the post-reset value IS the
    increase). The counter is the same deterministic integer-cents
    cumulative-mod sawtooth as promql_rate_counter_resets; Δt is exact
    epoch microseconds; a zero-Δt pair yields NULL (guard, not crash).

    Because lookback (30 m) ≤ grid step (1 h), a sample is eligible for
    at most ONE eval point (minute ≥ 30 → next hour) — the grid
    assignment is a projection, not a range join.

    100 TB: per-series cumulative fold is the standard TSDB shard
    shape; the top-2 window partitions by (series, eval hour) —
    calendar-bounded cardinality, ~samples/30min rows each. One shuffle
    on series, one on (series, hour)."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    wc = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        "ts",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        cents.alias("g"),
        (F.sum(cents).over(wc) % 50000000).alias("c"),
    )
    eligible = s.where(F.minute("ts") >= 30).withColumn(
        "h", F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")
    )
    wr = Window.partitionBy("event_type", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = eligible.withColumn("r", F.row_number().over(wr))
    pick = lambda col, r: F.max(F.when(F.col("r") == r, F.col(col)))  # noqa: E731
    win = rn.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_win"),
        pick("c", 1).alias("c1"),
        pick("c", 2).alias("c2"),
        pick("g", 1).alias("g1"),
        pick("g", 2).alias("g2"),
        pick("us", 1).alias("t1"),
        pick("us", 2).alias("t2"),
    )
    corrected = F.when(
        F.col("c1") - F.col("c2") < 0, F.col("c1")
    ).otherwise(F.col("c1") - F.col("c2"))
    return (
        win.where(F.col("c2").isNotNull())
        .select(
            "event_type",
            F.col("h").alias("eval_ts"),
            "n_win",
            (F.col("g1") - F.col("g2")).cast("bigint").alias("idelta_cents"),
            F.when(
                F.col("t1") > F.col("t2"),
                fround(
                    corrected.cast("double") * 1e6 / (F.col("t1") - F.col("t2")),
                    6,
                ),
            ).alias("irate_cents_per_s"),
        )
        .orderBy("event_type", "eval_ts")
    )


# --- PromQL subquery: max_over_time(rate(c[30m])[2h:30m]) --------------------

_SUBQ_ORACLE = """
    WITH s AS (
      SELECT event_type, ts, event_id, epoch_us(ts) AS us,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY ts, event_id)
               % 50000000 AS c
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT event_type, us, c,
             c - lag(c) OVER (PARTITION BY event_type ORDER BY us, event_id)
               AS dc
      FROM s
    ),
    inner_pts AS (
      SELECT event_type,
             ((us + 1799999999) // 1800000000) * 1800 AS p_s,
             CAST(sum(CASE WHEN dc < 0 THEN c ELSE dc END) AS BIGINT) AS inc
      FROM d WHERE dc IS NOT NULL
      GROUP BY event_type, p_s
    ),
    rated AS (
      SELECT event_type, p_s, (inc * 1000000) // 1800 AS rate_q6,
             ((p_s + 21599) // 21600) * 21600 AS big_p
      FROM inner_pts
    )
    SELECT event_type, big_p AS eval_epoch_s,
           CAST(count(*) AS BIGINT) AS n_inner,
           floor(CAST(max(rate_q6) AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
             AS max_rate_cents_per_s,
           floor(CAST(sum(rate_q6) AS DOUBLE) / count(*) / 1e6 * 1e6 + 0.5)
             / 1e6 AS avg_rate_cents_per_s
    FROM rated WHERE p_s > big_p - 7200
    GROUP BY event_type, big_p
    ORDER BY event_type, eval_epoch_s
    """


@query("promql_subquery_maxrate", oracle=_SUBQ_ORACLE)
def promql_subquery_maxrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL SUBQUERY semantics — ``max_over_time(rate(c[30m])[2h:30m])``
    at a 6-hour outer grid: the inner expression (delta-attributed
    30-minute increase rate, reset-corrected) is evaluated at its OWN
    30-minute grid, then the outer max/avg folds the inner points inside
    each eval point's trailing 2 h. Since the outer range (2 h) < step
    (6 h), only the last 4 inner points per block survive — exactly the
    published subquery windowing. Inner rates are exact integer
    micro-cents/s (inc·10⁶ div 1800), so the outer max/avg reduce
    integers.

    Increase attribution: each sample's reset-corrected delta (vs its
    predecessor) is credited to the sample's own 30-min bucket — the
    tiling form of increase() that sums to the true counter growth
    across buckets (documented simplification vs boundary
    extrapolation, which promql_increase_extrapolated covers).

    100 TB: series-keyed cumulative + lag (TSDB shard shape), then two
    keyed aggregations (series × 30-min), (series × 6-h) — cardinality
    collapses at each step; grid assignment is integer arithmetic, not
    a range join."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    wc = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.sum(cents).over(wc) % 50000000).alias("c"),
    )
    wl = Window.partitionBy("event_type").orderBy("us", "event_id")
    d = s.select(
        "event_type", "us", "c", (F.col("c") - F.lag("c").over(wl)).alias("dc")
    ).where(F.col("dc").isNotNull())
    inner = d.groupBy(
        "event_type",
        (F.expr("(us + 1799999999) div 1800000000") * 1800).alias("p_s"),
    ).agg(
        F.sum(F.when(F.col("dc") < 0, F.col("c")).otherwise(F.col("dc")))
        .cast("bigint")
        .alias("inc")
    )
    rated = inner.select(
        "event_type",
        "p_s",
        F.expr("(inc * 1000000) div 1800").alias("rate_q6"),
        (F.expr("(p_s + 21599) div 21600") * 21600).alias("big_p"),
    )
    return (
        rated.where(F.col("p_s") > F.col("big_p") - 7200)
        .groupBy("event_type", F.col("big_p").alias("eval_epoch_s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_inner"),
            fround(F.max("rate_q6").cast("double") / 1e6, 6).alias(
                "max_rate_cents_per_s"
            ),
            fround(
                F.sum("rate_q6").cast("double") / F.count(F.lit(1)) / 1e6, 6
            ).alias("avg_rate_cents_per_s"),
        )
        .orderBy("event_type", "eval_epoch_s")
    )


# --- closed-form ridge regression -------------------------------------------

_RIDGE_ORACLE = """
    WITH raw AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS DECIMAL(38,0)) AS s1,
             CAST(sum(x2) AS DECIMAL(38,0)) AS s2,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(x1 * x1) AS DECIMAL(38,0)) AS s11,
             CAST(sum(x1 * x2) AS DECIMAL(38,0)) AS s12,
             CAST(sum(x2 * x2) AS DECIMAL(38,0)) AS s22,
             CAST(sum(x1 * y) AS DECIMAL(38,0)) AS s1y,
             CAST(sum(x2 * y) AS DECIMAL(38,0)) AS s2y
      FROM raw
    ),
    cen AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a11,
             CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a12,
             CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a22,
             CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS b1,
             CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS b2,
             CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
             CAST(sy AS DOUBLE) AS syd
      FROM mo
    ),
    lams AS (SELECT unnest([0.0, 1.0, 10.0, 100.0]) AS lam),
    solved AS (
      SELECT l.lam, c.n,
             ((c.b1 * (c.a22 + l.lam * c.n * c.n)
               - c.a12 * c.b2)
              / ((c.a11 + l.lam * c.n * c.n) * (c.a22 + l.lam * c.n * c.n)
                 - c.a12 * c.a12)) AS bq,
             (((c.a11 + l.lam * c.n * c.n) * c.b2
               - c.a12 * c.b1)
              / ((c.a11 + l.lam * c.n * c.n) * (c.a22 + l.lam * c.n * c.n)
                 - c.a12 * c.a12)) AS bd,
             c.s1d, c.s2d, c.syd
      FROM lams l CROSS JOIN cen c
    )
    SELECT lam,
           floor(bq * 1e6 + 0.5) / 1e6 AS beta_qty_cents,
           floor(bd * 1e6 + 0.5) / 1e6 AS beta_disc_cents,
           floor((syd - bq * s1d - bd * s2d) / n / 100.0 * 1e6 + 0.5) / 1e6
             AS intercept_dollars
    FROM solved ORDER BY lam
    """


@query("ml_ridge_cramer", oracle=_RIDGE_ORACLE)
def ml_ridge_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (Hoerl & Kennard 1970) of price
    cents on (quantity, discount-cents) for a λ ladder {0,1,10,100}:
    β = (XᶜᵀXᶜ + λnI)⁻¹ Xᶜᵀy via the n-scaled centered normal equations
    (A + λn²I)β = b, solved by 2×2 Cramer — λ=0 reproduces the OLS twin
    (ml_ols_cramer family) and the ladder exhibits monotone coefficient
    shrinkage. All nine raw moments are exact DECIMAL(38) sums; the λ
    sweep reuses ONE moment pass (explode over the 1-row moments).

    100 TB: one map-side-combined scan produces nine numbers; the
    solve is constant work. This is the canonical "moments-then-solve"
    shape every exact linear model here rides."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    mo = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x1").cast(dec)).alias("s1"),
        F.sum(F.col("x2").cast(dec)).alias("s2"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x1") * F.col("x1")).cast(dec)).alias("s11"),
        F.sum((F.col("x1") * F.col("x2")).cast(dec)).alias("s12"),
        F.sum((F.col("x2") * F.col("x2")).cast(dec)).alias("s22"),
        F.sum(F.col("x1").cast(dec) * F.col("y")).alias("s1y"),
        F.sum(F.col("x2").cast(dec) * F.col("y")).alias("s2y"),
    )
    nd = F.col("n").cast("double")

    def d(c):
        return F.col(c).cast("double")

    cen = mo.select(
        "n",
        (nd * d("s11") - d("s1") * d("s1")).alias("a11"),
        (nd * d("s12") - d("s1") * d("s2")).alias("a12"),
        (nd * d("s22") - d("s2") * d("s2")).alias("a22"),
        (nd * d("s1y") - d("s1") * d("sy")).alias("b1"),
        (nd * d("s2y") - d("s2") * d("sy")).alias("b2"),
        d("s1").alias("s1d"),
        d("s2").alias("s2d"),
        d("sy").alias("syd"),
    )
    lam = F.explode(F.array(*[F.lit(v) for v in (0.0, 1.0, 10.0, 100.0)])).alias(
        "lam"
    )
    sl = cen.select("*", lam)
    r = F.col("lam") * F.col("n").cast("double") * F.col("n").cast("double")
    det = (F.col("a11") + r) * (F.col("a22") + r) - F.col("a12") * F.col("a12")
    bq = (F.col("b1") * (F.col("a22") + r) - F.col("a12") * F.col("b2")) / det
    bd = ((F.col("a11") + r) * F.col("b2") - F.col("a12") * F.col("b1")) / det
    return sl.select(
        "lam",
        fround(bq, 6).alias("beta_qty_cents"),
        fround(bd, 6).alias("beta_disc_cents"),
        fround(
            (F.col("syd") - bq * F.col("s1d") - bd * F.col("s2d"))
            / F.col("n")
            / 100.0,
            6,
        ).alias("intercept_dollars"),
    ).orderBy("lam")
