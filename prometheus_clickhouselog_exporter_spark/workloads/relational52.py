"""Round 10 batch: Granger causality, Bollinger/RSI technical
indicators, Page's trend test, and PromQL vector-matching semantics —
DuckDB-oracle-checked, integer-moment exact.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these; §2.3 north-star territory. Methods
are public: Granger 1969, Bollinger 1980s / Wilder 1978 (SMA-RSI
variant), Page 1963, Prometheus vector-matching docs (on/group_left).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Granger causality over hourly series ------------------------------------

_GRANGER_ORACLE = """
    WITH hc AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS xc,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS yc
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    bounds AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hc),
    grid AS (SELECT unnest(generate_series(h0, h1)) AS hr FROM bounds),
    full_g AS (
      SELECT g.hr, coalesce(h.xc, 0) AS x, coalesce(h.yc, 0) AS y
      FROM grid g LEFT JOIN hc h USING (hr)
    ),
    lagged AS (
      SELECT y, x,
             lag(y) OVER (ORDER BY hr) AS u,
             lag(x) OVER (ORDER BY hr) AS v
      FROM full_g
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS DECIMAL(38,0)) AS sy,
             CAST(sum(x) AS DECIMAL(38,0)) AS sx,
             CAST(sum(u) AS DECIMAL(38,0)) AS su,
             CAST(sum(v) AS DECIMAL(38,0)) AS sv,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(u AS HUGEINT) * u) AS suu,
             sum(CAST(v AS HUGEINT) * v) AS svv,
             sum(CAST(u AS HUGEINT) * y) AS suy,
             sum(CAST(v AS HUGEINT) * y) AS svy,
             sum(CAST(u AS HUGEINT) * x) AS sux,
             sum(CAST(v AS HUGEINT) * x) AS svx,
             sum(CAST(u AS HUGEINT) * v) AS suv
      FROM lagged WHERE u IS NOT NULL
    ),
    a AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS ayy,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS axx,
             CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
               - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS auu,
             CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) AS avv,
             CAST(n AS DOUBLE) * CAST(suy AS DOUBLE)
               - CAST(su AS DOUBLE) * CAST(sy AS DOUBLE) AS auy,
             CAST(n AS DOUBLE) * CAST(svy AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(sy AS DOUBLE) AS avy,
             CAST(n AS DOUBLE) * CAST(sux AS DOUBLE)
               - CAST(su AS DOUBLE) * CAST(sx AS DOUBLE) AS aux,
             CAST(n AS DOUBLE) * CAST(svx AS DOUBLE)
               - CAST(sv AS DOUBLE) * CAST(sx AS DOUBLE) AS avx,
             CAST(n AS DOUBLE) * CAST(suv AS DOUBLE)
               - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE) AS auv
      FROM mo
    ),
    dirs AS (
      -- x->y: y on (own lag u, cross lag v); restricted drops v
      SELECT 'x->y' AS direction, n,
             (ayy - auy * auy / auu) / n AS rss_r,
             (ayy - ((auy * avv - auv * avy)
                     / (auu * avv - auv * auv)) * auy
                  - ((auu * avy - auv * auy)
                     / (auu * avv - auv * auv)) * avy) / n AS rss_u,
             (auu * avy - auv * auy) / (auu * avv - auv * auv) AS beta_cross
      FROM a
      UNION ALL
      -- y->x: x on (own lag v, cross lag u); restricted drops u
      SELECT 'y->x' AS direction, n,
             (axx - avx * avx / avv) / n AS rss_r,
             (axx - ((avx * auu - auv * aux)
                     / (avv * auu - auv * auv)) * avx
                  - ((avv * aux - auv * avx)
                     / (avv * auu - auv * auv)) * aux) / n AS rss_u,
             (avv * aux - auv * avx) / (avv * auu - auv * auv) AS beta_cross
      FROM a
    )
    SELECT direction, n,
           CASE WHEN rss_u > 0 THEN
             floor((rss_r - rss_u) * (n - 3) / rss_u * 1e6 + 0.5) / 1e6
           END AS f_stat,
           floor(beta_cross * 1e6 + 0.5) / 1e6 AS beta_cross
    FROM dirs ORDER BY direction
    """


@query("stats_granger_causality", oracle=_GRANGER_ORACLE)
def stats_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality (Granger 1969) between the hourly click
    and purchase revenue series, BOTH directions: F = ((RSS_r −
    RSS_u)/1)/(RSS_u/(n−3)) comparing yₜ ~ yₜ₋₁ against yₜ ~ yₜ₋₁ + xₜ₋₁
    (and the mirror). The hourly grid is zero-filled between the
    series' bounds so lags are true calendar lags, not observation
    lags; all 14 moment sums are exact (DECIMAL/HUGEINT), and every
    RSS/beta is the identical double expression over them.

    100 TB: one scan → calendar-bounded hourly census; the lag window
    rides the census; the two directions are two projections of ONE
    1-row moment frame (no rescan). This is the moments-then-solve
    shape of the OLS family extended to a nested-model F test."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    hc = e.groupBy(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").alias("hr")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0))
        .cast("bigint")
        .alias("xc"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("bigint")
        .alias("yc"),
    )
    bounds = hc.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("hr"))
    full_g = grid.join(hc, "hr", "left").select(
        "hr",
        F.coalesce(F.col("xc"), F.lit(0)).alias("x"),
        F.coalesce(F.col("yc"), F.lit(0)).alias("y"),
    )
    w = Window.orderBy("hr")
    lagged = full_g.select(
        "y",
        "x",
        F.lag("y").over(w).alias("u"),
        F.lag("x").over(w).alias("v"),
    ).where(F.col("u").isNotNull())
    dec = "decimal(38,0)"

    def sq(a, b):
        return F.sum(F.col(a).cast(dec) * F.col(b)).alias(f"s{a}{b}")

    mo = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("u").cast(dec)).alias("su"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
        sq("y", "y"),
        sq("x", "x"),
        sq("u", "u"),
        sq("v", "v"),
        sq("u", "y"),
        sq("v", "y"),
        sq("u", "x"),
        sq("v", "x"),
        sq("u", "v"),
    ).localCheckpoint(eager=False)  # two direction projections

    nd = F.col("n").cast("double")

    def A(ab, a_, b_):
        return (
            nd * F.col(f"s{ab}").cast("double")
            - F.col(f"s{a_}").cast("double") * F.col(f"s{b_}").cast("double")
        )

    a = mo.select(
        "n",
        A("yy", "y", "y").alias("ayy"),
        A("xx", "x", "x").alias("axx"),
        A("uu", "u", "u").alias("auu"),
        A("vv", "v", "v").alias("avv"),
        A("uy", "u", "y").alias("auy"),
        A("vy", "v", "y").alias("avy"),
        A("ux", "u", "x").alias("aux"),
        A("vx", "v", "x").alias("avx"),
        A("uv", "u", "v").alias("auv"),
    )

    def direction(tag, tgt, own, cross):
        att = F.col(f"a{tgt}{tgt}")
        aoo = F.col(f"a{own}{own}")
        acc = F.col(f"a{cross}{cross}")
        aot = F.col(f"a{own}{tgt}") if f"a{own}{tgt}" in (
            "auy", "avy", "aux", "avx"
        ) else F.col(f"a{tgt}{own}")
        act = F.col(f"a{cross}{tgt}") if f"a{cross}{tgt}" in (
            "auy", "avy", "aux", "avx"
        ) else F.col(f"a{tgt}{cross}")
        aoc = F.col("auv")
        det = aoo * acc - aoc * aoc
        b_own = (aot * acc - aoc * act) / det
        b_cross = (aoo * act - aoc * aot) / det
        rss_r = (att - aot * aot / aoo) / F.col("n")
        rss_u = (att - b_own * aot - b_cross * act) / F.col("n")
        return a.select(
            F.lit(tag).alias("direction"),
            "n",
            F.when(
                rss_u > 0, fround((rss_r - rss_u) * (nd - 3) / rss_u, 6)
            ).alias("f_stat"),  # perfect unrestricted fit -> NULL, not a crash
            fround(b_cross, 6).alias("beta_cross"),
        )

    return direction("x->y", "y", "u", "v").unionByName(
        direction("y->x", "x", "v", "u")
    ).orderBy("direction")


# --- Bollinger bands + SMA-RSI over daily revenue -----------------------------

_TECH_ORACLE = """
    WITH daily AS (
      SELECT o_orderpriority AS pri, o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM orders GROUP BY pri, day
    ),
    win AS (
      SELECT pri, day, c,
             CAST(sum(c) OVER w20 AS HUGEINT) AS s20,
             sum(CAST(c AS HUGEINT) * c) OVER w20 AS s20sq,
             CAST(count(*) OVER w20 AS BIGINT) AS cnt20,
             c - lag(c) OVER (PARTITION BY pri ORDER BY day) AS delta
      FROM daily
      WINDOW w20 AS (PARTITION BY pri ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    rsi AS (
      SELECT pri, day, c, s20, s20sq, cnt20,
             CAST(sum(greatest(delta, 0)) OVER w14 AS BIGINT) AS sg,
             CAST(sum(greatest(-delta, 0)) OVER w14 AS BIGINT) AS sl,
             CAST(count(delta) OVER w14 AS BIGINT) AS cnt14
      FROM win
      WINDOW w14 AS (PARTITION BY pri ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT pri AS o_orderpriority, CAST(day AS VARCHAR) AS day,
           c AS revenue_cents,
           floor(CAST(s20 AS DOUBLE) / 20 * 1e4 + 0.5) / 1e4 AS ma20,
           floor((CAST(s20 AS DOUBLE) / 20
                  + 2 * sqrt((CAST(s20sq AS DOUBLE)
                              - CAST(s20 AS DOUBLE) * s20 / 20) / 20))
                 * 1e4 + 0.5) / 1e4 AS bb_upper,
           floor((CAST(s20 AS DOUBLE) / 20
                  - 2 * sqrt((CAST(s20sq AS DOUBLE)
                              - CAST(s20 AS DOUBLE) * s20 / 20) / 20))
                 * 1e4 + 0.5) / 1e4 AS bb_lower,
           CASE WHEN sg + sl > 0 THEN
             floor(100.0 * sg / (sg + sl) * 1e4 + 0.5) / 1e4
           END AS rsi14
    FROM rsi WHERE cnt20 = 20 AND cnt14 = 14
    ORDER BY o_orderpriority, day
    """


@query("timeseries_technical_indicators", oracle=_TECH_ORACLE)
def timeseries_technical_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-day MA ± 2σ, population σ) and the SMA
    variant of Wilder's RSI-14 over per-priority daily revenue — the
    classic streaming-window technical battery. Window sums are exact
    integers (cents, cents² in DECIMAL/HUGEINT); σ comes from the
    Σc²−(Σc)²/n identity and IEEE sqrt; RSI = 100·Σgain/(Σgain+Σloss)
    over trailing-14 deltas is a ratio of exact integers (flat-window
    guard → NULL). Rows emit only when both windows are full — no
    partial-window edge semantics to diverge on.

    100 TB: one groupBy(priority, day) census bounds everything to
    calendar cardinality; the three trailing frames share ONE sort per
    priority partition (Spark computes same-spec frames in one
    WindowExec). The daily aggregate is where the corpus collapses —
    the indicator math is O(days)."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"), F.col("o_orderdate").alias("day")
        )
        .agg(F.sum(cents).cast("bigint").alias("c"))
    )
    dec = "decimal(38,0)"
    w20 = Window.partitionBy("pri").orderBy("day").rowsBetween(-19, 0)
    wlag = Window.partitionBy("pri").orderBy("day")
    win = daily.select(
        "pri",
        "day",
        "c",
        F.sum(F.col("c").cast(dec)).over(w20).alias("s20"),
        F.sum((F.col("c").cast(dec) * F.col("c"))).over(w20).alias("s20sq"),
        F.count(F.lit(1)).over(w20).cast("bigint").alias("cnt20"),
        (F.col("c") - F.lag("c").over(wlag)).alias("delta"),
    )
    w14 = Window.partitionBy("pri").orderBy("day").rowsBetween(-13, 0)
    rsi = win.select(
        "pri",
        "day",
        "c",
        "s20",
        "s20sq",
        "cnt20",
        F.sum(F.greatest(F.col("delta"), F.lit(0)))
        .over(w14)
        .cast("bigint")
        .alias("sg"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0)))
        .over(w14)
        .cast("bigint")
        .alias("sl"),
        F.count("delta").over(w14).cast("bigint").alias("cnt14"),
    )
    s20d = F.col("s20").cast("double")
    sd = F.sqrt(
        (F.col("s20sq").cast("double") - s20d * F.col("s20").cast("double") / 20)
        / 20
    )
    return (
        rsi.where((F.col("cnt20") == 20) & (F.col("cnt14") == 14))
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.col("day").cast("string").alias("day"),
            F.col("c").alias("revenue_cents"),
            fround(s20d / 20, 4).alias("ma20"),
            fround(s20d / 20 + 2 * sd, 4).alias("bb_upper"),
            fround(s20d / 20 - 2 * sd, 4).alias("bb_lower"),
            F.when(
                F.col("sg") + F.col("sl") > 0,
                fround(
                    100.0 * F.col("sg") / (F.col("sg") + F.col("sl")), 4
                ),
            ).alias("rsi14"),
        )
        .orderBy("o_orderpriority", "day")
    )


# --- Page's L trend test --------------------------------------------------------

_PAGE_ORACLE = """
    WITH cell AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS ym,
             o_orderpriority AS pri,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    fullb AS (
      SELECT ym FROM cell GROUP BY ym HAVING count(*) = 5
    ),
    ranked AS (
      SELECT c.ym, c.pri,
             row_number() OVER (PARTITION BY c.ym ORDER BY c.c, c.pri)
               AS rnk,
             CAST(substr(c.pri, 1, 1) AS BIGINT) AS j
      FROM cell c JOIN fullb USING (ym)
    ),
    l AS (
      SELECT CAST(count(DISTINCT ym) AS BIGINT) AS b,
             CAST(sum(j * rnk) AS BIGINT) AS l_stat
      FROM ranked
    )
    SELECT b AS n_blocks, l_stat,
           floor((l_stat - 45.0 * b) / (5.0 * sqrt(CAST(b AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS z_page
    FROM l
    """


@query("stats_page_trend", oracle=_PAGE_ORACLE)
def stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test (Page 1963) for an ORDERED alternative across
    repeated measures: blocks = calendar months (complete 5-priority
    blocks only), treatments = the 5 priorities in their numeric order,
    L = Σⱼ j·Rⱼ over within-block ranks (deterministic — cents values
    tie-broken by treatment). Under H₀, E[L] = b·k(k+1)²/4 = 45b and
    Var[L] = b·k²(k+1)(k²−1)/144 = 25b for k = 5, so z = (L−45b)/(5√b).
    The Friedman twin tests ANY difference; Page is its one-sided
    monotone-trend sharpening.

    100 TB: one (month, priority) census; ranks are 5-row windows per
    block behind the aggregate; the statistic is one integer sum."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    cell = (
        table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.sum(cents).cast("bigint").alias("c"))
    )
    fullb = cell.groupBy("ym").agg(F.count(F.lit(1)).alias("k")).where(
        F.col("k") == 5
    ).select("ym")
    wr = Window.partitionBy("ym").orderBy("c", "pri")
    ranked = cell.join(fullb, "ym").select(
        "ym",
        F.row_number().over(wr).cast("bigint").alias("rnk"),
        F.substring("pri", 1, 1).cast("bigint").alias("j"),
    )
    lrow = ranked.agg(
        F.count_distinct("ym").cast("bigint").alias("b"),
        F.sum(F.col("j") * F.col("rnk")).cast("bigint").alias("l_stat"),
    )
    bd = F.col("b").cast("double")
    return lrow.select(
        F.col("b").alias("n_blocks"),
        "l_stat",
        fround(
            (F.col("l_stat") - 45.0 * F.col("b")) / (5.0 * F.sqrt(bd)), 6
        ).alias("z_page"),
    )


# --- PromQL vector matching (on / group_left / bool) ---------------------------

_VMATCH_ORACLE = """
    WITH num AS (
      SELECT event_type, user_id % 4 AS bucket,
             CAST(count(*) AS BIGINT) AS n_bucket
      FROM events GROUP BY 1, 2
    ),
    den AS (
      SELECT event_type, CAST(sum(n_bucket) AS BIGINT) AS n_type
      FROM num GROUP BY event_type
    )
    SELECT n.event_type, n.bucket, n.n_bucket, d.n_type,
           floor(CAST(n.n_bucket AS DOUBLE) / d.n_type * 1e6 + 0.5) / 1e6
             AS share,
           CASE WHEN CAST(n.n_bucket AS DOUBLE) / d.n_type > 0.3
                THEN 1 ELSE 0 END AS above_bool
    FROM num n JOIN den d USING (event_type)
    ORDER BY event_type, bucket
    """


@query("promql_vector_matching", oracle=_VMATCH_ORACLE)
def promql_vector_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL binary-operation vector matching: the many-to-one
    ``errors{type,bucket} / on(type) group_left requests{type}`` shape —
    the fine-grained metric divides the coarse one after matching ONLY
    the shared label (on(type) ≡ ignoring(bucket)), each coarse sample
    fanning out to its many fine partners (group_left). The ``bool``
    modifier variant emits the 0/1 comparison result instead of
    filtering, exactly per the published semantics.

    100 TB: the denominator derives from the numerator census (second
    aggregation — no rescan) and joins back broadcast on the |series|-
    bounded label set; a TSDB evaluates this identically, sharded by
    the matched label."""
    num = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", (F.col("user_id") % 4).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bucket"))
        .localCheckpoint(eager=False)  # numerator + derived denominator
    )
    den = num.groupBy("event_type").agg(
        F.sum("n_bucket").cast("bigint").alias("n_type")
    )
    share = F.col("n_bucket").cast("double") / F.col("n_type")
    return (
        num.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "bucket",
            "n_bucket",
            "n_type",
            fround(share, 6).alias("share"),
            F.when(share > 0.3, F.lit(1)).otherwise(F.lit(0)).alias("above_bool"),
        )
        .orderBy("event_type", "bucket")
    )
