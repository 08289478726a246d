"""Round 10 batch: Quade's weighted rank test and PromQL offset/@
modifier semantics — DuckDB-oracle-checked, integer-exact.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these; §2.3 north-star territory. Methods
are public: Quade 1979, Prometheus offset/@-modifier docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Quade test -----------------------------------------------------------------

_QUADE_ORACLE = """
    WITH cell AS (
      SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS ym,
             o_orderpriority AS pri,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    fullb AS (SELECT ym FROM cell GROUP BY ym HAVING count(*) = 5),
    ranked AS (
      SELECT c.ym, c.pri, c.c,
             CAST(row_number() OVER (PARTITION BY c.ym ORDER BY c.c, c.pri)
                  AS BIGINT) AS r
      FROM cell c JOIN fullb USING (ym)
    ),
    blocks AS (
      SELECT ym, CAST(max(c) - min(c) AS BIGINT) AS rng
      FROM ranked GROUP BY ym
    ),
    bq AS (
      SELECT ym, CAST(row_number() OVER (ORDER BY rng, ym) AS BIGINT) AS q
      FROM blocks
    ),
    s AS (
      SELECT r.pri, bq.q * (r.r - 3) AS s_ij
      FROM ranked r JOIN bq USING (ym)
    ),
    agg AS (
      SELECT CAST(sum(s_ij * s_ij) AS BIGINT) AS a_stat,
             CAST(count(*) // 5 AS BIGINT) AS b
      FROM s
    ),
    sj AS (
      SELECT pri, CAST(sum(s_ij) AS BIGINT) AS s_j FROM s GROUP BY pri
    ),
    b2 AS (
      SELECT CAST(sum(s_j * s_j) AS BIGINT) AS sum_sj2 FROM sj
    )
    SELECT agg.b AS n_blocks, agg.a_stat,
           floor(CAST(b2.sum_sj2 AS DOUBLE) / agg.b * 1e6 + 0.5) / 1e6
             AS b_stat,
           CASE WHEN CAST(agg.a_stat AS DOUBLE)
                     - CAST(b2.sum_sj2 AS DOUBLE) / agg.b > 0 THEN
             floor((agg.b - 1) * (CAST(b2.sum_sj2 AS DOUBLE) / agg.b)
                   / (CAST(agg.a_stat AS DOUBLE)
                      - CAST(b2.sum_sj2 AS DOUBLE) / agg.b) * 1e6 + 0.5) / 1e6
           END AS f_quade
    FROM agg CROSS JOIN b2
    """


@query("stats_quade_test", oracle=_QUADE_ORACLE)
def stats_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade's test (Quade 1979) — the block-weighted refinement of
    Friedman/Page completing the repeated-measures rank trio: blocks
    (complete months) are weighted by the rank Qᵢ of their within-block
    RANGE, so blocks that discriminate more count more. Sᵢⱼ =
    Qᵢ·(rᵢⱼ−(k+1)/2) stays an exact integer (k = 5 ⇒ center 3);
    A = ΣSᵢⱼ², B = ΣSⱼ²/b, F = (b−1)B/(A−B) with the degenerate A = B
    case (perfect agreement) guarded to NULL.

    100 TB: one (month, priority) census; within-block ranks are 5-row
    windows, block-range ranks a |blocks|-row window — both behind the
    aggregate; the statistic is two integer sums."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    cell = (
        table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.sum(cents).cast("bigint").alias("c"))
    )
    fullb = (
        cell.groupBy("ym").agg(F.count(F.lit(1)).alias("kk"))
        .where(F.col("kk") == 5)
        .select("ym")
    )
    wr = Window.partitionBy("ym").orderBy("c", "pri")
    ranked = cell.join(fullb, "ym").select(
        "ym", "pri", "c", F.row_number().over(wr).cast("bigint").alias("r")
    ).localCheckpoint(eager=False)  # consumers: block ranges + s terms
    blocks = ranked.groupBy("ym").agg(
        (F.max("c") - F.min("c")).cast("bigint").alias("rng")
    )
    wq = Window.orderBy("rng", "ym")
    bq = blocks.select(
        "ym", F.row_number().over(wq).cast("bigint").alias("q")
    )
    s = ranked.join(bq, "ym").select(
        "pri", (F.col("q") * (F.col("r") - 3)).alias("s_ij")
    ).localCheckpoint(eager=False)  # consumers: A and per-treatment sums
    # b = |s|/5 (every kept block contributes exactly k = 5 rows), so the
    # block count rides the SAME aggregate as A — one cross join total
    agg = s.agg(
        F.sum(F.col("s_ij") * F.col("s_ij")).cast("bigint").alias("a_stat"),
        F.expr("count(1) div 5").cast("bigint").alias("b"),
    )
    sj = s.groupBy("pri").agg(F.sum("s_ij").cast("bigint").alias("s_j"))
    b2 = sj.agg(F.sum(F.col("s_j") * F.col("s_j")).cast("bigint").alias("sum_sj2"))
    bd = F.col("b").cast("double")
    b_stat = F.col("sum_sj2").cast("double") / F.col("b")
    denom = F.col("a_stat").cast("double") - b_stat
    return agg.crossJoin(F.broadcast(b2)).select(
        F.col("b").alias("n_blocks"),
        "a_stat",
        fround(b_stat, 6).alias("b_stat"),
        F.when(denom > 0, fround((bd - 1) * b_stat / denom, 6)).alias(
            "f_quade"
        ),
    )


# --- PromQL offset / @ modifiers ---------------------------------------------------

_OFFSET_ORACLE = """
    WITH hc AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    bounds AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hc),
    grid AS (
      SELECT e.event_type, g.hr
      FROM (SELECT DISTINCT event_type FROM hc) e,
           (SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                          (SELECT h1 FROM bounds))) AS hr) g
    ),
    filled AS (
      SELECT g.event_type, g.hr, coalesce(h.cents, 0) AS cents
      FROM grid g LEFT JOIN hc h USING (event_type, hr)
    ),
    roll AS (
      SELECT event_type, hr,
             CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS inc6h,
             CAST(count(*) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cnt6
      FROM filled
    ),
    off_ AS (
      SELECT event_type, hr, inc6h, cnt6,
             lag(inc6h, 24) OVER (PARTITION BY event_type ORDER BY hr)
               AS inc6h_offset_24h,
             last_value(inc6h) OVER (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS inc6h_at_end
      FROM roll
    )
    SELECT event_type, hr AS eval_hr, inc6h, inc6h_offset_24h, inc6h_at_end,
           CAST(inc6h - inc6h_offset_24h AS BIGINT) AS day_over_day_cents,
           CASE WHEN inc6h_offset_24h > 0 THEN
             floor(CAST(inc6h AS DOUBLE) / inc6h_offset_24h * 1e6 + 0.5)
               / 1e6
           END AS day_over_day_ratio
    FROM off_ WHERE cnt6 = 6 AND inc6h_offset_24h IS NOT NULL
    ORDER BY event_type, eval_hr
    """


@query("promql_offset_atmodifier", oracle=_OFFSET_ORACLE)
def promql_offset_atmodifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``offset`` and ``@`` modifier semantics: the 6-hour
    increase at each hourly eval point compared against the SAME
    expression ``offset 24h`` (day-over-day delta and ratio — the
    canonical alerting comparison), plus the ``@``-pinned variant
    (expression evaluated at the range's end timestamp — a constant
    column per series, exactly what `@ end()` yields). The hourly grid
    is zero-filled per series so offsets are true calendar offsets.

    100 TB: per-series hourly census; the rolling sum, the 24-row lag,
    and the @-pin are three frames over ONE (series, hour)-sorted
    exchange — the TSDB evaluation shape, series-sharded."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    hc = e.groupBy(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").alias("hr"),
    ).agg(F.sum(cents).cast("bigint").alias("cents")).localCheckpoint(
        eager=False
    )  # consumers: bounds, series set, grid fill
    bounds = hc.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    types = hc.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    filled = grid.join(hc, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
    )
    w6 = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-5, 0)
    wlag = Window.partitionBy("event_type").orderBy("hr")
    wall = wlag.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    roll = filled.select(
        "event_type",
        "hr",
        F.sum("cents").over(w6).cast("bigint").alias("inc6h"),
        F.count(F.lit(1)).over(w6).cast("bigint").alias("cnt6"),
    )
    off = roll.select(
        "event_type",
        "hr",
        "inc6h",
        "cnt6",
        F.lag("inc6h", 24).over(wlag).alias("inc6h_offset_24h"),
        F.last("inc6h").over(wall).alias("inc6h_at_end"),
    )
    return (
        off.where((F.col("cnt6") == 6) & F.col("inc6h_offset_24h").isNotNull())
        .select(
            "event_type",
            F.col("hr").alias("eval_hr"),
            "inc6h",
            "inc6h_offset_24h",
            "inc6h_at_end",
            (F.col("inc6h") - F.col("inc6h_offset_24h"))
            .cast("bigint")
            .alias("day_over_day_cents"),
            F.when(
                F.col("inc6h_offset_24h") > 0,
                fround(
                    F.col("inc6h").cast("double") / F.col("inc6h_offset_24h"),
                    6,
                ),
            ).alias("day_over_day_ratio"),
        )
        .orderBy("event_type", "eval_hr")
    )
