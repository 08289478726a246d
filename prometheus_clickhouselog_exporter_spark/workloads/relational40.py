"""Relational battery, round 8 batch 5: causal/experimentation and
data-quality operators — difference-in-differences, chi-square
independence, and day-over-day partition-volume anomaly screening.

All three follow the SCALE.md integer-folds discipline: observations
enter as exact integers (cents, counts), every cross-engine reduction
is a sum of integers (per-cell float terms quantized to micro-units
first), and only final ratios return to doubles via ``fround``.

Reference parity note: /root/reference computes none of these
(query.go:1-289 parses logs; metrics.go:8-75 counts); §2.3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_CUTOVER = "2024-01-16"  # same pre/post boundary as stats_cuped_adjustment


@query(
    "stats_diff_in_diff",
    oracle=f"""
    WITH obs AS (
      SELECT (user_id % 2 = 1) AS treated,
             (ts >= TIMESTAMP '{_CUTOVER}') AS post,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT
        CAST(sum(CASE WHEN NOT treated AND NOT post THEN cents END) AS BIGINT) AS s_c_pre,
        CAST(count(CASE WHEN NOT treated AND NOT post THEN 1 END) AS BIGINT) AS n_c_pre,
        CAST(sum(CASE WHEN NOT treated AND post THEN cents END) AS BIGINT) AS s_c_post,
        CAST(count(CASE WHEN NOT treated AND post THEN 1 END) AS BIGINT) AS n_c_post,
        CAST(sum(CASE WHEN treated AND NOT post THEN cents END) AS BIGINT) AS s_t_pre,
        CAST(count(CASE WHEN treated AND NOT post THEN 1 END) AS BIGINT) AS n_t_pre,
        CAST(sum(CASE WHEN treated AND post THEN cents END) AS BIGINT) AS s_t_post,
        CAST(count(CASE WHEN treated AND post THEN 1 END) AS BIGINT) AS n_t_post
      FROM obs
    )
    SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
           floor(s_c_pre / CAST(n_c_pre AS DOUBLE) * 1e4 + 0.5) / 1e4 AS mean_c_pre,
           floor(s_c_post / CAST(n_c_post AS DOUBLE) * 1e4 + 0.5) / 1e4 AS mean_c_post,
           floor(s_t_pre / CAST(n_t_pre AS DOUBLE) * 1e4 + 0.5) / 1e4 AS mean_t_pre,
           floor(s_t_post / CAST(n_t_post AS DOUBLE) * 1e4 + 0.5) / 1e4 AS mean_t_post,
           floor((s_t_post / CAST(n_t_post AS DOUBLE)
                  - s_t_pre / CAST(n_t_pre AS DOUBLE)
                  - s_c_post / CAST(n_c_post AS DOUBLE)
                  + s_c_pre / CAST(n_c_pre AS DOUBLE)) * 1e4 + 0.5) / 1e4
             AS did_cents
    FROM cells
    """,
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2x2 natural-experiment estimator
    DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), with treatment
    assigned by user parity and the pre/post boundary shared with the
    CUPED query. All eight cell statistics (4 sums + 4 counts) come
    from ONE conditional aggregate over integer cents; the four means
    and the estimate are final-division doubles from identical integer
    inputs, so both engines agree bit-for-bit after fround.

    100 TB: a single map-side-combining scan producing one 8-column
    row — DiD at planet scale is this cheap, which is why it's the
    default quasi-experimental readout when randomization is broken."""
    t = (F.col("user_id") % 2 == 1)
    p = F.col("ts") >= F.lit(_CUTOVER).cast("timestamp")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")

    def cell(cond, agg):
        return agg(F.when(cond, cents if agg is F.sum else F.lit(1)))

    cells = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .agg(
            cell(~t & ~p, F.sum).cast("bigint").alias("s_c_pre"),
            cell(~t & ~p, F.count).cast("bigint").alias("n_c_pre"),
            cell(~t & p, F.sum).cast("bigint").alias("s_c_post"),
            cell(~t & p, F.count).cast("bigint").alias("n_c_post"),
            cell(t & ~p, F.sum).cast("bigint").alias("s_t_pre"),
            cell(t & ~p, F.count).cast("bigint").alias("n_t_pre"),
            cell(t & p, F.sum).cast("bigint").alias("s_t_post"),
            cell(t & p, F.count).cast("bigint").alias("n_t_post"),
        )
    )
    mean = lambda s, n: F.col(s) / F.col(n).cast("double")  # noqa: E731
    return cells.select(
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        fround(mean("s_c_pre", "n_c_pre"), 4).alias("mean_c_pre"),
        fround(mean("s_c_post", "n_c_post"), 4).alias("mean_c_post"),
        fround(mean("s_t_pre", "n_t_pre"), 4).alias("mean_t_pre"),
        fround(mean("s_t_post", "n_t_post"), 4).alias("mean_t_post"),
        fround(
            mean("s_t_post", "n_t_post")
            - mean("s_t_pre", "n_t_pre")
            - mean("s_c_post", "n_c_post")
            + mean("s_c_pre", "n_c_pre"),
            4,
        ).alias("did_cents"),
    )


@query(
    "stats_chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type AS et, isodow(ts) - 1 AS dw,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT et) AS BIGINT) AS n_r,
             CAST(count(DISTINCT dw) AS BIGINT) AS n_c
      FROM cells
    ),
    rm AS (SELECT et, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY et),
    cm AS (SELECT dw, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY dw),
    terms AS (
      SELECT CAST(floor(
               CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
               / (CAST(n AS DOUBLE) * r * c) * 1e6 + 0.5) AS BIGINT) AS tq
      FROM cells JOIN rm USING (et) JOIN cm USING (dw) CROSS JOIN tot
    )
    SELECT t.n AS n_obs,
           (t.n_r - 1) * (t.n_c - 1) AS dof,
           CAST(sum(tq) AS DOUBLE) / 1e6 AS chi_square,
           floor(sqrt(CAST(sum(tq) AS DOUBLE) / 1e6
                      / (t.n * least(t.n_r - 1, t.n_c - 1))) * 1e6 + 0.5) / 1e6
             AS cramers_v
    FROM terms CROSS JOIN tot t
    GROUP BY t.n, t.n_r, t.n_c
    """,
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence (event_type x weekday)
    with Cramér's V effect size. The per-cell term is computed from
    the EXACT integer (O·N − r·c) — squared and scaled in double from
    identical integers on both engines — and quantized to 1e-6 before
    the 35-term sum, so the statistic is a ratio of identical integers.
    Weekday is Monday=0 on both engines (Spark ``weekday`` vs DuckDB
    ``isodow − 1`` — the documented cross-engine day convention).

    100 TB: one contingency aggregate (map-side combining to R·C
    cells), margins from the cell table, everything after the first
    scan is cell-cardinality. The integer products o·n and n·r·c fit
    int64 through ~1e6 observed rows per test; past that, route the
    margins through DECIMAL (the HHI pattern) — noted, not needed at
    fixture scale."""
    cells = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("et"), F.weekday("ts").alias("dw")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=False)  # feeds margins, totals and terms
    )
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count_distinct("et").cast("bigint").alias("n_r"),
        F.count_distinct("dw").cast("bigint").alias("n_c"),
    )
    rm = cells.groupBy("et").agg(F.sum("o").cast("bigint").alias("r"))
    cm = cells.groupBy("dw").agg(F.sum("o").cast("bigint").alias("c"))
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    tq = F.floor(
        diff * diff / (F.col("n").cast("double") * F.col("r") * F.col("c")) * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    terms = (
        cells.join(F.broadcast(rm), "et")
        .join(F.broadcast(cm), "dw")
        .crossJoin(F.broadcast(tot))
        .select("n", "n_r", "n_c", tq.alias("tq"))
    )
    return terms.groupBy("n", "n_r", "n_c").agg(
        F.sum("tq").alias("sq")
    ).select(
        F.col("n").alias("n_obs"),
        ((F.col("n_r") - 1) * (F.col("n_c") - 1)).alias("dof"),
        (F.col("sq").cast("double") / 1e6).alias("chi_square"),
        fround(
            F.sqrt(
                F.col("sq").cast("double")
                / 1e6
                / (F.col("n") * F.least(F.col("n_r") - 1, F.col("n_c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "dq_partition_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT d, n, n_nulls,
             sum(n) OVER w AS sn, sum(n * n) OVER w AS snn,
             sum(n_nulls) OVER w AS sm,
             sum(n_nulls * n_nulls) OVER w AS smm,
             count(*) OVER w AS c
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(d AS VARCHAR) AS d, n, n_nulls,
           CASE WHEN c >= 3 AND c * snn - sn * sn > 0
                THEN floor((n * c - sn)
                           / sqrt(CAST(c * snn - sn * sn AS DOUBLE))
                           * 1e4 + 0.5) / 1e4 END AS z_volume,
           CASE WHEN c >= 3 AND c * smm - sm * sm > 0
                THEN floor((n_nulls * c - sm)
                           / sqrt(CAST(c * smm - sm * sm AS DOUBLE))
                           * 1e4 + 0.5) / 1e4 END AS z_nulls,
           coalesce(abs(CASE WHEN c >= 3 AND c * snn - sn * sn > 0
                             THEN floor((n * c - sn)
                                  / sqrt(CAST(c * snn - sn * sn AS DOUBLE))
                                  * 1e4 + 0.5) / 1e4 END) >= 3.0, FALSE)
             AS vol_anomaly
    FROM scored ORDER BY d
    """,
)
def dq_partition_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-health screen every partitioned lake runs at the landing
    zone: per arrival day, row volume and null-rate drift scored
    against the TRAILING 7-day window (never including today — the
    anomaly must not contaminate its own baseline). z-scores reduce to
    (n·c − Σn)/√(c·Σn² − (Σn)²) — integer numerator, one integer under
    the sqrt — so both engines agree exactly after fround(1e-4); the
    flag compares the QUANTIZED z against 3.0 so the decision boundary
    cannot flip cross-engine. Days with under 3 trailing observations
    or zero variance emit NULL scores (cold-start honesty).

    100 TB: one day-keyed aggregate (map-side combining), then a
    day-cardinality window — the screen costs one scan no matter the
    corpus; per-table fan-out is a loop over this plan."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-7, -1)
    scored = daily.select(
        "d",
        "n",
        "n_nulls",
        F.sum("n").over(w).alias("sn"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("snn"),
        F.sum("n_nulls").over(w).alias("sm"),
        F.sum(F.col("n_nulls") * F.col("n_nulls")).over(w).alias("smm"),
        F.count(F.lit(1)).over(w).alias("c"),
    )

    def z(x, s, ss):
        den2 = F.col("c") * F.col(ss) - F.col(s) * F.col(s)
        return F.when(
            (F.col("c") >= 3) & (den2 > 0),
            fround(
                (F.col(x) * F.col("c") - F.col(s)) / F.sqrt(den2.cast("double")),
                4,
            ),
        )

    zv = z("n", "sn", "snn")
    return scored.select(
        F.col("d").cast("string").alias("d"),  # dates hash as strings
        "n",
        "n_nulls",
        zv.alias("z_volume"),
        z("n_nulls", "sm", "smm").alias("z_nulls"),
        F.coalesce(F.abs(zv) >= 3.0, F.lit(False)).alias("vol_anomaly"),
    ).orderBy("d")
