"""Relational breadth, round 6: the Spark 4 DataSketches surface beyond
HLL — Theta sketches (the mergeable-set-ALGEBRA sketch: union AND
intersection AND difference, where HLL only unions) and KLL quantile
sketches (the successor to GK with formal rank-error guarantees and
first-class merge) — both emitted as value-hashed bound certificates —
plus the ANSI ``regr_*`` linear-regression aggregate family certified
against exact DECIMAL-moment arithmetic.

Reference analog: none (the exporter aggregates counters only); these
are the engine-provided aggregate surfaces a 100 TB telemetry store
leans on daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import fround, query, rank_contract_certificate, table


@query(
    "sketch_theta_setops",
    oracle="""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    per AS (
      SELECT 'distinct:' || event_type AS op,
             CAST(count(*) AS BIGINT) AS exact
      FROM pairs GROUP BY event_type
    ),
    un AS (
      SELECT 'union:all' AS op,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact
      FROM pairs
    ),
    ix AS (
      SELECT 'intersect:click,purchase' AS op,
             CAST(count(*) AS BIGINT) AS exact
      FROM (SELECT user_id FROM pairs WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM pairs WHERE event_type = 'purchase')
    ),
    df AS (
      SELECT 'diff:click,purchase' AS op,
             (SELECT count(*) FROM pairs WHERE event_type = 'click')
             - (SELECT exact FROM ix LIMIT 1) AS exact
    )
    SELECT op, exact, true AS within_tol
    FROM (SELECT * FROM per UNION ALL SELECT * FROM un
          UNION ALL SELECT * FROM ix UNION ALL SELECT * FROM df)
    ORDER BY op
    """,
)
def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketch set algebra (Apache DataSketches via Spark 4
    ``theta_sketch_agg``/``theta_union_agg``/``theta_intersection``/
    ``theta_difference``): per-event-type distinct-user sketches, their
    lattice union, the click∩purchase intersection and click∖purchase
    difference — each estimate certified within 5% (absolute floor 2) of
    the exact count as a literal boolean, with the exact counts
    themselves hash-checked against SQL set algebra. Theta is the
    sketch that makes AUDIENCE OVERLAP queries O(sketch bytes): HLL
    can only union, Theta's KMV retention supports all three ops.

    Plan: ONE events scan folds to distinct (type, user) pairs
    (sketches are duplicate-insensitive, so sketching the distinct
    pairs is state-identical) and the checkpointed pair set feeds the
    per-type sketches AND every exact count; |A∖B| = |A| − |A∩B| keeps
    the difference arithmetic, not a second set op. plan_audit's
    multi-BNLJ flag here is the vetted bounded pattern: every cross
    join in this plan pairs 1-row aggregates (union est × union exact,
    sketch pair × intersect exact) — constant-size broadcast nests,
    never data×data."""
    e = table(spark, sf_dir, "events")
    pairs = (
        e.select("event_type", "user_id").distinct().localCheckpoint(eager=False)
    )
    per = (
        pairs.groupBy("event_type")
        .agg(
            F.theta_sketch_agg("user_id").alias("sk"),
            F.count(F.lit(1)).alias("exact"),
        )
        .localCheckpoint(eager=False)  # typed rows + union + pair ops
    )
    tol = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") - exact)
        <= F.greatest(F.lit(2.0), 0.05 * exact)
    )
    typed = per.select(
        F.concat(F.lit("distinct:"), F.col("event_type")).alias("op"),
        "exact",
        tol(F.theta_sketch_estimate("sk"), F.col("exact")).alias("within_tol"),
    )
    u_exact = pairs.agg(F.count_distinct("user_id").alias("exact"))
    union_row = (
        per.agg(F.theta_sketch_estimate(F.theta_union_agg("sk")).alias("est"))
        .crossJoin(u_exact)
        .select(
            F.lit("union:all").alias("op"),
            "exact",
            tol(F.col("est"), F.col("exact")).alias("within_tol"),
        )
    )
    ab = per.agg(
        F.first(F.when(F.col("event_type") == "click", F.col("sk")), True).alias("ka"),
        F.first(F.when(F.col("event_type") == "purchase", F.col("sk")), True).alias("kb"),
        F.first(F.when(F.col("event_type") == "click", F.col("exact")), True).alias("na"),
    )
    i_exact = (
        pairs.filter(F.col("event_type") == "click")
        .select("user_id")
        .join(
            pairs.filter(F.col("event_type") == "purchase").select("user_id"),
            "user_id",
            "semi",
        )
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    pair_rows = (
        ab.crossJoin(i_exact)
        .select(
            F.theta_sketch_estimate(F.theta_intersection("ka", "kb")).alias("ei"),
            F.theta_sketch_estimate(F.theta_difference("ka", "kb")).alias("ed"),
            "na",
            "exact",
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("intersect:click,purchase").alias("op"),
                        F.col("exact").alias("exact"),
                        tol(F.col("ei"), F.col("exact")).alias("within_tol"),
                    ),
                    F.struct(
                        F.lit("diff:click,purchase").alias("op"),
                        (F.col("na") - F.col("exact")).alias("exact"),
                        tol(F.col("ed"), F.col("na") - F.col("exact")).alias(
                            "within_tol"
                        ),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    return typed.unionByName(union_row).unionByName(pair_rows).orderBy("op")


@query(
    "sketch_kll_quantiles",
    oracle="""
    WITH vals AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    groups AS (
      SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n
      FROM vals GROUP BY 1
      UNION ALL
      SELECT '__merged__', CAST(count(*) AS BIGINT) FROM vals
    ),
    ps AS (SELECT unnest(['p25', 'p50', 'p75', 'p95']) AS pct)
    SELECT g, pct, n, true AS within_rank_eps
    FROM groups CROSS JOIN ps
    ORDER BY g, pct
    """,
)
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches (Apache DataSketches via Spark 4
    ``kll_sketch_agg_double``): per-event-type value quantiles at
    p25/p50/p75/p95 plus a ``__merged__`` row whose sketch comes from
    ``kll_merge_agg_double`` over the per-type sketches — certifying BOTH
    halves of the KLL contract as literal booleans: (a) each reported
    value's true rank interval intersects φ·n ± (0.04·n + 1) (the
    k=200 normalized rank error ~1.65%, taken with 2.4× headroom), and
    (b) merge loses nothing certifiable — the merged sketch is built
    ONLY from the six per-type sketches, never the raw values, which is
    the property that lets a 100 TB store keep per-partition sketches
    and answer global quantiles in O(sketch bytes).

    Plan: the (group, value) base is duplicated onto '__merged__' for
    the rank counts by an in-row explode and checkpointed; per-type
    sketches fold from the same checkpoint; the merged row's rank
    check joins the same base. One events scan total."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = e.select(
        F.explode(F.array(F.col("event_type"), F.lit("__merged__"))).alias("g"),
        "value",
    ).localCheckpoint(eager=False)
    typed = base.filter(F.col("g") != "__merged__")
    sk = typed.groupBy("g").agg(
        F.kll_sketch_agg_double("value").alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = sk.agg(
        F.kll_merge_agg_double("k").alias("k"), F.sum("n").alias("n")
    ).select(F.lit("__merged__").alias("g"), "k", "n")
    allsk = sk.unionByName(merged)
    ps = [("p25", 0.25), ("p50", 0.50), ("p75", 0.75), ("p95", 0.95)]
    long = allsk.select(
        "g",
        "n",
        F.expr(
            "stack(4, "
            + ", ".join(
                f"'{name}', kll_sketch_get_quantile_double(k, {p}D)"
                for name, p in ps
            )
            + ") AS (pct, v)"
        ),
    )
    return rank_contract_certificate(
        long, base, "g", "n", "value", rank_eps=0.04
    )


@query(
    "stats_regr_family",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM q GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pairs,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
             AS slope,
           floor((CAST(sy AS DOUBLE) / 1e6
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) / 1e6
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS r2,
           true AS regr_matches
    FROM m ORDER BY event_type
    """,
)
def stats_regr_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ``regr_*`` aggregate family (slope / intercept / r² /
    count over (x=day index, y=value) per event type), certified the
    exact-moment way: the HASHED values come from integer moment sums
    (y quantized at 1e-6, all cross terms in DECIMAL(38,0) — exact, no
    reduction-order hazard) pushed through a fixed op sequence both
    engines mirror literally; the built-in ``regr_slope``/
    ``regr_intercept``/``regr_r2``/``regr_count`` results are then
    asserted to match the exact values within 1e-4 relative as the
    ``regr_matches`` boolean — surfacing the built-ins while keeping
    the hash deterministic (the certificate pattern).

    100 TB: one scan, one partial+final agg carrying 6 integer moments
    + 4 built-in regr states per group; day-indexed x keeps every
    cross term inside the DECIMAL(38) budget (documented bounds:
    syy ≤ n·(5.6e8)² ≈ 3e27 at sf0.1 ≪ 1e38)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    x = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast(
        "bigint"
    )
    y = F.floor(F.col("value") * 1e6 + 0.5)
    q = e.select("event_type", x.alias("x"), y.alias("y"), "value")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
        F.regr_count("value", F.col("x").cast("double")).alias("b_n"),
        F.regr_slope("value", F.col("x").cast("double")).alias("b_slope"),
        F.regr_intercept("value", F.col("x").cast("double")).alias("b_icpt"),
        F.regr_r2("value", F.col("x").cast("double")).alias("b_r2"),
    )
    num = (dec(F.col("n")) * F.col("sxy") - dec(F.col("sx")) * dec(F.col("sy"))).cast(
        "double"
    )
    dxx = (dec(F.col("n")) * dec(F.col("sxx")) - dec(F.col("sx")) * dec(F.col("sx"))).cast(
        "double"
    )
    dyy = (dec(F.col("n")) * F.col("syy") - dec(F.col("sy")) * dec(F.col("sy"))).cast(
        "double"
    )
    slope = num / dxx / F.lit(1e6)
    icpt = (
        F.col("sy").cast("double") / F.lit(1e6) - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = num * num / (dxx * dyy)
    rel = lambda a, b: F.abs(a - b) <= F.lit(1e-4) * F.greatest(  # noqa: E731
        F.lit(1.0), F.abs(b)
    )
    matches = (
        (F.col("b_n") == F.col("n"))
        & rel(F.col("b_slope"), slope)
        & rel(F.col("b_icpt"), icpt)
        & rel(F.col("b_r2"), r2)
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        fround(slope, 6).alias("slope"),
        fround(icpt, 6).alias("intercept"),
        fround(r2, 6).alias("r2"),
        matches.alias("regr_matches"),
    ).orderBy("event_type")
