"""Relational battery, round 8 batch 8: distributed resampling
inference — the Poisson bootstrap and a randomization test — with
fully DETERMINISTIC resamples.

Classical bootstrap/permutation inference is RNG-driven and therefore
unreproducible across engines, runs, and partitionings. Both operators
here replace the RNG with a deterministic per-(row, replicate) hash —
a two-round multiplicative congruential mix in pure int64 arithmetic
(identical on both engines, whole-stage-codegen-cheap; the md5 bucket
trick used elsewhere costs ~4× here because the fan-out evaluates
n·B = 20M hashes at sf0.1, measured 33 s md5 vs 8 s mix). The mix
drops the low bits and buckets on the middle bits; bootstrap/
randomization quality at B = 200 is B-dominated, and the contract
being certified is cross-engine exactness of the resample set, which
any shared pure function gives. Swap in md5 (or a real xxhash on both
sides) where adversarial inputs could correlate with the mix.

The Poisson bootstrap (weight_b(row) ~ Poisson(1), approximated here by
the md5-uniform inverse-CDF table) is the published way to bootstrap at
scale: one pass with B weight columns instead of B data passes, exactly
because Binomial(n, 1/n) → Poisson(1) and per-row weights need no
global coordination.

Reference parity note: /root/reference computes no statistics
(metrics.go:8-75 counts); §2.3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_B = 200  # bootstrap / randomization replicates

# Poisson(1) inverse CDF on a 0..9999 uniform bucket (cumulative
# probabilities x 10000, rounded): P(0)=.3679 P(<=1)=.7358 P(<=2)=.9197
# P(<=3)=.9810 P(<=4)=.9963 P(<=5)=.9994, else 6.
_POIS_EDGES = (3679, 7358, 9197, 9810, 9963, 9994)

# two-round multiplicative congruential mix of (event_id, b) onto
# 0..9999: the id is pre-reduced mod 2^31 BEFORE the multiply so the
# product can never wrap int64 at ANY id range (r9 ADVICE — unreduced,
# ids past ~3.47e9 overflow, and Spark/DuckDB need not wrap alike;
# 2^31·2.7e9 ≈ 5.7e18 < 2^63). h1 = ((id mod 2^31)·2654435761 + b)
# mod 2^31, h2 = (h1·1103515245 + 12345) mod 2^31 (2^31·1.1e9 ≈
# 2.4e18 fits), bucket = (h2 >> 10) mod 10000 — middle bits only.
# Value-identical to the unreduced form for ids < 2^31 (every test SF).
_BUCKET_SQL = (
    "((((((event_id % 2147483648) * 2654435761 + b) % 2147483648)"
    " * 1103515245 + 12345) % 2147483648) // 1024) % 10000"
)

_POIS_SQL = f"""CASE
  WHEN {_BUCKET_SQL} < {_POIS_EDGES[0]} THEN 0
  WHEN {_BUCKET_SQL} < {_POIS_EDGES[1]} THEN 1
  WHEN {_BUCKET_SQL} < {_POIS_EDGES[2]} THEN 2
  WHEN {_BUCKET_SQL} < {_POIS_EDGES[3]} THEN 3
  WHEN {_BUCKET_SQL} < {_POIS_EDGES[4]} THEN 4
  WHEN {_BUCKET_SQL} < {_POIS_EDGES[5]} THEN 5
  ELSE 6 END"""


def _pois_weight(bucket):
    w = F.lit(6)
    for k in range(len(_POIS_EDGES) - 1, -1, -1):
        w = F.when(bucket < _POIS_EDGES[k], k).otherwise(w)
    return w


@query(
    "stats_bootstrap_ci_diff",
    oracle=f"""
    WITH obs AS (
      SELECT event_id, user_id % 2 = 1 AS treated,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    reps AS (
      SELECT o.treated, o.cents, r.b, {_POIS_SQL} AS w
      FROM obs o CROSS JOIN (SELECT unnest(range({_B})) AS b) r
    ),
    diffs AS (
      SELECT b,
             CAST(sum(CASE WHEN treated THEN w * cents END) AS BIGINT) AS st,
             CAST(sum(CASE WHEN treated THEN w END) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN NOT treated THEN w * cents END) AS BIGINT)
               AS sc,
             CAST(sum(CASE WHEN NOT treated THEN w END) AS BIGINT) AS nc
      FROM reps GROUP BY b
    ),
    ranked AS (
      SELECT st / CAST(nt AS DOUBLE) - sc / CAST(nc AS DOUBLE) AS d,
             row_number() OVER (
               ORDER BY st / CAST(nt AS DOUBLE) - sc / CAST(nc AS DOUBLE), b
             ) AS rk
      FROM diffs WHERE nt > 0 AND nc > 0
    ),
    bounds AS (
      SELECT min(CASE WHEN rk = 5 THEN d END) AS lo,
             min(CASE WHEN rk = 196 THEN d END) AS hi
      FROM ranked
    ),
    observed AS (
      SELECT sum(CASE WHEN treated THEN cents END)
               / CAST(count(CASE WHEN treated THEN 1 END) AS DOUBLE)
             - sum(CASE WHEN NOT treated THEN cents END)
               / CAST(count(CASE WHEN NOT treated THEN 1 END) AS DOUBLE)
               AS d_obs
      FROM obs
    )
    SELECT CAST({_B} AS BIGINT) AS n_replicates,
           floor(o.d_obs * 1e4 + 0.5) / 1e4 AS observed_diff,
           floor(bd.lo * 1e4 + 0.5) / 1e4 AS ci_lo,
           floor(bd.hi * 1e4 + 0.5) / 1e4 AS ci_hi
    FROM observed o CROSS JOIN bounds bd
    """,
)
def stats_bootstrap_ci_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for the treated-vs-
    control MEAN DIFFERENCE (the same contrast stats_randomization_test
    p-values and stats_diff_in_diff estimates — together they are the
    effect-size readout of an experiment platform). Each of 200
    replicates reweights every row by a Poisson(1) integer drawn
    deterministically from the (event_id, b) congruential mix through
    the inverse-CDF table; replicate contrasts are exact-integer
    conditional sums divided once; the interval is ranks 5/196 of the
    sorted contrasts (explicit rank convention — no interpolation to
    disagree on). The plain-mean sibling is stats_bootstrap_ci_mean
    (pipeline_ops5, md5-addressed); this one bootstraps a CONTRAST,
    whose sampling distribution a single-group bootstrap cannot give.

    100 TB: THE distributed bootstrap — one scan fans each row into B
    (replicate, weight) pairs that partial-aggregate map-side into B
    4-cell rows; no per-replicate pass, no RNG state. The rank window
    runs over exactly B rows above the HashAggregate, and both CI
    bounds come from ONE conditional aggregate (no per-bound rescan).

    Plan note: the audit's multi-BNLJ flag is the whitelisted class —
    the replicate fan-out broadcasts a 200-row literal range and the
    final select broadcasts 1-row aggregates."""
    obs = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            (F.col("user_id") % 2 == 1).alias("treated"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
                "cents"
            ),
        )
    )
    reps = obs.join(
        F.broadcast(spark.range(_B).select(F.col("id").alias("b")))
    )
    bucket = F.expr(
        "((((((event_id % 2147483648L) * 2654435761L + b) % 2147483648L)"
        " * 1103515245L + 12345L) % 2147483648L) div 1024L) % 10000L"
    )
    t = F.col("treated")
    diffs = (
        reps.select("b", "treated", "cents", _pois_weight(bucket).alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.when(t, F.col("w") * F.col("cents"))).cast("bigint").alias("st"),
            F.sum(F.when(t, F.col("w"))).cast("bigint").alias("nt"),
            F.sum(F.when(~t, F.col("w") * F.col("cents")))
            .cast("bigint")
            .alias("sc"),
            F.sum(F.when(~t, F.col("w"))).cast("bigint").alias("nc"),
        )
        .filter((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    d = (
        F.col("st") / F.col("nt").cast("double")
        - F.col("sc") / F.col("nc").cast("double")
    ).alias("d")
    ranked = diffs.select(d, "b").withColumn(
        "rk", F.row_number().over(Window.orderBy("d", "b"))
    )
    bounds = ranked.agg(
        F.min(F.when(F.col("rk") == 5, F.col("d"))).alias("lo"),
        F.min(F.when(F.col("rk") == 196, F.col("d"))).alias("hi"),
    )
    observed = obs.agg(
        (
            F.sum(F.when(t, F.col("cents"))).cast("bigint")
            / F.count(F.when(t, F.lit(1))).cast("double")
            - F.sum(F.when(~t, F.col("cents"))).cast("bigint")
            / F.count(F.when(~t, F.lit(1))).cast("double")
        ).alias("d_obs")
    )
    return observed.crossJoin(F.broadcast(bounds)).select(
        F.lit(_B).cast("bigint").alias("n_replicates"),
        fround(F.col("d_obs"), 4).alias("observed_diff"),
        fround(F.col("lo"), 4).alias("ci_lo"),
        fround(F.col("hi"), 4).alias("ci_hi"),
    )


@query(
    "stats_randomization_test",
    oracle=f"""
    WITH obs AS (
      SELECT event_id, user_id % 2 = 1 AS treated,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    observed AS (
      SELECT sum(CASE WHEN treated THEN cents END)
               / CAST(count(CASE WHEN treated THEN 1 END) AS DOUBLE)
             - sum(CASE WHEN NOT treated THEN cents END)
               / CAST(count(CASE WHEN NOT treated THEN 1 END) AS DOUBLE)
               AS d_obs
      FROM obs
    ),
    reps AS (
      SELECT r.b, o.cents,
             {_BUCKET_SQL} < 5000 AS flip
      FROM obs o CROSS JOIN (SELECT unnest(range({_B})) AS b) r
    ),
    diffs AS (
      SELECT b,
             sum(CASE WHEN flip THEN cents END)
               / CAST(count(CASE WHEN flip THEN 1 END) AS DOUBLE)
             - sum(CASE WHEN NOT flip THEN cents END)
               / CAST(count(CASE WHEN NOT flip THEN 1 END) AS DOUBLE)
               AS d
      FROM reps GROUP BY b
    )
    SELECT floor(o.d_obs * 1e4 + 0.5) / 1e4 AS observed_diff,
           CAST({_B} AS BIGINT) AS n_replicates,
           CAST((SELECT count(*) FROM diffs WHERE abs(d) >= abs(o.d_obs))
                AS BIGINT) AS n_as_extreme,
           floor(((SELECT count(*) FROM diffs
                   WHERE abs(d) >= abs(o.d_obs)) + 1.0)
                 / ({_B} + 1.0) * 1e6 + 0.5) / 1e6 AS p_value
    FROM observed o
    """,
)
def stats_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (approximate permutation) test for the treated-vs-
    control mean difference (same 2-group design as stats_diff_in_diff):
    200 deterministic hash re-assignments of rows to groups, p = (#{|d_b|
    ≥ |d_obs|} + 1)/(B + 1) — the add-one convention that keeps p > 0.
    Every replicate difference is computed from exact integer sums via
    the identical expression on both engines, so the ≥ comparisons and
    the final count are bit-reproducible.

    100 TB: same one-pass fan-out shape as the Poisson bootstrap (B
    conditional cells per replicate, map-side combining, B-row
    exchange); the observed statistic is one extra conditional
    aggregate on the same scan.

    Plan note: multi-BNLJ flag = whitelisted class (200-row literal
    range fan-out + 1-row observed-stat broadcast)."""
    obs = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            (F.col("user_id") % 2 == 1).alias("treated"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
                "cents"
            ),
        )
        .localCheckpoint(eager=False)  # observed stat + the B-replicate fan-out
    )

    def diff(flag):
        a = F.sum(F.when(flag, F.col("cents"))).cast("bigint")
        na = F.count(F.when(flag, F.lit(1)))
        b_ = F.sum(F.when(~flag, F.col("cents"))).cast("bigint")
        nb = F.count(F.when(~flag, F.lit(1)))
        return a / na.cast("double") - b_ / nb.cast("double")

    observed = obs.agg(diff(F.col("treated")).alias("d_obs"))
    reps = obs.join(
        F.broadcast(spark.range(_B).select(F.col("id").alias("b")))
    )
    bucket = F.expr(
        "((((((event_id % 2147483648L) * 2654435761L + b) % 2147483648L)"
        " * 1103515245L + 12345L) % 2147483648L) div 1024L) % 10000L"
    )
    diffs = (
        reps.select("b", "cents", (bucket < 5000).alias("flip"))
        .groupBy("b")
        .agg(diff(F.col("flip")).alias("d"))
    )
    counted = diffs.crossJoin(F.broadcast(observed)).agg(
        F.count_if(F.abs(F.col("d")) >= F.abs(F.col("d_obs")))
        .cast("bigint")
        .alias("n_as_extreme")
    )
    return (
        observed.crossJoin(F.broadcast(counted))
        .select(
            fround(F.col("d_obs"), 4).alias("observed_diff"),
            F.lit(_B).cast("bigint").alias("n_replicates"),
            "n_as_extreme",
            fround((F.col("n_as_extreme") + 1.0) / (_B + 1.0), 6).alias(
                "p_value"
            ),
        )
    )
