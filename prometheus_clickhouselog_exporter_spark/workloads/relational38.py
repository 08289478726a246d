"""Relational battery, round 8: experimentation & evaluation statistics —
Kaplan–Meier survival, CUPED variance reduction, ROC/PR summary metrics,
calibration (ECE) — plus PromQL ``predict_linear`` parity.

All five follow the SCALE.md quantized-folds rule: event values enter
as integer cents (or whole dollars where products must stay inside
int64), per-cell float terms are quantized to integer micro-units
before any reduction, and only final ratios return to doubles (same
expression text both engines).

Reference parity note: /root/reference computes none of these
(query.go:1-289 parses logs; metrics.go:8-75 counts); §2.2/§2.3
extensions. predict_linear mirrors the published PromQL function of
the same name (simple least-squares over the range, extrapolated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "stats_kaplan_meier",
    oracle="""
    WITH subj AS (
      SELECT user_id,
             date_diff('day', min(ts), max(ts)) AS dur,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS observed
      FROM events GROUP BY user_id
    ),
    deaths AS (
      SELECT dur AS t, CAST(count(*) AS BIGINT) AS d
      FROM subj WHERE observed = 1 GROUP BY dur
    ),
    risk AS (
      SELECT d.t, d.d,
             (SELECT CAST(count(*) AS BIGINT) FROM subj s WHERE s.dur >= d.t)
               AS n_risk
      FROM deaths d
    ),
    terms AS (
      SELECT t, d, n_risk,
             CASE WHEN d >= n_risk THEN NULL
                  ELSE CAST(floor(ln((n_risk - d) / CAST(n_risk AS DOUBLE))
                                  * 1e6 + 0.5) AS BIGINT) END AS l_q
      FROM risk
    ),
    folded AS (
      SELECT t, d, n_risk,
             sum(l_q) OVER (ORDER BY t) AS s_q,
             count(CASE WHEN l_q IS NULL THEN 1 END)
               OVER (ORDER BY t) AS n_dead_tail
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days, n_risk, d AS d_events,
           CASE WHEN n_dead_tail > 0 THEN 0.0
                ELSE floor(exp(s_q / 1e6) * 1e6 + 0.5) / 1e6
           END AS km_survival
    FROM folded ORDER BY t_days
    """,
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimator: subjects are users, duration is
    the user's observed activity span in days, the "event" is the user
    ever hitting an error (others are right-censored at their last
    activity — the standard deaths-before-censoring tie convention, so
    at-risk at t counts every duration >= t). S(t) is the product-limit
    estimate, folded as a cumulative sum of per-death-time quantized
    log terms (exp restores it — exact-integer until the final exp);
    a death time that clears the whole risk set pins S to exactly 0.

    100 TB: one user-keyed aggregate builds subjects; death times are
    group-cardinality (<= max duration in days), so the risk-set join
    and the cumulative window run on a bounded frame — the classic
    life-table reduction of KM, not a per-subject scan."""
    subj = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("ts"), F.min("ts")).cast("bigint").alias("dur"),
            F.max(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("observed"),
        )
        .localCheckpoint(eager=False)  # feeds deaths AND the risk-set join
    )
    deaths = (
        subj.filter(F.col("observed") == 1)
        .groupBy(F.col("dur").alias("t"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # risk set per death time: durations are AGGREGATED to per-day
    # counts BEFORE the theta-join (r9 ADVICE — broadcasting raw
    # per-user durations is user-cardinality; the day-count table is
    # bounded by max duration in days, the life-table frame the
    # docstring promises), then n_risk = Σ counts over dur >= t
    durc = subj.groupBy("dur").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    risk = (
        deaths.join(F.broadcast(durc), F.col("dur") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.sum("c").cast("bigint").alias("n_risk"))
    )
    l_q = F.when(F.col("d") >= F.col("n_risk"), F.lit(None)).otherwise(
        F.floor(
            F.log((F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double"))
            * 1e6
            + F.lit(0.5)
        ).cast("bigint")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    folded = risk.select(
        "t",
        "d",
        "n_risk",
        F.sum(l_q).over(w).alias("s_q"),
        F.count(F.when(l_q.isNull(), 1)).over(w).alias("n_dead_tail"),
    )
    return folded.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.when(F.col("n_dead_tail") > 0, F.lit(0.0))
        .otherwise(fround(F.exp(F.col("s_q") / 1e6), 6))
        .alias("km_survival"),
    ).orderBy("t_days")


@query(
    "stats_cuped_adjustment",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
               THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) // 100
               AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
               THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) // 100
               AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per_user
    )
    SELECT n AS n_users,
           floor((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS theta,
           floor((n * syy - sy * sy) / (CAST(n AS DOUBLE) * n) * 1e4 + 0.5)
             / 1e4 AS var_y,
           floor(((n * syy - sy * sy)
                  - (n * sxy - sx * sy) * ((n * sxy - sx * sy)
                    / CAST(n * sxx - sx * sx AS DOUBLE)))
                 / (CAST(n AS DOUBLE) * n) * 1e4 + 0.5) / 1e4 AS var_y_cuped,
           floor((n * sxy - sx * sy) * ((n * sxy - sx * sy)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                 / (n * syy - sy * sy) * 1e6 + 0.5) / 1e6
             AS var_reduction_frac
    FROM m
    """,
)
def stats_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): the
    published variance-reduction adjustment Y' = Y − θ(X − X̄) with
    θ = cov(X,Y)/var(X), where X is each user's pre-period spend (first
    15 days) and Y the experiment-period spend (last 15). Reports θ,
    raw and adjusted metric variance, and the variance-reduction
    fraction ρ² = cov²/(var(X)var(Y)) — the whole point of CUPED is
    that the reduction equals the squared correlation.

    Integer discipline: per-user sums quantize to whole DOLLARS (floor
    of cents/100) so every cross-moment n·Σxy stays inside int64 at any
    user count the fixtures reach; the θ/variance arithmetic then runs
    in doubles from identical integer moments on both engines.

    100 TB: one user-keyed aggregate + one 1-row moment fold — CUPED at
    planet scale is exactly this cheap, which is why every experiment
    platform runs it by default."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' "
            "THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) div 100 "
            "AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' "
            "THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) div 100 "
            "AS BIGINT)"
        ).alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy  # n^2 * cov
    varx_n = (n * sxx - sx * sx).cast("double")  # n^2 * var(X)
    vary_n = n * syy - sy * sy  # n^2 * var(Y)
    theta = cov_n / varx_n
    return m.select(
        n.alias("n_users"),
        fround(theta, 6).alias("theta"),
        fround(vary_n / (n.cast("double") * n), 4).alias("var_y"),
        fround((vary_n - cov_n * theta) / (n.cast("double") * n), 4).alias(
            "var_y_cuped"
        ),
        fround(cov_n * theta / vary_n, 6).alias("var_reduction_frac"),
    )


@query(
    "ml_roc_pr_summary",
    oracle="""
    WITH scored AS (
      SELECT value AS s, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    tot AS (
      SELECT CAST(sum(y) AS BIGINT) AS p,
             CAST(count(*) - sum(y) AS BIGINT) AS neg
      FROM scored
    ),
    grp AS (
      SELECT s, CAST(sum(y) AS BIGINT) AS d_tp,
             CAST(count(*) - sum(y) AS BIGINT) AS d_fp
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s,
             sum(d_tp) OVER w AS tp, sum(d_fp) OVER w AS fp,
             d_tp, d_fp
      FROM grp WINDOW w AS (ORDER BY s DESC)
    ),
    terms AS (
      SELECT
        d_fp * (2 * tp - d_tp) AS roc_num_term,
        CASE WHEN d_tp > 0
             THEN (d_tp * tp * 1000000000) // ((SELECT p FROM tot) * (tp + fp))
             ELSE 0 END AS ap_term_q
      FROM cum
    )
    SELECT (SELECT p FROM tot) AS n_pos, (SELECT neg FROM tot) AS n_neg,
           floor(CAST(sum(roc_num_term) AS DOUBLE)
                 / (2.0 * (SELECT p FROM tot) * (SELECT neg FROM tot))
                 * 1e6 + 0.5) / 1e6 AS auc_roc,
           floor(CAST(sum(ap_term_q) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6
             AS avg_precision
    FROM terms
    """,
)
def ml_roc_pr_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC (trapezoidal, tie-correct — the Mann–Whitney U with the
    ties/2 convention) and average precision (step-interpolated PR
    area), scoring "is this an error event" by the event's value.
    Per-threshold terms are exact rationals: the ROC numerator folds as
    integers (Δfp·(2·tp − Δtp) summed over distinct-score groups equals
    2× the trapezoid area numerator), and each AP term quantizes via
    integer floor-division at 1e-9 before the sum — no float enters any
    reduction.

    100 TB: one scan + a distinct-score aggregate; the cumulative
    window runs over distinct scores (bounded by score cardinality,
    not event count). This is the standard two-pass AUC shape every
    eval harness ships."""
    scored = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("value").alias("s"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
        )
    )
    grp = scored.groupBy("s").agg(
        F.sum("y").cast("bigint").alias("d_tp"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("d_fp"),
    )
    tot = grp.agg(
        F.sum("d_tp").cast("bigint").alias("p"),
        F.sum("d_fp").cast("bigint").alias("neg"),
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    cum = grp.select(
        "d_tp",
        "d_fp",
        F.sum("d_tp").over(w).alias("tp"),
        F.sum("d_fp").over(w).alias("fp"),
    )
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "p",
        "neg",
        (F.col("d_fp") * (2 * F.col("tp") - F.col("d_tp"))).alias("roc_num_term"),
        F.when(
            F.col("d_tp") > 0,
            F.expr("(d_tp * tp * 1000000000) div (p * (tp + fp))"),
        )
        .otherwise(F.lit(0))
        .alias("ap_term_q"),
    )
    return terms.groupBy("p", "neg").agg(
        fround(
            F.sum("roc_num_term").cast("double")
            / (2.0 * F.col("p") * F.col("neg")),
            6,
        ).alias("auc_roc"),
        fround(F.sum("ap_term_q").cast("double") / 1e9, 6).alias("avg_precision"),
    ).select(
        F.col("p").alias("n_pos"),
        F.col("neg").alias("n_neg"),
        "auc_roc",
        "avg_precision",
    )


@query(
    "ml_best_f1_threshold",
    oracle="""
    WITH scored AS (
      SELECT value AS s, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    tot AS (SELECT CAST(sum(y) AS BIGINT) AS p FROM scored),
    grp AS (
      SELECT s, CAST(sum(y) AS BIGINT) AS d_tp,
             CAST(count(*) - sum(y) AS BIGINT) AS d_fp
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, sum(d_tp) OVER w AS tp, sum(d_fp) OVER w AS fp
      FROM grp WINDOW w AS (ORDER BY s DESC)
    ),
    f1 AS (
      SELECT s, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             CAST(t.p - tp AS BIGINT) AS fn,
             CAST((2 * tp * 1000000000) // (2 * tp + fp + (t.p - tp))
                  AS BIGINT) AS f1_q
      FROM cum CROSS JOIN tot t
    )
    SELECT s AS threshold, tp, fp, fn,
           floor(tp / CAST(tp + fp AS DOUBLE) * 1e6 + 0.5) / 1e6 AS precision_at,
           floor(tp / CAST(tp + fn AS DOUBLE) * 1e6 + 0.5) / 1e6 AS recall_at,
           CAST(f1_q AS DOUBLE) / 1e9 AS f1
    FROM (
      SELECT *, row_number() OVER (ORDER BY f1_q DESC, s) AS rk FROM f1
    ) WHERE rk = 1
    """,
)
def ml_best_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection: sweep every distinct score as a
    "predict positive at >= threshold" cut and return the F1-maximizing
    one with its confusion counts and precision/recall. F1 compares as
    the INTEGER 2·tp·1e9 div (2·tp+fp+fn) (floor division of exact
    integers — no float enters the argmax), tie-broken on the lower
    threshold, so both engines pick the same operating point even
    between near-tied cuts. Completes the eval family: ml_roc_pr_summary
    integrates the curve, this picks the deployment point on it.

    100 TB: the same distinct-score cumulative shape as ROC — the sweep
    is score-cardinality, never event-cardinality."""
    scored = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("value").alias("s"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
        )
    )
    # NOTE deliberately not checkpointed: the audit proves the sweep
    # windows bounded by seeing the HashAggregate under them; a
    # checkpoint would hide it (and the saved rescan is one events scan)
    grp = scored.groupBy("s").agg(
        F.sum("y").cast("bigint").alias("d_tp"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("d_fp"),
    )
    tot = grp.agg(F.sum("d_tp").cast("bigint").alias("p"))
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    cum = grp.select(
        "s",
        F.sum("d_tp").over(w).alias("tp"),
        F.sum("d_fp").over(w).alias("fp"),
    )
    f1 = cum.crossJoin(F.broadcast(tot)).select(
        "s",
        "tp",
        "fp",
        (F.col("p") - F.col("tp")).alias("fn"),
        F.expr("(2 * tp * 1000000000) div (2 * tp + fp + (p - tp))").alias(
            "f1_q"
        ),
    )
    return (
        f1.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("f1_q"), F.col("s")))
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("s").alias("threshold"),
            "tp",
            "fp",
            "fn",
            fround(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 6).alias(
                "precision_at"
            ),
            fround(F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"), 6).alias(
                "recall_at"
            ),
            (F.col("f1_q").cast("double") / 1e9).alias("f1"),
        )
    )


@query(
    "ml_calibration_ece",
    oracle="""
    WITH minmax AS (
      SELECT min(value) AS vmin, max(value) AS vmax
      FROM events WHERE value IS NOT NULL
    ),
    scored AS (
      SELECT CAST(floor((value - vmin) / (vmax - vmin) * 1e6 + 0.5) AS BIGINT)
               AS s_q,
             least(CAST(floor((value - vmin) / (vmax - vmin) * 10) AS BIGINT),
                   9) AS bin,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events CROSS JOIN minmax WHERE value IS NOT NULL
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s_q) AS BIGINT) AS sum_sq,
             CAST(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(abs(sum_sq - pos * 1000000)) AS BIGINT) AS gap_total
      FROM bins
    )
    SELECT bin, n,
           floor(sum_sq / (n * 1e6) * 1e6 + 0.5) / 1e6 AS avg_pred,
           floor(pos / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS obs_rate,
           floor(abs(sum_sq - pos * 1000000) / (n * 1e6) * 1e6 + 0.5) / 1e6
             AS gap,
           floor(t.gap_total / (t.n_total * 1e6) * 1e6 + 0.5) / 1e6 AS ece
    FROM bins CROSS JOIN tot t ORDER BY bin
    """,
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error: the event's
    min-max-normalized value plays the model score, "error" the
    positive label; 10 equal-width bins report mean predicted vs
    observed rate and |gap|, and every row carries the corpus ECE
    = Σ n_b/N·|gap_b|. The trick that keeps both engines exact: with
    scores quantized to 1e-6 ints, n_b·|avg_pred − obs| is EXACTLY
    |Σs_q − pos·1e6| — an integer — so the ECE numerator is a sum of
    integers and only the final division is floating.

    100 TB: a 1-row min/max broadcast, then one binned aggregate —
    the shape every model-monitoring pipeline runs per model per day."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    minmax = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    s = (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin"))
    scored = ev.crossJoin(F.broadcast(minmax)).select(
        F.floor(s * 1e6 + F.lit(0.5)).cast("bigint").alias("s_q"),
        F.least(F.floor(s * 10).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "bin"
        ),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )
    bins = (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("s_q").cast("bigint").alias("sum_sq"),
            F.sum("y").cast("bigint").alias("pos"),
        )
        # ≤10 rows feeding BOTH the ECE total and the output — checkpoint
        # once so the events scan runs once per branch, not twice each.
        .localCheckpoint(eager=False)
    )
    gap_int = F.abs(F.col("sum_sq") - F.col("pos") * 1000000)
    tot = bins.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(F.abs(F.col("sum_sq") - F.col("pos") * 1000000))
        .cast("bigint")
        .alias("gap_total"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            fround(F.col("sum_sq") / (F.col("n") * 1e6), 6).alias("avg_pred"),
            fround(F.col("pos") / F.col("n").cast("double"), 6).alias("obs_rate"),
            fround(gap_int / (F.col("n") * 1e6), 6).alias("gap"),
            fround(F.col("gap_total") / (F.col("n_total") * 1e6), 6).alias("ece"),
        )
        .orderBy("bin")
    )


@query(
    "promql_predict_linear",
    oracle="""
    WITH s AS (
      SELECT user_id,
             (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
               // 1000000000 AS t_ks,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t_ks) AS BIGINT) AS st, CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(t_ks * t_ks) AS BIGINT) AS stt,
             CAST(sum(t_ks * v) AS BIGINT) AS stv,
             CAST(max(t_ks) AS BIGINT) AS t_max
      FROM s GROUP BY user_id
    )
    SELECT user_id, n AS n_samples,
           floor((n * stv - st * sv)
                 / CAST(nullif(n * stt - st * st, 0) AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS slope_cents_per_ks,
           floor(((sv - (n * stv - st * sv)
                        / CAST(nullif(n * stt - st * st, 0) AS DOUBLE) * st) / n
                  + (n * stv - st * sv)
                    / CAST(nullif(n * stt - st * st, 0) AS DOUBLE)
                    * (t_max + 3.6)) * 1e4 + 0.5) / 1e4 AS predicted_cents
    FROM m WHERE n >= 2 AND n * stt - st * st <> 0
    ORDER BY user_id
    """,
)
def promql_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``deriv()`` + ``predict_linear()`` parity: per series
    (user), simple least-squares of value-in-cents on time, slope in
    cents per kilosecond, extrapolated one hour (3.6 ks) past the last
    sample — the published Prometheus semantics (least-squares over the
    range, linear extrapolation). Time enters as integer kiloseconds
    since the series' first sample (an integer floor-division of
    epoch-microseconds), which keeps every moment n·Σt² inside int64 at
    any per-series sample count the fixtures reach while preserving
    determinism; the slope/intercept arithmetic runs in doubles from
    identical integer moments.

    100 TB: one shuffle on series key; per-series moments are a plain
    aggregate — the same per-series independence a PromQL engine shards
    by (the promql_rate_counter_resets note)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wmin = Window.partitionBy("user_id")
    s = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) - "
            "min(unix_micros(CAST(ts AS TIMESTAMP))) "
            "OVER (PARTITION BY user_id)) div 1000000000"
        ).alias("t_ks"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    m = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t_ks").cast("bigint").alias("st"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("t_ks") * F.col("t_ks")).cast("bigint").alias("stt"),
        F.sum(F.col("t_ks") * F.col("v")).cast("bigint").alias("stv"),
        F.max("t_ks").cast("bigint").alias("t_max"),
    )
    n, st, sv = F.col("n"), F.col("st"), F.col("sv")
    den = F.nullif(n * F.col("stt") - st * st, F.lit(0)).cast("double")
    slope = (n * F.col("stv") - st * sv) / den
    intercept = (sv - slope * st) / n
    return (
        m.filter((n >= 2) & ((n * F.col("stt") - st * st) != 0))
        .select(
            "user_id",
            n.alias("n_samples"),
            fround(slope, 6).alias("slope_cents_per_ks"),
            fround(intercept + slope * (F.col("t_max") + 3.6), 4).alias(
                "predicted_cents"
            ),
        )
        .orderBy("user_id")
    )
