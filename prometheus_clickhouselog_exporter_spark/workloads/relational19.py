"""Relational battery, round 3 batch 21: autocorrelation, duplicate-
event screening, Cohen's d, and the co-purchase degree profile.

Autocorrelation is the SELF-series member of the lag family
(timeseries_xcorr_lag correlated two series; ACF correlates a series
with its own shifts — the periodicity detector feeding seasonal
models). The duplicate-event screen is the ingestion-DQ staple: same
user, same event type, suspiciously close in time — the measurement
that sizes a dedup-within-watermark policy. Cohen's d adds
the standardized-mean-difference effect size next to the AUC effect
(stats_mann_whitney_u) — the two numbers every A/B readout needs.
The co-purchase degree profile graphs parts that ship together and
reports the degree distribution — the connectivity audit run before
any recommendation or substitution model.

Float discipline per workloads/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import copurchase_edges, fround, query, table


@query(
    "timeseries_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    lags AS (SELECT CAST(r.l + 1 AS INT) AS lag FROM range(7) r(l)),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(c) AS DOUBLE) AS s,
             CAST(sum(c * c) AS DOUBLE) AS ss
      FROM daily
    ),
    shifted AS (
      SELECT lag,
             count(*) AS n_overlap,
             CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
             CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy
      FROM lags, daily a JOIN daily b ON b.d = a.d + CAST(lag AS INT)
      GROUP BY lag
    )
    SELECT s.lag, CAST(s.n_overlap AS BIGINT) AS n_overlap,
           floor((((CAST(s.sxy AS DOUBLE) / s.n_overlap)
                   - ((CAST(s.sx AS DOUBLE) / s.n_overlap)
                      * (CAST(s.sy AS DOUBLE) / s.n_overlap)))
                  / ((m.ss / m.n) - ((m.s / m.n) * (m.s / m.n))))
                 * 1e6 + 0.5) / 1e6 AS acf
    FROM shifted s, m ORDER BY s.lag
    """,
)
def timeseries_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7 —
    the periodicity detector (a weekly cycle spikes lag 7) and the
    i.i.d. check behind every forecasting model. Each lag's
    co-moment uses the exact integer sums over the OVERLAP window,
    normalized by the full-series variance (the standard plug-in ACF)
    — every input to the final expression is an exact integer, so the
    frounded ACF is deterministic.

    Scale: the fact table folds to |days| rows once; the 7 shifted
    joins are day-keyed equi-joins against the broadcast lag set —
    same plan family as timeseries_xcorr_lag, normalized.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # days-sized; moments + both join sides
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("ss"),
    )
    lags = spark.range(7).select((F.col("id") + 1).cast("int").alias("lag"))
    a, b = daily.alias("a"), daily.alias("b")
    shifted = (
        a.crossJoin(F.broadcast(lags))
        .select("lag", F.date_add(F.col("a.d"), F.col("lag")).alias("db"),
                F.col("a.c").alias("ca"))
        .join(b, F.col("db") == F.col("b.d"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.sum(F.col("ca") * F.col("b.c")).cast("bigint").alias("sxy"),
            F.sum("ca").cast("bigint").alias("sx"),
            F.sum(F.col("b.c")).cast("bigint").alias("sy"),
        )
    )
    no = F.col("n_overlap").cast("double")
    cov = (F.col("sxy").cast("double") / no) - (
        (F.col("sx").cast("double") / no) * (F.col("sy").cast("double") / no)
    )
    var = (F.col("ss") / F.col("n")) - ((F.col("s") / F.col("n")) * (F.col("s") / F.col("n")))
    return (
        shifted.crossJoin(F.broadcast(m))
        .select(
            "lag",
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            fround(cov / var, 6).alias("acf"),
        )
        .orderBy("lag")
    )


@query(
    "dq_duplicate_event_screen",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us
      FROM events
    )
    SELECT a.user_id, a.event_type,
           a.event_id AS event_a, b.event_id AS event_b,
           CAST((b.us - a.us) // 1000000 AS BIGINT) AS gap_sec
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_type = b.event_type
     AND a.event_id < b.event_id
     AND b.us >= a.us - 3600000000 AND b.us <= a.us + 3600000000
    ORDER BY a.user_id, a.event_type, event_a, event_b
    """,
)
def dq_duplicate_event_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-submission screen: pairs of events by the SAME user
    of the SAME type within ±1 hour — the retry/double-click audit
    run over ingestion streams before dedup policy is set (the batch
    analog of dropDuplicatesWithinWatermark's question: HOW MUCH
    near-duplicate traffic is there, and how close together?).
    Exactly-once pair emission via the event-id ordering; the gap is
    exact integer seconds.

    Scale: equi-join on the (user, type) composite key — the blocking
    discipline: buckets are per-user-per-type event counts, and the
    time window is a residual filter, never the join condition. At
    100 TB this is one co-partitioned shuffle of (key, id, ts)
    triples. The self-join's two scans are DELIBERATE (plan-audit
    eventsx2): both are column-pruned to 4 fields, and re-reading a
    pruned columnar scan is cheaper than materializing the projection
    the checkpoint-once rule would write — that rule applies to
    DERIVED aggregates, not raw pruned scans. The same plan with a
    tighter window IS the streaming dedup's state-size estimator.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", us.alias("us")
    )
    a, b = e.alias("a"), e.alias("b")
    gap = F.col("b.us") - F.col("a.us")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (gap >= -3600000000)
            & (gap <= 3600000000),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_type").alias("event_type"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            F.expr("(b.us - a.us) DIV 1000000").alias("gap_sec"),
        )
        .orderBy("user_id", "event_type", "event_a", "event_b")
    )


@query(
    "stats_cohens_d",
    oracle="""
    WITH q AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS x
      FROM customer
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sxd,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxxd
      FROM q GROUP BY grp
    ),
    wide AS (
      SELECT
        max(CASE WHEN grp = 'A' THEN n END) AS na,
        max(CASE WHEN grp = 'B' THEN n END) AS nb,
        CAST(max(CASE WHEN grp = 'A' THEN sxd END) AS DOUBLE) AS sa,
        CAST(max(CASE WHEN grp = 'B' THEN sxd END) AS DOUBLE) AS sb,
        CAST(max(CASE WHEN grp = 'A' THEN sxxd END) AS DOUBLE) AS ssa,
        CAST(max(CASE WHEN grp = 'B' THEN sxxd END) AS DOUBLE) AS ssb
      FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor(((sa / na) / 100) * 1e4 + 0.5) / 1e4 AS mean_a,
           floor(((sb / nb) / 100) * 1e4 + 0.5) / 1e4 AS mean_b,
           floor((((sa / na) - (sb / nb))
                  / nullif(sqrt(greatest(0.0,
                       (((ssa - ((sa * sa) / na))
                         + (ssb - ((sb * sb) / nb)))
                        / CAST(na + nb - 2 AS DOUBLE)))), 0.0))
                 * 1e6 + 0.5) / 1e6 AS cohens_d
    FROM wide
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between the deterministic parity split of customers
    (the stats_ab_test_zscore assignment): standardized mean
    difference with the pooled standard deviation — the effect-size
    number that belongs NEXT TO a significance test (the z-test says
    'real?', d says 'how big?'; the AUC effect in stats_mann_whitney_u
    is its rank-based sibling). Group moments ride DECIMAL(38), and
    the pooled-SD expression is one shared float formula over exact
    inputs, frounded.

    Scale: a 2-group moment aggregate with map-side combine, then
    1-row arithmetic — the same mergeable-moments contract as every
    moment statistic here.
    """
    c = table(spark, sf_dir, "customer")
    q = c.select(
        F.when(F.col("c_custkey") % 2 == 0, "A").otherwise("B").alias("grp"),
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
    )
    g = q.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sxd"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxxd"),
    )
    pick = lambda grp, col: F.max(F.when(F.col("grp") == grp, F.col(col)))  # noqa: E731
    wide = g.agg(
        pick("A", "n").alias("na"),
        pick("B", "n").alias("nb"),
        pick("A", "sxd").cast("double").alias("sa"),
        pick("B", "sxd").cast("double").alias("sb"),
        pick("A", "sxxd").cast("double").alias("ssa"),
        pick("B", "sxxd").cast("double").alias("ssb"),
    )
    na, nb, sa, sb, ssa, ssb = (
        F.col(k) for k in ("na", "nb", "sa", "sb", "ssa", "ssb")
    )
    # greatest(0,·) absorbs the negative-ulp cancellation case (DuckDB's
    # sqrt errors on it); nullif makes a truly-zero pooled SD yield NULL
    # identically in both engines instead of Spark-NaN vs DuckDB-div
    pooled = F.expr(
        "nullif(sqrt(greatest(0.0D, "
        "((ssa - ((sa * sa) / na)) + (ssb - ((sb * sb) / nb)))"
        " / CAST(na + nb - 2 AS DOUBLE))), 0.0D)"
    )
    return wide.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        fround((sa / na) / 100, 4).alias("mean_a"),
        fround((sb / nb) / 100, 4).alias("mean_b"),
        fround(((sa / na) - (sb / nb)) / pooled, 6).alias("cohens_d"),
    )


@query(
    "graph_copurchase_degree",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    degree AS (
      SELECT p, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT pa AS p FROM edges UNION ALL SELECT pb FROM edges)
      GROUP BY p
    ),
    hist AS (
      SELECT CAST(length(bin(deg)) AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(min(deg) AS BIGINT) AS min_deg,
             CAST(max(deg) AS BIGINT) AS max_deg
      FROM degree GROUP BY 1
    )
    SELECT bucket, n_parts, min_deg, max_deg
    FROM hist ORDER BY bucket
    """,
)
def graph_copurchase_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (parts appearing
    on the same order are adjacent), rolled into power-of-two degree
    buckets — the connectivity audit (is the graph hub-dominated or
    flat?) run before any recommendation/substitution model built on
    co-occurrence. Per-order pair expansion is bounded by order SIZE
    (≤ C(lines-per-order, 2) pairs each), never corpus size; the log2
    bucket is the binary-string-length trick again (no libm).

    Scale: one distinct projection, one order-keyed self-join whose
    buckets are order-sized, one degree aggregate keyed by part.
    100 TB co-purchase graphs are built exactly this way — the skew
    guard is the per-order line cap in the schema.
    """
    li = table(spark, sf_dir, "lineitem")
    # one-exchange edge build (r13 optimization pass — core.copurchase_edges;
    # collect_set subsumes the old lines-level distinct)
    edges = (
        copurchase_edges(li.select("l_orderkey", "l_partkey"), directed=False)
        .select(F.col("src").alias("pa"), F.col("dst").alias("pb"))
        .localCheckpoint(eager=False)  # edge list; both endpoints fan out
    )
    degree = (
        edges.select(F.col("pa").alias("p"))
        .unionByName(edges.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    return (
        degree.groupBy(F.length(F.bin("deg")).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.min("deg").cast("bigint").alias("min_deg"),
            F.max("deg").cast("bigint").alias("max_deg"),
        )
        .orderBy("bucket")
    )
