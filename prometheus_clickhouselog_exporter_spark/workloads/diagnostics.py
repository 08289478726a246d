"""Behavioral-sequence and distribution-diagnostic operators (r3 batch 3):
event-transition Markov matrix, population-stability drift (PSI), and
join-key skew profiling — the observability queries a 100 TB pipeline
runs about ITSELF (is the key distribution joinable? did the input drift
since yesterday's snapshot?) plus sequence features for behavior models.

Reference analog: the exporter's per-type counters (metrics.go:23-40) are
degenerate 1-step distribution snapshots; these generalize to transitions
and cross-snapshot comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    trans AS (
      SELECT prev, event_type AS next, count(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, next
    ),
    totals AS (SELECT prev, sum(n) AS tot FROM trans GROUP BY prev)
    SELECT t.prev, t.next, t.n,
           floor(CAST(t.n AS DOUBLE) / tot.tot * 1000000 + 0.5) / 1000000 AS p
    FROM trans t JOIN totals tot USING (prev)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next | prev) with counts — the behavioral-feature table
    session-based recommenders and anomaly models train on. Probability
    is an exact integer ratio under one IEEE division (no libm).

    100 TB: ONE shuffle on user_id for the lag window; the transition
    aggregation re-keys to the 25-cell (prev, next) space, whose partial
    aggregation collapses each mapper's output to ≤25 rows — the
    exchange after the window is label-cardinality, not data-sized.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev"))
    trans = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("prev")
    return trans.select(
        "prev",
        "next",
        "n",
        fround(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("p"),
    )


@query(
    "drift_psi_value_halves",
    oracle="""
    WITH bucketed AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'ref' ELSE 'cur' END AS half,
             least(CAST(floor(value / 50) AS BIGINT), 7) AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT bucket,
             sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS n_cur
      FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts)
    SELECT c.bucket, CAST(c.n_ref AS BIGINT) AS n_ref, CAST(c.n_cur AS BIGINT) AS n_cur,
           floor((CAST(c.n_cur AS DOUBLE) / t.tc - CAST(c.n_ref AS DOUBLE) / t.tr)
                 * ln((CAST(c.n_cur AS DOUBLE) / t.tc) / (CAST(c.n_ref AS DOUBLE) / t.tr))
                 * 1000000 + 0.5) / 1000000 AS psi_term
    FROM counts c, tot t
    """,
)
def drift_psi_value_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    month, per value bucket: psi_term = (q−p)·ln(q/p); Σ terms > 0.2 is
    the standard "input drifted, retrain/investigate" alarm. The
    distribution-drift check a pipeline runs between yesterday's corpus
    snapshot and today's.

    100 TB: both halves bucket in the SAME scan (conditional partial
    aggregation — no second pass, no join of two snapshots); the
    exchange carries 8 bucket rows per mapper. ln() is libm and may
    differ by 1 ulp across engines — acceptable here because psi_term is
    a reported magnitude, not a rank key, and fround(6) absorbs it.
    """
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    half = F.when(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "ref").otherwise(
        "cur"
    )
    bucket = F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(7))
    counts = (
        e.select(half.alias("half"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "ref", 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("half") == "cur", 1).otherwise(0)).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    q = F.col("n_cur").cast("double") / F.col("tc")
    p = F.col("n_ref").cast("double") / F.col("tr")
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        fround((q - p) * F.log(q / p), 6).alias("psi_term"),
    )


@query(
    "keyskew_gini_customers",
    oracle="""
    WITH k AS (
      SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n, o_custkey) AS i,
             count(*) OVER () AS nk, sum(n) OVER () AS tot
      FROM k
    )
    SELECT CAST(max(nk) AS BIGINT) AS n_keys,
           CAST(max(tot) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           floor((2.0 * sum(CAST(i AS DOUBLE) * n) / (max(nk) * max(tot))
                  - CAST(max(nk) + 1 AS DOUBLE) / max(nk))
                 * 1000000 + 0.5) / 1000000 AS gini
    FROM ranked
    """,
)
def keyskew_gini_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders.o_custkey: key count, row count,
    hottest key, and the Gini coefficient of the per-key row distribution
    (0 = uniform, →1 = one key owns the table). The pre-flight check that
    decides whether a planned 100 TB join needs salting/AQE skew handling
    BEFORE burning cluster-hours; everything except the rank is integer
    arithmetic, and the rank order (n, key) is total, so the result is
    deterministic cross-engine.

    100 TB: per-key counts are one partial+final agg; the global sort for
    ranks runs on the KEY-COUNT table (|keys| rows, not |rows|) — for
    billion-key tables swap in the two-level distributed prefix-sum
    (range_join_value_neighbors' CDF trick) over count buckets.
    """
    o = table(spark, sf_dir, "orders")
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy("n", "o_custkey")
    wall = Window.partitionBy()
    ranked = k.select(
        "n",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("nk"),
        F.sum("n").over(wall).alias("tot"),
    )
    return ranked.agg(
        F.max("nk").alias("n_keys"),
        F.max("tot").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        fround(
            2.0 * F.sum(F.col("i").cast("double") * F.col("n"))
            / (F.max("nk") * F.max("tot"))
            - (F.max("nk") + 1).cast("double") / F.max("nk"),
            6,
        ).alias("gini"),
    )
