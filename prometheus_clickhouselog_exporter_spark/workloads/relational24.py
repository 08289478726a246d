"""Relational battery, round 4 batch 2: bitwise aggregates, interpolated
(continuous) quantiles, and equi-depth histograms — the last standard
aggregate shapes without a certified row.

House discipline throughout: integer/rank arithmetic end to end, one
frounded float at the edge, and RANKS COME FROM VALUES — both quantile
queries use the value-grouped recipe (fold to per-value counts, rank =
exclusive running count over the DISTINCT-value series), so no window
ever sees corpus-sized input (the bounded-global-window invariant
tools/plan_audit.py enforces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "agg_bitwise_flags",
    oracle="""
    WITH f AS (
      SELECT event_type,
             CAST(
               CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN value >= 50 THEN 2 ELSE 0 END
               + CASE WHEN event_id % 2 = 0 THEN 4 ELSE 0 END
               + CASE WHEN user_id % 10 = 0 THEN 8 ELSE 0 END
             AS BIGINT) AS flags
      FROM events
    )
    SELECT event_type,
           CAST(bit_or(flags) AS BIGINT) AS any_flags,
           CAST(bit_and(flags) AS BIGINT) AS all_flags,
           CAST(bit_xor(flags) AS BIGINT) AS parity_flags,
           CAST(count(*) AS BIGINT) AS n
    FROM f GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate battery — the flag-set analysis shape (feature
    bitmasks, permission audits, capability matrices): per event type,
    bit_or = "any row has the bit", bit_and = "every row has the bit",
    bit_xor = occurrence PARITY per bit (the order-free checksum trick
    the connected-components convergence check uses). All three are
    commutative/associative, so they fold map-side like sums — the
    cheapest aggregates in the engine, and exactly reproducible by
    definition (no float anywhere)."""
    e = table(spark, sf_dir, "events")
    flags = (
        F.when(F.col("value").isNotNull(), 1).otherwise(0)
        + F.when(F.col("value") >= 50, 2).otherwise(0)
        + F.when(F.col("event_id") % 2 == 0, 4).otherwise(0)
        + F.when(F.col("user_id") % 10 == 0, 8).otherwise(0)
    ).cast("bigint")
    return (
        e.select("event_type", flags.alias("flags"))
        .groupBy("event_type")
        .agg(
            F.bit_or("flags").alias("any_flags"),
            F.bit_and("flags").alias("all_flags"),
            F.bit_xor("flags").alias("parity_flags"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def _value_ranks(e: DataFrame, keys: list[str]) -> DataFrame:
    """The value-grouped rank table: per (keys, cents) — occurrence
    count k, exclusive cumulative count cum (= rank of the value's
    first occurrence − 1), and the per-key total n. Every window runs
    over the DISTINCT-value series behind the aggregate (bounded)."""
    g = e.groupBy(*keys, "cents").agg(F.count(F.lit(1)).alias("k"))
    wv = (
        Window.partitionBy(*keys)
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wk = Window.partitionBy(*keys)
    return g.select(
        *keys,
        "cents",
        "k",
        F.coalesce(F.sum("k").over(wv), F.lit(0)).alias("cum"),
        F.sum("k").over(wk).alias("n"),
    )


@query(
    "quantile_cont_interpolated",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, cents, CAST(count(*) AS BIGINT) AS k
      FROM q GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, cents, k,
             coalesce(sum(k) OVER (PARTITION BY event_type ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
             sum(k) OVER (PARTITION BY event_type) AS n
      FROM g
    ),
    marks AS (
      SELECT r.event_type, r.n, p.p,
             ((r.n - 1) * p.p) // 100 + 1 AS rlo,
             ((r.n - 1) * p.p) % 100 AS frac100
      FROM (SELECT DISTINCT event_type, n FROM r) r,
           (VALUES (25), (50), (75), (90)) p(p)
    )
    SELECT m.event_type, CAST(m.p AS INT) AS pct,
           floor(((CAST(lo.cents AS DOUBLE)
                   + (CAST(m.frac100 AS DOUBLE) / 100)
                     * (CAST(hi.cents AS DOUBLE) - CAST(lo.cents AS DOUBLE)))
                  / 100) * 1e6 + 0.5) / 1e6 AS q_cont
    FROM marks m
    JOIN r lo ON lo.event_type = m.event_type
             AND m.rlo > lo.cum AND m.rlo <= lo.cum + lo.k
    JOIN r hi ON hi.event_type = m.event_type
             AND (CASE WHEN m.frac100 = 0 THEN m.rlo ELSE m.rlo + 1 END) > hi.cum
             AND (CASE WHEN m.frac100 = 0 THEN m.rlo ELSE m.rlo + 1 END)
                 <= hi.cum + hi.k
    ORDER BY m.event_type, pct
    """,
)
def quantile_cont_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS (interpolated) quantiles per key — percentile_cont
    semantics from VALUE-GROUPED rank arithmetic, so both engines
    compute the IDENTICAL value and no window ever sees corpus rows:
    at percentile p over n ordered values the target position is
    h = (n−1)·p; with whole-percent p, h·100 is an exact integer, so
    the bracketing ranks ⌊h⌋+1 / ⌊h⌋+2 and the interpolation fraction
    come from integer division/modulo. The value AT a rank is the
    distinct value whose occupancy interval (cum, cum+k] covers it —
    a range probe of the 4-marks-per-key table against the
    value-cardinality rank table, no per-row rank anywhere (ranks come
    from values — the Mann-Whitney recipe). The builtin
    percentile_cont is deliberately avoided: its internal arithmetic
    order is implementation-defined; this derivation is the portable
    contract. Values quantize to exact cents; the shared lerp is the
    one float op sequence.
    """
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    r = _value_ranks(
        e.select("event_type", F.floor(F.col("value") * 100).cast("bigint").alias("cents")),
        ["event_type"],
    ).localCheckpoint(eager=False)  # value-cardinality; marks + two probes
    pcts = spark.createDataFrame([(25,), (50,), (75,), (90,)], "p int")
    marks = (
        r.select("event_type", "n")
        .distinct()
        .crossJoin(F.broadcast(pcts))
        .select(
            "event_type",
            "p",
            # integer DIV, not double division + cast: at row counts near
            # 2^53 the double quotient can round up where floor division
            # does not (house rule — exact rank arithmetic end to end)
            (F.expr("((n - 1) * p) DIV 100") + 1).alias("rlo"),
            (((F.col("n") - 1) * F.col("p")) % 100).alias("frac100"),
        )
    )
    lo = r.select(
        F.col("event_type").alias("et"), F.col("cents").alias("c_lo"),
        F.col("cum").alias("cum1"), F.col("k").alias("k1"),
    )
    hi = r.select(
        F.col("event_type").alias("et2"), F.col("cents").alias("c_hi"),
        F.col("cum").alias("cum2"), F.col("k").alias("k2"),
    )
    rhi_want = F.when(F.col("frac100") == 0, F.col("rlo")).otherwise(F.col("rlo") + 1)
    j = (
        marks.join(
            lo,
            (F.col("et") == F.col("event_type"))
            & (F.col("rlo") > F.col("cum1"))
            & (F.col("rlo") <= F.col("cum1") + F.col("k1")),
        )
        .withColumn("rhi_want", rhi_want)
        .join(
            hi,
            (F.col("et2") == F.col("event_type"))
            & (F.col("rhi_want") > F.col("cum2"))
            & (F.col("rhi_want") <= F.col("cum2") + F.col("k2")),
        )
    )
    lerp = (
        F.col("c_lo").cast("double")
        + (F.col("frac100").cast("double") / 100)
        * (F.col("c_hi").cast("double") - F.col("c_lo").cast("double"))
    ) / 100
    return j.select(
        "event_type",
        F.col("p").cast("int").alias("pct"),
        fround(lerp, 6).alias("q_cont"),
    ).orderBy("event_type", "pct")


@query(
    "hist_equidepth_values",
    oracle="""
    WITH q AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT cents, CAST(count(*) AS BIGINT) AS k FROM q GROUP BY 1),
    r AS (
      SELECT cents, k,
             coalesce(sum(k) OVER (ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
             sum(k) OVER () AS n
      FROM g
    )
    SELECT CAST((cum * 8) // n AS INT) AS bucket,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM r GROUP BY 1 ORDER BY bucket
    """,
)
def hist_equidepth_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-ATOMIC equi-depth histogram of event values — the partner
    of the equi-width form (hist_equiwidth_events): 8 buckets of
    roughly equal row mass whose boundaries land wherever the data
    puts them, with ties NEVER split — a distinct value's whole tie
    group goes to the bucket of its first rank (bucket =
    ⌊cum_exclusive·8/n⌋), which is what real optimizer histograms do
    (splitting a tie across buckets is meaningless for selectivity).
    Pure value-grouped rank arithmetic: counts fold map-side, the
    sweep window runs over DISTINCT cents behind the aggregate (the
    bounded-global-window invariant holds), and every output cell is
    an exact integer.

    Equi-depth is what drift monitors and optimizers want from a
    histogram: every bucket carries equal evidence, so a moved
    boundary IS the signal; the equi-width form wastes buckets on
    empty ranges."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    r = _value_ranks(
        e.select(F.floor(F.col("value") * 100).cast("bigint").alias("cents")),
        [],  # global series — the keys=[] case of the shared rank table
    )
    return (
        r.groupBy(F.expr("(cum * 8) DIV n").cast("int").alias("bucket"))
        .agg(
            F.sum("k").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "growth_accounting_weekly",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
      FROM events
    ),
    lagged AS (
      SELECT user_id, week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
      FROM wk
    ),
    states AS (
      SELECT week,
             CASE WHEN prev_week IS NULL THEN 'new'
                  WHEN prev_week = week - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM lagged
    ),
    active AS (
      SELECT week, state, CAST(count(*) AS BIGINT) AS n_users
      FROM states GROUP BY 1, 2
    ),
    churned AS (
      SELECT CAST(week + INTERVAL 7 DAY AS DATE) AS week,
             'churned' AS state, CAST(count(*) AS BIGINT) AS n_users
      FROM lagged a
      WHERE NOT EXISTS (
        SELECT 1 FROM wk b
        WHERE b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
      )
      AND a.week + INTERVAL 7 DAY <= (SELECT max(week) FROM wk)
      GROUP BY 1
    )
    SELECT CAST(week AS VARCHAR) AS week, state, n_users
    FROM (SELECT * FROM active UNION ALL SELECT * FROM churned)
    ORDER BY week, state
    """,
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly GROWTH ACCOUNTING — the new/retained/resurrected/churned
    user-state decomposition every growth team reports (active(t) =
    new + retained + resurrected; churned(t) = active(t−1) − retained):
    a user is `new` on their first-ever active week, `retained` when
    active the immediately previous week too, `resurrected` when
    returning after a gap, and `churned` (attributed to week t) when
    active in t−1 but not t — with the final observed week excluded
    from churn (its successor is unobservable, not empty). Weeks are
    emitted as strings (the DATE-dtype cross-engine rule).

    Scale shape: the corpus folds to DISTINCT (user, week) map-side
    first; the lag window partitions by user (bounded per key); churn
    is an anti-join of user-weeks against their own successors — all
    (user×week)-cardinality, nothing corpus-sized past the first fold.
    """
    e = table(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week")
    ).distinct().localCheckpoint(eager=False)  # (user, week)-sized; 3 consumers
    lagged = wk.select(
        "user_id",
        "week",
        F.lag("week").over(Window.partitionBy("user_id").orderBy("week")).alias(
            "prev_week"
        ),
    )
    states = lagged.select(
        "week",
        F.when(F.col("prev_week").isNull(), "new")
        .when(F.col("prev_week") == F.date_sub(F.col("week"), 7), "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    active = states.groupBy("week", "state").agg(F.count(F.lit(1)).alias("n_users"))
    nxt = wk.select(
        F.col("user_id").alias("u2"), F.col("week").alias("w2")
    )
    max_week = wk.agg(F.max("week").alias("mw"))
    churned = (
        wk.join(
            nxt,
            (F.col("u2") == F.col("user_id"))
            & (F.col("w2") == F.date_add(F.col("week"), 7)),
            "left_anti",
        )
        .crossJoin(F.broadcast(max_week))
        .filter(F.date_add(F.col("week"), 7) <= F.col("mw"))
        .select(F.date_add(F.col("week"), 7).alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select("week", F.lit("churned").alias("state"), "n_users")
    )
    return (
        active.select("week", "state", "n_users")
        .unionByName(churned)
        .select(F.col("week").cast("string").alias("week"), "state", "n_users")
        .orderBy("week", "state")
    )


@query(
    "text_char_entropy_by_source",
    oracle="""
    WITH chars AS (
      SELECT source, unnest(regexp_extract_all(text, '.')) AS ch
      FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
      SELECT source, ch, CAST(count(*) AS BIGINT) AS c FROM chars GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1)
    SELECT c.source, t.n AS n_chars,
           CAST(count(*) AS BIGINT) AS distinct_chars,
           floor((-sum((CAST(c.c AS DOUBLE) / t.n)
                       * log2(CAST(c.c AS DOUBLE) / t.n)))
                 * 1e6 + 0.5) / 1e6 AS entropy_bits
    FROM counts c JOIN tot t ON t.source = c.source
    GROUP BY c.source, t.n ORDER BY c.source
    """,
)
def text_char_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per source — the
    information-theoretic quality proxy (low entropy = repetitive or
    template-heavy feeds; natural language sits in a narrow band per
    script, so an outlying source is a data-quality flag — the
    compression-ratio screen without a compressor). Characters are
    code points via regexp `.` on BOTH engines (multibyte zh counts as
    one char each side); frequencies are exact integers; the entropy
    sum is the one float fold, frounded at 1e-6 — log2 is libm and may
    differ in the last ulp, absorbed exactly as the PSI docstring
    documents for reported magnitudes.

    Scale: one explode pass (corpus chars), counts fold map-side to
    (source × alphabet) rows — the alphabet bounds everything
    downstream; the entropy aggregate is per-source tiny."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    chars = d.select(
        "source", F.explode(F.regexp_extract_all(F.col("text"), F.lit("."), 0)).alias("ch")
    )
    counts = chars.groupBy("source", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        counts.join(tot, "source")
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("distinct_chars"),
            fround(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
        )
        .select(
            "source",
            F.col("n").alias("n_chars"),
            "distinct_chars",
            "entropy_bits",
        )
        .orderBy("source")
    )
