"""Round 10 batch: TOST equivalence testing, ClickHouse quantileTiming
bucket parity, SAX motif symbolization, and a t-closeness privacy audit
— all integer-moment exact or quantized-per-row deterministic, every
one DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these surfaces; §2.3 north-star territory.
Methods are public: Schuirmann 1987 (TOST), the ClickHouse
quantileTiming timing-histogram bucket layout as documented in the
public CH docs (exact below 1024 ms, 16 ms steps to 30 s, clamp at
30 s), Lin et al. 2003 (SAX), and Li/Li/Venkatasubramanian 2007
(t-closeness with ordered-distance EMD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- TOST equivalence ---------------------------------------------------------

_TOST_ORACLE = """
    WITH ms AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    ),
    g AS (SELECT CAST(sum(n) AS BIGINT) AS gn, CAST(sum(s) AS BIGINT) AS gs,
                 CAST(sum(s2) AS BIGINT) AS gs2 FROM ms),
    t AS (
      SELECT source, n, gn - n AS nr,
             CAST(s AS DOUBLE) / n - CAST(gs - s AS DOUBLE) / (gn - n) AS d,
             (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) AS var_s,
             (CAST(gs2 - s2 AS DOUBLE)
              - CAST(gs - s AS DOUBLE) * (gs - s) / (gn - n)) / (gn - n - 1)
               AS var_r,
             CAST(gs AS DOUBLE) / gn * 0.05 AS delta
      FROM ms, g
    ),
    z AS (
      SELECT source, n, d, delta, sqrt(var_s / n + var_r / nr) AS se FROM t
    )
    SELECT source, n,
           floor(d * 1e6 + 0.5) / 1e6 AS mean_diff,
           floor(((d + delta) / se) * 1e6 + 0.5) / 1e6 AS t_lower,
           floor(((d - delta) / se) * 1e6 + 0.5) / 1e6 AS t_upper,
           ((d + delta) / se > 1.6449 AND (d - delta) / se < -1.6449)
             AS equivalent
    FROM z ORDER BY source
    """


@query("stats_tost_equivalence", oracle=_TOST_ORACLE)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987): for each source, are its
    mean doc lengths equivalent to the pooled rest within a ±5%-of-grand-
    mean margin? Two one-sided large-sample z statistics (critical value
    1.6449 at alpha=0.05, documented large-sample form); equivalence
    holds iff BOTH reject. All moments are exact BIGINT sums (n_chars is
    integral); doubles appear only in the final ratios, so both engines
    evaluate identical IEEE sequences.

    100 TB: one map-side-combinable groupBy(source) census; the grand
    moments are the 1-row sum of the per-source frame (broadcast scalar
    parameterization, the whitelisted pattern). No windows, no rescans."""
    ms = table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    ).localCheckpoint(eager=False)  # census reused for grand moments
    g = ms.agg(
        F.sum("n").cast("bigint").alias("gn"),
        F.sum("s").cast("bigint").alias("gs"),
        F.sum("s2").cast("bigint").alias("gs2"),
    )
    t = ms.join(F.broadcast(g))
    nr = F.col("gn") - F.col("n")
    d = F.col("s").cast("double") / F.col("n") - (
        F.col("gs") - F.col("s")
    ).cast("double") / nr
    var_s = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    var_r = (
        (F.col("gs2") - F.col("s2")).cast("double")
        - (F.col("gs") - F.col("s")).cast("double")
        * (F.col("gs") - F.col("s"))
        / nr
    ) / (nr - 1)
    delta = F.col("gs").cast("double") / F.col("gn") * 0.05
    se = F.sqrt(var_s / F.col("n") + var_r / nr)
    t_lo = (d + delta) / se
    t_hi = (d - delta) / se
    return t.select(
        "source",
        "n",
        fround(d, 6).alias("mean_diff"),
        fround(t_lo, 6).alias("t_lower"),
        fround(t_hi, 6).alias("t_upper"),
        ((t_lo > 1.6449) & (t_hi < -1.6449)).alias("equivalent"),
    ).orderBy("source")


# --- ClickHouse quantileTiming bucket parity ---------------------------------

_QT_ORACLE = """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS ms
      FROM events
    ),
    b AS (
      SELECT event_type,
             CASE WHEN ms < 1024 THEN ms
                  WHEN ms < 30000 THEN 1024 + ((ms - 1024) // 16) * 16
                  ELSE 30000 END AS bucket
      FROM v
    ),
    pb AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY event_type, bucket
    ),
    cum AS (
      SELECT event_type, bucket,
             CAST(sum(cnt) OVER w AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM pb
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN bucket END) AS qt50,
           min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN bucket END) AS qt90,
           min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS qt99
    FROM cum GROUP BY event_type ORDER BY event_type
    """


@query("clickhouse_quantile_timing", oracle=_QT_ORACLE)
def clickhouse_quantile_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse quantileTiming bucket semantics (public CH docs:
    timing histograms store values < 1024 ms exactly, 1024..30000 ms in
    16 ms steps, and clamp anything >= 30 s to 30000): per event_type,
    the 50/90/99th timing quantiles with rank convention
    ceil(q*n) over the bucketized distribution — deterministic by
    construction (integer bucket arithmetic + integer rank), so both
    engines agree bit-for-bit with no float quantile interpolation.

    100 TB: values collapse to <= ~2840 possible buckets per type, so
    the census is map-side combinable into a tiny frame; the cumulative
    window partitions are bounded by the bucket-domain size, never by
    corpus size. This is the same histogram-not-sort trick the
    reference's Prometheus histograms (metrics.go:39-69) rely on."""
    ms = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    bucket = (
        F.when(ms < 1024, ms)
        .when(ms < 30000, 1024 + F.expr(
            "((cast(floor(value * 100 + 0.5) as bigint) - 1024) div 16) * 16"
        ))
        .otherwise(F.lit(30000).cast("bigint"))
    )
    pb = (
        table(spark, sf_dir, "events")
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = pb.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        F.sum("cnt").over(wtot).cast("bigint").alias("n"),
    )

    def rank_ge(num: int, den: int):
        target = F.expr(f"(n * {num} + {den - 1}) div {den}")
        return F.min(F.when(F.col("cum") >= target, F.col("bucket")))

    return (
        cum.groupBy("event_type")
        .agg(
            rank_ge(1, 2).alias("qt50"),
            rank_ge(9, 10).alias("qt90"),
            rank_ge(99, 100).alias("qt99"),
        )
        .orderBy("event_type")
    )


# --- SAX motif symbolization --------------------------------------------------

_SAX_ORACLE = """
    WITH seq AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    first16 AS (SELECT * FROM seq WHERE rn <= 16),
    mom AS (
      SELECT user_id, CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS s2,
             CAST(count(*) AS BIGINT) AS n
      FROM first16 GROUP BY user_id
      HAVING count(*) = 16 AND sum(cents * cents) * 16 > sum(cents) * sum(cents)
    ),
    segs AS (
      SELECT f.user_id, (f.rn - 1) // 4 AS seg,
             CAST(sum(f.cents) AS BIGINT) AS segsum,
             any_value(m.s) AS s, any_value(m.s2) AS s2
      FROM first16 f JOIN mom m USING (user_id)
      GROUP BY f.user_id, (f.rn - 1) // 4
    ),
    sym AS (
      SELECT user_id, seg,
             CASE WHEN paa < -0.6745 THEN 'a'
                  WHEN paa < 0.0 THEN 'b'
                  WHEN paa < 0.6745 THEN 'c'
                  ELSE 'd' END AS sy
      FROM (
        SELECT user_id, seg,
               (CAST(segsum AS DOUBLE) / 4 - CAST(s AS DOUBLE) / 16)
                 / sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / 16) / 16)
                 AS paa
        FROM segs
      )
    ),
    words AS (
      SELECT user_id,
             max(CASE WHEN seg = 0 THEN sy END)
          || max(CASE WHEN seg = 1 THEN sy END)
          || max(CASE WHEN seg = 2 THEN sy END)
          || max(CASE WHEN seg = 3 THEN sy END) AS word
      FROM sym GROUP BY user_id
    )
    SELECT word, CAST(count(*) AS BIGINT) AS users
    FROM words GROUP BY word ORDER BY word
    """


@query("timeseries_sax_motifs", oracle=_SAX_ORACLE)
def timeseries_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al. 2003): each user's first 16 events
    (by time) become a 4-symbol word — z-normalize, piecewise-aggregate
    into 4 segments, quantize at the exact N(0,1) quartile breakpoints
    ±0.6745 — then motifs are the word census. Every mean that feeds the
    normalization is computed from exact BIGINT cent sums (PAA = exact
    segment sum / 4), so the doubles entering the breakpoint comparison
    are identical on both engines; constant-variance users are excluded
    by an exact integer inequality (16*s2 > s*s), never by a float
    epsilon.

    100 TB: the only window partitions by user_id and is bounded by
    events-per-user; moments and segments are map-side-combinable
    groupBys; the word assembly is a 4-way conditional aggregate, no
    collect_list ordering hazards."""
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    first16 = seq.where(F.col("rn") <= 16).localCheckpoint(eager=False)
    mom = (
        first16.groupBy("user_id")
        .agg(
            F.sum("cents").cast("bigint").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .where(
            (F.col("n") == 16)
            & (F.col("s2") * 16 > F.col("s") * F.col("s"))
        )
    )
    segs = (
        first16.withColumn("seg", F.expr("(rn - 1) div 4"))
        .join(mom, "user_id")
        .groupBy("user_id", "seg")
        .agg(
            F.sum("cents").cast("bigint").alias("segsum"),
            F.any_value("s").alias("s"),
            F.any_value("s2").alias("s2"),
        )
    )
    paa = (
        F.col("segsum").cast("double") / 4 - F.col("s").cast("double") / 16
    ) / F.sqrt(
        (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / 16)
        / 16
    )
    sy = (
        F.when(paa < -0.6745, "a")
        .when(paa < 0.0, "b")
        .when(paa < 0.6745, "c")
        .otherwise("d")
    )
    sym = segs.select("user_id", "seg", sy.alias("sy"))
    word = F.concat(
        *[F.max(F.when(F.col("seg") == i, F.col("sy"))) for i in range(4)]
    )
    words = sym.groupBy("user_id").agg(word.alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("users"))
        .orderBy("word")
    )


# --- t-closeness audit ---------------------------------------------------------

_TCLOSE_ORACLE = """
    WITH binned AS (
      SELECT c_mktsegment, c_nationkey,
             least(9, greatest(0,
               (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 1100)) AS bin
      FROM customer
    ),
    grp AS (SELECT DISTINCT c_mktsegment, c_nationkey FROM binned),
    grid AS (
      SELECT g.c_mktsegment, g.c_nationkey, b.bin
      FROM grp g CROSS JOIN (SELECT unnest(range(10)) AS bin) b
    ),
    cnt AS (
      SELECT c_mktsegment, c_nationkey, bin, CAST(count(*) AS BIGINT) AS c
      FROM binned GROUP BY ALL
    ),
    cells AS (
      SELECT grid.c_mktsegment, grid.c_nationkey, grid.bin,
             coalesce(cnt.c, 0) AS c
      FROM grid LEFT JOIN cnt USING (c_mktsegment, c_nationkey, bin)
    ),
    cum AS (
      SELECT c_mktsegment, c_nationkey, bin,
             CAST(sum(c) OVER w AS BIGINT) AS cumg,
             CAST(sum(c) OVER (PARTITION BY c_mktsegment, c_nationkey)
                  AS BIGINT) AS ng
      FROM cells
      WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    gbin AS (SELECT bin, CAST(count(*) AS BIGINT) AS gc FROM binned GROUP BY bin),
    gcum AS (
      SELECT a.bin, CAST(sum(b.gc) AS BIGINT) AS gcum
      FROM gbin a JOIN gbin b ON b.bin <= a.bin GROUP BY a.bin
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM binned),
    emd AS (
      SELECT c_mktsegment, c_nationkey, any_value(ng) AS group_n,
             CAST(sum(CASE WHEN cum.bin < 9
                      THEN abs(cum.cumg * tot.n - gcum.gcum * cum.ng)
                      ELSE 0 END) AS BIGINT) AS num
      FROM cum JOIN gcum USING (bin) CROSS JOIN tot
      GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment, c_nationkey, group_n,
           floor(CAST(num AS DOUBLE) / (9.0 * group_n * tot.n) * 1e9 + 0.5)
             / 1e9 AS emd,
           CAST(num AS DOUBLE) / (9.0 * group_n * tot.n) > 0.15 AS violates
    FROM emd CROSS JOIN tot
    ORDER BY c_mktsegment, c_nationkey
    """


@query("kanon_tcloseness_audit", oracle=_TCLOSE_ORACLE)
def kanon_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) completing
    the k-anonymity/l-diversity privacy trio: for each quasi-identifier
    group (mktsegment x nation), the ordered-distance EMD between the
    group's account-balance decile distribution and the global one —
    EMD = sum_j |P(<=j) - Q(<=j)| / (m-1) over fixed-width bins. The
    absolute cumulative differences are exact BIGINT cross-products
    (cumg*N - gcum*ng), so the hash never depends on float summation
    order; the final division is one deterministic double per group.

    100 TB: bins are fixed-width (no ranking pass); per-group windows
    are exactly 10 rows; the global bin census is a 10-row frame folded
    by a 10x10 self-join instead of a global window; N is a 1-row
    broadcast scalar."""
    cust = table(spark, sf_dir, "customer")
    bin_ = F.least(
        F.lit(9),
        F.greatest(
            F.lit(0),
            F.expr("(cast(floor(c_acctbal) as bigint) + 1000) div 1100"),
        ),
    )
    binned = cust.select(
        "c_mktsegment", "c_nationkey", bin_.alias("bin")
    ).localCheckpoint(eager=False)  # reused: grid, cells, global census, N
    grp = binned.select("c_mktsegment", "c_nationkey").distinct()
    grid = grp.select(
        "c_mktsegment",
        "c_nationkey",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin0"),
    ).select(
        "c_mktsegment", "c_nationkey", F.col("bin0").cast("bigint").alias("bin")
    )
    cnt = binned.groupBy("c_mktsegment", "c_nationkey", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cells = grid.join(cnt, ["c_mktsegment", "c_nationkey", "bin"], "left").select(
        "c_mktsegment",
        "c_nationkey",
        "bin",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
    )
    wcum = (
        Window.partitionBy("c_mktsegment", "c_nationkey")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("c_mktsegment", "c_nationkey")
    cum = cells.select(
        "c_mktsegment",
        "c_nationkey",
        "bin",
        F.sum("c").over(wcum).cast("bigint").alias("cumg"),
        F.sum("c").over(wtot).cast("bigint").alias("ng"),
    )
    gbin = binned.groupBy("bin").agg(F.count(F.lit(1)).cast("bigint").alias("gc"))
    gcum = (
        gbin.alias("a")
        .join(gbin.alias("b"), F.col("b.bin") <= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(F.sum("b.gc").cast("bigint").alias("gcum"))
    )
    tot = binned.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    emd = (
        cum.join(F.broadcast(gcum), "bin")
        .join(F.broadcast(tot))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.any_value("ng").alias("group_n"),
            F.any_value("n").alias("n"),  # carry N through — no 2nd BNLJ
            F.sum(
                F.when(
                    F.col("bin") < 9,
                    F.abs(
                        F.col("cumg") * F.col("n") - F.col("gcum") * F.col("ng")
                    ),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("num"),
        )
    )
    emd_val = F.col("num").cast("double") / (
        F.lit(9.0) * F.col("group_n") * F.col("n")
    )
    return (
        emd
        .select(
            "c_mktsegment",
            "c_nationkey",
            "group_n",
            fround(emd_val, 9).alias("emd"),
            (emd_val > 0.15).alias("violates"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )
