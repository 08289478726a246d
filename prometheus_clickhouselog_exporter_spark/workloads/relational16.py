"""Relational battery, round 3 batch 17: Kolmogorov–Smirnov distance,
Spearman rank correlation, and the segment-migration matrix.

Completes the nonparametric family: the repo now carries Pearson (from
exact moments), Kendall (concordance counting), Mann–Whitney (rank
sums) — KS adds the DISTRIBUTION-distance two-sample test and
Spearman the rank-correlation member, both exact. KS's statistic
D = max|F₁−F₂| becomes an INTEGER cross-multiply max
(|c₁n₂ − c₂n₁|), and Spearman is Pearson over doubled tie-averaged
ranks, which are integers — the same doubling trick as Mann–Whitney.
The migration matrix is the longitudinal follow-up to
rfm_customer_segments: where did each spend-quartile's customers move
between the first and second half of the observation window?

Float discipline per workloads/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table


@query(
    "stats_ks_two_sample",
    oracle="""
    WITH samp AS (
      SELECT lang, n_chars FROM documents WHERE lang IN ('en', 'zh')
    ),
    steps AS (
      SELECT n_chars,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS b
      FROM samp GROUP BY n_chars
    ),
    n AS (
      SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2
      FROM steps
    ),
    ecdf AS (
      SELECT n_chars,
             sum(a) OVER (ORDER BY n_chars
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c1,
             sum(b) OVER (ORDER BY n_chars
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c2
      FROM steps
    ),
    scored AS (
      SELECT n_chars, n.n1 AS n1, n.n2 AS n2,
             abs(c1 * n.n2 - c2 * n.n1) AS dn
      FROM ecdf, n
    ),
    top AS (
      SELECT * FROM (SELECT *, max(dn) OVER () AS dm FROM scored)
      WHERE dn = dm
    )
    SELECT max(n1) AS n1, max(n2) AS n2,
           CAST(max(dn) AS BIGINT) AS d_numerator,
           CAST(min(n_chars) AS BIGINT) AS d_at_value,
           floor((CAST(max(dn) AS DOUBLE)
                  / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS ks_d
    FROM top
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the English and
    Chinese document-length distributions: D = max|F₁(x) − F₂(x)| over
    the pooled support. The supremum is found WITHOUT floats —
    |c₁/n₁ − c₂/n₂| maximizes exactly where |c₁·n₂ − c₂·n₁| does, an
    integer cross-multiply (the ABC-classes trick applied to ECDFs) —
    and the witness point (smallest x achieving the max) is exact too;
    only the final D ratio is a frounded double. KS catches SHAPE
    drift (bimodality, tail moves) that mean/variance screens miss —
    the distribution-drift gate next to drift_psi_value_halves.

    Scale: value-grouped step counts fold map-side; both running ECDFs
    share ONE global-order window over the bounded distinct-value
    series (sweep-line shape). Per-key: partition the same plan.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "zh"))
    steps = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("lang") == "zh", 1).otherwise(0)).alias("b"),
    ).localCheckpoint(eager=False)  # value-cardinality; feeds n + the ECDF sweep
    n = steps.agg(
        F.sum("a").cast("bigint").alias("n1"), F.sum("b").cast("bigint").alias("n2")
    )
    wo = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = steps.select(
        "n_chars",
        F.sum("a").over(wo).alias("c1"),
        F.sum("b").over(wo).alias("c2"),
    )
    scored = ecdf.crossJoin(F.broadcast(n)).select(
        "n_chars",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias("dn"),
    )
    top = scored.withColumn(
        "dmax", F.max("dn").over(Window.partitionBy())
    ).filter(F.col("dn") == F.col("dmax"))
    return top.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max("dn").cast("bigint").alias("d_numerator"),
        F.min("n_chars").cast("bigint").alias("d_at_value"),
        fround(
            F.max("dn").cast("double")
            / (F.max("n1").cast("double") * F.max("n2").cast("double")),
            6,
        ).alias("ks_d"),
    )


@query(
    "stats_spearman_rho",
    oracle="""
    WITH feat AS (
      SELECT c.c_custkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS x,
             CAST(coalesce(o.n, 0) AS BIGINT) AS y
      FROM customer c
      LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
        ON c.c_custkey = o.o_custkey
    ),
    ranked AS (
      SELECT c_custkey,
             2 * rank() OVER (ORDER BY x)
               + count(*) OVER (PARTITION BY x) - 1 AS rx,
             2 * rank() OVER (ORDER BY y)
               + count(*) OVER (PARTITION BY y) - 1 AS ry
      FROM feat
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(sum(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           floor((((sxy / n) - ((sx / n) * (sy / n)))
                  / (sqrt((sxx / n) - ((sx / n) * (sx / n)))
                     * sqrt((syy / n) - ((sy / n) * (sy / n)))))
                 * 1e6 + 0.5) / 1e6 AS spearman_rho
    FROM m
    """,
)
def stats_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between account balance and order
    count — Pearson evaluated on RANKS, so it measures monotone
    association without Pearson's linearity assumption and is immune
    to outliers. Ranks use the Mann–Whitney doubling trick (2·avg-tie-
    rank = 2r+c−1 stays integer), the moment sums ride DECIMAL(38)
    exactly, and the final rho is one shared float expression —
    completing the correlation family: Pearson (stats_corr_moments),
    Kendall (stats_kendall_tau), Spearman.

    Scale: ranks are VALUE-GROUPED — per-value doubled tie-averaged
    ranks (2r+c−1, a function of the VALUE alone) come from exclusive
    running counts over the two DISTINCT-value series (value-
    cardinality windows provably behind aggregates — the
    bounded-global-window invariant plan_audit enforces), then two
    equi-joins attach rx/ry back to the customer rows and one moment
    aggregate finishes. No corpus-sized window anywhere.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    feat = (
        c.join(counts, c.c_custkey == counts.o_custkey, "left")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=False)  # feeds both rank maps + the probe join
    )

    def rank_map(col: str, out: str) -> DataFrame:
        wo = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            feat.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                col,
                (
                    F.lit(2) * (F.coalesce(F.sum("c").over(wo), F.lit(0)) + 1)
                    + F.col("c")
                    - 1
                ).alias(out),
            )
        )

    ranked = (
        feat.join(rank_map("x", "rx"), "x")
        .join(rank_map("y", "ry"), "y")
        .select("rx", "ry")
    )
    dec = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("rx")).alias("sx"),
        dec(F.col("ry")).alias("sy"),
        dec(F.col("rx") * F.col("rx")).alias("sxx"),
        dec(F.col("ry") * F.col("ry")).alias("syy"),
        dec(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(k) for k in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    rho = ((sxy / n) - ((sx / n) * (sy / n))) / (
        F.sqrt((sxx / n) - ((sx / n) * (sx / n)))
        * F.sqrt((syy / n) - ((sy / n) * (sy / n)))
    )
    return m.select(
        n.cast("bigint").alias("n_obs"), fround(rho, 6).alias("spearman_rho")
    )


@query(
    "segment_migration_matrix",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    halves AS (
      SELECT o_custkey,
             CASE WHEN epoch_us(o_orderdate) * 2
                       <= epoch_us(b.lo) + epoch_us(b.hi)
                  THEN 1 ELSE 2 END AS half,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders, bounds b
    ),
    spend AS (
      SELECT o_custkey, half, sum(p) AS rev FROM halves GROUP BY 1, 2
    ),
    q AS (
      SELECT o_custkey, half,
             ntile(4) OVER (PARTITION BY half ORDER BY rev, o_custkey)
               AS quartile
      FROM spend
    ),
    mat AS (
      SELECT a.quartile AS q_first, b.quartile AS q_second,
             count(*) AS n
      FROM q a JOIN q b ON a.o_custkey = b.o_custkey
      WHERE a.half = 1 AND b.half = 2
      GROUP BY 1, 2
    )
    SELECT CAST(q_first AS INT) AS q_first, CAST(q_second AS INT) AS q_second,
           CAST(n AS BIGINT) AS n_customers,
           floor((CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY q_first) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS row_share
    FROM mat ORDER BY q_first, q_second
    """,
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix: spend-quartile in the first
    half of the observation window × quartile in the second half, with
    row-normalized transition shares — the longitudinal question after
    rfm_customer_segments (are top customers STAYING top?). Quartiles
    come from ntile over exact DECIMAL spend with a customer-id
    tie-break (total order → deterministic assignment both engines);
    only customers active in BOTH halves enter the matrix.

    Scale: one fact aggregate keyed by (customer, half); the quartile
    windows partition by half over customer-cardinality rows; the
    matrix join is customer-keyed. The midpoint split broadcasts from
    a 1-row bounds aggregate.
    """
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    halves = o.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.when(
            us("o_orderdate") * 2 <= us("lo") + us("hi"), F.lit(1)
        )
        .otherwise(F.lit(2))
        .alias("half"),
        money(F.col("o_totalprice")).alias("p"),
    )
    spend = halves.groupBy("o_custkey", "half").agg(F.sum("p").alias("rev"))
    q = spend.select(
        "o_custkey",
        "half",
        F.ntile(4)
        .over(Window.partitionBy("half").orderBy("rev", "o_custkey"))
        .alias("quartile"),
    ).localCheckpoint(eager=False)  # customer-sized; both sides of the matrix join
    a, b = q.alias("a"), q.alias("b")
    mat = (
        a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"))
        .filter((F.col("a.half") == 1) & (F.col("b.half") == 2))
        .groupBy(
            F.col("a.quartile").cast("int").alias("q_first"),
            F.col("b.quartile").cast("int").alias("q_second"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return mat.select(
        "q_first",
        "q_second",
        F.col("n").cast("bigint").alias("n_customers"),
        fround(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("q_first")).cast("double"),
            6,
        ).alias("row_share"),
    ).orderBy("q_first", "q_second")
