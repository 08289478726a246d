"""Relational battery, round 3 batch 20: SQL pipe syntax, the
Brown–Forsythe variance-homogeneity test, and chi-square keyness.

The pipe-syntax row closes the modern-SQL surface set (GROUP BY ALL,
collations, listagg, recursive CTEs, UDTF/LATERAL): Spark 4 ships the
|> operator pipeline form, and the query runs TPC-H Q1's shape through
it — the oracle is the classic-syntax equivalent, so the row certifies
the desugaring. Brown–Forsythe extends the ANOVA machinery to the
question ANOVA itself assumes away (are group VARIANCES equal?),
using |x − group median| — the robust variant of Levene's test — and
the same deviation-form quantized moments that dodge the floor clamp.
Keyness is the text-analytics classic: which tokens are
OVER-represented in each source vs the rest of the corpus, ranked by
the 2×2 chi-square — the distinctive-vocabulary report behind corpus
comparison and source fingerprinting.

Float discipline per workloads/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_PIPE_SQL = """
FROM {t}
|> WHERE l_quantity < 45
|> AGGREGATE
     CAST(count(*) AS BIGINT) AS n_lines,
     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""


@query(
    "sql_pipe_syntax_surface",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem WHERE l_quantity < 45
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (|>) — Spark 4's operator-pipeline form of SQL,
    run over the Q1 pricing-summary shape: FROM |> WHERE |> AGGREGATE
    ... GROUP BY |> ORDER BY. The oracle is the CLASSIC-syntax
    equivalent, so a hash match certifies the desugaring end to end
    (grouping keys are emitted implicitly by |> AGGREGATE ... GROUP
    BY — part of the surface under test). Complements the GROUP BY
    ALL row, where the identical text ran on both engines; here the
    texts deliberately differ and the SEMANTICS must meet.

    Scale: desugars before planning — the physical plan is the same
    partial+final hash aggregate as q1_pricing_summary.
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(_PIPE_SQL.format(t="pipe_lineitem"))


@query(
    "stats_levene_bf",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS x
      FROM customer
    ),
    med AS (
      SELECT seg, x AS m
      FROM (SELECT seg, x,
                   row_number() OVER (PARTITION BY seg ORDER BY x) AS rn,
                   count(*) OVER (PARTITION BY seg) AS n
            FROM q)
      WHERE rn = (n + 1) // 2
    ),
    z AS (
      SELECT q.seg, abs(q.x - med.m) AS z
      FROM q JOIN med ON q.seg = med.seg
    ),
    g AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(z AS DECIMAL(38,0))) AS szd,
             sum(CAST(z * z AS DECIMAL(38,0))) AS szzd
      FROM z GROUP BY seg
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS nt,
             CAST(sum(szd) AS DOUBLE) AS szt,
             CAST(sum(szzd) AS DOUBLE) AS szzt,
             CAST(count(*) AS DOUBLE) AS k
      FROM g
    ),
    ssb_t AS (
      SELECT CAST(sum(CAST(floor(CAST(g.n AS DOUBLE)
                      * ((CAST(g.szd AS DOUBLE) / CAST(g.n AS DOUBLE))
                         - (t.szt / t.nt))
                      * ((CAST(g.szd AS DOUBLE) / CAST(g.n AS DOUBLE))
                         - (t.szt / t.nt))
                      * 1000) AS DECIMAL(38,0))) AS DOUBLE) / 1000 AS ssb
      FROM g, tot t
    )
    SELECT CAST(t.nt AS BIGINT) AS n_obs, CAST(t.k AS INT) AS n_groups,
           floor(((b.ssb / (t.k - 1))
                  / (((t.szzt - ((t.szt * t.szt) / t.nt)) - b.ssb)
                     / (t.nt - t.k)))
                 * 1e6 + 0.5) / 1e6 AS bf_w
    FROM tot t, ssb_t b
    """,
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test for variance homogeneity across segments —
    the gate in FRONT of ANOVA (stats_anova_dow assumes equal group
    variances; this is the check). One-way ANOVA computed on
    z = |x − group MEDIAN| (the median makes it Brown–Forsythe, robust
    to heavy tails where classic Levene's mean version inflates).
    Medians come from per-group rank arithmetic; z is exact integer
    cents; moments ride DECIMAL(38); SS_between uses the deviation
    form with per-term quantization — the floor-clamp discipline.

    Scale: one rank window partitioned by segment, one moment
    aggregate, then k-row arithmetic. The W statistic references the
    F(k−1, n−k) distribution like ANOVA's.
    """
    c = table(spark, sf_dir, "customer")
    q = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
    )
    ranked = q.select(
        "seg",
        "x",
        F.row_number().over(Window.partitionBy("seg").orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "seg", F.col("x").alias("m")
    )
    z = q.join(F.broadcast(med), "seg").select(
        "seg", F.abs(F.col("x") - F.col("m")).alias("z")
    )
    g = z.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("z").cast("decimal(38,0)")).alias("szd"),
        F.sum((F.col("z") * F.col("z")).cast("decimal(38,0)")).alias("szzd"),
    ).localCheckpoint(eager=False)  # k rows; feeds totals + deviation terms
    tot = g.agg(
        F.sum("n").cast("double").alias("nt"),
        F.sum("szd").cast("double").alias("szt"),
        F.sum("szzd").cast("double").alias("szzt"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    mean_g = F.col("szd").cast("double") / F.col("n").cast("double")
    mean_all = F.col("szt") / F.col("nt")
    term = F.col("n").cast("double") * (mean_g - mean_all) * (mean_g - mean_all)
    ssb_t = g.crossJoin(F.broadcast(tot)).agg(
        (
            F.sum(F.floor(term * 1000).cast("decimal(38,0)")).cast("double") / 1000
        ).alias("ssb")
    )
    nt, szt, szzt, k = (F.col(c0) for c0 in ("nt", "szt", "szzt", "k"))
    sst = szzt - ((szt * szt) / nt)
    return (
        tot.crossJoin(F.broadcast(ssb_t))
        .select(
            nt.cast("bigint").alias("n_obs"),
            k.cast("int").alias("n_groups"),
            fround(
                (F.col("ssb") / (k - 1)) / ((sst - F.col("ssb")) / (nt - k)), 6
            ).alias("bf_w"),
        )
    )


@query(
    "text_keyness_chi2",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    cnt AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS a
      FROM tok WHERE w <> '' GROUP BY source, w
    ),
    wtot AS (SELECT w, CAST(sum(a) AS BIGINT) AS wt FROM cnt GROUP BY w),
    stot AS (SELECT source, CAST(sum(a) AS BIGINT) AS st FROM cnt GROUP BY source),
    gtot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cnt),
    cells AS (
      SELECT c.source, c.w, c.a,
             (t.wt - c.a) AS b, (s.st - c.a) AS cc,
             (g.n - t.wt - s.st + c.a) AS d, g.n AS n
      FROM cnt c
      JOIN wtot t ON c.w = t.w
      JOIN stot s ON c.source = s.source
      CROSS JOIN gtot g
      WHERE t.wt >= 50
    ),
    scored AS (
      SELECT source, w, a,
             floor((CAST(n AS DOUBLE)
                    * ((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                       - (CAST(b AS DOUBLE) * CAST(cc AS DOUBLE)))
                    * ((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                       - (CAST(b AS DOUBLE) * CAST(cc AS DOUBLE)))
                    / ((CAST(a + b AS DOUBLE) * CAST(cc + d AS DOUBLE))
                       * (CAST(a + cc AS DOUBLE) * CAST(b + d AS DOUBLE))))
                   * 1e4) AS qchi2
      FROM cells
      WHERE (CAST(a AS DOUBLE) * CAST(cc + d AS DOUBLE))
            > (CAST(cc AS DOUBLE) * CAST(a + b AS DOUBLE))
    ),
    ranked AS (
      SELECT source, w, a, qchi2,
             row_number() OVER (PARTITION BY source
                                ORDER BY qchi2 DESC, w) AS rk
      FROM scored
    )
    SELECT source, CAST(rk AS INT) AS rank, w AS token, a AS n_in_source,
           CAST(qchi2 AS BIGINT) / 1e4 AS chi2
    FROM ranked WHERE rk <= 3 ORDER BY source, rank
    """,
)
def text_keyness_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square keyness: for every source, the 3 tokens most
    OVER-represented vs the rest of the corpus (2×2 test per (source,
    token): in-source count a against elsewhere-count b, with the
    complementary token masses) — the distinctive-vocabulary report
    behind corpus comparison, source fingerprinting, and topic drift.
    Only positively-keyed tokens rank (integer cross-multiply
    over-representation guard — no float on the filter), the χ²
    quantizes to a BIGINT rank key, and ties break on the token, so
    the per-source top-3 is total-ordered. Rare tokens (global count
    < 50) are excluded per standard keyness practice.

    Scale: one (source, token) count aggregate; token and source
    margins derive FROM that aggregate (no corpus re-scan); the
    per-source top-3 plans as WindowGroupLimit.
    """
    d = table(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("a"))
        .localCheckpoint(eager=False)  # vocabulary-sized; margins + cells
    )
    wtot = cnt.groupBy("w").agg(F.sum("a").cast("bigint").alias("wt"))
    stot = cnt.groupBy("source").agg(F.sum("a").cast("bigint").alias("st"))
    gtot = cnt.agg(F.sum("a").cast("bigint").alias("n"))
    cells = (
        cnt.join(wtot, "w")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(gtot))
        .filter(F.col("wt") >= 50)
        .select(
            "source",
            "w",
            "a",
            (F.col("wt") - F.col("a")).alias("b"),
            (F.col("st") - F.col("a")).alias("cc"),
            (F.col("n") - F.col("wt") - F.col("st") + F.col("a")).alias("d"),
            "n",
        )
    )
    ad_bc = (F.col("a").cast("double") * F.col("d").cast("double")) - (
        F.col("b").cast("double") * F.col("cc").cast("double")
    )
    denom = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("cc") + F.col("d")).cast("double")
    ) * (
        (F.col("a") + F.col("cc")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    )
    qchi2 = F.floor((F.col("n").cast("double") * ad_bc * ad_bc / denom) * 1e4)
    over = (
        F.col("a").cast("double") * (F.col("cc") + F.col("d")).cast("double")
    ) > (F.col("cc").cast("double") * (F.col("a") + F.col("b")).cast("double"))
    scored = cells.filter(over).select(
        "source", "w", "a", qchi2.alias("qchi2")
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("qchi2"), "w")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            "source",
            F.col("rk").cast("int").alias("rank"),
            F.col("w").alias("token"),
            F.col("a").alias("n_in_source"),
            (F.col("qchi2").cast("bigint") / 1e4).alias("chi2"),
        )
        .orderBy("source", "rank")
    )
