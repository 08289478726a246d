"""Round 10 batch: Jonckheere–Terpstra ordered trend, Breusch–Pagan
heteroskedasticity, and the Spark 4 IDENTIFIER() SQL surface — all
integer-moment exact, DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these surfaces; §2.3 north-star territory.
Methods are public: Jonckheere 1954 / Terpstra 1952 (ordered
alternative rank trend), Breusch & Pagan 1979 (LM heteroskedasticity
test, Koenker's studentized form), and the documented Spark 4
IDENTIFIER clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Jonckheere–Terpstra ---------------------------------------------------------

_JT_ORACLE = """
    WITH census AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, n_chars
    ),
    grid AS (
      SELECT l.lang, v.v, coalesce(c.c, 0) AS c
      FROM (SELECT DISTINCT lang FROM census) l
      CROSS JOIN (SELECT DISTINCT v FROM census) v
      LEFT JOIN census c USING (lang, v)
    ),
    pre AS (
      SELECT lang, v, c,
             CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS clt
      FROM grid
    ),
    lp AS (
      SELECT lang, v, c, clt,
             CAST(coalesce(sum(clt) OVER (PARTITION BY v ORDER BY lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS sum_clt_before,
             CAST(coalesce(sum(c) OVER (PARTITION BY v ORDER BY lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS sum_c_before
      FROM pre
    ),
    j AS (
      SELECT CAST(sum(c * sum_clt_before) AS BIGINT) AS strict,
             CAST(sum(c * sum_c_before) AS BIGINT) AS ties
      FROM lp
    ),
    sizes AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS ni FROM census GROUP BY lang
    ),
    agg AS (
      SELECT CAST(sum(ni) AS BIGINT) AS nn,
             CAST(sum(ni * ni) AS BIGINT) AS sn2,
             CAST(sum(ni * ni * (2 * ni + 3)) AS BIGINT) AS sn23
      FROM sizes
    )
    SELECT agg.nn AS n, j.strict, j.ties,
           CAST(j.strict AS DOUBLE) + 0.5 * j.ties AS jt,
           floor(((CAST(j.strict AS DOUBLE) + 0.5 * j.ties)
                  - (CAST(agg.nn AS DOUBLE) * agg.nn - agg.sn2) / 4.0)
                 / sqrt((CAST(agg.nn AS DOUBLE) * agg.nn * (2 * agg.nn + 3)
                         - agg.sn23) / 72.0) * 1e6 + 0.5) / 1e6 AS z_jt
    FROM j CROSS JOIN agg
    """


@query("stats_jonckheere_terpstra", oracle=_JT_ORACLE)
def stats_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra test for an ordered alternative (Terpstra
    1952, Jonckheere 1954): across the 5 languages in alphabetical
    order, J = Σ_{i<j} #{x_i < x_j} + ½#{ties}, normalized with the
    classical mean (N² - Σn_i²)/4 and no-tie variance
    (N²(2N+3) - Σn_i²(2n_i+3))/72 (documented convention; ties enter J
    but not the variance). The O(Σ n_i n_j) pair count collapses to
    exact prefix sums over the value census: per (lang, value), the
    count of strictly-smaller values in every EARLIER lang is one
    lang-ordered prefix of value-ordered prefixes — both windows
    bounded (values per lang, langs per value).

    100 TB: the census is map-side combinable; the grid is |langs| x
    |distinct values|; windows partition by lang (<=|V| rows) and by
    value (<=|langs| rows). No pair join ever materializes."""
    census = (
        table(spark, sf_dir, "documents")
        .groupBy("lang", F.col("n_chars").cast("bigint").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # grid axes + sizes + totals
    )
    langs = census.select("lang").distinct()
    vals = census.select("v").distinct()
    grid = (
        langs.crossJoin(vals)
        .join(census, ["lang", "v"], "left")
        .select("lang", "v", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
    )
    wv = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = grid.withColumn(
        "clt", F.coalesce(F.sum("c").over(wv), F.lit(0)).cast("bigint")
    )
    wl = (
        Window.partitionBy("v")
        .orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lp = pre.select(
        "lang",
        "v",
        "c",
        F.coalesce(F.sum("clt").over(wl), F.lit(0)).cast("bigint").alias(
            "sum_clt_before"
        ),
        F.coalesce(F.sum("c").over(wl), F.lit(0)).cast("bigint").alias(
            "sum_c_before"
        ),
    )
    j = lp.agg(
        F.sum(F.col("c") * F.col("sum_clt_before")).cast("bigint").alias("strict"),
        F.sum(F.col("c") * F.col("sum_c_before")).cast("bigint").alias("ties"),
    )
    sizes = census.groupBy("lang").agg(F.sum("c").cast("bigint").alias("ni"))
    agg = sizes.agg(
        F.sum("ni").cast("bigint").alias("nn"),
        F.sum(F.col("ni") * F.col("ni")).cast("bigint").alias("sn2"),
        F.sum(F.col("ni") * F.col("ni") * (2 * F.col("ni") + 3))
        .cast("bigint")
        .alias("sn23"),
    )
    out = j.join(F.broadcast(agg))
    jt = F.col("strict").cast("double") + 0.5 * F.col("ties")
    mean = (F.col("nn").cast("double") * F.col("nn") - F.col("sn2")) / 4.0
    var = (
        F.col("nn").cast("double") * F.col("nn") * (2 * F.col("nn") + 3)
        - F.col("sn23")
    ) / 72.0
    return out.select(
        F.col("nn").alias("n"),
        "strict",
        "ties",
        jt.alias("jt"),
        fround((jt - mean) / F.sqrt(var), 6).alias("z_jt"),
    )


# --- Breusch–Pagan heteroskedasticity ---------------------------------------------

_BP_ORACLE = """
    WITH raw AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    obs AS (
      SELECT 'raw' AS model, x, cents AS y FROM raw
      UNION ALL
      SELECT 'scaled', x, cents * x FROM raw
    ),
    m AS (
      SELECT model, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(CAST(x AS DECIMAL(38, 0)) * y) AS DECIMAL(38, 0)) AS sxy
      FROM obs GROUP BY model
    ),
    fit AS (
      SELECT model, n,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sy AS DOUBLE)
              - sx * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * sy)
                      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)))
               / n AS a
      FROM m
    ),
    z AS (
      SELECT obs.model, x,
             CAST(floor((y - a - b * x) * (y - a - b * x) / 1e8) AS BIGINT)
               AS e2q
      FROM obs JOIN fit ON fit.model = obs.model
    ),
    zm AS (
      SELECT model, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38, 0)) AS sx,
             CAST(sum(e2q) AS DECIMAL(38, 0)) AS sz,
             CAST(sum(CAST(x AS DECIMAL(38, 0)) * x) AS DECIMAL(38, 0)) AS sxx,
             CAST(sum(CAST(e2q AS DECIMAL(38, 0)) * e2q) AS DECIMAL(38, 0))
               AS szz,
             CAST(sum(CAST(x AS DECIMAL(38, 0)) * e2q) AS DECIMAL(38, 0)) AS sxz
      FROM z GROUP BY model
    ),
    r AS (
      SELECT model, n,
             (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                         - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rr
      FROM zm
    )
    SELECT model, n,
           floor(rr * 1e6 + 0.5) / 1e6 AS r_e2_x,
           floor(CAST(n AS DOUBLE) * rr * rr * 1e6 + 0.5) / 1e6 AS lm_stat,
           CAST(n AS DOUBLE) * rr * rr > 3.841459 AS heteroskedastic
    FROM r ORDER BY model
    """


@query("stats_breusch_pagan", oracle=_BP_ORACLE)
def stats_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan LM heteroskedasticity test (1979; Koenker's
    studentized form LM = n * R² of e² on x) over TWO models so both
    verdict branches are live against the synthetic corpus (the
    fixture-signal rule: the raw price~quantity relation carries no
    heteroskedastic structure here — measured r = -0.018 at sf0.001):
    'raw' (y = price cents, the homoskedastic control) and 'scaled'
    (y = cents * quantity, an in-plan planted multiplicative structure
    whose residual variance provably grows with x). The OLS fits come
    from exact integer/decimal moments; residual squares quantize to a
    1e8 grid per row (asserted within int64) so every e² cross-moment
    is an exact DECIMAL(38) sum — reduction order cannot flake the
    hash. Verdict vs the chi-square(1) 5% critical value 3.841459.

    100 TB: the two models stack into one column-pruned scan; moment
    and residual folds are map-side-combinable aggregates with a 2-row
    broadcast of the fits between them."""
    raw = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    obs = raw.select(
        F.expr("stack(2, 'raw', x, cents, 'scaled', x, cents * x) as (model, x, y)")
    ).localCheckpoint(eager=False)  # moment fold + residual fold
    dec = "decimal(38,0)"
    m = obs.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
    )
    b = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    a = (F.col("sy").cast("double") - F.col("sx") * b) / F.col("n")
    fit = m.select("model", a.alias("a"), b.alias("b"))
    e = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    e2q = F.floor(e * e / 1e8).cast("bigint")
    guard = F.assert_true(
        e2q < F.lit(10**15), F.lit("stats_breusch_pagan: e2q exceeds bound")
    )
    z = obs.join(F.broadcast(fit), "model").select(
        "model", "x", F.when(guard.isNull(), e2q).alias("e2q")
    )
    zm = z.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("e2q").cast(dec).alias("sz"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("e2q").cast(dec) * F.col("e2q")).cast(dec).alias("szz"),
        F.sum(F.col("x").cast(dec) * F.col("e2q")).cast(dec).alias("sxz"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxz").cast("double") - F.col("sx").cast("double") * F.col(
        "sz"
    ).cast("double")
    den = F.sqrt(
        (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        * (nd * F.col("szz").cast("double") - F.col("sz").cast("double") * F.col("sz").cast("double"))
    )
    r = num / den
    lm = nd * r * r
    return zm.select(
        "model",
        "n",
        fround(r, 6).alias("r_e2_x"),
        fround(lm, 6).alias("lm_stat"),
        (lm > 3.841459).alias("heteroskedastic"),
    ).orderBy("model")


# --- Spark 4 IDENTIFIER() clause surface --------------------------------------------

_ID_ORACLE = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """


@query("sql_identifier_clause", oracle=_ID_ORACLE)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 IDENTIFIER() clause: table and column names supplied
    as PARAMETERS rather than string-spliced SQL — the injection-safe
    templating surface (docs: SQL ref, IDENTIFIER clause). Both the
    table reference AND the group-by column ride IDENTIFIER(:param)
    binds; the oracle is the equivalent static SQL, proving the
    indirection is semantics-free.

    100 TB: a plain aggregate; IDENTIFIER resolution happens at parse
    time, so the plan is byte-identical to the static query (no extra
    analysis cost per batch)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("idclause_orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
                 AS total_price
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp) ORDER BY IDENTIFIER(:grp)
        """,
        args={"tbl": "idclause_orders", "grp": "o_orderstatus"},
    )
