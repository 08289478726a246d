"""Round 10 batch: Horvitz–Thompson estimation under Poisson-PPS
sampling, the Hodges–Lehmann location estimator, and mRMR
mutual-information feature ranking — DuckDB-oracle-checked,
integer-exact folds.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these; §2.3 north-star territory. Methods
are public: Horvitz & Thompson 1952, Hodges & Lehmann 1963, Peng et
al. 2005 (mRMR, MID criterion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, fround, md5_long, query, table

# --- Horvitz–Thompson under Poisson-PPS --------------------------------------

_HT_N = 500  # expected sample size

_HT_ORACLE = f"""
    WITH pop AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             {MD5_SQL.format(x="('ht|' || o_orderkey)")} % 1000000 AS h
      FROM orders
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pop,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM pop
    ),
    marked AS (
      SELECT p.o_orderkey, p.cents, t.n_pop, t.sum_cents,
             {_HT_N}.0 * p.cents / t.sum_cents AS pi,
             (p.h / 1e6) < ({_HT_N}.0 * p.cents / t.sum_cents) AS sampled
      FROM pop p CROSS JOIN tot t
    ),
    terms AS (
      SELECT n_pop, sum_cents, sampled, pi,
             CASE WHEN sampled THEN
               CAST(floor(1e6 / pi + 0.5) AS BIGINT) ELSE 0 END AS invq,
             CASE WHEN sampled THEN
               CAST(floor(cents / pi * 100 + 0.5) AS BIGINT) ELSE 0 END
               AS revq
      FROM marked
    )
    SELECT max(n_pop) AS n_pop,
           CAST(count_if(sampled) AS BIGINT) AS n_sampled,
           CAST(count_if(pi >= 1.0) AS BIGINT) AS n_certainty,
           floor(CAST(sum(invq) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS est_n,
           floor(CAST(sum(revq) AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4
             AS est_revenue_dollars,
           floor(CAST(max(sum_cents) AS DOUBLE) / 100.0 * 1e4 + 0.5) / 1e4
             AS true_revenue_dollars,
           floor(CAST(sum(revq) AS DOUBLE) / 100.0
                 / CAST(max(sum_cents) AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS revenue_ratio
    FROM terms
    """


@query("sample_horvitz_thompson", oracle=_HT_ORACLE)
def sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson estimation (Horvitz & Thompson 1952) under
    Poisson-PPS sampling: inclusion probability πᵢ = n·xᵢ/Σx (size =
    order value), deterministic hash draw uᵢ < πᵢ, and the unbiased
    totals T̂ = Σ_sample yᵢ/πᵢ for y = 1 (population size) and
    y = revenue. The HT revenue estimator is EXACTLY the true total by
    construction when y ∝ size — the published "PPS is optimal for the
    size variable" identity, visible as revenue_ratio ≈ 1 with only the
    Poisson sample-size noise; est_n shows the variance a non-
    proportional y pays. n_certainty counts πᵢ ≥ 1 items (0 on this
    population — the certificate that no Hájek correction is needed).

    Float discipline: πᵢ is the same two-operand double expression on
    both engines; each HT term quantizes PER ROW (1/πᵢ at 1e-6, yᵢ/πᵢ
    at hundredth-cents) so the cross-row reductions are exact integer
    sums — the standard quantized-fold rule.

    100 TB: one scan for totals (1-row broadcast), one scan for the
    marked population; no shuffle beyond the two aggregations — the
    textbook design-based-sampling shape."""
    pop = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        (
            md5_long(F.concat(F.lit("ht|"), F.col("o_orderkey").cast("string")))
            % 1000000
        ).alias("h"),
    )
    tot = pop.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
    pi = F.lit(float(_HT_N)) * F.col("cents") / F.col("sum_cents")
    marked = pop.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n_pop",
        "sum_cents",
        pi.alias("pi"),
        ((F.col("h") / 1e6) < pi).alias("sampled"),
    )
    invq = F.when(
        F.col("sampled"),
        F.floor(F.lit(1e6) / F.col("pi") + F.lit(0.5)).cast("bigint"),
    ).otherwise(F.lit(0))
    revq = F.when(
        F.col("sampled"),
        F.floor(F.col("cents") / F.col("pi") * 100 + F.lit(0.5)).cast("bigint"),
    ).otherwise(F.lit(0))
    return marked.agg(
        F.max("n_pop").alias("n_pop"),
        F.count_if(F.col("sampled")).cast("bigint").alias("n_sampled"),
        F.count_if(F.col("pi") >= 1.0).cast("bigint").alias("n_certainty"),
        fround(F.sum(invq).cast("double") / 1e6, 4).alias("est_n"),
        fround(F.sum(revq).cast("double") / 1e4, 4).alias(
            "est_revenue_dollars"
        ),
        fround(F.max("sum_cents").cast("double") / 100.0, 4).alias(
            "true_revenue_dollars"
        ),
        fround(
            F.sum(revq).cast("double")
            / 100.0
            / F.max("sum_cents").cast("double"),
            6,
        ).alias("revenue_ratio"),
    )


# --- Hodges–Lehmann estimator -------------------------------------------------

_HL_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT o_orderpriority AS pri, o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders WHERE year(o_orderdate) = 1995
      GROUP BY pri, day
    ),
    walsh AS (
      SELECT a.pri, a.y + b.y AS w2
      FROM daily a JOIN daily b ON a.pri = b.pri AND a.day <= b.day
    ),
    census AS (
      SELECT pri, w2, CAST(count(*) AS BIGINT) AS c
      FROM walsh GROUP BY pri, w2
    ),
    cum AS (
      SELECT pri, w2, c,
             CAST(sum(c) OVER (PARTITION BY pri ORDER BY w2) AS BIGINT)
               AS cumc,
             CAST(sum(c) OVER (PARTITION BY pri) AS BIGINT) AS t
      FROM census
    )
    SELECT pri AS o_orderpriority,
           CAST(max(t) AS BIGINT) AS n_pairs,
           CAST(min(CASE WHEN cumc >= (t + 1) // 2 THEN w2 END) AS BIGINT)
             AS hl2_cents,
           floor(CAST(min(CASE WHEN cumc >= (t + 1) // 2 THEN w2 END)
                      AS DOUBLE) / 200.0 * 1e4 + 0.5) / 1e4 AS hl_dollars
    FROM cum GROUP BY pri ORDER BY pri
    """


@query("stats_hodges_lehmann", oracle=_HL_ORACLE)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location estimator (Hodges & Lehmann 1963) of
    1995's daily revenue per priority: the LOWER MEDIAN of all n(n+1)/2
    Walsh averages (yᵢ+yⱼ)/2, i ≤ j — the rank-based location estimate
    dual to the Wilcoxon signed-rank test, 29% efficiency loss at the
    normal but a 0.29 breakdown point. Walsh sums stay doubled integers
    (w2 = yᵢ+yⱼ) end-to-end; the median is min{w2 : cum ≥ ⌈T/2⌉} over
    the per-priority Walsh-value census.

    100 TB: the pair join is CALENDAR-BOUNDED (365 days/priority →
    ≤ 66.8k pairs regardless of corpus size) because it rides the daily
    aggregate; the rank scan is a census window behind that aggregate.
    This is the bounded-pair shape that makes an O(n²) estimator safe:
    aggregate to a bounded frame FIRST, then pair."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(F.sum(cents).cast("bigint").alias("y"))
        .localCheckpoint(eager=False)  # both sides of the pair join
    )
    b = daily.select(
        F.col("pri").alias("pri2"), F.col("day").alias("day2"),
        F.col("y").alias("y2"),
    )
    walsh = daily.join(
        b,
        (F.col("pri") == F.col("pri2")) & (F.col("day") <= F.col("day2")),
    ).select("pri", (F.col("y") + F.col("y2")).alias("w2"))
    census = walsh.groupBy("pri", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("pri").orderBy("w2").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("pri")
    cum = census.select(
        "pri",
        "w2",
        F.sum("c").over(wcum).cast("bigint").alias("cumc"),
        F.sum("c").over(wall).cast("bigint").alias("t"),
    )
    k = F.expr("(t + 1) div 2")
    hl2 = F.min(F.when(F.col("cumc") >= k, F.col("w2"))).cast("bigint")
    return (
        cum.groupBy(F.col("pri").alias("o_orderpriority"))
        .agg(
            F.max("t").cast("bigint").alias("n_pairs"),
            hl2.alias("hl2_cents"),
            fround(hl2.cast("double") / 200.0, 4).alias("hl_dollars"),
        )
        .orderBy("o_orderpriority")
    )


# --- mRMR feature ranking ------------------------------------------------------

# stacked census ids: 1-4 relevance MI(f_i; y), 5-10 redundancy MI(f_i; f_j)
_MRMR_PAIRS = [(5, 1, 2), (6, 1, 3), (7, 1, 4), (8, 2, 3), (9, 2, 4), (10, 3, 4)]

_MRMR_ORACLE = """
    WITH raw AS (
      SELECT CAST(l_quantity AS BIGINT) // 10 AS f1,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) // 3 AS f2,
             least(CAST(floor(l_extendedprice / 20000) AS BIGINT), 4) AS f3,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) // 3 AS f4,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    long AS (
      SELECT u.mid, u.v1, u.v2 FROM raw, unnest([
        struct_pack(mid := 1, v1 := f1, v2 := CAST(y AS BIGINT)),
        struct_pack(mid := 2, v1 := f2, v2 := CAST(y AS BIGINT)),
        struct_pack(mid := 3, v1 := f3, v2 := CAST(y AS BIGINT)),
        struct_pack(mid := 4, v1 := f4, v2 := CAST(y AS BIGINT)),
        struct_pack(mid := 5, v1 := f1, v2 := f2),
        struct_pack(mid := 6, v1 := f1, v2 := f3),
        struct_pack(mid := 7, v1 := f1, v2 := f4),
        struct_pack(mid := 8, v1 := f2, v2 := f3),
        struct_pack(mid := 9, v1 := f2, v2 := f4),
        struct_pack(mid := 10, v1 := f3, v2 := f4)
      ]) AS t(u)
    ),
    census AS (
      SELECT mid, v1, v2, CAST(count(*) AS BIGINT) AS c
      FROM long GROUP BY mid, v1, v2
    ),
    marg AS (
      SELECT mid, v1, v2, c,
             CAST(sum(c) OVER (PARTITION BY mid, v1) AS BIGINT) AS m1,
             CAST(sum(c) OVER (PARTITION BY mid, v2) AS BIGINT) AS m2,
             CAST(sum(c) OVER (PARTITION BY mid) AS BIGINT) AS nn
      FROM census
    ),
    mi AS (
      SELECT mid,
             CAST(sum(CAST(floor(c * ln(CAST(c AS DOUBLE) * nn
                                        / (CAST(m1 AS DOUBLE) * m2))
                                 * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS miq
      FROM marg GROUP BY mid
    ),
    rel AS (SELECT mid AS fid, miq AS relq FROM mi WHERE mid <= 4),
    red AS (
      SELECT mid, miq AS redq,
             CASE mid WHEN 5 THEN 1 WHEN 6 THEN 1 WHEN 7 THEN 1
                      WHEN 8 THEN 2 WHEN 9 THEN 2 ELSE 3 END AS fa,
             CASE mid WHEN 5 THEN 2 WHEN 6 THEN 3 WHEN 7 THEN 4
                      WHEN 8 THEN 3 WHEN 9 THEN 4 ELSE 4 END AS fb
      FROM mi WHERE mid >= 5
    ),
    red2 AS (
      SELECT fa, fb, redq FROM red
      UNION ALL SELECT fb, fa, redq FROM red
    ),
    s1 AS (SELECT fid AS w1, relq AS w1q FROM rel
           ORDER BY relq DESC, fid LIMIT 1),
    scored AS (
      SELECT r.fid, r.relq, r.relq - d.redq AS mrmr_q, s.w1
      FROM rel r CROSS JOIN s1 s
      JOIN red2 d ON d.fa = r.fid AND d.fb = s.w1
      WHERE r.fid <> s.w1
    )
    SELECT fid AS feature, relq AS rel_q,
           CAST(mrmr_q AS BIGINT) AS mrmr_q,
           FALSE AS is_first
    FROM scored
    UNION ALL
    SELECT w1 AS feature, w1q AS rel_q, NULL AS mrmr_q, TRUE AS is_first
    FROM s1
    ORDER BY feature
    """


@query("ml_mrmr_feature_select", oracle=_MRMR_ORACLE)
def ml_mrmr_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mRMR feature ranking (Peng et al. 2005, MID criterion) over four
    quantized lineitem features vs the return flag: ALL ten mutual
    informations (4 relevance + 6 redundancy) come from ONE stacked
    census pass; the first pick maximizes relevance, the rest rank by
    relevance − redundancy-to-the-first-pick (the documented one-step
    MID ranking — the full greedy recursion differs only from pick 3
    on). MI cells quantize c·ln(cN/(m₁m₂)) to 1e-9 integers BEFORE the
    per-id sum, so selection comparisons are exact integer comparisons
    (all ten share the same N — equal denominators cancel).

    100 TB: one scan fans each row to 10 (feature-pair, v1, v2) keys —
    tiny domains (≤ ~40 cells/id) so partial aggregation collapses it
    map-side; marginals are windows over the ≤ 400-row census behind
    the aggregate; the greedy step is arithmetic over a 10-row frame
    (1-row broadcast parameterization, the whitelisted pattern)."""
    q = table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(l_quantity AS BIGINT) div 10").alias("f1"),
        F.expr(
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) div 3"
        ).alias("f2"),
        F.least(
            F.floor(F.col("l_extendedprice") / 20000).cast("bigint"), F.lit(4)
        ).alias("f3"),
        F.expr("CAST(floor(l_tax * 100 + 0.5) AS BIGINT) div 3").alias("f4"),
        F.when(F.col("l_returnflag") == "R", F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("y"),
    )
    entries = [
        ("1", "f1", "y"), ("2", "f2", "y"), ("3", "f3", "y"), ("4", "f4", "y"),
        ("5", "f1", "f2"), ("6", "f1", "f3"), ("7", "f1", "f4"),
        ("8", "f2", "f3"), ("9", "f2", "f4"), ("10", "f3", "f4"),
    ]
    stack = ", ".join(f"{m}, {a}, {b}" for m, a, b in entries)
    long = q.select(
        F.expr(f"stack({len(entries)}, {stack}) as (mid, v1, v2)")
    )
    census = long.groupBy("mid", "v1", "v2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w1 = Window.partitionBy("mid", "v1")
    w2 = Window.partitionBy("mid", "v2")
    wn = Window.partitionBy("mid")
    marg = census.select(
        "mid",
        "c",
        F.sum("c").over(w1).cast("bigint").alias("m1"),
        F.sum("c").over(w2).cast("bigint").alias("m2"),
        F.sum("c").over(wn).cast("bigint").alias("nn"),
    )
    cell_q = F.floor(
        F.col("c")
        * F.log(
            F.col("c").cast("double")
            * F.col("nn")
            / (F.col("m1").cast("double") * F.col("m2"))
        )
        * 1e9
        + F.lit(0.5)
    ).cast("bigint")
    mi = marg.groupBy("mid").agg(F.sum(cell_q).cast("bigint").alias("miq"))
    mi = mi.localCheckpoint(eager=False)  # consumers: rel + red
    rel = mi.where(F.col("mid") <= 4).select(
        F.col("mid").cast("bigint").alias("fid"), F.col("miq").alias("relq")
    )
    pairs = spark.createDataFrame(
        [(m, a, b) for m, a, b in _MRMR_PAIRS]
        + [(m, b, a) for m, a, b in _MRMR_PAIRS],
        "mid int, fa long, fb long",
    )
    red2 = mi.where(F.col("mid") >= 5).join(
        F.broadcast(pairs), "mid"
    ).select("fa", "fb", F.col("miq").alias("redq"))
    s1 = rel.orderBy(F.col("relq").desc(), "fid").limit(1).select(
        F.col("fid").alias("w1"), F.col("relq").alias("w1q")
    )
    scored = (
        rel.crossJoin(F.broadcast(s1))
        .where(F.col("fid") != F.col("w1"))
        .join(
            red2,
            (F.col("fa") == F.col("fid")) & (F.col("fb") == F.col("w1")),
        )
        .select(
            "fid", "relq", (F.col("relq") - F.col("redq")).alias("mrmr_q")
        )
    )
    ranked = scored.select(
        F.col("fid").alias("feature"),
        F.col("relq").alias("rel_q"),
        F.col("mrmr_q").cast("bigint").alias("mrmr_q"),
        F.lit(False).alias("is_first"),
    )
    first = s1.select(
        F.col("w1").alias("feature"),
        F.col("w1q").alias("rel_q"),
        F.lit(None).cast("bigint").alias("mrmr_q"),
        F.lit(True).alias("is_first"),
    )
    return ranked.unionByName(first).orderBy("feature")
