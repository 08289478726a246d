"""Round 10 batch: Fleiss' kappa, Cronbach's alpha, and the Murphy
decomposition of the Brier score — DuckDB-oracle-checked, census-exact.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has no eval surface; §2.3 north-star territory.
Methods are public: Fleiss 1971, Cronbach 1951, Murphy 1973 (Brier
decomposition), Brier 1950.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import MD5_SQL, fround, md5_long, query, table

# --- Fleiss' kappa -------------------------------------------------------------

_H = MD5_SQL.format


def _fleiss_sql() -> str:
    hb = _H(x="('b|' || o_orderkey)")
    hcp = _H(x="('cp|' || o_orderkey)")
    hcf = _H(x="('cf|' || o_orderkey)")
    return f"""
    WITH base AS (
      SELECT CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 'hi'
                  WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'mid'
                  ELSE 'lo' END AS c0,
             {hb} % 10 AS hb, {hcp} % 5 AS hcp, {hcf} % 7 AS hcf
      FROM orders
    ),
    lab AS (
      SELECT c0,
             CASE WHEN hb = 0 THEN
               CASE c0 WHEN 'hi' THEN 'mid' WHEN 'mid' THEN 'lo'
                       ELSE 'hi' END ELSE c0 END AS lb,
             CASE WHEN hcf = 0 THEN
               CASE c0 WHEN 'hi' THEN 'lo' WHEN 'mid' THEN 'hi'
                       ELSE 'mid' END ELSE c0 END AS lc
      FROM base WHERE hcp <> 0
    ),
    cnts AS (
      SELECT (CASE WHEN c0 = 'hi' THEN 1 ELSE 0 END
              + CASE WHEN lb = 'hi' THEN 1 ELSE 0 END
              + CASE WHEN lc = 'hi' THEN 1 ELSE 0 END) AS ch,
             (CASE WHEN c0 = 'mid' THEN 1 ELSE 0 END
              + CASE WHEN lb = 'mid' THEN 1 ELSE 0 END
              + CASE WHEN lc = 'mid' THEN 1 ELSE 0 END) AS cm,
             (CASE WHEN c0 = 'lo' THEN 1 ELSE 0 END
              + CASE WHEN lb = 'lo' THEN 1 ELSE 0 END
              + CASE WHEN lc = 'lo' THEN 1 ELSE 0 END) AS cl
      FROM lab
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(ch * (ch - 1) + cm * (cm - 1) + cl * (cl - 1))
                  AS BIGINT) AS p6,
             CAST(sum(ch) AS BIGINT) AS nh,
             CAST(sum(cm) AS BIGINT) AS nm,
             CAST(sum(cl) AS BIGINT) AS nl
      FROM cnts
    )
    SELECT n_items,
           floor(CAST(p6 AS DOUBLE) / (6.0 * n_items) * 1e9 + 0.5) / 1e9
             AS p_obs,
           floor((CAST(nh AS DOUBLE) * nh + CAST(nm AS DOUBLE) * nm
                  + CAST(nl AS DOUBLE) * nl)
                 / (9.0 * n_items * n_items) * 1e9 + 0.5) / 1e9 AS p_exp,
           floor((CAST(p6 AS DOUBLE) / (6.0 * n_items)
                  - (CAST(nh AS DOUBLE) * nh + CAST(nm AS DOUBLE) * nm
                     + CAST(nl AS DOUBLE) * nl)
                    / (9.0 * n_items * n_items))
                 / (1.0 - (CAST(nh AS DOUBLE) * nh + CAST(nm AS DOUBLE) * nm
                           + CAST(nl AS DOUBLE) * nl)
                          / (9.0 * n_items * n_items))
                 * 1e9 + 0.5) / 1e9 AS kappa
    FROM agg
    """


@query("eval_fleiss_kappa", oracle=_fleiss_sql())
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) over the SAME deterministic 3-rater
    grid as eval_krippendorff_alpha, restricted to the items all three
    raters labeled (Fleiss requires a fixed rater count m): per-item
    agreement Pᵢ = Σ_c nᵢc(nᵢc−1)/(m(m−1)) folds to one integer per item
    (6Pᵢ ∈ 0..6); chance agreement P̄ₑ = Σ_c p_c² from the label census.
    κ = (P̄−P̄ₑ)/(1−P̄ₑ). Together the two queries pin the two published
    reliability conventions against each other on one fixture.

    100 TB: one scan, one 1-row aggregation — the per-item class-count
    closed form from the alpha query, with the m=3 restriction."""
    o = table(spark, sf_dir, "orders")
    first = F.substring("o_orderpriority", 1, 1)
    c0 = (
        F.when(first.isin("1", "2"), F.lit("hi"))
        .when(first == "3", F.lit("mid"))
        .otherwise(F.lit("lo"))
    )
    key = F.col("o_orderkey").cast("string")
    hb = md5_long(F.concat(F.lit("b|"), key)) % 10
    hcp = md5_long(F.concat(F.lit("cp|"), key)) % 5
    hcf = md5_long(F.concat(F.lit("cf|"), key)) % 7
    cyc1 = F.when(c0 == "hi", "mid").when(c0 == "mid", "lo").otherwise("hi")
    cyc2 = F.when(c0 == "hi", "lo").when(c0 == "mid", "hi").otherwise("mid")
    lab = o.where(hcp != 0).select(
        c0.alias("c0"),
        F.when(hb == 0, cyc1).otherwise(c0).alias("lb"),
        F.when(hcf == 0, cyc2).otherwise(c0).alias("lc"),
    )

    def cnt(label: str):
        out = F.lit(0)
        for col in ("c0", "lb", "lc"):
            out = out + F.when(F.col(col) == label, 1).otherwise(0)
        return out.cast("bigint")

    ch, cm, cl = cnt("hi"), cnt("mid"), cnt("lo")
    agg = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(ch * (ch - 1) + cm * (cm - 1) + cl * (cl - 1))
        .cast("bigint")
        .alias("p6"),
        F.sum(ch).cast("bigint").alias("nh"),
        F.sum(cm).cast("bigint").alias("nm"),
        F.sum(cl).cast("bigint").alias("nl"),
    )
    nd = F.col("n_items").cast("double")
    po = F.col("p6").cast("double") / (6.0 * F.col("n_items"))
    pe = (
        F.col("nh").cast("double") * F.col("nh")
        + F.col("nm").cast("double") * F.col("nm")
        + F.col("nl").cast("double") * F.col("nl")
    ) / (9.0 * nd * nd)
    return agg.select(
        "n_items",
        fround(po, 9).alias("p_obs"),
        fround(pe, 9).alias("p_exp"),
        fround((po - pe) / (1.0 - pe), 9).alias("kappa"),
    )


# --- Cronbach's alpha -----------------------------------------------------------

_CRONBACH_ORACLE = """
    WITH it AS (
      SELECT CAST(l_quantity AS BIGINT) AS i1,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS i2,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS i3,
             CAST(floor(l_extendedprice / 1000) AS BIGINT) AS i4
      FROM lineitem
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(i1) AS DECIMAL(38,0)) AS s1,
             CAST(sum(i2) AS DECIMAL(38,0)) AS s2,
             CAST(sum(i3) AS DECIMAL(38,0)) AS s3,
             CAST(sum(i4) AS DECIMAL(38,0)) AS s4,
             sum(CAST(i1 AS HUGEINT) * i1) AS q1,
             sum(CAST(i2 AS HUGEINT) * i2) AS q2,
             sum(CAST(i3 AS HUGEINT) * i3) AS q3,
             sum(CAST(i4 AS HUGEINT) * i4) AS q4,
             sum(CAST(i1 + i2 + i3 + i4 AS HUGEINT)
                 * (i1 + i2 + i3 + i4)) AS qs,
             CAST(sum(i1 + i2 + i3 + i4) AS DECIMAL(38,0)) AS ss
      FROM it
    ),
    a AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a1,
             CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a2,
             CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) AS a3,
             CAST(n AS DOUBLE) * CAST(q4 AS DOUBLE)
               - CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) AS a4,
             CAST(n AS DOUBLE) * CAST(qs AS DOUBLE)
               - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) AS ass
      FROM mo
    )
    SELECT n,
           floor((4.0 / 3.0) * (1.0 - (a1 + a2 + a3 + a4) / ass) * 1e9 + 0.5)
             / 1e9 AS alpha,
           floor(a1 / ass * 1e6 + 0.5) / 1e6 AS var_share_qty,
           floor(a2 / ass * 1e6 + 0.5) / 1e6 AS var_share_disc,
           floor(a3 / ass * 1e6 + 0.5) / 1e6 AS var_share_tax,
           floor(a4 / ass * 1e6 + 0.5) / 1e6 AS var_share_price
    FROM a
    """


@query("stats_cronbach_alpha", oracle=_CRONBACH_ORACLE)
def stats_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha (Cronbach 1951) internal-consistency
    reliability of a 4-item scale (quantity, discount, tax, price-k):
    α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) — every variance comes from exact
    n-scaled moments (the common n cancels, so α is a ratio of exact
    integers cast once to double). Per-item variance shares are the
    item-analysis diagnostic. On independent-ish TPC-H columns α ≈ 0 —
    correctly reporting "this is not a scale"; the pytest fixture plants
    a correlated battery and watches α approach 1.

    100 TB: one scan, eleven moment aggregates, constant-time algebra —
    the moments-then-solve shape."""
    it = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("i1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint").alias("i2"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("bigint").alias("i3"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("i4"),
    )
    dec = "decimal(38,0)"
    s_all = F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4")
    mo = it.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(F.col(f"i{k}").cast(dec)).alias(f"s{k}") for k in (1, 2, 3, 4)],
        *[
            F.sum((F.col(f"i{k}") * F.col(f"i{k}")).cast(dec)).alias(f"q{k}")
            for k in (1, 2, 3, 4)
        ],
        F.sum((s_all * s_all).cast(dec)).alias("qs"),
        F.sum(s_all.cast(dec)).alias("ss"),
    )
    nd = F.col("n").cast("double")

    def A(q, s):
        return nd * F.col(q).cast("double") - F.col(s).cast("double") * F.col(
            s
        ).cast("double")

    a1, a2, a3, a4 = A("q1", "s1"), A("q2", "s2"), A("q3", "s3"), A("q4", "s4")
    ass = A("qs", "ss")
    return mo.select(
        "n",
        fround((4.0 / 3.0) * (1.0 - (a1 + a2 + a3 + a4) / ass), 9).alias(
            "alpha"
        ),
        fround(a1 / ass, 6).alias("var_share_qty"),
        fround(a2 / ass, 6).alias("var_share_disc"),
        fround(a3 / ass, 6).alias("var_share_tax"),
        fround(a4 / ass, 6).alias("var_share_price"),
    )


# --- Brier score + Murphy decomposition ------------------------------------------

_BRIER_ORACLE = """
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
             sum(CAST(s_q AS HUGEINT) * s_q) AS sum_sq2,
             CAST(sum(s_q * y) AS BIGINT) AS sum_sqy,
             CAST(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS post,
             CAST(sum(sum_sq) AS BIGINT) AS sqt,
             sum(sum_sq2) AS sq2t, CAST(sum(sum_sqy) AS BIGINT) AS sqyt
      FROM bins
    ),
    terms AS (
      SELECT b.bin, b.n, t.nt, t.post,
             CAST(floor(b.n * (CAST(b.sum_sq AS DOUBLE) / b.n / 1e6
                               - CAST(b.pos AS DOUBLE) / b.n)
                            * (CAST(b.sum_sq AS DOUBLE) / b.n / 1e6
                               - CAST(b.pos AS DOUBLE) / b.n)
                        * 1e9 + 0.5) AS BIGINT) AS relq,
             CAST(floor(b.n * (CAST(b.pos AS DOUBLE) / b.n
                               - CAST(t.post AS DOUBLE) / t.nt)
                            * (CAST(b.pos AS DOUBLE) / b.n
                               - CAST(t.post AS DOUBLE) / t.nt)
                        * 1e9 + 0.5) AS BIGINT) AS resq
      FROM bins b CROSS JOIN tot t
    )
    SELECT max(nt) AS n,
           floor(CAST(max(post) AS DOUBLE) / max(nt) * 1e6 + 0.5) / 1e6
             AS o_bar,
           floor((CAST(max(post) AS DOUBLE) / max(nt))
                 * (1.0 - CAST(max(post) AS DOUBLE) / max(nt)) * 1e9 + 0.5)
             / 1e9 AS unc,
           floor(CAST(sum(relq) AS DOUBLE) / 1e9 / max(nt) * 1e9 + 0.5) / 1e9
             AS reliability,
           floor(CAST(sum(resq) AS DOUBLE) / 1e9 / max(nt) * 1e9 + 0.5) / 1e9
             AS resolution,
           floor((SELECT (CAST(sq2t AS DOUBLE) / 1e12
                          - 2.0 * sqyt / 1e6 + post) / nt FROM tot)
                 * 1e9 + 0.5) / 1e9 AS brier_raw
    FROM terms
    """


@query("eval_brier_decomposition", oracle=_BRIER_ORACLE)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score (Brier 1950) with the Murphy (1973) decomposition —
    reliability − resolution + uncertainty — over the SAME min-max
    score / 10-bin / error-label construction as ml_calibration_ece, so
    the two calibration diagnostics are directly comparable. brier_raw
    expands Σ(s−y)² = Σs²−2Σsy+Σy from exact bin-level integer moments
    (no per-row second pass); per-bin reliability/resolution terms
    quantize to 1e-9 integers before the cross-bin sum. brier_raw −
    (rel − res + unc) is the binning residual (within-bin score
    variance minus 2× within-bin score/outcome covariance — zero for
    discrete forecasts, where Murphy's identity is exact) — derivable
    by the consumer from the emitted parts.

    100 TB: one scan → 10-bin census carrying five integer moments;
    everything else is arithmetic over 10 rows + a 1-row broadcast."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    minmax = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    norm = (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin"))
    scored = e.crossJoin(F.broadcast(minmax)).select(
        F.floor(norm * 1e6 + F.lit(0.5)).cast("bigint").alias("s_q"),
        F.least(F.floor(norm * 10).cast("bigint"), F.lit(9)).alias("bin"),
        F.when(F.col("event_type") == "error", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    dec = "decimal(38,0)"
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s_q").cast("bigint").alias("sum_sq"),
        F.sum((F.col("s_q") * F.col("s_q")).cast(dec)).alias("sum_sq2"),
        F.sum(F.col("s_q") * F.col("y")).cast("bigint").alias("sum_sqy"),
        F.sum("y").cast("bigint").alias("pos"),
    ).localCheckpoint(eager=False)  # consumers: totals + per-bin terms
    tot = bins.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("post"),
        F.sum("sum_sq2").alias("sq2t"),
        F.sum("sum_sqy").cast("bigint").alias("sqyt"),
    )
    p_bar = F.col("sum_sq").cast("double") / F.col("n") / 1e6
    o_bin = F.col("pos").cast("double") / F.col("n")
    o_all = F.col("post").cast("double") / F.col("nt")
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "n",
        "nt",
        "post",
        F.floor(F.col("n") * (p_bar - o_bin) * (p_bar - o_bin) * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("relq"),
        F.floor(F.col("n") * (o_bin - o_all) * (o_bin - o_all) * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("resq"),
        F.col("sq2t"),
        F.col("sqyt"),
    )
    nt = F.max("nt").cast("double")
    post = F.max("post").cast("double")
    raw = (
        F.max(F.col("sq2t").cast("double")) / 1e12
        - 2.0 * F.max("sqyt").cast("double") / 1e6
        + F.max("post")
    ) / nt
    return terms.agg(
        F.max("nt").alias("n"),
        fround(post / nt, 6).alias("o_bar"),
        fround((post / nt) * (1.0 - post / nt), 9).alias("unc"),
        fround(F.sum("relq").cast("double") / 1e9 / nt, 9).alias("reliability"),
        fround(F.sum("resq").cast("double") / 1e9 / nt, 9).alias("resolution"),
        fround(raw, 9).alias("brier_raw"),
    )
