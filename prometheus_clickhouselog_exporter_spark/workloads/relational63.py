"""Round 12 batch 4: the normal-scores family — Fligner–Killeen scale
test, van der Waerden location test, the Lilliefors normality distance,
and the Ljung–Box portmanteau — unlocked by evaluating Φ⁻¹ and Φ as
PUBLISHED rational approximations spelled identically on both engines.

Reference parity note: /root/reference has none of these; §2.3
territory. Methods are public: Fligner & Killeen 1976 (normal scores
on ranks of |x − median|), van der Waerden 1952/1953 (normal scores on
plain ranks), Lilliefors 1967 (KS distance against the FITTED normal),
Ljung & Box 1978 (the portmanteau Q on the first h autocorrelations),
Acklam 2003 (the piecewise rational Φ⁻¹ approximation, |ε| < 1.15e-9),
Abramowitz & Stegun 1964 eq. 26.2.17 (the 5-term Φ approximation,
|ε| < 7.5e-8).

The barrier these break: earlier scale/location rank tests in this
registry (Conover, Ansari–Bradley, Mood) were chosen precisely to need
NO normal quantile. Here Φ⁻¹/Φ are generated from ONE coefficient
list into BOTH the Spark Column tree and the oracle SQL string in the
same Horner order, so the engines evaluate bit-identical doubles and
the hash gate certifies the approximation itself — the statistic is
exact FOR THESE SCORES, which is the standard practice (R's
fligner.test uses qnorm the same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Acklam's inverse normal CDF (2003), Horner form ---------------------------------

_ACK_A = ("-3.969683028665376e+01", "2.209460984245205e+02",
          "-2.759285104469687e+02", "1.383577518672690e+02",
          "-3.066479806614716e+01", "2.506628277459239e+00")
_ACK_B = ("-5.447609879822406e+01", "1.615858368580409e+02",
          "-1.556989798598866e+02", "6.680131188771972e+01",
          "-1.328068155288572e+01")
_ACK_C = ("-7.784894002430293e-03", "-3.223964580411365e-01",
          "-2.400758277161838e+00", "-2.549732539343734e+00",
          "4.374664141464968e+00", "2.938163982698783e+00")
_ACK_D = ("7.784695709041462e-03", "3.224671290700398e-01",
          "2.445134137142996e+00", "3.754408661907416e+00")
_ACK_PLOW = "2.425e-02"


def _horner_sql(coeffs, var: str) -> str:
    expr = coeffs[0]
    for c in coeffs[1:]:
        expr = f"({expr} * {var} + {c})"
    return expr


def _horner_col(coeffs, var: Column) -> Column:
    expr = F.lit(float(coeffs[0]))
    for c in coeffs[1:]:
        expr = expr * var + F.lit(float(c))
    return expr


def probit_sql(p: str) -> str:
    """Acklam Φ⁻¹ as a DuckDB SQL expression of the (0,1) expression
    ``p`` — textually the same Horner nesting as ``probit_col``."""
    ql = f"sqrt(-2.0 * ln({p}))"
    qu = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    qc = f"(({p}) - 0.5)"
    rc = f"({qc} * {qc})"
    low = (f"({_horner_sql(_ACK_C, ql)})"
           f" / ({_horner_sql(_ACK_D, ql)} * {ql} + 1.0)")
    upp = (f"-(({_horner_sql(_ACK_C, qu)})"
           f" / ({_horner_sql(_ACK_D, qu)} * {qu} + 1.0))")
    cen = (f"({_horner_sql(_ACK_A, rc)}) * {qc}"
           f" / ({_horner_sql(_ACK_B, rc)} * {rc} + 1.0)")
    return (f"(CASE WHEN ({p}) < {_ACK_PLOW} THEN {low}"
            f" WHEN ({p}) <= 1.0 - {_ACK_PLOW} THEN {cen}"
            f" ELSE {upp} END)")


def probit_col(p: Column) -> Column:
    """Acklam Φ⁻¹ as a Spark Column of the (0,1) Column ``p`` — the
    identical arithmetic tree as ``probit_sql``."""
    ql = F.sqrt(-2.0 * F.log(p))
    qu = F.sqrt(-2.0 * F.log(1.0 - p))
    qc = p - 0.5
    rc = qc * qc
    low = _horner_col(_ACK_C, ql) / (_horner_col(_ACK_D, ql) * ql + 1.0)
    upp = -(_horner_col(_ACK_C, qu) / (_horner_col(_ACK_D, qu) * qu + 1.0))
    cen = _horner_col(_ACK_A, rc) * qc / (_horner_col(_ACK_B, rc) * rc + 1.0)
    return (
        F.when(p < float(_ACK_PLOW), low)
        .when(p <= 1.0 - float(_ACK_PLOW), cen)
        .otherwise(upp)
    )


# --- Abramowitz–Stegun 26.2.17 normal CDF --------------------------------------------

_AS_B = ("0.319381530", "-0.356563782", "1.781477937",
         "-1.821255978", "1.330274429")
_AS_T = "0.2316419"
_INV_SQRT_2PI = "0.3989422804014327"


def normal_cdf_sql(x: str) -> str:
    """A&S 26.2.17 Φ(x) for DuckDB; mirrored for x < 0 via symmetry."""
    ax = f"abs({x})"
    t = f"(1.0 / (1.0 + {_AS_T} * {ax}))"
    poly = _horner_sql(tuple(reversed(_AS_B)), t)
    tail = f"({_INV_SQRT_2PI} * exp(-0.5 * {ax} * {ax}) * ({poly}) * {t})"
    return (f"(CASE WHEN ({x}) >= 0.0 THEN 1.0 - {tail}"
            f" ELSE {tail} END)")


def normal_cdf_col(x: Column) -> Column:
    ax = F.abs(x)
    t = 1.0 / (1.0 + float(_AS_T) * ax)
    poly = _horner_col(tuple(reversed(_AS_B)), t)
    tail = (
        F.lit(float(_INV_SQRT_2PI)) * F.exp(-0.5 * ax * ax) * poly * t
    )
    return F.when(x >= 0.0, 1.0 - tail).otherwise(tail)


# --- Fligner–Killeen ------------------------------------------------------------------

_FK_ORACLE = f"""
    WITH q AS (
      SELECT lang AS grp, CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    gcen AS (
      SELECT grp, x, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY grp, x
    ),
    gn AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM gcen GROUP BY grp),
    med AS (
      -- exact discrete per-group median: smallest x with 2*cum >= n
      SELECT grp, CAST(min(x) AS BIGINT) AS m FROM (
        SELECT g.grp, g.x, t.n,
               CAST(sum(g.c) OVER (PARTITION BY g.grp ORDER BY g.x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM gcen g JOIN gn t USING (grp)
      ) WHERE 2 * cum >= n GROUP BY grp
    ),
    dev AS (
      SELECT g.grp, abs(g.x - m.m) AS u, g.c
      FROM gcen g JOIN med m USING (grp)
    ),
    ucen AS (
      SELECT grp, u, CAST(sum(c) AS BIGINT) AS c FROM dev GROUP BY grp, u
    ),
    pool AS (
      SELECT u, CAST(sum(c) AS BIGINT) AS l FROM ucen GROUP BY u
    ),
    pcum AS (
      SELECT u, l,
             CAST(coalesce(sum(l) OVER (ORDER BY u
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b
      FROM pool
    ),
    nn1 AS (SELECT CAST(sum(l) AS BIGINT) AS nn FROM pool),
    scored AS (
      -- midrank r = (2b+l+1)/2; score a = probit(1/2 + r/(2(N+1))),
      -- quantized per census cell at 1e9 before every integer fold
      SELECT s.grp, s.c,
             CAST(floor(s.c * {probit_sql(
                 "0.5 + (CAST(2 * p.b + p.l + 1 AS DOUBLE) / 2)"
                 " / (2.0 * (t.nn + 1))")} * 1e9) AS BIGINT) AS aq,
             CAST(floor(s.c * {probit_sql(
                 "0.5 + (CAST(2 * p.b + p.l + 1 AS DOUBLE) / 2)"
                 " / (2.0 * (t.nn + 1))")} * {probit_sql(
                 "0.5 + (CAST(2 * p.b + p.l + 1 AS DOUBLE) / 2)"
                 " / (2.0 * (t.nn + 1))")} * 1e9) AS BIGINT) AS a2q
      FROM ucen s JOIN pcum p USING (u) CROSS JOIN nn1 t
    ),
    pg AS (
      SELECT grp, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(aq) AS BIGINT) AS sa
      FROM scored GROUP BY grp
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(sa) AS BIGINT) AS sat
      FROM pg
    ),
    v AS (
      SELECT (CAST(sum(a2q) AS DOUBLE) / 1e9
              - t.nn * (CAST(t.sat AS DOUBLE) / 1e9 / t.nn)
                     * (CAST(t.sat AS DOUBLE) / 1e9 / t.nn))
             / (t.nn - 1) AS vv
      FROM scored CROSS JOIN tot t GROUP BY t.nn, t.sat
    ),
    terms AS (
      SELECT CAST(sum(CAST(floor(
               CAST(p.n AS DOUBLE)
               * (CAST(p.sa AS DOUBLE) / 1e9 / p.n
                  - CAST(t.sat AS DOUBLE) / 1e9 / t.nn)
               * (CAST(p.sa AS DOUBLE) / 1e9 / p.n
                  - CAST(t.sat AS DOUBLE) / 1e9 / t.nn)
               * 1e9) AS BIGINT)) AS BIGINT) AS tq
      FROM pg p CROSS JOIN tot t
    )
    SELECT t.nn AS n, t.k,
           floor((CAST(x.tq AS DOUBLE) / 1e9) / v.vv * 1e6 + 0.5) / 1e6
             AS fk_statistic
    FROM tot t CROSS JOIN v CROSS JOIN terms x
    """


@query("stats_fligner_killeen", oracle=_FK_ORACLE)
def stats_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner–Killeen scale test (Fligner & Killeen 1976; the
    median-centered normal-scores variant R ships as fligner.test)
    across document languages on n_chars: score each observation
    a_i = Φ⁻¹(½ + r_i/(2(N+1))) where r_i is the pooled midrank of
    |x − median_g|; X² = Σ_g n_g(Ā_g − ā)² / V with V the score
    variance; X² ~ χ²_{k−1}. THE robust omnibus scale test — and the
    registry's first operator to cross the Φ⁻¹ barrier: Acklam's 2003
    rational approximation (|ε| < 1.15e-9) is generated from one
    coefficient table into both engines' expressions in identical
    Horner order, so the hash gate certifies the scores themselves.

    Exactness: per-group medians are exact census rank cuts; deviation
    ranks are exact doubled midranks on the pooled deviation census;
    scores and squared scores quantize per census CELL at 1e9 before
    every integer fold; the k-row terms fold quantizes again at 1e9.

    100 TB: two census passes (per-group, pooled deviations), windows
    over census rows only, k-row + 1-row scalar crosses.

    Ref cite: none — §2.3 territory."""
    d = table(spark, sf_dir, "documents")
    q = d.select(
        F.col("lang").alias("grp"), F.col("n_chars").cast("bigint").alias("x")
    )
    gcen = q.groupBy("grp", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # median cut + deviation census share it
    gn = gcen.groupBy("grp").agg(F.sum("c").cast("bigint").alias("n"))
    wg = (
        Window.partitionBy("grp")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    med = (
        gcen.join(gn, "grp")
        .select(
            "grp", "x", "n", F.sum("c").over(wg).cast("bigint").alias("cum")
        )
        .filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("grp")
        .agg(F.min("x").cast("bigint").alias("m"))
    )
    dev = gcen.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("x") - F.col("m")).alias("u"), "c"
    )
    ucen = dev.groupBy("grp", "u").agg(
        F.sum("c").cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # pool + scores share it
    pool = ucen.groupBy("u").agg(F.sum("c").cast("bigint").alias("l"))
    wlt = Window.orderBy("u").rowsBetween(Window.unboundedPreceding, -1)
    pcum = pool.select(
        "u",
        "l",
        F.coalesce(F.sum("l").over(wlt), F.lit(0)).cast("bigint").alias("b"),
    )
    nn1 = pool.agg(F.sum("l").cast("bigint").alias("nn"))
    p = 0.5 + (
        (2 * F.col("b") + F.col("l") + 1).cast("double") / 2
    ) / (2.0 * (F.col("nn") + 1))
    a = probit_col(p)
    scored = (
        ucen.join(pcum, "u")
        .crossJoin(F.broadcast(nn1))
        .select(
            "grp",
            "c",
            F.floor(F.col("c") * a * 1e9).cast("bigint").alias("aq"),
            F.floor(F.col("c") * a * a * 1e9).cast("bigint").alias("a2q"),
        )
        .localCheckpoint(eager=False)  # group fold + variance fold share it
    )
    pg = scored.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("aq").cast("bigint").alias("sa"),
    ).localCheckpoint(eager=False)
    tot = pg.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("sa").cast("bigint").alias("sat"),
    )
    abar = F.col("sat").cast("double") / 1e9 / F.col("nn")
    v = (
        scored.crossJoin(F.broadcast(tot))
        .groupBy("nn", "sat")
        .agg(F.sum("a2q").cast("bigint").alias("s2t"))
        .select(
            (
                (
                    F.col("s2t").cast("double") / 1e9
                    - F.col("nn") * abar * abar
                )
                / (F.col("nn") - 1)
            ).alias("vv")
        )
    )
    term = (
        F.col("n").cast("double")
        * (F.col("sa").cast("double") / 1e9 / F.col("n") - abar)
        * (F.col("sa").cast("double") / 1e9 / F.col("n") - abar)
        * 1e9
    )
    terms = (
        pg.crossJoin(F.broadcast(tot))
        .agg(F.sum(F.floor(term).cast("bigint")).cast("bigint").alias("tq"))
    )
    return (
        tot.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(terms))
        .select(
            F.col("nn").alias("n"),
            "k",
            fround(
                (F.col("tq").cast("double") / 1e9) / F.col("vv"), 6
            ).alias("fk_statistic"),
        )
    )


# --- van der Waerden -----------------------------------------------------------------

_VDW_ORACLE = f"""
    WITH q AS (
      SELECT lang AS grp, CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    gcen AS (
      SELECT grp, x, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY grp, x
    ),
    pool AS (
      SELECT x, CAST(sum(c) AS BIGINT) AS l FROM gcen GROUP BY x
    ),
    pcum AS (
      SELECT x, l,
             CAST(coalesce(sum(l) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b
      FROM pool
    ),
    nn1 AS (SELECT CAST(sum(l) AS BIGINT) AS nn FROM pool),
    scored AS (
      SELECT g.grp, g.c,
             CAST(floor(g.c * {probit_sql(
                 "(CAST(2 * p.b + p.l + 1 AS DOUBLE) / 2) / (t.nn + 1.0)")}
                 * 1e9) AS BIGINT) AS aq,
             CAST(floor(g.c * {probit_sql(
                 "(CAST(2 * p.b + p.l + 1 AS DOUBLE) / 2) / (t.nn + 1.0)")}
                 * {probit_sql(
                 "(CAST(2 * p.b + p.l + 1 AS DOUBLE) / 2) / (t.nn + 1.0)")}
                 * 1e9) AS BIGINT) AS a2q
      FROM gcen g JOIN pcum p USING (x) CROSS JOIN nn1 t
    ),
    pg AS (
      SELECT grp, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(aq) AS BIGINT) AS sa
      FROM scored GROUP BY grp
    ),
    s2 AS (SELECT CAST(sum(a2q) AS BIGINT) AS s2t FROM scored),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k
      FROM pg
    ),
    terms AS (
      SELECT CAST(sum(CAST(floor(
               (CAST(p.sa AS DOUBLE) / 1e9) * (CAST(p.sa AS DOUBLE) / 1e9)
               / p.n * 1e9) AS BIGINT)) AS BIGINT) AS tq
      FROM pg p
    )
    SELECT t.nn AS n, t.k,
           floor((CAST(x.tq AS DOUBLE) / 1e9)
                 / ((CAST(s.s2t AS DOUBLE) / 1e9) / (t.nn - 1))
                 * 1e6 + 0.5) / 1e6 AS vdw_statistic
    FROM tot t CROSS JOIN s2 s CROSS JOIN terms x
    """


@query("stats_van_der_waerden", oracle=_VDW_ORACLE)
def stats_van_der_waerden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """van der Waerden normal-scores location test (van der Waerden
    1952) across document languages on n_chars: a_i = Φ⁻¹(r_i/(N+1))
    on pooled midranks; T = Σ_g (S_g²/n_g) / s² with s² = Σa²/(N−1);
    T ~ χ²_{k−1} — the asymptotically most efficient rank test under
    normality (ARE 1 vs ANOVA), the location sibling of
    stats_fligner_killeen on the same Acklam-Φ⁻¹ machinery.

    Exactness: pooled midranks on the value census; scores and squared
    scores quantized per census cell at 1e9; group and variance folds
    integer.

    100 TB: one value census + census window + k-row folds.

    Ref cite: none — §2.3 territory."""
    d = table(spark, sf_dir, "documents")
    gcen = (
        d.select(
            F.col("lang").alias("grp"),
            F.col("n_chars").cast("bigint").alias("x"),
        )
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # pool + scores share it
    )
    pool = gcen.groupBy("x").agg(F.sum("c").cast("bigint").alias("l"))
    wlt = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    pcum = pool.select(
        "x",
        "l",
        F.coalesce(F.sum("l").over(wlt), F.lit(0)).cast("bigint").alias("b"),
    )
    nn1 = pool.agg(F.sum("l").cast("bigint").alias("nn"))
    p = (
        (2 * F.col("b") + F.col("l") + 1).cast("double") / 2
    ) / (F.col("nn") + 1.0)
    a = probit_col(p)
    scored = (
        gcen.join(pcum, "x")
        .crossJoin(F.broadcast(nn1))
        .select(
            "grp",
            "c",
            F.floor(F.col("c") * a * 1e9).cast("bigint").alias("aq"),
            F.floor(F.col("c") * a * a * 1e9).cast("bigint").alias("a2q"),
        )
        .localCheckpoint(eager=False)
    )
    pg = scored.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("aq").cast("bigint").alias("sa"),
    )
    s2 = scored.agg(F.sum("a2q").cast("bigint").alias("s2t"))
    tot = pg.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    terms = pg.agg(
        F.sum(
            F.floor(
                (F.col("sa").cast("double") / 1e9)
                * (F.col("sa").cast("double") / 1e9)
                / F.col("n")
                * 1e9
            ).cast("bigint")
        ).cast("bigint").alias("tq")
    )
    return (
        tot.crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(terms))
        .select(
            F.col("nn").alias("n"),
            "k",
            fround(
                (F.col("tq").cast("double") / 1e9)
                / ((F.col("s2t").cast("double") / 1e9) / (F.col("nn") - 1)),
                6,
            ).alias("vdw_statistic"),
        )
    )


# --- Lilliefors -----------------------------------------------------------------------

_LILLIEFORS_ORACLE = f"""
    WITH q AS (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    cen AS (
      SELECT grp, x, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY grp, x
    ),
    mom AS (
      -- cast BEFORE the product: x*x*c would cross BIGINT long before
      -- the DECIMAL fold at corpus scale
      SELECT grp, CAST(sum(c) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(38,0)) * c) AS sx,
             sum(CAST(x AS DECIMAL(38,0)) * x * c) AS sxx
      FROM cen GROUP BY grp
    ),
    fit AS (
      SELECT grp, n,
             CAST(sx AS DOUBLE) / n / 1e5 AS mu,
             sqrt((CAST(sxx AS DOUBLE) / 1e10
                   - (CAST(sx AS DOUBLE) / 1e5)
                     * (CAST(sx AS DOUBLE) / 1e5) / n) / (n - 1)) AS sd
      FROM mom
    ),
    steps AS (
      SELECT c.grp, c.c, f.n,
             CAST(sum(c.c) OVER (PARTITION BY c.grp ORDER BY c.x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             {normal_cdf_sql(
                 "(CAST(c.x AS DOUBLE) / 1e5 - f.mu) / f.sd")} AS phi
      FROM cen c JOIN fit f USING (grp)
    ),
    d AS (
      SELECT grp, CAST(max(n) AS BIGINT) AS n,
             max(CAST(cum AS DOUBLE) / n - phi) AS dp,
             max(phi - CAST(cum - c AS DOUBLE) / n) AS dm
      FROM steps GROUP BY grp
    )
    SELECT grp, n,
           floor(dp * 1e6 + 0.5) / 1e6 AS d_plus,
           floor(dm * 1e6 + 0.5) / 1e6 AS d_minus,
           floor((CASE WHEN dp > dm THEN dp ELSE dm END) * 1e6 + 0.5) / 1e6
             AS d_lilliefors
    FROM d ORDER BY grp
    """


@query("stats_lilliefors", oracle=_LILLIEFORS_ORACLE)
def stats_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors normality distance per order priority (Lilliefors
    1967): the KS statistic against the normal FITTED from the sample
    (μ̂, s) — the correction that makes KS honest when the parameters
    are estimated; D = max(D⁺, D⁻) over the value census with
    D⁺ = max(F̂(x) − Φ(z)) and D⁻ = max(Φ(z) − F̂(x⁻)). Φ is the
    Abramowitz–Stegun 26.2.17 5-term approximation (|ε| < 7.5e-8)
    generated into both engines in identical Horner order — the same
    cross-engine-certified-approximation discipline as the Φ⁻¹ family.

    Exactness: moments are exact DECIMAL folds over the (value, count)
    census (weights carried by count — no per-row pass after the
    census); the ECDF steps are integer cumulatives over census rows;
    max is order-independent so the double max-folds carry no
    reduction-order hazard.

    100 TB: one census, census windows per group, 5-row output.

    Ref cite: none — §2.3 territory."""
    o = table(spark, sf_dir, "orders")
    cen = (
        o.select(
            F.col("o_orderpriority").alias("grp"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
        )
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # moments + steps share it
    )
    mom = cen.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        # cast BEFORE the product (BIGINT would overflow at corpus scale)
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("c")).alias("sx"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x") * F.col("c")
        ).alias("sxx"),
    )
    fit = mom.select(
        "grp",
        "n",
        (F.col("sx").cast("double") / F.col("n") / 1e5).alias("mu"),
        F.sqrt(
            (
                F.col("sxx").cast("double") / 1e10
                - (F.col("sx").cast("double") / 1e5)
                * (F.col("sx").cast("double") / 1e5)
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    wg = (
        Window.partitionBy("grp")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    z = (F.col("x").cast("double") / 1e5 - F.col("mu")) / F.col("sd")
    steps = cen.join(F.broadcast(fit), "grp").select(
        "grp",
        "c",
        "n",
        F.sum("c").over(wg).cast("bigint").alias("cum"),
        normal_cdf_col(z).alias("phi"),
    )
    dd = steps.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.col("cum").cast("double") / F.col("n") - F.col("phi")).alias(
            "dp"
        ),
        F.max(
            F.col("phi") - (F.col("cum") - F.col("c")).cast("double") / F.col("n")
        ).alias("dm"),
    )
    return dd.select(
        "grp",
        "n",
        fround(F.col("dp"), 6).alias("d_plus"),
        fround(F.col("dm"), 6).alias("d_minus"),
        fround(F.greatest("dp", "dm"), 6).alias("d_lilliefors"),
    ).orderBy("grp")


# --- Ljung–Box ------------------------------------------------------------------------

_LB_LAGS = 6

_LB_ORACLE = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    idx AS (
      SELECT y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
      FROM daily
    ),
    mu AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS DOUBLE) / count(*) AS m
      FROM idx
    ),
    dev AS (
      SELECT i.t, CAST(i.y AS DOUBLE) - m.m AS u FROM idx i CROSS JOIN mu m
    ),
    lagged AS (
      SELECT u,
             {", ".join(f"lag(u, {k}) OVER (ORDER BY t) AS u{k}"
                        for k in range(1, _LB_LAGS + 1))}
      FROM dev
    ),
    prods AS (
      SELECT
        CAST(sum(CAST(floor(u * u * 1e6) AS BIGINT)) AS BIGINT) AS c0,
        {", ".join(
            f"CAST(sum(CAST(floor(u * u{k} * 1e6) AS BIGINT)) AS BIGINT)"
            f" AS c{k}" for k in range(1, _LB_LAGS + 1))}
      FROM lagged
    )
    SELECT m.n, CAST({_LB_LAGS} AS BIGINT) AS h,
           floor(CAST(m.n AS DOUBLE) * (m.n + 2) * (
             {" + ".join(
                 f"(CAST(p.c{k} AS DOUBLE) / p.c0)"
                 f" * (CAST(p.c{k} AS DOUBLE) / p.c0) / (m.n - {k})"
                 for k in range(1, _LB_LAGS + 1))}
           ) * 1e6 + 0.5) / 1e6 AS q_ljung_box,
           floor(CAST(m.n AS DOUBLE) * (
             {" + ".join(
                 f"(CAST(p.c{k} AS DOUBLE) / p.c0)"
                 f" * (CAST(p.c{k} AS DOUBLE) / p.c0)"
                 for k in range(1, _LB_LAGS + 1))}
           ) * 1e6 + 0.5) / 1e6 AS q_box_pierce
    FROM mu m CROSS JOIN prods p
    """


@query("timeseries_ljung_box", oracle=_LB_ORACLE)
def timeseries_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test (Ljung & Box 1978) on the daily
    event-count series: Q = n(n+2) Σ_{k=1..h} ρ̂_k²/(n−k) over the
    first h = 6 autocorrelations (the Box–Pierce Q' = n Σρ̂_k² is
    reported alongside — the small-sample-corrected and original
    forms); Q ~ χ²_h under white noise. The residual-whiteness check a
    forecasting pipeline runs after fitting (timeseries_stl_strength /
    promql_holt_winters produce exactly such residual series).

    Exactness: the same quantized lag-product ACF machinery as
    timeseries_pacf_durbin_levinson (per-row u·u_{t−k}·1e6 integer
    folds, biased estimator, index-consecutive convention); the h-term
    combination is closed-form arithmetic on identical doubles.

    100 TB: day census + one census window + a 1-row fold.

    Ref cite: none — §2.3 territory."""
    from .relational62 import _daily

    idx = _daily(spark, sf_dir)
    mu = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    dev = idx.crossJoin(F.broadcast(mu)).select(
        "t", (F.col("y").cast("double") - F.col("m")).alias("u")
    )
    wo = Window.orderBy("t")
    lagged = dev.select(
        "u",
        *[F.lag("u", k).over(wo).alias(f"u{k}") for k in range(1, _LB_LAGS + 1)],
    )
    prods = lagged.agg(
        F.sum(F.floor(F.col("u") * F.col("u") * 1e6).cast("bigint"))
        .cast("bigint")
        .alias("c0"),
        *[
            F.sum(F.floor(F.col("u") * F.col(f"u{k}") * 1e6).cast("bigint"))
            .cast("bigint")
            .alias(f"c{k}")
            for k in range(1, _LB_LAGS + 1)
        ],
    )
    nd = F.col("n").cast("double")
    rho2 = [
        (F.col(f"c{k}").cast("double") / F.col("c0"))
        * (F.col(f"c{k}").cast("double") / F.col("c0"))
        for k in range(1, _LB_LAGS + 1)
    ]
    qlb = nd * (F.col("n") + 2) * sum(
        r / (F.col("n") - k) for k, r in zip(range(1, _LB_LAGS + 1), rho2)
    )
    qbp = nd * sum(rho2)
    return mu.crossJoin(F.broadcast(prods)).select(
        "n",
        F.lit(_LB_LAGS).cast("bigint").alias("h"),
        fround(qlb, 6).alias("q_ljung_box"),
        fround(qbp, 6).alias("q_box_pierce"),
    )
