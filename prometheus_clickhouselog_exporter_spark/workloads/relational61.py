"""Round 12 batch 2: normality diagnostics (Jarque–Bera, D'Agostino K²),
the Grubbs outlier statistic, Cochran's Q for binary repeated measures,
and the Scholz–Stephens k-sample Anderson–Darling test —
DuckDB-oracle-checked, census/integer-exact.

Reference parity note: /root/reference has none of these; §2.3
territory. Methods are public: Jarque & Bera 1980 (the LM normality
test on skewness + excess kurtosis), D'Agostino, Belanger & D'Agostino
1990 (the K² omnibus combining the skewness and kurtosis z-transforms),
Grubbs 1950 (max studentized deviation), Cochran 1950 (Q for k binary
matched treatments), Scholz & Stephens 1987 (the k-sample
Anderson–Darling rank statistic, midrank/tie-adjusted version A²akN).

Moment discipline (house float rule): the central-moment queries
quantize per ROW before any integer fold — deviations in kilo-dollar
units keep u⁴ within per-row BIGINT at this domain, and the folds sum
as DECIMAL(38,0) so no engine-order float reduction exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# Shared central-moment scaffolding over order totals by priority:
# exact integer cents -> group mean -> per-row quantized powers of the
# kilo-dollar deviation -> DECIMAL(38,0) folds.
_MOMENTS_CTE = """
    WITH q AS (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    means AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx
      FROM q GROUP BY grp
    ),
    dev AS (
      SELECT q.grp, m.n,
             CAST(q.x AS DOUBLE) / 1e5
               - CAST(m.sx AS DOUBLE) / m.n / 1e5 AS u
      FROM q JOIN means m USING (grp)
    ),
    folds AS (
      SELECT grp, CAST(max(n) AS BIGINT) AS n,
             sum(CAST(CAST(floor(u * u * 1e9) AS BIGINT)
                      AS DECIMAL(38,0))) AS s2,
             sum(CAST(CAST(floor(u * u * u * 1e6) AS BIGINT)
                      AS DECIMAL(38,0))) AS s3,
             sum(CAST(CAST(floor(u * u * u * u * 1e3) AS BIGINT)
                      AS DECIMAL(38,0))) AS s4
      FROM dev GROUP BY grp
    ),
    m AS (
      SELECT grp, n,
             CAST(s2 AS DOUBLE) / 1e9 / n AS m2,
             CAST(s3 AS DOUBLE) / 1e6 / n AS m3,
             CAST(s4 AS DOUBLE) / 1e3 / n AS m4
      FROM folds
    )
"""


def _moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority (grp, n, m2, m3, m4) central moments in kilo-dollar
    units, matching _MOMENTS_CTE expression for expression."""
    o = table(spark, sf_dir, "orders")
    q = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    means = q.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
    )
    u = (
        F.col("x").cast("double") / 1e5
        - F.col("sx").cast("double") / F.col("n") / 1e5
    )
    dev = q.join(F.broadcast(means), "grp").select("grp", "n", u.alias("u"))
    folds = dev.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("u") * F.col("u") * 1e9)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias("s2"),
        F.sum(
            F.floor(F.col("u") * F.col("u") * F.col("u") * 1e6)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias("s3"),
        F.sum(
            F.floor(F.col("u") * F.col("u") * F.col("u") * F.col("u") * 1e3)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias("s4"),
    )
    return folds.select(
        "grp",
        "n",
        (F.col("s2").cast("double") / 1e9 / F.col("n")).alias("m2"),
        (F.col("s3").cast("double") / 1e6 / F.col("n")).alias("m3"),
        (F.col("s4").cast("double") / 1e3 / F.col("n")).alias("m4"),
    )


# --- Jarque–Bera -------------------------------------------------------------------

_JB_ORACLE = (
    _MOMENTS_CTE
    + """
    SELECT grp, n,
           floor(m3 / (m2 * sqrt(m2)) * 1e6 + 0.5) / 1e6 AS skewness,
           floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) / 1e6 AS ex_kurtosis,
           floor(CAST(n AS DOUBLE) / 6
                 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4)
                 * 1e6 + 0.5) / 1e6 AS jb
    FROM m ORDER BY grp
    """
)


@query("stats_jarque_bera", oracle=_JB_ORACLE)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test per order priority (Jarque & Bera
    1980): JB = n/6·(g1² + g2²/4) with g1 = m3/m2^{3/2} the moment
    skewness and g2 = m4/m2² − 3 the excess kurtosis; JB ~ χ²₂ under
    normality. The TPC-H price distribution is flat-ish, so the
    kurtosis arm dominates — the test statistic is reported, inference
    is the reader's (no p-value machinery needed).

    Exactness: one mean pass (DECIMAL cents), then per-row quantized
    powers of the kilo-dollar deviation (u²·1e9, u³·1e6, u⁴·1e3 —
    each within per-row BIGINT at this price domain) folded as
    DECIMAL(38,0): no float reduction order anywhere; both engines run
    the identical double expression per row.

    100 TB: two scan passes (mean, then moments), both map-side
    combinable; 5-row result.

    Ref cite: none — §2.3 territory."""
    m = _moments(spark, sf_dir)
    g1 = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    g2 = F.col("m4") / (F.col("m2") * F.col("m2")) - 3
    return m.select(
        "grp",
        "n",
        fround(g1, 6).alias("skewness"),
        fround(g2, 6).alias("ex_kurtosis"),
        fround(F.col("n").cast("double") / 6 * (g1 * g1 + g2 * g2 / 4), 6).alias(
            "jb"
        ),
    ).orderBy("grp")


# --- D'Agostino K² -----------------------------------------------------------------

_K2_ORACLE = (
    _MOMENTS_CTE
    + """,
    t AS (
      SELECT grp, n,
             m3 / (m2 * sqrt(m2)) AS g1,
             m4 / (m2 * m2) AS b2,
             CAST(n AS DOUBLE) AS nd
      FROM m
    ),
    zs AS (
      SELECT grp, n, g1, b2, nd,
             g1 * sqrt((nd + 1) * (nd + 3) / (6 * (nd - 2))) AS y,
             3.0 * (nd * nd + 27 * nd - 70) * (nd + 1) * (nd + 3)
               / ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9)) AS beta2
      FROM t
    ),
    z1 AS (
      SELECT grp, n, b2, nd,
             (1.0 / sqrt(ln(sqrt(-1 + sqrt(2 * (beta2 - 1))))))
             * ln(y / sqrt(2.0 / (-1 + sqrt(2 * (beta2 - 1)) - 1))
                  + sqrt((y / sqrt(2.0 / (-1 + sqrt(2 * (beta2 - 1)) - 1)))
                         * (y / sqrt(2.0 / (-1 + sqrt(2 * (beta2 - 1)) - 1)))
                         + 1)) AS z_skew
      FROM zs
    ),
    z2 AS (
      SELECT grp, n, z_skew,
             ((1 - 2.0 / (9 * a)) - cbrt((1 - 2.0 / a) / (1 + x * sqrt(2.0 / (a - 4)))))
               / sqrt(2.0 / (9 * a)) AS z_kurt
      FROM (
        SELECT grp, n, z_skew,
               (b2 - 3 * (nd - 1) / (nd + 1))
                 / sqrt(24 * nd * (nd - 2) * (nd - 3)
                        / ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5))) AS x,
               6 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1 + 4.0 / (sb1 * sb1))) AS a
        FROM (
          SELECT grp, n, z_skew, b2, nd,
                 6.0 * (nd * nd - 5 * nd + 2) / ((nd + 7) * (nd + 9))
                 * sqrt(6.0 * (nd + 3) * (nd + 5)
                        / (nd * (nd - 2) * (nd - 3))) AS sb1
          FROM z1
        )
      )
    )
    SELECT grp, n,
           floor(z_skew * 1e6 + 0.5) / 1e6 AS z_skew,
           floor(z_kurt * 1e6 + 0.5) / 1e6 AS z_kurt,
           floor((z_skew * z_skew + z_kurt * z_kurt) * 1e6 + 0.5) / 1e6 AS k2
    FROM z2 ORDER BY grp
    """
)


@query("stats_dagostino_k2", oracle=_K2_ORACLE)
def stats_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino's K² omnibus normality test per order priority
    (D'Agostino, Belanger & D'Agostino 1990): the skewness arm maps √b1
    through the Johnson SU transform (Y, β2(√b1), W² = −1+√(2(β2−1)),
    δ = 1/√(ln W), Z1 = δ·asinh(Y/α)); the kurtosis arm uses the
    Anscombe–Glynn 1983 cube-root normalization (standardize b2, then
    Z2 from the Wilson–Hilferty-style transform with A); K² = Z1² +
    Z2² ~ χ²₂. All elementary functions (sqrt/ln/cbrt) — no Φ⁻¹ —
    so both engines evaluate the identical closed form.

    Builds on the same quantized central-moment scaffolding as
    stats_jarque_bera (per-row integer quantization, DECIMAL folds);
    asinh is spelled ln(x + √(x²+1)) on both engines for identical
    rounding.

    100 TB: identical shape to stats_jarque_bera — two scan passes,
    5-row result.

    Ref cite: none — §2.3 territory."""
    m = _moments(spark, sf_dir)
    nd = F.col("n").cast("double")
    g1 = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    b2 = F.col("m4") / (F.col("m2") * F.col("m2"))
    y = g1 * F.sqrt((nd + 1) * (nd + 3) / (6 * (nd - 2)))
    beta2 = (
        3.0 * (nd * nd + 27 * nd - 70) * (nd + 1) * (nd + 3)
        / ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9))
    )
    w2 = -1 + F.sqrt(2 * (beta2 - 1))
    alpha = F.sqrt(2.0 / (w2 - 1))
    z1 = (1.0 / F.sqrt(F.log(F.sqrt(w2)))) * F.log(
        y / alpha + F.sqrt((y / alpha) * (y / alpha) + 1)
    )
    sb1 = (
        6.0 * (nd * nd - 5 * nd + 2) / ((nd + 7) * (nd + 9))
        * F.sqrt(6.0 * (nd + 3) * (nd + 5) / (nd * (nd - 2) * (nd - 3)))
    )
    a = 6 + 8.0 / sb1 * (2.0 / sb1 + F.sqrt(1 + 4.0 / (sb1 * sb1)))
    x = (b2 - 3 * (nd - 1) / (nd + 1)) / F.sqrt(
        24 * nd * (nd - 2) * (nd - 3)
        / ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5))
    )
    z2 = (
        (1 - 2.0 / (9 * a))
        - F.cbrt((1 - 2.0 / a) / (1 + x * F.sqrt(2.0 / (a - 4))))
    ) / F.sqrt(2.0 / (9 * a))
    return m.select(
        "grp",
        "n",
        fround(z1, 6).alias("z_skew"),
        fround(z2, 6).alias("z_kurt"),
        fround(z1 * z1 + z2 * z2, 6).alias("k2"),
    ).orderBy("grp")


# --- Grubbs ------------------------------------------------------------------------

_GRUBBS_ORACLE = (
    _MOMENTS_CTE
    + """,
    mx AS (
      SELECT grp, CAST(max(CAST(floor(abs(u) * 1e9) AS BIGINT)) AS BIGINT)
               AS dq
      FROM dev GROUP BY grp
    )
    SELECT m.grp, m.n,
           floor(CAST(x.dq AS DOUBLE) / 1e9
                 / sqrt(m.m2 * m.n / (m.n - 1)) * 1e6 + 0.5) / 1e6 AS g_grubbs,
           floor(CAST(x.dq AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6
             AS max_dev_kusd
    FROM m JOIN mx x USING (grp) ORDER BY m.grp
    """
)


@query("stats_grubbs_outlier", oracle=_GRUBBS_ORACLE)
def stats_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic per order priority (Grubbs 1950):
    G = max|x−x̄| / s with s the SAMPLE standard deviation — the
    largest studentized deviation, compared against the t-based
    critical value in practice (the statistic is reported; the critical
    value is a constant of (n, α) the reader applies). The max
    deviation is also reported in kilo-dollar units.

    Exactness: the same quantized-moment discipline as
    stats_jarque_bera (m2 = Σfloor(u²·1e9)/1e9/n; m2·n/(n−1) is the
    sample variance) with the u²-fold and the max-|u| fold fused into
    ONE grouped pass; the max is over per-row quantized |u|·1e9
    BIGINTs — max is order-independent, so no float reduction concern
    exists even before quantization, and quantizing makes the tie
    behavior explicit.

    100 TB: two scan passes total (group means, then the fused
    moment+max fold), 5-row result; both folds map-side combinable.

    Ref cite: none — §2.3 territory."""
    o = table(spark, sf_dir, "orders")
    q = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    means = q.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
    )
    u = (
        F.col("x").cast("double") / 1e5
        - F.col("sx").cast("double") / F.col("n") / 1e5
    )
    dev = q.join(F.broadcast(means), "grp").select("grp", "n", u.alias("u"))
    fold = dev.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("u") * F.col("u") * 1e9)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias("s2"),
        F.max(F.floor(F.abs(F.col("u")) * 1e9).cast("bigint")).alias("dq"),
    )
    m2 = F.col("s2").cast("double") / 1e9 / F.col("n")
    s = F.sqrt(m2 * F.col("n") / (F.col("n") - 1))
    return fold.select(
        "grp",
        "n",
        fround(F.col("dq").cast("double") / 1e9 / s, 6).alias("g_grubbs"),
        fround(F.col("dq").cast("double") / 1e9, 6).alias("max_dev_kusd"),
    ).orderBy("grp")


# --- Cochran's Q -------------------------------------------------------------------

_COCHRAN_Q_ORACLE = """
    WITH ev AS (
      SELECT user_id, event_type, CAST(floor(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    cen AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM ev
      GROUP BY event_type, v
    ),
    tot AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cen
      GROUP BY event_type
    ),
    cq AS (
      -- exact discrete p90 per type: smallest v with 10*cum >= 9*n
      SELECT event_type, CAST(min(v) AS BIGINT) AS q FROM (
        SELECT c.event_type, c.v, t.n,
               CAST(sum(c.c) OVER (PARTITION BY c.event_type ORDER BY c.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM cen c JOIN tot t USING (event_type)
      ) WHERE 10 * cum >= 9 * n GROUP BY event_type
    ),
    inc AS (
      SELECT DISTINCT e.user_id, e.event_type
      FROM ev e JOIN cq USING (event_type)
      WHERE e.v > cq.q
    ),
    cols AS (
      -- k spans the FULL treatment domain (every event type with a
      -- census row = every cq row): a type whose p90 cut admits zero
      -- users enters as a treatment with C_j = 0 rather than silently
      -- shrinking k and mis-scaling (k-1) (ADVICE r12 #2)
      SELECT cq.event_type, CAST(coalesce(i.cj, 0) AS BIGINT) AS cj
      FROM cq LEFT JOIN (
        SELECT event_type, CAST(count(*) AS BIGINT) AS cj FROM inc
        GROUP BY event_type
      ) i USING (event_type)
    ),
    rows_ AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS ri FROM inc
      GROUP BY user_id
    ),
    k1 AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(cj) AS BIGINT) AS t,
                  CAST(sum(cj * cj) AS BIGINT) AS sc2
           FROM cols),
    r1 AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(ri * ri) AS BIGINT) AS sr2
           FROM rows_)
    SELECT k1.k, r1.n_users, k1.t,
           floor((CAST(k1.k AS DOUBLE) - 1)
                 * (CAST(k1.k AS DOUBLE) * k1.sc2
                    - CAST(k1.t AS DOUBLE) * k1.t)
                 / (CAST(k1.k AS DOUBLE) * k1.t - r1.sr2)
                 * 1e6 + 0.5) / 1e6 AS q_cochran
    FROM k1 CROSS JOIN r1
    """


@query("stats_cochran_q", oracle=_COCHRAN_Q_ORACLE)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) across the k event types as
    binary matched treatments: X_{u,t} = 1 iff user u ever fired event
    type t; Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²) with C_j the
    per-treatment successes, R_i the per-subject successes, T = ΣC_j;
    Q ~ χ²_{k−1} under equal marginal success probabilities — the
    k-treatment generalization of McNemar (stats_mcnemar_halves is the
    k=2 member). Subjects with all-zero rows drop out of every term
    algebraically, so the distinct-pair frame IS the full design
    matrix. "Fired" means an event whose value exceeds that type's
    DISCRETE p90 (smallest census value with 10·cum ≥ 9·n) — raw
    presence is degenerate on this corpus (every user fires every
    type, making Q's denominator exactly 0), and the tail-threshold
    form is the realistic alert-style predicate.

    Exactness: the p90 is a rank cut on the integer-cents value census
    (10·cum ≥ 9·n — pure integers); everything after is integer counts
    until the single final division.

    100 TB: one census pass per type, one distinct pass
    (hash-partition by (user, type)), two bounded aggregations (k-row
    and user-domain), 1-row crosses.

    Ref cite: none — §2.3 territory."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        )
    )
    cen = ev.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cen.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cq = (
        cen.join(tot, "event_type")
        .select(
            "event_type",
            "v",
            "n",
            F.sum("c").over(wcum).cast("bigint").alias("cum"),
        )
        .filter(10 * F.col("cum") >= 9 * F.col("n"))
        .groupBy("event_type")
        .agg(F.min("v").cast("bigint").alias("q"))
    )
    inc = (
        ev.join(F.broadcast(cq), "event_type")
        .filter(F.col("v") > F.col("q"))
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )  # both margins read it
    # k spans the FULL treatment domain (one cq row per event type): a
    # type whose p90 cut admits zero users must enter with C_j = 0, not
    # vanish and shrink Q's (k-1) scaling (ADVICE r12 #2). Both engines
    # derive cols from cq the same way, so the hash gate now certifies
    # Cochran's design, not a shared convention.
    cols = (
        cq.select("event_type")
        .join(
            inc.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("bigint").alias("cj")
            ),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            F.coalesce(F.col("cj"), F.lit(0)).cast("bigint").alias("cj"),
        )
    )
    rows_ = inc.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ri")
    )
    k1 = cols.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("cj").cast("bigint").alias("t"),
        F.sum(F.col("cj") * F.col("cj")).cast("bigint").alias("sc2"),
    )
    r1 = rows_.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("ri") * F.col("ri")).cast("bigint").alias("sr2"),
    )
    kd = F.col("k").cast("double")
    q = (
        (kd - 1)
        * (kd * F.col("sc2") - F.col("t").cast("double") * F.col("t"))
        / (kd * F.col("t") - F.col("sr2"))
    )
    return k1.crossJoin(F.broadcast(r1)).select(
        "k", "n_users", "t", fround(q, 6).alias("q_cochran")
    )


# --- k-sample Anderson–Darling ------------------------------------------------------

_AD_KSAMPLE_ORACLE = """
    WITH census AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, n_chars
    ),
    langs AS (SELECT lang, CAST(sum(c) AS BIGINT) AS ni FROM census
              GROUP BY lang),
    pooled AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS l FROM census GROUP BY v
    ),
    pcum AS (
      SELECT v, l,
             CAST(2 * coalesce(sum(l) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + l
               AS BIGINT) AS b2
      FROM pooled
    ),
    nn1 AS (SELECT CAST(sum(l) AS BIGINT) AS nn FROM pooled),
    grid AS (
      SELECT g.lang, g.ni, p.v, p.l, p.b2,
             CAST(coalesce(c.c, 0) AS BIGINT) AS cij
      FROM langs g CROSS JOIN pcum p
      LEFT JOIN census c ON c.lang = g.lang AND c.v = p.v
    ),
    mcum AS (
      SELECT lang, ni, v, l, b2,
             CAST(2 * coalesce(sum(cij) OVER (PARTITION BY lang ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cij
               AS BIGINT) AS m2
      FROM grid
    ),
    terms AS (
      SELECT m.lang, m.ni,
             CAST(floor(CAST(m.l AS DOUBLE)
                    * (CAST(t.nn AS DOUBLE) * m.m2
                       - CAST(m.ni AS DOUBLE) * m.b2)
                    * (CAST(t.nn AS DOUBLE) * m.m2
                       - CAST(m.ni AS DOUBLE) * m.b2)
                    / (CAST(t.nn AS DOUBLE)
                       * (CAST(m.b2 AS DOUBLE) * (2 * t.nn - m.b2)
                          - CAST(t.nn AS DOUBLE) * m.l))
                    * 1e9) AS BIGINT) AS tq
      FROM mcum m CROSS JOIN nn1 t
    ),
    persample AS (
      SELECT lang, CAST(max(ni) AS BIGINT) AS ni,
             CAST(sum(tq) AS BIGINT) AS sq
      FROM terms GROUP BY lang
    )
    SELECT CAST(t.nn AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS k,
           floor((CAST(t.nn AS DOUBLE) - 1) / t.nn
                 * (CAST(sum(CAST(floor(CAST(p.sq AS DOUBLE) / 1e9 / p.ni
                                        * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
                 * 1e6 + 0.5) / 1e6 AS a2_akn
    FROM persample p CROSS JOIN nn1 t
    GROUP BY t.nn
    """


@query("stats_ad_ksample", oracle=_AD_KSAMPLE_ORACLE)
def stats_ad_ksample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scholz–Stephens k-sample Anderson–Darling test (Scholz &
    Stephens 1987, the tie-adjusted midrank version A²akN) across the
    document languages on the n_chars distribution: per distinct pooled
    value j with block count l_j, midpoint cumulatives B̃_j (pooled)
    and M̃_ij (sample i), the contribution is (l_j/N)·(N·M̃_ij −
    n_i·B̃_j)² / (B̃_j(N−B̃_j) − N·l_j/4); A² = (N−1)/N · Σ_i S_i/n_i.
    Under H0 (all samples from one distribution) A² has mean k−1 —
    the rank-based omnibus that weights the TAILS more than
    Kruskal–Wallis.

    Exactness: doubled midpoint cumulatives B2 = 2B_{j−1}+l_j and
    M2 = 2M_{i,j−1}+c_ij keep the midpoints integer; the contribution
    simplifies EXACTLY to l·(N·M2 − n_i·B2)² / (N·(B2(2N−B2) − N·l)) —
    the /4s cancel — evaluated as the identical double expression per
    grid row, quantized at 1e9, and integer-folded per language.

    100 TB: the |langs| × |distinct n_chars| grid is the
    stats_jonckheere_terpstra shape — census-bounded axes, windows
    partitioned by lang over census rows, never a row-pair join.

    Ref cite: none — §2.3 territory."""
    d = table(spark, sf_dir, "documents")
    census = (
        d.groupBy("lang", F.col("n_chars").cast("bigint").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # grid axes + margins share it
    )
    langs = census.groupBy("lang").agg(F.sum("c").cast("bigint").alias("ni"))
    pooled = census.groupBy("v").agg(F.sum("c").cast("bigint").alias("l"))
    wlt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pcum = pooled.select(
        "v",
        "l",
        (2 * F.coalesce(F.sum("l").over(wlt), F.lit(0)) + F.col("l"))
        .cast("bigint")
        .alias("b2"),
    )
    nn1 = pooled.agg(F.sum("l").cast("bigint").alias("nn"))
    grid = (
        langs.crossJoin(pcum)
        .join(census, ["lang", "v"], "left")
        .select(
            "lang",
            "ni",
            "v",
            "l",
            "b2",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("cij"),
        )
    )
    wlang = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mcum = grid.select(
        "lang",
        "ni",
        "l",
        "b2",
        (2 * F.coalesce(F.sum("cij").over(wlang), F.lit(0)) + F.col("cij"))
        .cast("bigint")
        .alias("m2"),
    )
    nnd = F.col("nn").cast("double")
    num = nnd * F.col("m2") - F.col("ni").cast("double") * F.col("b2")
    den = nnd * (
        F.col("b2").cast("double") * (2 * F.col("nn") - F.col("b2"))
        - nnd * F.col("l")
    )
    terms = mcum.crossJoin(F.broadcast(nn1)).select(
        "lang",
        "ni",
        F.floor(F.col("l").cast("double") * num * num / den * 1e9)
        .cast("bigint")
        .alias("tq"),
    )
    persample = terms.groupBy("lang").agg(
        F.max("ni").cast("bigint").alias("ni"),
        F.sum("tq").cast("bigint").alias("sq"),
    )
    return (
        persample.crossJoin(F.broadcast(nn1))
        .groupBy("nn")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            # per-language quantization before the k-row fold: no float
            # reduction order even across the tiny language dimension
            F.sum(
                F.floor(
                    F.col("sq").cast("double") / 1e9 / F.col("ni") * 1e9
                ).cast("bigint")
            ).cast("bigint").alias("sq9"),
        )
        .select(
            F.col("nn").cast("bigint").alias("n"),
            "k",
            fround(
                (nnd - 1) / nnd * (F.col("sq9").cast("double") / 1e9), 6
            ).alias("a2_akn"),
        )
    )
