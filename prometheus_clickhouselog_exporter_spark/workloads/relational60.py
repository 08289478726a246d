"""Round 12 batch 1: the classical two-sample rank battery for scale —
Siegel–Tukey alternating extreme ranks, Lepage's combined
location+scale test, and the Cucconi test — DuckDB-oracle-checked,
census/integer-exact.

Reference parity note: /root/reference has none of these; §2.3
territory. Methods are public: Siegel & Tukey 1960 (a rank test for
relative spread using alternating ranks from the extremes — the
Wilcoxon machinery repurposed for dispersion), Lepage 1971 (the
quadratic combination of the Wilcoxon and Ansari–Bradley statistics —
the standard rank test sensitive to location AND scale at once), and
Cucconi 1968 (the historically-earlier location-scale test on squared
ranks and contrary squared ranks; see Marozzi 2009 for the modern
treatment).

Shared discipline (the stats_conover_squared_ranks pattern,
relational59.py): two groups pooled into ONE value census on integer
cents, exact integer block-rank arithmetic on the census (never a
per-row rank), per-row quantization before any integer fold, classical
no-tie moments with midrank statistics (documented convention — ties
enter the statistic via midranks; the variance keeps the closed form,
exactly as stats_jonckheere_terpstra documents).

100 TB: every query here is one grouped census (map-side combinable),
one bounded cumulative window OVER THE CENSUS (rows = distinct cent
values, not corpus rows), and 1-row scalar crosses — the
MULTI_BNLJ_OK class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# Two-group pooled value census over order totals: '1-URGENT' (group 1)
# vs '5-LOW' (group 2), values as exact integer cents.
_CENSUS_CTE = """
    WITH q AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END AS g,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS d
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    vals AS (
      SELECT d,
             CAST(count(*) AS BIGINT) AS c,
             CAST(count(*) FILTER (WHERE g = 1) AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE g = 2) AS BIGINT) AS c2
      FROM q GROUP BY d
    ),
    cum AS (
      SELECT d, c, c1, c2,
             CAST(coalesce(sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b
      FROM vals
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c) AS BIGINT) AS nn
      FROM vals
    )
"""


def _census(spark: SparkSession, sf_dir: str):
    """(census df with d,c,c1,c2,b ; 1-row totals df with n1,n2,nn)."""
    o = table(spark, sf_dir, "orders")
    q = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(2))
        .alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("d"),
    )
    vals = q.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.count_if(F.col("g") == 1).cast("bigint").alias("c1"),
        F.count_if(F.col("g") == 2).cast("bigint").alias("c2"),
    )
    wlt = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "d",
        "c",
        "c1",
        "c2",
        F.coalesce(F.sum("c").over(wlt), F.lit(0)).cast("bigint").alias("b"),
    ).localCheckpoint(eager=False)  # census feeds both the fold and totals
    tot = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum("c").cast("bigint").alias("nn"),
    )
    return cum, tot


# --- Siegel–Tukey ------------------------------------------------------------------

_SIEGEL_TUKEY_ORACLE = (
    _CENSUS_CTE
    + """,
    blocks AS (
      -- exact integer sum of Siegel-Tukey weights over each tie block
      -- [b+1, b+c]: weights alternate from the extremes (1; 4,5; 8,9; …
      -- from below — 2,3; 6,7; … from above; middle of an odd pool
      -- takes N), summed in closed form per segment.
      SELECT u.d, u.c, u.c1,
             (CASE WHEN least(u.b + u.c, t.nn // 2) >= u.b + 1
                   THEN (u.b + 1 + least(u.b + u.c, t.nn // 2))
                        * (least(u.b + u.c, t.nn // 2) - u.b)
                        - ((least(u.b + u.c, t.nn // 2) + 1) // 2
                           - (u.b + 1) // 2)
                   ELSE 0 END)
             + (CASE WHEN t.nn % 2 = 1
                          AND u.b + 1 <= (t.nn + 1) // 2
                          AND u.b + u.c >= (t.nn + 1) // 2
                     THEN t.nn ELSE 0 END)
             + (CASE WHEN u.b + u.c >= greatest(u.b + 1, t.nn - t.nn // 2 + 1)
                   THEN (t.nn + 1 - (u.b + u.c)
                         + t.nn + 1 - greatest(u.b + 1, t.nn - t.nn // 2 + 1))
                        * (u.b + u.c
                           - greatest(u.b + 1, t.nn - t.nn // 2 + 1) + 1)
                        - ((t.nn + 1 - greatest(u.b + 1,
                                                t.nn - t.nn // 2 + 1)) // 2
                           - (t.nn + 1 - (u.b + u.c) - 1) // 2)
                   ELSE 0 END) AS ws
      FROM cum u CROSS JOIN tot t
    ),
    w AS (
      SELECT CAST(sum(CAST(floor(CAST(c1 AS DOUBLE) * ws / c * 1e6)
                           AS BIGINT)) AS BIGINT) AS wq
      FROM blocks
    )
    SELECT t.n1, t.n2,
           floor(CAST(w.wq AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS w_st,
           floor((CAST(w.wq AS DOUBLE) / 1e6
                  - CAST(t.n1 AS DOUBLE) * (t.nn + 1) / 2)
                 / sqrt(CAST(t.n1 AS DOUBLE) * t.n2 * (t.nn + 1) / 12)
                 * 1e6 + 0.5) / 1e6 AS z_st
    FROM tot t CROSS JOIN w
    """
)


@query("stats_siegel_tukey", oracle=_SIEGEL_TUKEY_ORACLE)
def stats_siegel_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel–Tukey test (Siegel & Tukey 1960) of equal SPREAD between
    urgent and low-priority order totals: pool both samples, assign
    ranks alternating from the extremes inward — 1 to the smallest;
    2, 3 to the two largest; 4, 5 to the next two smallest; … (middle
    of an odd pool takes N) — then run the Wilcoxon machinery on those
    ranks: under equal dispersion W has the Wilcoxon null moments,
    E[W] = n1(N+1)/2 and Var = n1·n2(N+1)/12; a sample concentrated in
    the middle collects LOW weights, one in the tails HIGH weights.

    Exactness: the pooled value census on integer cents gives each tie
    block the positions [b+1, b+c]; the alternating-weight sum over a
    position range has a closed integer form per segment (below the
    middle: Σ(2j − [j odd]); above: Σ(2k − [k even]) with k the
    distance from the top; middle: N) — so every block's weight mass is
    EXACT integer arithmetic, midranks quantize per block at 1e6 before
    the single integer fold, and ties use midranks while the variance
    keeps the classical no-tie form (documented convention, the
    stats_jonckheere_terpstra discipline).

    100 TB: one census groupBy (map-side combinable), one cumulative
    window over census rows, 1-row scalar crosses. Census magnitude
    guard: block sums ≤ c·N and the quantized fold ≤ N²·1e6, inside
    both double-exactness and BIGINT at any census the cents domain
    admits (the census axis is price cents, not corpus rows).

    Ref cite: none — §2.3 territory."""
    cum, tot = _census(spark, sf_dir)
    blocks = cum.crossJoin(F.broadcast(tot))
    p1 = F.col("b") + 1
    p2 = F.col("b") + F.col("c")
    fl = F.expr("nn DIV 2")
    jhi = F.least(p2, fl)
    low = F.when(
        jhi >= p1,
        (p1 + jhi) * (jhi - p1 + 1)
        - (F.expr("(least(b + c, nn DIV 2) + 1) DIV 2")
           - F.expr("(b + 1) DIV 2")),
    ).otherwise(F.lit(0))
    midpos = F.expr("(nn + 1) DIV 2")
    mid = F.when(
        (F.col("nn") % 2 == 1) & (p1 <= midpos) & (p2 >= midpos),
        F.col("nn"),
    ).otherwise(F.lit(0))
    plo_u = F.greatest(p1, F.col("nn") - fl + 1)
    ka = F.col("nn") + 1 - p2
    kb = F.col("nn") + 1 - plo_u
    up = F.when(
        p2 >= plo_u,
        (ka + kb) * (kb - ka + 1)
        - (F.expr("(nn + 1 - greatest(b + 1, nn - nn DIV 2 + 1)) DIV 2")
           - F.expr("(nn + 1 - (b + c) - 1) DIV 2")),
    ).otherwise(F.lit(0))
    ws = (low + mid + up).alias("ws")
    w = blocks.select(
        "c", "c1", ws
    ).select(
        F.floor(F.col("c1").cast("double") * F.col("ws") / F.col("c") * 1e6)
        .cast("bigint")
        .alias("wq")
    ).agg(F.sum("wq").cast("bigint").alias("wq"))
    wst = F.col("wq").cast("double") / 1e6
    z = (
        wst - F.col("n1").cast("double") * (F.col("nn") + 1) / 2
    ) / F.sqrt(
        F.col("n1").cast("double") * F.col("n2") * (F.col("nn") + 1) / 12
    )
    return tot.crossJoin(F.broadcast(w)).select(
        "n1",
        "n2",
        fround(wst, 6).alias("w_st"),
        fround(z, 6).alias("z_st"),
    )


# --- Lepage ------------------------------------------------------------------------

_LEPAGE_ORACLE = (
    _CENSUS_CTE
    + """,
    blocks AS (
      -- doubled Wilcoxon midrank mass: c1 * (2b + c + 1) (exact), and
      -- the exact Ansari-Bradley block mass: sum over [b+1, b+c] of
      -- min(p, N+1-p), split at the middle in closed form.
      SELECT u.c, u.c1,
             u.c1 * (2 * u.b + u.c + 1) AS w2m,
             (CASE WHEN least(u.b + u.c, (t.nn + 1) // 2) >= u.b + 1
                   THEN (u.b + 1 + least(u.b + u.c, (t.nn + 1) // 2))
                        * (least(u.b + u.c, (t.nn + 1) // 2) - u.b) // 2
                   ELSE 0 END)
             + (CASE WHEN u.b + u.c >= greatest(u.b + 1, (t.nn + 1) // 2 + 1)
                   THEN (t.nn + 1 - (u.b + u.c)
                         + t.nn + 1
                         - greatest(u.b + 1, (t.nn + 1) // 2 + 1))
                        * (u.b + u.c
                           - greatest(u.b + 1, (t.nn + 1) // 2 + 1) + 1) // 2
                   ELSE 0 END) AS abm
      FROM cum u CROSS JOIN tot t
    ),
    s AS (
      SELECT CAST(sum(w2m) AS BIGINT) AS w2,
             CAST(sum(CAST(floor(CAST(c1 AS DOUBLE) * abm / c * 1e6)
                           AS BIGINT)) AS BIGINT) AS aq
      FROM blocks
    ),
    z AS (
      SELECT t.n1, t.n2,
             CAST(s.w2 AS DOUBLE) / 2 AS w,
             CAST(s.aq AS DOUBLE) / 1e6 AS a,
             (CAST(s.w2 AS DOUBLE) / 2
              - CAST(t.n1 AS DOUBLE) * (t.nn + 1) / 2)
             / sqrt(CAST(t.n1 AS DOUBLE) * t.n2 * (t.nn + 1) / 12) AS zw,
             CASE WHEN t.nn % 2 = 0
                  THEN (CAST(s.aq AS DOUBLE) / 1e6
                        - CAST(t.n1 AS DOUBLE) * (t.nn + 2) / 4)
                       / sqrt(CAST(t.n1 AS DOUBLE) * t.n2 * (t.nn + 2)
                              * (t.nn - 2) / (48.0 * (t.nn - 1)))
                  ELSE (CAST(s.aq AS DOUBLE) / 1e6
                        - CAST(t.n1 AS DOUBLE) * (t.nn + 1) * (t.nn + 1)
                          / (4.0 * t.nn))
                       / sqrt(CAST(t.n1 AS DOUBLE) * t.n2 * (t.nn + 1)
                              * (3 + CAST(t.nn AS DOUBLE) * t.nn)
                              / (48.0 * t.nn * t.nn))
             END AS za
      FROM tot t CROSS JOIN s
    )
    SELECT n1, n2,
           floor(w * 1e6 + 0.5) / 1e6 AS w_wilcoxon,
           floor(a * 1e6 + 0.5) / 1e6 AS a_ansari,
           floor(zw * 1e6 + 0.5) / 1e6 AS z_w,
           floor(za * 1e6 + 0.5) / 1e6 AS z_ab,
           floor((zw * zw + za * za) * 1e6 + 0.5) / 1e6 AS lepage_l
    FROM z
    """
)


@query("stats_lepage_test", oracle=_LEPAGE_ORACLE)
def stats_lepage_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lepage's combined location-scale test (Lepage 1971): L = Z_W² +
    Z_AB², the squared standardized Wilcoxon rank-sum (location) plus
    the squared standardized Ansari–Bradley statistic (scale, scores
    a(p) = min(p, N+1−p) peaking at the middle); L ~ χ²₂ under the
    joint null of equal location AND scale — the standard omnibus rank
    test when either could differ.

    Exactness: doubled Wilcoxon midrank mass c1·(2b+c+1) per census
    block is exact integer; the Ansari–Bradley block mass Σ min(p,
    N+1−p) over [b+1, b+c] has a closed integer form split at the
    middle (both (a+b)(b−a+1) products are even, so the halving stays
    integer); AB midranks quantize per block at 1e6. AB null moments
    use the classical even/odd-N closed forms (Ansari & Bradley 1960);
    ties enter via midranks only (documented convention).

    100 TB: identical shape to stats_siegel_tukey — census groupBy,
    census-bounded window, 1-row crosses.

    Ref cite: none — §2.3 territory."""
    cum, tot = _census(spark, sf_dir)
    blocks = cum.crossJoin(F.broadcast(tot))
    p1 = F.col("b") + 1
    p2 = F.col("b") + F.col("c")
    h = F.expr("(nn + 1) DIV 2")
    jhi = F.least(p2, h)
    low = F.when(
        jhi >= p1, F.expr(
            "(b + 1 + least(b + c, (nn + 1) DIV 2))"
            " * (least(b + c, (nn + 1) DIV 2) - b) DIV 2"
        )
    ).otherwise(F.lit(0))
    plo_u = F.greatest(p1, h + 1)
    up = F.when(
        p2 >= plo_u, F.expr(
            "(nn + 1 - (b + c) + nn + 1"
            " - greatest(b + 1, (nn + 1) DIV 2 + 1))"
            " * (b + c - greatest(b + 1, (nn + 1) DIV 2 + 1) + 1) DIV 2"
        )
    ).otherwise(F.lit(0))
    s = blocks.select(
        (F.col("c1") * (2 * F.col("b") + F.col("c") + 1)).alias("w2m"),
        F.floor(
            F.col("c1").cast("double") * (low + up) / F.col("c") * 1e6
        ).cast("bigint").alias("aqm"),
    ).agg(
        F.sum("w2m").cast("bigint").alias("w2"),
        F.sum("aqm").cast("bigint").alias("aq"),
    )
    nn = F.col("nn").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    w = F.col("w2").cast("double") / 2
    a = F.col("aq").cast("double") / 1e6
    zw = (w - n1 * (F.col("nn") + 1) / 2) / F.sqrt(
        n1 * n2 * (F.col("nn") + 1) / 12
    )
    za = F.when(
        F.col("nn") % 2 == 0,
        (a - n1 * (F.col("nn") + 2) / 4)
        / F.sqrt(
            n1 * n2 * (F.col("nn") + 2) * (F.col("nn") - 2)
            / (48.0 * (F.col("nn") - 1))
        ),
    ).otherwise(
        (a - n1 * (F.col("nn") + 1) * (F.col("nn") + 1) / (4.0 * F.col("nn")))
        / F.sqrt(
            n1 * n2 * (F.col("nn") + 1) * (3 + nn * nn)
            / (48.0 * nn * nn)
        )
    )
    return tot.crossJoin(F.broadcast(s)).select(
        "n1",
        "n2",
        fround(w, 6).alias("w_wilcoxon"),
        fround(a, 6).alias("a_ansari"),
        fround(zw, 6).alias("z_w"),
        fround(za, 6).alias("z_ab"),
        fround(zw * zw + za * za, 6).alias("lepage_l"),
    )


# --- Cucconi -----------------------------------------------------------------------

_CUCCONI_ORACLE = (
    _CENSUS_CTE
    + """,
    s AS (
      -- exact quadrupled sums of squared midranks for sample 2:
      -- Q2 = sum c2 * (2b+c+1)^2  (midrank^2 = (2b+c+1)^2 / 4), and the
      -- doubled plain midrank mass W2 = sum c2 * (2b+c+1)
      SELECT CAST(sum(c2 * (2 * b + c + 1) * (2 * b + c + 1)) AS BIGINT)
               AS q2,
             CAST(sum(c2 * (2 * b + c + 1)) AS BIGINT) AS w2
      FROM cum
    ),
    z AS (
      SELECT t.n1, t.n2, t.nn,
             (6.0 * (CAST(s.q2 AS DOUBLE) / 4)
              - CAST(t.n2 AS DOUBLE) * (t.nn + 1) * (2 * t.nn + 1))
             / sqrt(CAST(t.n1 AS DOUBLE) * t.n2 * (t.nn + 1)
                    * (2 * t.nn + 1) * (8 * t.nn + 11) / 5.0) AS u,
             (6.0 * (CAST(t.n2 AS DOUBLE)
                       * (t.nn + 1) * (CAST(t.nn AS DOUBLE) + 1)
                     - CAST(s.w2 AS DOUBLE) * (t.nn + 1)
                     + CAST(s.q2 AS DOUBLE) / 4)
              - CAST(t.n2 AS DOUBLE) * (t.nn + 1) * (2 * t.nn + 1))
             / sqrt(CAST(t.n1 AS DOUBLE) * t.n2 * (t.nn + 1)
                    * (2 * t.nn + 1) * (8 * t.nn + 11) / 5.0) AS v,
             (2.0 * (CAST(t.nn AS DOUBLE) * t.nn - 4))
               / ((2.0 * t.nn + 1) * (8.0 * t.nn + 11)) - 1 AS rho
      FROM tot t CROSS JOIN s
    )
    SELECT n1, n2,
           floor(u * 1e6 + 0.5) / 1e6 AS u_stat,
           floor(v * 1e6 + 0.5) / 1e6 AS v_stat,
           floor(rho * 1e6 + 0.5) / 1e6 AS rho,
           floor((u * u + v * v - 2 * rho * u * v)
                 / (2 * (1 - rho * rho)) * 1e6 + 0.5) / 1e6 AS c_cucconi
    FROM z
    """
)


@query("stats_cucconi_test", oracle=_CUCCONI_ORACLE)
def stats_cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi's location-scale test (Cucconi 1968; Marozzi 2009):
    standardize U = ΣR² (squared pooled ranks of sample 2) and
    V = Σ(N+1−R)² (contrary squared ranks) by their exact null moments,
    then C = (U² + V² − 2ρUV) / (2(1−ρ²)) with the closed-form null
    correlation ρ = 2(N²−4)/((2N+1)(8N+11)) − 1; C ~ exponential-like
    under the null and predates Lepage's statistic by three years —
    the squared-rank pairing makes it sensitive to scale, the U/V
    asymmetry to location.

    Exactness: the squared-midrank mass is kept as the exact QUADRUPLED
    integer Q2 = Σ c2·(2b+c+1)² (midrank² = (2b+c+1)²/4 — no per-row
    quantization needed at all here), the plain mass as doubled W2;
    Σ(N+1−R)² expands to n2(N+1)² − 2(N+1)ΣR + ΣR² so V needs no
    second census pass. Ties enter via midranks; moments keep the
    classical no-tie closed forms (documented convention).

    100 TB: census groupBy + census window + 1-row crosses. Magnitude:
    Q2 ≤ 4N³ — integer-exact far past this SF; the docstring bound
    would switch to normalized-rank units (the Conover discipline) at
    censuses near 2e6 pooled rows.

    Ref cite: none — §2.3 territory."""
    cum, tot = _census(spark, sf_dir)
    r2 = 2 * F.col("b") + F.col("c") + 1
    s = cum.select(
        (F.col("c2") * r2 * r2).alias("q2m"),
        (F.col("c2") * r2).alias("w2m"),
    ).agg(
        F.sum("q2m").cast("bigint").alias("q2"),
        F.sum("w2m").cast("bigint").alias("w2"),
    )
    nn = F.col("nn").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    denom = F.sqrt(
        n1 * n2 * (F.col("nn") + 1) * (2 * F.col("nn") + 1)
        * (8 * F.col("nn") + 11) / 5.0
    )
    sumsq = F.col("q2").cast("double") / 4
    u = (6.0 * sumsq - n2 * (F.col("nn") + 1) * (2 * F.col("nn") + 1)) / denom
    contrary = (
        n2 * (F.col("nn") + 1) * (nn + 1)
        - F.col("w2").cast("double") * (F.col("nn") + 1)
        + sumsq
    )
    v = (6.0 * contrary - n2 * (F.col("nn") + 1) * (2 * F.col("nn") + 1)) / denom
    rho = (2.0 * (nn * nn - 4)) / ((2.0 * F.col("nn") + 1) * (8.0 * F.col("nn") + 11)) - 1
    return tot.crossJoin(F.broadcast(s)).select(
        "n1",
        "n2",
        fround(u, 6).alias("u_stat"),
        fround(v, 6).alias("v_stat"),
        fround(rho, 6).alias("rho"),
        fround(
            (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho)), 6
        ).alias("c_cucconi"),
    )
