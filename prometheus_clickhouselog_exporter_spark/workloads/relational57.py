"""Round 11 batch: Bartlett's test, Mood's median test, Kuiper's V and
Watson's U² uniformity audits, generalized-ESD (Grubbs) outlier rounds,
and Kendall's W concordance — DuckDB-oracle-checked, census/moment-exact.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these; §2.3 north-star territory. Methods
are public: Bartlett 1937, Brown & Mood 1951 (median test), Kuiper 1960
+ Stephens 1970 (modified statistic), Watson 1961 (U²), Rosner 1983
(generalized ESD), Kendall & Babington Smith 1939 (W, tie-corrected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, md5_long, query, table

# --- Bartlett's test of homogeneity of variances ----------------------------------

_BARTLETT_ORACLE = """
    WITH q AS (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxx
      FROM q GROUP BY grp
    ),
    terms AS (
      -- per-group pieces from EXACT (n, sx, sxx); every cross-group sum
      -- of doubles is per-term quantized (deterministic fold, no
      -- reduction-order hazard). s2 is the unbiased variance in cents^2.
      SELECT n,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS s2
      FROM g
    ),
    folds AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k,
             -- (n-1)*s2 ~ 3e18 cents^2: quantize DOWN at 1e-3 (granularity
             -- 1e3 cents^2, relative 1e-15) to stay far from BIGINT clamp
             CAST(sum(CAST(floor(CAST(n - 1 AS DOUBLE) * s2 * 1e-3)
                           AS BIGINT)) AS BIGINT) AS ssw_q,
             -- (n-1)*ln(s2) ~ 1e6: quantize at 1e9
             CAST(sum(CAST(floor(CAST(n - 1 AS DOUBLE) * ln(s2) * 1e9)
                           AS BIGINT)) AS BIGINT) AS sln_q,
             -- 1/(n-1) ~ 3e-5: quantize at 1e12
             CAST(sum(CAST(floor(1.0 / CAST(n - 1 AS DOUBLE) * 1e12)
                           AS BIGINT)) AS BIGINT) AS sinv_q
      FROM terms
    )
    SELECT CAST(nn AS BIGINT) AS n_obs, CAST(k AS INT) AS n_groups,
           CAST(k - 1 AS INT) AS df,
           floor(((CAST(nn - k AS DOUBLE)
                   * ln(CAST(ssw_q AS DOUBLE) * 1e3 / CAST(nn - k AS DOUBLE))
                   - CAST(sln_q AS DOUBLE) / 1e9)
                  / (1.0 + (CAST(sinv_q AS DOUBLE) / 1e12
                            - 1.0 / CAST(nn - k AS DOUBLE))
                           / (3.0 * CAST(k - 1 AS DOUBLE))))
                 * 1e6 + 0.5) / 1e6 AS t_bartlett
    FROM folds
    """


@query("stats_bartlett_test", oracle=_BARTLETT_ORACLE)
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test (Bartlett 1937) of equal variances across the 5
    order-priority classes — the normal-theory member of the
    scale-comparison family (stats_levene_bf is the robust mean-based
    member, stats_ansari_bradley the rank-based two-sample one):
    T = [(N−k)·ln(Sp²) − Σ(nᵢ−1)ln(Sᵢ²)] / C with the Bartlett
    correction C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)); T ~ χ²_{k−1}
    under H₀. Group variances come from exact DECIMAL cent moments;
    the three cross-group folds are per-term quantized at scales
    matched to their magnitudes (1e-3 for the ~1e18 cents² pooled-SS
    terms — far from the floor(double) BIGINT clamp, SCALE.md — 1e9
    for log terms, 1e12 for reciprocal terms), so both engines reduce
    identical integers.

    100 TB: one 5-group moment aggregate with map-side combine; all
    downstream arithmetic is k-row. The moment partials merge by
    addition — incremental/streaming-ready.

    Ref cite: none — /root/reference computes no statistics
    (metrics.go:8-75); §2.3 territory."""
    o = table(spark, sf_dir, "orders")
    q = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    g = q.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    s2 = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
        / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    terms = g.select("n", s2.alias("s2"))
    folds = terms.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.floor((F.col("n") - 1).cast("double") * F.col("s2") * 1e-3)
            .cast("bigint")
        ).cast("bigint").alias("ssw_q"),
        F.sum(
            F.floor(
                (F.col("n") - 1).cast("double") * F.log("s2") * 1e9
            ).cast("bigint")
        ).cast("bigint").alias("sln_q"),
        F.sum(
            F.floor(
                F.lit(1.0) / (F.col("n") - 1).cast("double") * 1e12
            ).cast("bigint")
        ).cast("bigint").alias("sinv_q"),
    )
    nn, k = F.col("nn"), F.col("k")
    sp2 = F.col("ssw_q").cast("double") * 1e3 / (nn - k).cast("double")
    num = (nn - k).cast("double") * F.log(sp2) - F.col("sln_q").cast(
        "double"
    ) / 1e9
    c = F.lit(1.0) + (
        F.col("sinv_q").cast("double") / 1e12
        - F.lit(1.0) / (nn - k).cast("double")
    ) / (F.lit(3.0) * (k - 1).cast("double"))
    return folds.select(
        nn.cast("bigint").alias("n_obs"),
        k.cast("int").alias("n_groups"),
        (k - 1).cast("int").alias("df"),
        fround(num / c, 6).alias("t_bartlett"),
    )


# --- Mood's median test -----------------------------------------------------------

_MOOD_ORACLE = """
    WITH q AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    vals AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY v
    ),
    cum AS (
      SELECT v, CAST(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cc
      FROM vals
    ),
    med AS (
      -- lower median: smallest v whose cumulative count reaches
      -- floor((N+1)/2); exact integer arithmetic on the value census
      SELECT min(v) AS m FROM cum
      WHERE cc >= ((SELECT CAST(sum(c) AS BIGINT) FROM vals) + 1) // 2
    ),
    g AS (
      SELECT q.lang, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE q.v > (SELECT m FROM med))
                  AS BIGINT) AS a
      FROM q GROUP BY q.lang
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(a) AS BIGINT) AS aa,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    chi AS (
      SELECT CAST(sum(CAST(floor(
               (CAST(g.a AS DOUBLE) - e.ea) * (CAST(g.a AS DOUBLE) - e.ea)
               * (1.0 / e.ea + 1.0 / (CAST(g.n AS DOUBLE) - e.ea)) * 1e9)
               AS BIGINT)) AS BIGINT) AS chi_q
      FROM g CROSS JOIN tot t,
           LATERAL (SELECT CAST(g.n AS DOUBLE) * t.aa / t.nn AS ea) e
    )
    SELECT g.lang, g.n, g.a AS n_above,
           floor(CAST(g.n AS DOUBLE) * t.aa / t.nn * 1e6 + 0.5) / 1e6
             AS e_above,
           CAST((SELECT m FROM med) AS BIGINT) AS grand_median,
           floor(c.chi_q / 1e9 * 1e6 + 0.5) / 1e6 AS chi2,
           CAST(t.k - 1 AS INT) AS df
    FROM g CROSS JOIN tot t CROSS JOIN chi c
    ORDER BY g.lang
    """


@query("stats_moods_median", oracle=_MOOD_ORACLE)
def stats_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's (Brown–Mood 1951) k-sample median test over document
    lengths by language: count each group's values ABOVE the grand
    lower median and fold the 2×k above/not-above contingency into
    χ² = Σ(aᵢ−Eᵢ)²·(1/Eᵢ + 1/(nᵢ−Eᵢ)), the coarsest — and most
    outlier-immune — of the k-sample location screens (Kruskal–Wallis
    ranks everything; this only asks "above the median?"). The grand
    median is exact integer census arithmetic (smallest value whose
    cumulative count reaches ⌊(N+1)/2⌋); per-group χ² terms are
    per-term quantized at 1e9 before the k-row fold.

    100 TB: value census (map-side combined) → one bounded cumulative
    window over distinct lengths → one k-group conditional aggregate.
    The median comes from the census, never a global sort.

    Ref cite: none — §2.3 territory."""
    q = table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("bigint").alias("v")
    )
    vals = q.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "v", F.sum("c").over(wc).cast("bigint").alias("cc")
    )
    nn_half = vals.agg(
        ((F.sum("c").cast("bigint") + 1) / 2).cast("bigint").alias("h")
    )
    med = (
        cum.crossJoin(F.broadcast(nn_half))
        .where(F.col("cc") >= F.col("h"))
        .agg(F.min("v").alias("m"))
    )
    g = (
        q.crossJoin(F.broadcast(med))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("v") > F.col("m")).cast("bigint").alias("a"),
            F.any_value("m").alias("m"),
        )
        .localCheckpoint(eager=False)  # totals + chi + output rows
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("a").cast("bigint").alias("aa"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ea = F.col("n").cast("double") * F.col("aa") / F.col("nn")
    term = (
        (F.col("a").cast("double") - ea)
        * (F.col("a").cast("double") - ea)
        * (F.lit(1.0) / ea + F.lit(1.0) / (F.col("n").cast("double") - ea))
    )
    chi = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.floor(term * 1e9).cast("bigint"))
            .cast("bigint")
            .alias("chi_q")
        )
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "lang",
            "n",
            F.col("a").alias("n_above"),
            fround(ea, 6).alias("e_above"),
            F.col("m").cast("bigint").alias("grand_median"),
            fround(F.col("chi_q") / 1e9, 6).alias("chi2"),
            (F.col("k") - 1).cast("int").alias("df"),
        )
        .orderBy("lang")
    )


# --- Kuiper's V and Watson's U^2 uniformity audits --------------------------------

# Shared construction with audit_hash_uniformity_ad (relational55): the
# portable 48-bit md5 hash folded into 1e6 buckets, u = (h + 1/2)/1e6.

_KUIPER_ORACLE = """
    WITH u AS (
      SELECT ((CAST(('0x' || substr(md5('kp|' || CAST(event_id AS VARCHAR)),
                     1, 12)) AS UBIGINT) % 1000000) + 0.5) / 1e6 AS uv
      FROM events
    ),
    census AS (
      SELECT uv, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY uv
    ),
    cum AS (
      SELECT uv, c,
             CAST(coalesce(sum(c) OVER (ORDER BY uv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM census
    ),
    folds AS (
      SELECT max(CAST(b + c AS DOUBLE) / n - uv) AS dp,
             max(uv - CAST(b AS DOUBLE) / n) AS dm,
             any_value(n) AS n
      FROM cum
    )
    SELECT n,
           floor(dp * 1e9 + 0.5) / 1e9 AS d_plus,
           floor(dm * 1e9 + 0.5) / 1e9 AS d_minus,
           floor((dp + dm) * 1e9 + 0.5) / 1e9 AS v_kuiper,
           floor((dp + dm) * (sqrt(CAST(n AS DOUBLE)) + 0.155
                              + 0.24 / sqrt(CAST(n AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS v_star,
           (dp + dm) * (sqrt(CAST(n AS DOUBLE)) + 0.155
                        + 0.24 / sqrt(CAST(n AS DOUBLE))) < 2.001
             AS pass_1pct
    FROM folds
    """


@query("stats_kuiper_uniformity", oracle=_KUIPER_ORACLE)
def stats_kuiper_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's V uniformity test (Kuiper 1960) for the repo's portable
    48-bit md5 hash family: V = D⁺ + D⁻ is invariant under cyclic
    shifts of the unit interval, so unlike KS it weights a bias at the
    WRAP-AROUND (hash values near 0 and 1) exactly like one in the
    middle — the right EDF audit for hashes that feed modular
    bucketing. On the value census a run of c equal values after b
    predecessors attains D⁺ at ecdf (b+c)/n and D⁻ at b/n — maxima
    need no per-row ranks, and max() is reduction-order-free, so no
    quantized fold is even needed. The pass certificate uses Stephens'
    (1970) modified statistic V* = V(√n + 0.155 + 0.24/√n) against the
    1% point 2.001.

    100 TB: hash → 10⁶-bucket census (map-side combined), one bounded
    cumulative window over value cardinality, two max folds. Companion
    to audit_hash_uniformity_ad (tail-weighted) — Kuiper is the
    rotation-invariant member of the audit family.

    Ref cite: none — §2.3 territory."""
    e = table(spark, sf_dir, "events")
    u = e.select(
        (
            (
                (
                    md5_long(
                        F.concat(F.lit("kp|"), F.col("event_id").cast("string"))
                    )
                    % 1000000
                ).cast("double")
                + 0.5
            )
            / 1e6
        ).alias("uv")
    )
    census = u.groupBy("uv").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wlt = Window.orderBy("uv").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("uv").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = census.select(
        "uv",
        "c",
        F.coalesce(F.sum("c").over(wlt), F.lit(0)).cast("bigint").alias("b"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    folds = cum.agg(
        F.max(
            (F.col("b") + F.col("c")).cast("double") / F.col("n") - F.col("uv")
        ).alias("dp"),
        F.max(F.col("uv") - F.col("b").cast("double") / F.col("n")).alias("dm"),
        F.any_value("n").alias("n"),
    )
    v = F.col("dp") + F.col("dm")
    vstar = v * (
        F.sqrt(F.col("n").cast("double"))
        + F.lit(0.155)
        + F.lit(0.24) / F.sqrt(F.col("n").cast("double"))
    )
    return folds.select(
        "n",
        fround(F.col("dp"), 9).alias("d_plus"),
        fround(F.col("dm"), 9).alias("d_minus"),
        fround(v, 9).alias("v_kuiper"),
        fround(vstar, 6).alias("v_star"),
        (vstar < 2.001).alias("pass_1pct"),
    )


_WATSON_ORACLE = """
    WITH u AS (
      SELECT ((CAST(('0x' || substr(md5('wu|' || CAST(event_id AS VARCHAR)),
                     1, 12)) AS UBIGINT) % 1000000) + 0.5) / 1e6 AS uv
      FROM events
    ),
    census AS (
      SELECT uv, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY uv
    ),
    cum AS (
      SELECT uv, c,
             CAST(coalesce(sum(c) OVER (ORDER BY uv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM census
    ),
    terms AS (
      -- closed-form tied-block contribution to W^2 = sum_i (u_(i) -
      -- (2i-1)/(2n))^2: every index sum is evaluated in DOUBLE via the
      -- same expression on both engines (m^3-scale integers would pass
      -- the BIGINT clamp at corpus scale)
      SELECT n,
             CAST(floor((
               CAST(c AS DOUBLE) * uv * uv
               - uv / CAST(n AS DOUBLE)
                 * CAST(c AS DOUBLE) * (2.0 * CAST(b AS DOUBLE)
                                        + CAST(c AS DOUBLE))
               + (4.0 * (  (CAST(b + c AS DOUBLE) * CAST(b + c + 1 AS DOUBLE)
                            * (2.0 * CAST(b + c AS DOUBLE) + 1.0)
                            - CAST(b AS DOUBLE) * CAST(b + 1 AS DOUBLE)
                              * (2.0 * CAST(b AS DOUBLE) + 1.0)) / 6.0)
                  - 4.0 * (CAST(c AS DOUBLE)
                           * (2.0 * CAST(b AS DOUBLE)
                              + CAST(c AS DOUBLE) + 1.0) / 2.0)
                  + CAST(c AS DOUBLE))
                 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             ) * 1e9) AS BIGINT) AS w2t_q,
             CAST(floor(CAST(c AS DOUBLE) * uv * 1e9) AS BIGINT) AS su_q
      FROM cum
    ),
    folds AS (
      SELECT any_value(n) AS n,
             CAST(sum(w2t_q) AS BIGINT) AS w2_q,
             CAST(sum(su_q) AS BIGINT) AS su_q
      FROM terms
    )
    SELECT n,
           floor((CAST(w2_q AS DOUBLE) / 1e9 + 1.0 / (12.0 * n)) * 1e6 + 0.5)
             / 1e6 AS w2_cvm,
           floor(((CAST(w2_q AS DOUBLE) / 1e9 + 1.0 / (12.0 * n))
                  - CAST(n AS DOUBLE)
                    * (CAST(su_q AS DOUBLE) / 1e9 / n - 0.5)
                    * (CAST(su_q AS DOUBLE) / 1e9 / n - 0.5))
                 * 1e6 + 0.5) / 1e6 AS u2_watson,
           ((CAST(w2_q AS DOUBLE) / 1e9 + 1.0 / (12.0 * n))
            - CAST(n AS DOUBLE)
              * (CAST(su_q AS DOUBLE) / 1e9 / n - 0.5)
              * (CAST(su_q AS DOUBLE) / 1e9 / n - 0.5))
             * (1.0 + 0.8 / n) < 0.267 AS pass_1pct
    FROM folds
    """


@query("stats_watson_u2", oracle=_WATSON_ORACLE)
def stats_watson_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watson's U² uniformity test (Watson 1961): the rotation-invariant
    Cramér–von Mises variant, U² = W² − n(ū−½)² — it integrates squared
    EDF deviation (every bucket contributes, unlike Kuiper's two
    extremes) yet stays invariant to cyclic origin shifts. Tied-block
    contributions to W² = Σᵢ(u₍ᵢ₎−(2i−1)/(2n))² fold in closed form
    from the census (Σ(2i−1) and Σ(2i−1)² over an index run are
    arithmetic series); the m³-scale index products are evaluated in
    DOUBLE with the identical expression on both engines (as BIGINT
    they would cross the clamp at corpus scale), and the two
    cross-block folds are per-term quantized at 1e9. Pass certificate:
    Stephens' modified U²(1+0.8/n) against the 1% point 0.267.

    100 TB: same shape as the AD/Kuiper audits — 10⁶-bucket census,
    one bounded cumulative window, one quantized reduction.

    Ref cite: none — §2.3 territory."""
    e = table(spark, sf_dir, "events")
    u = e.select(
        (
            (
                (
                    md5_long(
                        F.concat(F.lit("wu|"), F.col("event_id").cast("string"))
                    )
                    % 1000000
                ).cast("double")
                + 0.5
            )
            / 1e6
        ).alias("uv")
    )
    census = u.groupBy("uv").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wlt = Window.orderBy("uv").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("uv").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = census.select(
        "uv",
        "c",
        F.coalesce(F.sum("c").over(wlt), F.lit(0)).cast("bigint").alias("b"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    cd = F.col("c").cast("double")
    bd = F.col("b").cast("double")
    nd = F.col("n").cast("double")
    s2i = (
        (bd + cd) * (bd + cd + 1) * (2.0 * (bd + cd) + 1.0)
        - bd * (bd + 1) * (2.0 * bd + 1.0)
    ) / 6.0
    s1odd = cd * (2.0 * bd + cd)
    s2odd = 4.0 * s2i - 4.0 * (cd * (2.0 * bd + cd + 1.0) / 2.0) + cd
    w2_term = (
        cd * F.col("uv") * F.col("uv")
        - F.col("uv") / nd * s1odd
        + s2odd / (4.0 * nd * nd)
    )
    terms = cum.select(
        "n",
        F.floor(w2_term * 1e9).cast("bigint").alias("w2t_q"),
        F.floor(cd * F.col("uv") * 1e9).cast("bigint").alias("su_q"),
    )
    folds = terms.agg(
        F.any_value("n").alias("n"),
        F.sum("w2t_q").cast("bigint").alias("w2_q"),
        F.sum("su_q").cast("bigint").alias("su_q"),
    )
    nd = F.col("n").cast("double")
    w2 = F.col("w2_q").cast("double") / 1e9 + F.lit(1.0) / (12.0 * nd)
    ubar = F.col("su_q").cast("double") / 1e9 / nd
    u2 = w2 - nd * (ubar - 0.5) * (ubar - 0.5)
    return folds.select(
        "n",
        fround(w2, 6).alias("w2_cvm"),
        fround(u2, 6).alias("u2_watson"),
        (u2 * (F.lit(1.0) + F.lit(0.8) / nd) < 0.267).alias("pass_1pct"),
    )


# --- generalized ESD (Grubbs) outlier rounds --------------------------------------

_ESD_ROUNDS = 3


def _esd_round_sql(prev: str, this: str, stat: str, step: int) -> str:
    # one ESD round: moments of the remaining days (exact DECIMAL cent
    # sums), integer argmax of |N*x - Sx| (cents x count, exact BIGINT,
    # ties broken by earliest day), R = that deviation / (N * sd)
    return f"""
    {stat} AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxx
      FROM {prev}
    ),
    {this}_pick AS MATERIALIZED (
      SELECT d.day, d.x,
             abs(CAST(s.n AS DECIMAL(38,0)) * d.x - s.sx) AS devn
      FROM {prev} d CROSS JOIN {stat} s
      ORDER BY abs(CAST(s.n AS DECIMAL(38,0)) * d.x - s.sx) DESC, d.day ASC
      LIMIT 1
    ),
    {this} AS MATERIALIZED (
      SELECT d.day, d.x FROM {prev} d
      WHERE d.day <> (SELECT day FROM {this}_pick)
    )"""


_ESD_SELECT = """
      SELECT CAST({step} AS INT) AS step,
             CAST(s.n AS BIGINT) AS n_before,
             CAST(p.day AS VARCHAR) AS removed_day,
             floor(CAST(p.devn AS DOUBLE)
                   / (CAST(s.n AS DOUBLE)
                      * sqrt((CAST(s.sxx AS DOUBLE)
                              - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                                / CAST(s.n AS DOUBLE))
                             / CAST(s.n - 1 AS DOUBLE)))
                   * 1e6 + 0.5) / 1e6 AS r_stat
      FROM it{step}_pick p CROSS JOIN st{step} s
"""

_ESD_ORACLE = (
    """
    WITH d0 AS MATERIALIZED (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY o_orderdate
    ),
    it0 AS MATERIALIZED (SELECT day, x FROM d0),
    """
    + ",".join(
        _esd_round_sql(f"it{i}", f"it{i + 1}", f"st{i + 1}", i + 1)
        for i in range(_ESD_ROUNDS)
    )
    + "\n    "
    + "\n    UNION ALL\n    ".join(
        _ESD_SELECT.format(step=i + 1) for i in range(_ESD_ROUNDS)
    )
    + "\n    ORDER BY step"
)


@query("stats_esd_outlier_rounds", oracle=_ESD_ORACLE)
def stats_esd_outlier_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized extreme studentized deviate rounds (Rosner 1983; the
    iterated Grubbs 1950 statistic) over daily revenue totals: three
    rounds of Rᵢ = max|x−x̄|/s with the extreme day REMOVED between
    rounds, so masked outliers (a second spike hiding behind the
    first) surface — the screen plain Grubbs fails. Exactness: daily
    totals are integer cents; the argmax compares |N·x − Σx| in exact
    integer arithmetic (cents × day-count, far from the clamp) with
    ties broken by earliest day, and only the final R divides through
    the double sd. Rounds are UNROLLED in one lazy plan (no
    convergence actions); the oracle mirrors them as MATERIALIZED
    CTEs.

    100 TB: the day census is calendar-bounded at any corpus size;
    each round is census-row arithmetic + a 1-row broadcast join.

    Ref cite: none — §2.3 territory."""
    o = table(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
        .localCheckpoint(eager=False)  # 3 rounds walk this census
    )
    rows = []
    cur = d
    for step in range(1, _ESD_ROUNDS + 1):
        st = cur.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
                "sxx"
            ),
        )
        devn = F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("sx")
        )
        pick = (
            cur.crossJoin(F.broadcast(st))
            .withColumn("devn", devn)
            .orderBy(F.desc("devn"), F.asc("day"))
            .limit(1)
            .localCheckpoint(eager=False)  # removed from next round + output
        )
        sd = F.sqrt(
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")
                / F.col("n").cast("double")
            )
            / (F.col("n") - 1).cast("double")
        )
        rows.append(
            pick.select(
                F.lit(step).cast("int").alias("step"),
                F.col("n").cast("bigint").alias("n_before"),
                F.col("day").cast("string").alias("removed_day"),
                fround(
                    F.col("devn").cast("double")
                    / (F.col("n").cast("double") * sd),
                    6,
                ).alias("r_stat"),
            )
        )
        cur = (
            cur.join(
                pick.select(F.col("day").alias("rm_day")),
                cur["day"] == F.col("rm_day"),
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("step")


# --- Kendall's W concordance -----------------------------------------------------

_KW_ORACLE = """
    WITH base AS (
      SELECT n.n_name,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    scored AS (
      SELECT n_name, rev AS m1, cnt AS m2,
             CAST(rev AS DOUBLE) / cnt AS m3
      FROM base
    ),
    r1 AS (
      SELECT n_name,
             rank() OVER (ORDER BY m1)
               + (count(*) OVER (PARTITION BY m1) - 1) / 2.0 AS rk
      FROM scored
    ),
    r2 AS (
      SELECT n_name,
             rank() OVER (ORDER BY m2)
               + (count(*) OVER (PARTITION BY m2) - 1) / 2.0 AS rk
      FROM scored
    ),
    r3 AS (
      SELECT n_name,
             rank() OVER (ORDER BY m3)
               + (count(*) OVER (PARTITION BY m3) - 1) / 2.0 AS rk
      FROM scored
    ),
    allr AS (
      SELECT rk FROM r1 UNION ALL SELECT rk FROM r2
      UNION ALL SELECT rk FROM r3
    ),
    ties AS (
      SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tt
      FROM (
        SELECT CAST(count(*) AS BIGINT) AS t FROM r1 GROUP BY rk
        UNION ALL
        SELECT CAST(count(*) AS BIGINT) AS t FROM r2 GROUP BY rk
        UNION ALL
        SELECT CAST(count(*) AS BIGINT) AS t FROM r3 GROUP BY rk
      ) WHERE t > 1
    ),
    sums AS (
      SELECT s.n_name, r1.rk + r2.rk + r3.rk AS rsum
      FROM scored s
      JOIN r1 USING (n_name) JOIN r2 USING (n_name) JOIN r3 USING (n_name)
    ),
    devs AS (
      SELECT rsum, CAST(count(*) OVER () AS BIGINT) AS n FROM sums
    ),
    folds AS (
      SELECT CAST(any_value(n) AS BIGINT) AS n,
             CAST(sum(CAST(floor((rsum - 3.0 * (n + 1) / 2.0)
                    * (rsum - 3.0 * (n + 1) / 2.0) * 1e6)
                    AS BIGINT)) AS BIGINT) AS s_q
      FROM devs
    )
    SELECT CAST(f.n AS BIGINT) AS n_items, CAST(3 AS INT) AS m_raters,
           floor(CAST(f.s_q AS DOUBLE) / 1e6
                 / (9.0 * (CAST(f.n AS DOUBLE) * f.n * f.n - f.n) / 12.0
                    - 3.0 * CAST(t.tt AS DOUBLE) / 12.0)
                 * 1e6 + 0.5) / 1e6 AS w_kendall,
           floor(3.0 * (CAST(f.n AS DOUBLE) - 1)
                 * (CAST(f.s_q AS DOUBLE) / 1e6
                    / (9.0 * (CAST(f.n AS DOUBLE) * f.n * f.n - f.n) / 12.0
                       - 3.0 * CAST(t.tt AS DOUBLE) / 12.0))
                 * 1e6 + 0.5) / 1e6 AS chi2
    FROM folds f CROSS JOIN ties t
    """


@query("eval_kendalls_w", oracle=_KW_ORACLE)
def eval_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith 1939, tie-corrected) among three deterministic "raters"
    ranking the 25 nations — total revenue, order count, and average
    order value — the agreement screen an eval pipeline runs before
    trusting that its judges rank systems consistently (the m-rater
    generalization of stats_kendall_tau; eval_krippendorff_alpha is
    the value-level sibling). Midranks handle ties (rank() + (t−1)/2);
    W = S / (m²(n³−n)/12 − mΣT/12) with ΣT = Σ(t³−t) per rater, and
    χ² = m(n−1)W. The S fold is per-term quantized at 1e6.

    100 TB: one nation-grade aggregate (25 rows), three bounded
    windows over it, k-row arithmetic after.

    Ref cite: none — §2.3 territory."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("m1"),
            F.count(F.lit(1)).cast("bigint").alias("m2"),
        )
        .withColumn("m3", F.col("m1").cast("double") / F.col("m2"))
        .localCheckpoint(eager=False)  # three rank windows ride it
    )

    def midrank(col: str, out: str):
        # midrank via the VALUE CENSUS (blt + (t+1)/2 = mean of the tied
        # positions): the cumulative window rides the census aggregate
        # directly, so the audit SEES the bounding HashAggregate (a
        # window straight over the checkpointed base would not — the
        # checkpoint-scan-hides-aggregate trap, SCALE.md)
        cen = base.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        wlt = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        cum = cen.select(
            col,
            "t",
            F.coalesce(F.sum("t").over(wlt), F.lit(0)).alias("blt"),
        )
        return base.select("n_name", col).join(F.broadcast(cum), col).select(
            "n_name",
            (F.col("blt") + (F.col("t") + 1) / F.lit(2.0)).alias(out),
        )

    r1, r2, r3 = midrank("m1", "rk1"), midrank("m2", "rk2"), midrank("m3", "rk3")
    sums = (
        r1.join(r2, "n_name").join(r3, "n_name")
        .select(
            "n_name",
            (F.col("rk1") + F.col("rk2") + F.col("rk3")).alias("rsum"),
        )
        .localCheckpoint(eager=False)  # count + dev fold ride it
    )
    ncnt = sums.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dev = F.col("rsum") - 3.0 * (F.col("n") + 1) / F.lit(2.0)
    folds = (
        sums.crossJoin(F.broadcast(ncnt))
        .select("n", F.floor(dev * dev * 1e6).cast("bigint").alias("sq"))
        .agg(
            F.any_value("n").cast("bigint").alias("n"),
            F.sum("sq").cast("bigint").alias("s_q"),
        )
    )
    # per-rater tie census: identical rank values within one rater's
    # ranking are ties; across raters they are not — census per source
    t1 = r1.groupBy("rk1").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    t2 = r2.groupBy("rk2").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    t3 = r3.groupBy("rk3").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    ties = (
        t1.select("t").unionAll(t2.select("t")).unionAll(t3.select("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tt")
        )
    )
    nd = F.col("n").cast("double")
    denom = (
        F.lit(9.0) * (nd * nd * nd - nd) / 12.0
        - F.lit(3.0) * F.col("tt").cast("double") / 12.0
    )
    w = F.col("s_q").cast("double") / 1e6 / denom
    return (
        folds.crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("bigint").alias("n_items"),
            F.lit(3).cast("int").alias("m_raters"),
            fround(w, 6).alias("w_kendall"),
            fround(F.lit(3.0) * (nd - 1) * w, 6).alias("chi2"),
        )
    )
