"""Round 11 batch 3: Conover squared-ranks scale test, Pettitt
change-point test, consonant-skeleton ER blocking — DuckDB-oracle
-checked, census/integer-exact.

Reference parity note: /root/reference has none of these; §2.3
territory. Methods are public: Conover & Iman 1981 / Conover 1999
(squared-ranks test for equal variances — the rank-based member of the
scale family, needing no normal quantiles), Pettitt 1979 (the
Mann–Whitney-based change-point test with its published exponential
p-approximation), and the classic consonant-skeleton blocking key of
entity-resolution practice (Odell & Russell's Soundex lineage, reduced
to the engine-portable strip-vowels + squeeze-repeats form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Conover squared-ranks test ----------------------------------------------------

_CONOVER_ORACLE = """
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
    devs AS (
      -- |x - mean_g| quantized to integer cents: identical double
      -- expression on both engines, then EXACT integer ranking
      SELECT q.grp,
             CAST(floor(abs(CAST(q.x AS DOUBLE)
                            - CAST(m.sx AS DOUBLE) / m.n)) AS BIGINT) AS d
      FROM q JOIN means m USING (grp)
    ),
    vals AS (
      SELECT d, CAST(count(*) AS BIGINT) AS c FROM devs GROUP BY d
    ),
    cum AS (
      SELECT d, c,
             CAST(coalesce(sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b
      FROM vals
    ),
    nn1 AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM vals),
    ranked AS (
      -- doubled midrank r2 = 2b + c + 1, then NORMALIZED squared rank
      -- rho^2 = (r2/(2N))^2 in (0,1]: T is scale-invariant, so the
      -- normalized units keep every fold bounded at ANY corpus size
      -- (raw S_g^2/n_g crosses the BIGINT clamp at sf0.1 already).
      -- rho^2 / rho^4 quantize per ROW at 1e12 before the integer sums.
      SELECT v.grp,
             CAST(floor((CAST(u.b * 2 + u.c + 1 AS DOUBLE) / (2.0 * t.nn))
                        * (CAST(u.b * 2 + u.c + 1 AS DOUBLE) / (2.0 * t.nn))
                        * 1e12) AS BIGINT) AS p2q,
             CAST(floor((CAST(u.b * 2 + u.c + 1 AS DOUBLE) / (2.0 * t.nn))
                        * (CAST(u.b * 2 + u.c + 1 AS DOUBLE) / (2.0 * t.nn))
                        * (CAST(u.b * 2 + u.c + 1 AS DOUBLE) / (2.0 * t.nn))
                        * (CAST(u.b * 2 + u.c + 1 AS DOUBLE) / (2.0 * t.nn))
                        * 1e12) AS BIGINT) AS p4q
      FROM (SELECT grp, d FROM devs) v
      JOIN cum u USING (d) CROSS JOIN nn1 t
    ),
    folds AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p2q) AS BIGINT) AS s2,
             CAST(sum(p4q) AS BIGINT) AS s4
      FROM ranked GROUP BY grp
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(s2) AS BIGINT) AS st2,
             CAST(sum(s4) AS BIGINT) AS st4
      FROM folds
    ),
    terms AS (
      -- per-group (S'_g)^2/n_g in normalized units ~ n_g/9: quantize
      -- per term at 1e9 before the k-row fold
      SELECT CAST(sum(CAST(floor(
               (CAST(s2 AS DOUBLE) / 1e12) * (CAST(s2 AS DOUBLE) / 1e12)
               / CAST(f.n AS DOUBLE) * 1e9) AS BIGINT)) AS BIGINT) AS tq
      FROM folds f
    )
    SELECT t.nn AS n_obs, CAST(t.k AS INT) AS n_groups,
           CAST(t.k - 1 AS INT) AS df,
           floor(((CAST(m.tq AS DOUBLE) / 1e9
                   - CAST(t.nn AS DOUBLE)
                     * (CAST(t.st2 AS DOUBLE) / 1e12 / t.nn)
                     * (CAST(t.st2 AS DOUBLE) / 1e12 / t.nn))
                  / ((CAST(t.st4 AS DOUBLE) / 1e12
                      - CAST(t.nn AS DOUBLE)
                        * (CAST(t.st2 AS DOUBLE) / 1e12 / t.nn)
                        * (CAST(t.st2 AS DOUBLE) / 1e12 / t.nn))
                     / (CAST(t.nn AS DOUBLE) - 1)))
                 * 1e6 + 0.5) / 1e6 AS t_conover
    FROM tot t CROSS JOIN terms m
    """


@query("stats_conover_squared_ranks", oracle=_CONOVER_ORACLE)
def stats_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover's squared-ranks test (Conover & Iman 1981) of equal
    variances across the 5 order priorities — the RANK-BASED member of
    the scale family (stats_bartlett_test is normal-theory,
    stats_levene_bf robust-mean-based): |x−x̄_g| ranks across all
    groups, T = [Σ S_g²/n_g − N·S̄²] / D² with S̄ = mean squared rank
    and D² the squared-rank variance; T ~ χ²_{k−1}. Needing only ranks
    — never a normal quantile — it is the member that survives engines
    without Φ⁻¹. Deviations quantize to integer cents via the identical
    double expression on both engines; ranks are exact doubled
    midranks on the deviation census, then NORMALIZED (ρ = r2/2N) — T
    is scale-invariant, and normalized units keep every fold bounded at
    any corpus size (the raw S_g²/n_g form crosses the BIGINT clamp at
    sf0.1 already); ρ²/ρ⁴ quantize per row at 1e12.

    100 TB: one 5-group moment pass, one deviation census + bounded
    cumulative window, one grouped integer fold.

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
    dev = F.floor(
        F.abs(
            F.col("x").cast("double")
            - F.col("sx").cast("double") / F.col("n")
        )
    ).cast("bigint")
    devs = (
        q.join(F.broadcast(means), "grp")
        .select("grp", dev.alias("d"))
        .localCheckpoint(eager=False)  # census + rank join ride it
    )
    vals = devs.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wlt = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "d",
        "c",
        F.coalesce(F.sum("c").over(wlt), F.lit(0)).cast("bigint").alias("b"),
    )
    nn1 = vals.agg(F.sum("c").cast("bigint").alias("nnt"))
    rho = (F.col("b") * 2 + F.col("c") + 1).cast("double") / (
        2.0 * F.col("nnt")
    )
    ranked = (
        devs.join(cum, "d")
        .crossJoin(F.broadcast(nn1))
        .select(
            "grp",
            F.floor(rho * rho * 1e12).cast("bigint").alias("p2q"),
            F.floor(rho * rho * rho * rho * 1e12).cast("bigint").alias("p4q"),
        )
    )
    folds = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p2q").cast("bigint").alias("s2"),
        F.sum("p4q").cast("bigint").alias("s4"),
    ).localCheckpoint(eager=False)  # totals + per-group terms
    tot = folds.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s2").cast("bigint").alias("st2"),
        F.sum("s4").cast("bigint").alias("st4"),
    )
    term = (
        (F.col("s2").cast("double") / 1e12)
        * (F.col("s2").cast("double") / 1e12)
        / F.col("n").cast("double")
        * 1e9
    )
    terms = folds.agg(
        F.sum(F.floor(term).cast("bigint")).cast("bigint").alias("tq")
    )
    nn = F.col("nn").cast("double")
    sbar = F.col("st2").cast("double") / 1e12 / F.col("nn")
    num = F.col("tq").cast("double") / 1e9 - nn * sbar * sbar
    d2 = (F.col("st4").cast("double") / 1e12 - nn * sbar * sbar) / (nn - 1)
    return (
        tot.crossJoin(F.broadcast(terms))
        .select(
            F.col("nn").alias("n_obs"),
            F.col("k").cast("int").alias("n_groups"),
            (F.col("k") - 1).cast("int").alias("df"),
            fround(num / d2, 6).alias("t_conover"),
        )
    )


# --- Pettitt change-point test -----------------------------------------------------

_PETTITT_ORACLE = """
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM orders GROUP BY o_orderdate
    ),
    vals AS (
      SELECT x, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY x
    ),
    cum AS (
      SELECT x, c,
             CAST(coalesce(sum(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b
      FROM vals
    ),
    ranked AS (
      SELECT d.day, u.b * 2 + u.c + 1 AS r2
      FROM d JOIN cum u USING (x)
    ),
    pre AS (
      SELECT day,
             CAST(sum(r2) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS w2,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM ranked
    ),
    u AS (
      -- U_t = 2*W_t - t(N+1) with W_t in doubled-rank halves:
      -- w2 = sum of doubled midranks so U_t = w2 - t*(n+1), all integer
      SELECT day, w2 - t * (n + 1) AS ut, t, n FROM pre WHERE t < n
    ),
    best AS (
      SELECT day, abs(ut) AS k_stat, ut, n FROM u
      ORDER BY abs(ut) DESC, day ASC LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(k_stat AS BIGINT) AS k_stat,
           CAST(day AS VARCHAR) AS change_day,
           ut > 0 AS shift_down,
           floor(2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE) * k_stat
                           / (CAST(n AS DOUBLE) * n * n
                              + CAST(n AS DOUBLE) * n))
                 * 1e9 + 0.5) / 1e9 AS p_approx,
           2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE) * k_stat
                     / (CAST(n AS DOUBLE) * n * n
                        + CAST(n AS DOUBLE) * n)) < 0.01 AS significant
    FROM best
    """


@query("stats_pettitt_changepoint", oracle=_PETTITT_ORACLE)
def stats_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's change-point test (Pettitt 1979): the nonparametric
    single-change-point locator — U_t = 2W_t − t(N+1) over the rank
    prefix sums of daily revenue, K = max|U_t| with the earliest argmax
    day, and the published approximation p ≈ 2exp(−6K²/(N³+N²)). The
    events_cusum_changepoint operator assumes a known reference mean;
    Pettitt is the distribution-free complement (it is Mann–Whitney
    between the prefix and suffix at every split). Doubled midranks
    keep every statistic integer until the final p; the argmax ties
    break to the earliest day on both engines.

    100 TB: day census (calendar-bounded), one value-census rank join,
    one bounded prefix window, a 1-row argmax.

    Ref cite: none — §2.3 territory."""
    o = table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    ).localCheckpoint(eager=False)  # value census + rank join (one scan)
    vals = d.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wlt = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "x",
        "c",
        F.coalesce(F.sum("c").over(wlt), F.lit(0)).cast("bigint").alias("b"),
    )
    ranked = d.join(cum, "x").select(
        "day", (F.col("b") * 2 + F.col("c") + 1).alias("r2")
    )
    wday = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = ranked.select(
        "day",
        F.sum("r2").over(wday).cast("bigint").alias("w2"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    u = pre.where(F.col("t") < F.col("n")).select(
        "day",
        (F.col("w2") - F.col("t") * (F.col("n") + 1)).alias("ut"),
        "n",
    )
    best = u.orderBy(F.abs(F.col("ut")).desc(), F.col("day").asc()).limit(1)
    nd = F.col("n").cast("double")
    k = F.abs(F.col("ut")).cast("double")
    p = 2.0 * F.exp(-6.0 * k * k / (nd * nd * nd + nd * nd))
    return best.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.abs(F.col("ut")).cast("bigint").alias("k_stat"),
        F.col("day").cast("string").alias("change_day"),
        (F.col("ut") > 0).alias("shift_down"),
        fround(p, 9).alias("p_approx"),
        (p < 0.01).alias("significant"),
    )


# --- consonant-skeleton ER blocking -------------------------------------------------

_SKEL_ORACLE = r"""
    WITH nm AS (
      SELECT DISTINCT p_name FROM part
    ),
    keyed AS (
      -- consonant skeleton: lowercase, drop spaces and vowels, squeeze
      -- repeated characters; leading character always kept
      SELECT p_name,
             substr(lower(p_name), 1, 1) ||
               regexp_replace(
                 regexp_replace(substr(lower(p_name), 2), '[aeiou ]', '', 'g'),
                 '(.)\1+', '\1', 'g') AS skel
      FROM nm
    ),
    blocks AS (
      SELECT skel, CAST(count(*) AS BIGINT) AS sz FROM keyed GROUP BY skel
    ),
    cand AS (
      SELECT a.p_name AS src, b.p_name AS dst
      FROM keyed a JOIN keyed b
        ON a.skel = b.skel AND a.p_name < b.p_name
    ),
    ver AS (
      SELECT count(*) FILTER (WHERE levenshtein(src, dst) <= 2) AS hits,
             count(*) AS pairs
      FROM cand
    )
    SELECT CAST((SELECT count(*) FROM nm) AS BIGINT) AS n_names,
           CAST((SELECT count(*) FROM blocks) AS BIGINT) AS n_blocks,
           CAST((SELECT max(sz) FROM blocks) AS BIGINT) AS max_block,
           CAST(v.pairs AS BIGINT) AS candidate_pairs,
           CAST(v.hits AS BIGINT) AS verified_pairs,
           floor(CAST(v.hits AS DOUBLE)
                 / greatest(CAST(v.pairs AS DOUBLE), 1.0) * 1e6 + 0.5) / 1e6
             AS precision_q
    FROM ver v
    """


@query("er_consonant_skeleton_blocking", oracle=_SKEL_ORACLE)
def er_consonant_skeleton_blocking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Consonant-skeleton blocking for entity resolution: key each part
    name by leading character + vowel-stripped, repeat-squeezed
    consonant skeleton (the engine-portable reduction of the
    Soundex/phonetic-key lineage — no phonetic code tables, identical
    regex semantics on both engines), generate candidate pairs INSIDE
    blocks only, and verify with levenshtein ≤ 2. The output is the
    blocking-quality profile an ER pipeline reads before committing to
    a key: block count, largest block (the skew/cost driver),
    candidate volume, verified matches, precision. Complements
    er_blocked_name_match (token blocking) and
    er_fuzzy_levenshtein_join: skeleton keys survive vowel-level typos
    that token-equality blocking misses. Backreference syntax differs
    between engines (Spark ``$1`` vs DuckDB ``\\1``) — semantics
    certified identical by the hash.

    100 TB: the skeleton is a scan-stage expression; the join is
    block-keyed (never all-pairs) and the quadratic term is bounded by
    max_block — which this operator itself reports, making it
    self-auditing.

    Ref cite: none — §2.3 ER territory."""
    nm = table(spark, sf_dir, "part").select("p_name").distinct()
    skel = F.concat(
        F.substring(F.lower(F.col("p_name")), 1, 1),
        F.regexp_replace(
            F.regexp_replace(
                F.expr("substr(lower(p_name), 2)"), "[aeiou ]", ""
            ),
            r"(.)\1+",
            "$1",
        ),
    )
    keyed = nm.select("p_name", skel.alias("skel")).localCheckpoint(
        eager=False
    )  # blocks + both candidate sides
    blocks = keyed.groupBy("skel").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    bstats = blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.max("sz").cast("bigint").alias("max_block"),
    )
    nstats = keyed.agg(F.count(F.lit(1)).cast("bigint").alias("n_names"))
    a = keyed.select(F.col("p_name").alias("src"), "skel")
    b = keyed.select(F.col("p_name").alias("dst"), "skel")
    cand = a.join(b, "skel").where(F.col("src") < F.col("dst"))
    ver = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("pairs"),
        F.count_if(F.levenshtein("src", "dst") <= 2)
        .cast("bigint")
        .alias("hits"),
    )
    return (
        nstats.crossJoin(F.broadcast(bstats))
        .crossJoin(F.broadcast(ver))
        .select(
            "n_names",
            "n_blocks",
            "max_block",
            F.col("pairs").alias("candidate_pairs"),
            F.col("hits").alias("verified_pairs"),
            fround(
                F.col("hits").cast("double")
                / F.greatest(F.col("pairs").cast("double"), F.lit(1.0)),
                6,
            ).alias("precision_q"),
        )
    )
