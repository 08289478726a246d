"""Round 10 batch: Dunn's post-hoc test, Hurst R/S exponent,
Ansari–Bradley scale test, and pairwise Jensen–Shannon divergence —
DuckDB-oracle-checked, census-exact.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these; §2.3 north-star territory. Methods
are public: Dunn 1964 (KW post-hoc, tie-corrected), Hurst 1951 /
Mandelbrot & Wallis 1969 (R/S), Ansari & Bradley 1960 (scores per
Hollander & Wolfe), Lin 1991 (JS divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# --- Dunn's post-hoc after Kruskal-Wallis -----------------------------------------

_DUNN_ORACLE = """
    WITH census AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, n_chars
    ),
    vals AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS t FROM census GROUP BY v
    ),
    cumv AS (
      SELECT v, t,
             CAST(coalesce(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS blt
      FROM vals
    ),
    ranked AS (
      SELECT c.lang, c.c, 2 * u.blt + u.t + 1 AS r2
      FROM census c JOIN cumv u USING (v)
    ),
    groups AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS ni,
             CAST(sum(c * r2) AS BIGINT) AS rsum2
      FROM ranked GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(t) AS BIGINT) AS nn,
             CAST(sum(t * t * t - t) AS BIGINT) AS cf
      FROM vals
    ),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             a.rsum2 / 2.0 / a.ni - b.rsum2 / 2.0 / b.ni AS rdiff,
             a.ni AS na, b.ni AS nb, t.nn, t.cf
      FROM groups a JOIN groups b ON a.lang < b.lang
      CROSS JOIN tot t
    )
    SELECT lang_a, lang_b,
           floor(rdiff / sqrt((CAST(nn AS DOUBLE) * (nn + 1) / 12.0
                               - CAST(cf AS DOUBLE) / (12.0 * (nn - 1)))
                              * (1.0 / na + 1.0 / nb)) * 1e6 + 0.5) / 1e6
             AS z_dunn,
           abs(rdiff / sqrt((CAST(nn AS DOUBLE) * (nn + 1) / 12.0
                             - CAST(cf AS DOUBLE) / (12.0 * (nn - 1)))
                            * (1.0 / na + 1.0 / nb))) > 2.807 AS significant
    FROM pairs ORDER BY lang_a, lang_b
    """


@query("stats_dunn_posthoc", oracle=_DUNN_ORACLE)
def stats_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test (Dunn 1964) — WHICH language pairs differ,
    after stats_kruskal_wallis says SOME do: zᵢⱼ = (R̄ᵢ−R̄ⱼ) /
    √((N(N+1)/12 − ΣT/(12(N−1)))·(1/nᵢ+1/nⱼ)) with the tie correction
    ΣT = Σ(t³−t), midranks held exact at DOUBLED scale on the value
    census (2R = 2·below + ties + 1). The `significant` certificate
    applies the Bonferroni 0.05/10 two-sided cut (|z| > 2.807) for the
    C(5,2) pairs — the published multiple-comparison discipline.

    100 TB: the same value-census fold as Kruskal–Wallis, then a 5-row
    group frame self-paired (10 rows) with a 1-row broadcast of (N, ΣT).
    No per-document rank ever materializes."""
    census = table(spark, sf_dir, "documents").groupBy(
        "lang", F.col("n_chars").cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).localCheckpoint(
        eager=False
    )  # consumers: value totals + group ranking
    vals = census.groupBy("v").agg(F.sum("c").cast("bigint").alias("t"))
    wlt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cumv = vals.select(
        "v",
        "t",
        F.coalesce(F.sum("t").over(wlt), F.lit(0)).cast("bigint").alias("blt"),
    )
    ranked = census.join(cumv, "v").select(
        "lang", "c", (2 * F.col("blt") + F.col("t") + 1).alias("r2")
    )
    groups = ranked.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("ni"),
        F.sum(F.col("c") * F.col("r2")).cast("bigint").alias("rsum2"),
    )
    tot = vals.agg(
        F.sum("t").cast("bigint").alias("nn"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("cf"),
    )
    # the 5-row group frame folds into ONE array row; pairs expand
    # array-locally (the alpha/Fleiss trick) — no self-join, no BNLJ
    gagg = groups.agg(
        F.sort_array(
            F.collect_list(F.struct("lang", "ni", "rsum2"))
        ).alias("gs")
    )
    pairs = (
        gagg.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(gs, a -> transform(gs, b -> "
                    "IF(a.lang < b.lang, struct(a.lang AS lang_a,"
                    " b.lang AS lang_b, a.ni AS na, b.ni AS nb,"
                    " a.rsum2 AS rsum2a, b.rsum2 AS rsum2b), null)))),"
                    " x -> x IS NOT NULL)"
                )
            ).alias("p")
        )
        .select("p.*")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang_a",
            "lang_b",
            (
                F.col("rsum2a").cast("double") / 2.0 / F.col("na")
                - F.col("rsum2b").cast("double") / 2.0 / F.col("nb")
            ).alias("rdiff"),
            "na",
            "nb",
            "nn",
            "cf",
        )
    )
    denom = F.sqrt(
        (
            F.col("nn").cast("double") * (F.col("nn") + 1) / 12.0
            - F.col("cf").cast("double") / (12.0 * (F.col("nn") - 1))
        )
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    z = F.col("rdiff") / denom
    return pairs.select(
        "lang_a",
        "lang_b",
        fround(z, 6).alias("z_dunn"),
        (F.abs(z) > 2.807).alias("significant"),
    ).orderBy("lang_a", "lang_b")


# --- Hurst exponent via R/S analysis ------------------------------------------------

_HURST_ORACLE = """
    WITH daily AS (
      SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
               AS x,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate
    ),
    idx AS (
      SELECT y, row_number() OVER (ORDER BY x) - 1 AS i FROM daily
    ),
    sizes AS (SELECT unnest([8, 16, 32, 64]) AS s),
    blocks AS (
      SELECT s.s, i.i // s.s AS blk, i.i % s.s AS pos, i.y
      FROM idx i CROSS JOIN sizes s
    ),
    bstats AS (
      SELECT s, blk, y, pos,
             CAST(count(*) OVER w AS BIGINT) AS cnt,
             CAST(sum(y) OVER w AS BIGINT) AS ysum,
             sum(CAST(y AS HUGEINT) * y) OVER w AS ysq
      FROM blocks
      WINDOW w AS (PARTITION BY s, blk)
    ),
    cdev AS (
      SELECT s, blk, cnt, ysum, ysq,
             sum(y - CAST(ysum AS DOUBLE) / cnt)
               OVER (PARTITION BY s, blk ORDER BY pos) AS cd
      FROM bstats
    ),
    rs AS (
      SELECT s, blk, max(cnt) AS cnt,
             max(cd) - min(cd) AS r,
             sqrt(CAST(max(ysq) AS DOUBLE) / max(cnt)
                  - (CAST(max(ysum) AS DOUBLE) / max(cnt))
                    * (CAST(max(ysum) AS DOUBLE) / max(cnt))) AS sd
      FROM cdev GROUP BY s, blk
    ),
    perblock AS (
      SELECT s,
             CAST(floor(ln(r / sd) * 1e9 + 0.5) AS BIGINT) AS lq
      FROM rs WHERE cnt = s AND sd > 0 AND r > 0
    ),
    persize AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(lq) AS BIGINT) AS lsum
      FROM perblock GROUP BY s
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             sum(ln(CAST(s AS DOUBLE))) AS sx,
             sum(ln(CAST(s AS DOUBLE)) * ln(CAST(s AS DOUBLE))) AS sxx,
             sum(CAST(lsum AS DOUBLE) / 1e9 / n_blocks) AS sy,
             sum(ln(CAST(s AS DOUBLE))
                 * (CAST(lsum AS DOUBLE) / 1e9 / n_blocks)) AS sxy
      FROM persize
    )
    SELECT p.s, p.n_blocks,
           floor(CAST(p.lsum AS DOUBLE) / 1e9 / p.n_blocks * 1e9 + 0.5) / 1e9
             AS mean_ln_rs,
           floor((f.k * f.sxy - f.sx * f.sy)
                 / (f.k * f.sxx - f.sx * f.sx) * 1e6 + 0.5) / 1e6 AS h_est
    FROM persize p CROSS JOIN fit f
    ORDER BY p.s
    """


@query("timeseries_hurst_rs", oracle=_HURST_ORACLE)
def timeseries_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969) of the daily-revenue series: complete
    blocks of s ∈ {8,16,32,64} days each yield R/S (range of the
    mean-adjusted cumulative deviations over the population std);
    H = slope of mean ln(R/S) on ln(s) — 0.5 is a memoryless walk,
    above it persistence. Per-block ln(R/S) quantizes to 1e-9 integers
    before the per-size mean; the 4-point OLS slope uses exact ln(s)
    literals. Degenerate blocks (flat: S = 0 or R = 0) are excluded on
    both engines.

    100 TB: the series is the calendar-bounded daily census; block
    stats are (size, block)-partitioned window frames over it, the
    cumulative-deviation pass one more frame on the same exchange. The
    ladder multiplies the DAY census 4×, never the corpus."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(cents).cast("bigint").alias("y"))
    )
    widx = Window.orderBy("day")
    idx = daily.select(
        "y", (F.row_number().over(widx) - 1).cast("bigint").alias("i")
    )
    sizes = F.explode(F.array(*[F.lit(s) for s in (8, 16, 32, 64)])).alias("s")
    blocks = idx.select("y", "i", sizes).select(
        "s",
        F.expr("i div s").alias("blk"),
        (F.col("i") % F.col("s")).alias("pos"),
        "y",
    )
    dec = "decimal(38,0)"
    wb = Window.partitionBy("s", "blk")
    bstats = blocks.select(
        "s",
        "blk",
        "y",
        "pos",
        F.count(F.lit(1)).over(wb).cast("bigint").alias("cnt"),
        F.sum("y").over(wb).cast("bigint").alias("ysum"),
        F.sum((F.col("y").cast(dec) * F.col("y"))).over(wb).alias("ysq"),
    )
    wc = Window.partitionBy("s", "blk").orderBy("pos")
    cdev = bstats.select(
        "s",
        "blk",
        "cnt",
        "ysum",
        "ysq",
        F.sum(
            F.col("y") - F.col("ysum").cast("double") / F.col("cnt")
        ).over(wc).alias("cd"),
    )
    mean_ = F.max("ysum").cast("double") / F.max("cnt")
    rs = cdev.groupBy("s", "blk").agg(
        F.max("cnt").alias("cnt"),
        (F.max("cd") - F.min("cd")).alias("r"),
        F.sqrt(
            F.max("ysq").cast("double") / F.max("cnt") - mean_ * mean_
        ).alias("sd"),
    )
    perblock = rs.where(
        (F.col("cnt") == F.col("s")) & (F.col("sd") > 0) & (F.col("r") > 0)
    ).select(
        "s",
        F.floor(F.log(F.col("r") / F.col("sd")) * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("lq"),
    )
    persize = perblock.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("lq").cast("bigint").alias("lsum"),
    ).localCheckpoint(eager=False)  # consumers: fit + output rows
    lns = F.log(F.col("s").cast("double"))
    my = F.col("lsum").cast("double") / 1e9 / F.col("n_blocks")
    fit = persize.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(lns).alias("sx"),
        F.sum(lns * lns).alias("sxx"),
        F.sum(my).alias("sy"),
        F.sum(lns * my).alias("sxy"),
    )
    slope = (
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        persize.crossJoin(F.broadcast(fit))
        .select(
            "s",
            "n_blocks",
            fround(F.col("lsum").cast("double") / 1e9 / F.col("n_blocks"), 9)
            .alias("mean_ln_rs"),
            fround(slope, 6).alias("h_est"),
        )
        .orderBy("s")
    )


# --- Ansari–Bradley scale test --------------------------------------------------------

_AB_ORACLE = """
    WITH s AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             CAST(count_if(event_type = 'click') AS BIGINT) AS a,
             CAST(count_if(event_type = 'view') AS BIGINT) AS b
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')
      GROUP BY 1
    ),
    cum AS (
      SELECT v, a, b,
             CAST(coalesce(sum(a + b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bb,
             CAST(sum(a) OVER () AS BIGINT) AS n1,
             CAST(sum(b) OVER () AS BIGINT) AS n2
      FROM s
    ),
    -- S(m) = sum_{i=1..m} min(i, N+1-i), half = (N+1)//2:
    -- m <= half: m(m+1)/2; else S(half) + (m-half)(N+1) - (sum i)
    scored AS (
      SELECT a, b, n1, n2, n1 + n2 AS nn,
             (CASE WHEN bb + a + b <= (n1 + n2 + 1) // 2
                   THEN (bb + a + b) * (bb + a + b + 1) / 2
                   ELSE ((n1 + n2 + 1) // 2) * ((n1 + n2 + 1) // 2 + 1) / 2
                        + (bb + a + b - (n1 + n2 + 1) // 2) * (n1 + n2 + 1)
                        - ((bb + a + b) * (bb + a + b + 1)
                           - ((n1 + n2 + 1) // 2)
                             * ((n1 + n2 + 1) // 2 + 1)) / 2 END
              - CASE WHEN bb <= (n1 + n2 + 1) // 2
                     THEN bb * (bb + 1) / 2
                     ELSE ((n1 + n2 + 1) // 2) * ((n1 + n2 + 1) // 2 + 1) / 2
                          + (bb - (n1 + n2 + 1) // 2) * (n1 + n2 + 1)
                          - (bb * (bb + 1)
                             - ((n1 + n2 + 1) // 2)
                               * ((n1 + n2 + 1) // 2 + 1)) / 2 END)
               AS run_score_sum
      FROM cum
    ),
    terms AS (
      SELECT n1, n2, nn,
             CAST(sum(CAST(floor(CAST(a AS DOUBLE) * run_score_sum
                                 / (a + b) * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS ab_q6
      FROM scored GROUP BY n1, n2, nn
    )
    SELECT n1, n2,
           floor(CAST(ab_q6 AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS ab_stat,
           CASE WHEN nn % 2 = 0 THEN
             floor((CAST(ab_q6 AS DOUBLE) / 1e6
                    - CAST(n1 AS DOUBLE) * (nn + 2) / 4.0)
                   / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 2) * (nn - 2)
                          / (48.0 * (nn - 1))) * 1e6 + 0.5) / 1e6
           ELSE
             floor((CAST(ab_q6 AS DOUBLE) / 1e6
                    - CAST(n1 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn))
                   / sqrt(CAST(n1 AS DOUBLE) * n2 * (nn + 1)
                          * (3.0 + nn * nn) / (48.0 * nn * nn))
                   * 1e6 + 0.5) / 1e6
           END AS z_ab
    FROM terms
    """


@query("stats_ansari_bradley", oracle=_AB_ORACLE)
def stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley scale test (Ansari & Bradley 1960): do click and
    view values differ in DISPERSION? Scores min(i, N+1−i) peak at the
    center, so a group with larger spread collects smaller scores. The
    scores fold on the value census through the closed-form prefix sum
    S(m) = Σ min(i, N+1−i) (triangular up to (N+1)/2, reflected after);
    ties take the run's average score per Hollander & Wolfe, quantized
    1e-6 per value before the integer reduction. The z uses the
    published no-tie null moments (parity-split mean/variance) — the
    documented approximation under ties, as in the classical tables.

    100 TB: the census-rank shape again — one value fold, one
    cumulative window behind it, one quantized reduction."""
    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    )
    s = e.groupBy(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v")
    ).agg(
        F.count_if(F.col("event_type") == "click").cast("bigint").alias("a"),
        F.count_if(F.col("event_type") == "view").cast("bigint").alias("b"),
    )
    wlt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = s.select(
        "a",
        "b",
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(wlt), F.lit(0))
        .cast("bigint")
        .alias("bb"),
        F.sum("a").over(wall).cast("bigint").alias("n1"),
        F.sum("b").over(wall).cast("bigint").alias("n2"),
    )

    def prefix(m):
        half = F.expr("(n1 + n2 + 1) div 2")
        # m(m+1) is always even; the /2 happens in double on BOTH engines
        below = (m * (m + 1)).cast("bigint") / 2
        return F.when(m <= half, below).otherwise(
            (half * (half + 1)).cast("bigint") / 2
            + (m - half) * (F.col("n1") + F.col("n2") + 1)
            - (m * (m + 1) - half * (half + 1)).cast("bigint") / 2
        )

    m_hi = F.col("bb") + F.col("a") + F.col("b")
    m_lo = F.col("bb")
    run_sum = prefix(m_hi) - prefix(m_lo)
    scored = cum.select(
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("nn"),
        F.floor(
            F.col("a").cast("double")
            * run_sum
            / (F.col("a") + F.col("b"))
            * 1e6
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("q6"),
    )
    terms = scored.groupBy("n1", "n2", "nn").agg(
        F.sum("q6").cast("bigint").alias("ab_q6")
    )
    abd = F.col("ab_q6").cast("double") / 1e6
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nn = F.col("nn")
    nnd = nn.cast("double")
    z_even = (abd - n1d * (nn + 2) / 4.0) / F.sqrt(
        n1d * n2d * (nn + 2) * (nn - 2) / (48.0 * (nn - 1))
    )
    z_odd = (abd - n1d * (nn + 1) * (nn + 1) / (4.0 * nn)) / F.sqrt(
        n1d * n2d * (nn + 1) * (3.0 + nnd * nnd) / (48.0 * nnd * nnd)
    )
    return terms.select(
        "n1",
        "n2",
        fround(abd, 4).alias("ab_stat"),
        F.when(nn % 2 == 0, fround(z_even, 6))
        .otherwise(fround(z_odd, 6))
        .alias("z_ab"),
    )


# --- pairwise Jensen-Shannon divergence ------------------------------------------------

_JS_ORACLE = """
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    census AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok
    ),
    totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM census GROUP BY source
    ),
    probs AS (
      SELECT c.source, c.tok, c.c, t.n FROM census c JOIN totals t USING (source)
    ),
    -- densify over the GLOBAL vocabulary so one-sided mass (tokens a
    -- source never emits) contributes its p*ln2 term: p=0 for absent
    -- (source, tok) cells. r11 fix — the former inner join on shared
    -- tokens silently dropped this mass, and at sf0.001 three sources
    -- genuinely miss tokens (the r10 advice's hazard, live).
    grid AS (
      SELECT s.source, v.tok,
             COALESCE(CAST(p.c AS DOUBLE) / p.n, 0.0) AS p
      FROM (SELECT DISTINCT source FROM totals) s
      CROSS JOIN (SELECT DISTINCT tok FROM census) v
      LEFT JOIN probs p ON p.source = s.source AND p.tok = v.tok
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, a.tok,
             a.p AS p, b.p AS q
      FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
    ),
    terms AS (
      SELECT src_a, src_b,
             CAST(floor((CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q))
                              ELSE 0 END
                         + CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q))
                                ELSE 0 END) / 2.0 * 1e12 + 0.5) AS BIGINT)
               AS tq
      FROM pairs
    )
    SELECT src_a, src_b,
           floor(CAST(sum(tq) AS DOUBLE) / 1e12 * 1e9 + 0.5) / 1e9 AS js
    FROM terms GROUP BY src_a, src_b ORDER BY src_a, src_b
    """


@query("text_js_divergence", oracle=_JS_ORACLE)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (Lin 1991) between every two
    sources' token distributions — the symmetric, bounded-by-ln2
    distributional distance a mixing pipeline uses to pick diverse
    domains (crosssource_vocab_similarity's set-overlap twin, but over
    the full PROBABILITY MASS, so frequency shifts register even with
    identical vocabularies). Each source's distribution is densified
    over the GLOBAL vocabulary (sources × vocab grid, absent cells
    p=0) before the pair join, so one-sided mass — tokens a source
    never emits — contributes its p·ln2 term through the p>0/q>0
    guards. r11 fix: the former inner join on shared tokens dropped
    that mass, and the pinned precondition (every source covers the
    global vocabulary — tests/test_r10_batch13.py) is genuinely
    violated at sf0.001, where three sources miss tokens; the old form
    agreed with its oracle on a value that was not JS there.

    100 TB: (source, token) census → |S|·|V| dense grid → token-keyed
    pair join (|V|·k² worst case, bounded by vocabulary, never
    documents); per-pair terms quantize at 1e-12 before the
    reduction."""
    toks = table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    census = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = census.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    probs = census.join(totals, "source").select(
        "source", "tok", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    # densify over the global vocabulary: absent (source, tok) cells get
    # p=0 so one-sided mass survives the pair join (see docstring).
    # sources × vocab is |S|·|V| — bounded by vocabulary, both sides
    # broadcastable at any corpus size where |S|·|V| is dim-table-sized.
    sources = totals.select("source")
    vocab = census.select("tok").distinct()
    grid = (
        sources.crossJoin(vocab)
        .join(probs, ["source", "tok"], "left")
        .select("source", "tok", F.coalesce(F.col("p"), F.lit(0.0)).alias("p"))
        .localCheckpoint(eager=False)  # both sides of the pair join
    )
    bside = grid.select(
        F.col("source").alias("src_b"),
        F.col("tok").alias("tok_b"),
        F.col("p").alias("q"),
    )
    pairs = grid.join(
        bside,
        (F.col("tok") == F.col("tok_b")) & (F.col("source") < F.col("src_b")),
    ).select(F.col("source").alias("src_a"), "src_b", "p", "q")
    term = (
        F.when(F.col("p") > 0, F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q")))).otherwise(F.lit(0.0))
        + F.when(F.col("q") > 0, F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q")))).otherwise(F.lit(0.0))
    ) / 2.0
    terms = pairs.select(
        "src_a",
        "src_b",
        F.floor(term * 1e12 + F.lit(0.5)).cast("bigint").alias("tq"),
    )
    return (
        terms.groupBy("src_a", "src_b")
        .agg(fround(F.sum("tq").cast("double") / 1e12, 9).alias("js"))
        .orderBy("src_a", "src_b")
    )
