"""Relational battery, round 3 batch 15: W-pattern scan, Mann–Whitney
U, one-way ANOVA, and an LSH band-tuning report.

Deepens three existing lanes. The W-scan extends pattern_v_recovery
with two more lags on the SAME sort — the promised generalization:
fixed-length row patterns compose from lag stacks, never a second
shuffle. Mann–Whitney U completes the rank-statistics family
(Theil–Sen, Kendall, runs test) with the two-SAMPLE comparison, kept
exact by doubling tie-averaged ranks into integers. ANOVA is the
k-sample generalization, from the same quantized-moment discipline as
skew/kurtosis. The band-tuning report turns the MinHash machinery
into the operational question every LSH deployment asks first: how
many candidate pairs does each (bands × rows) configuration cost?

Float discipline per workloads/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, fround, money, query, table
from .core import MD5_SQL as _MD5_SQL, md5_long as _md5_long

_TUNE_PERMS = 16  # signature width for the band-tuning report
_TUNE_CONFIGS = [(8, 2), (4, 4), (2, 8)]  # (bands, rows-per-band), b*r = 16


@query(
    "pattern_w_double_bottom",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    ctx AS (
      SELECT priority, day, rev,
             lag(rev, 2) OVER w AS m2, lag(rev, 1) OVER w AS m1,
             lead(rev, 1) OVER w AS p1, lead(rev, 2) OVER w AS p2
      FROM daily WINDOW w AS (PARTITION BY priority ORDER BY day)
    )
    SELECT priority, CAST(day AS VARCHAR) AS center_day,
           CAST(m2 AS DOUBLE) AS rev_m2, CAST(m1 AS DOUBLE) AS rev_m1,
           CAST(rev AS DOUBLE) AS rev_center,
           CAST(p1 AS DOUBLE) AS rev_p1, CAST(p2 AS DOUBLE) AS rev_p2,
           CAST((m2 + p2) - (m1 + p1) AS DOUBLE) AS w_depth
    FROM ctx
    WHERE m2 IS NOT NULL AND p2 IS NOT NULL
      AND m1 < m2 AND m1 < rev      -- first bottom
      AND p1 < rev AND p1 < p2      -- second bottom
      AND rev < m2 AND rev < p2     -- middle peak stays below shoulders
    ORDER BY w_depth DESC, priority, center_day LIMIT 15
    """,
)
def pattern_w_double_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-shape (double bottom) detection — the promised generalization
    of pattern_v_recovery: five consecutive days shaped
    high / bottom / lower-peak / bottom / high, found with FOUR lags
    on the SAME single per-priority sort (no extra shuffle, no self
    join). All comparisons are exact DECIMAL; the depth ranking
    (shoulder sum − bottom sum) and the top-15 cut are total-ordered.

    Scale: identical to the V-scan — daily pre-aggregation bounds the
    window input; each added pattern leg is one more lag column, so a
    k-leg pattern costs k column reads over one sort, which is why
    the lag-stack form beats MATCH_RECOGNIZE-style NFA evaluation for
    fixed-length patterns.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
    w = Window.partitionBy("priority").orderBy("day")
    ctx = daily.select(
        "priority",
        "day",
        "rev",
        F.lag("rev", 2).over(w).alias("m2"),
        F.lag("rev", 1).over(w).alias("m1"),
        F.lead("rev", 1).over(w).alias("p1"),
        F.lead("rev", 2).over(w).alias("p2"),
    )
    rev = F.col("rev")
    m1, m2, p1, p2 = (F.col(k) for k in ("m1", "m2", "p1", "p2"))
    return (
        ctx.filter(
            m2.isNotNull()
            & p2.isNotNull()
            & (m1 < m2)
            & (m1 < rev)
            & (p1 < rev)
            & (p1 < p2)
            & (rev < m2)
            & (rev < p2)
        )
        .select(
            "priority",
            F.col("day").cast("string").alias("center_day"),
            m2.cast("double").alias("rev_m2"),
            m1.cast("double").alias("rev_m1"),
            rev.cast("double").alias("rev_center"),
            p1.cast("double").alias("rev_p1"),
            p2.cast("double").alias("rev_p2"),
            ((m2 + p2) - (m1 + p1)).cast("double").alias("w_depth"),
        )
        .orderBy(F.desc("w_depth"), "priority", "center_day")
        .limit(15)
    )


@query(
    "stats_mann_whitney_u",
    oracle="""
    WITH samp AS (
      SELECT lang, n_chars FROM documents WHERE lang IN ('en', 'de')
    ),
    ranked AS (
      SELECT lang, n_chars,
             rank() OVER (ORDER BY n_chars) AS rk,
             count(*) OVER (PARTITION BY n_chars) AS cnt
      FROM samp
    ),
    scored AS (
      -- doubled tie-averaged rank: 2*avg = 2*rank + cnt - 1 (exact integer)
      SELECT lang, 2 * rk + cnt - 1 AS r2 FROM ranked
    ),
    sums AS (
      SELECT
        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN lang = 'en' THEN r2 ELSE 0 END) AS BIGINT) AS r1x2
      FROM scored
    )
    SELECT n1, n2,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
           floor(((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS auc_effect
    FROM sums
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the English and German document-length
    distributions — the two-sample rank test (does one population
    stochastically dominate?) that needs no normality assumption. Tie
    handling stays EXACT by working in doubled ranks: the tie-averaged
    rank of a group starting at rank r with c members is r+(c−1)/2, so
    2·avg = 2r+c−1 is an integer — U₁·2 = 2R₁ − n₁(n₁+1) never touches
    a float. The only emitted double is the U₁/(n₁n₂) effect size,
    which is exactly P(en > de) + ½P(tie) — the AUC interpretation.

    Scale: ranks are VALUE-GROUPED — the corpus folds to per-value
    (cnt, en_cnt, de_cnt) rows map-side first, the competition rank of
    a value is 1 + the exclusive running count over the DISTINCT-value
    series (value-cardinality, provably behind the aggregate — the
    bounded-global-window invariant plan_audit enforces), and every
    document at that value contributes the same doubled rank, so the
    rank sum is Σ en_cnt·(2rk+cnt−1) with no corpus-sized window
    anywhere.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de"))
    g = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en_cnt"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("de_cnt"),
    )
    wo = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "cnt",
        "en_cnt",
        "de_cnt",
        (F.coalesce(F.sum("cnt").over(wo), F.lit(0)) + 1).alias("rk"),
    )
    sums = ranked.agg(
        F.sum("en_cnt").cast("bigint").alias("n1"),
        F.sum("de_cnt").cast("bigint").alias("n2"),
        F.sum(
            F.col("en_cnt") * (F.lit(2) * F.col("rk") + F.col("cnt") - 1)
        )
        .cast("bigint")
        .alias("r1x2"),
    )
    n1, n2, r1x2 = F.col("n1"), F.col("n2"), F.col("r1x2")
    u1x2 = r1x2 - n1 * (n1 + 1)
    return sums.select(
        "n1",
        "n2",
        u1x2.cast("bigint").alias("u1_x2"),
        (F.lit(2) * n1 * n2 - u1x2).cast("bigint").alias("u2_x2"),
        fround(
            (u1x2.cast("double") / 2) / (n1.cast("double") * n2.cast("double")), 6
        ).alias("auc_effect"),
    )


@query(
    "stats_anova_dow",
    oracle="""
    WITH q AS (
      SELECT CAST(isodow(o_orderdate) AS INT) AS dow,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sxd,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxxd
      FROM q GROUP BY dow
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS nt,
             CAST(sum(sxd) AS DOUBLE) AS sxt,
             CAST(sum(sxxd) AS DOUBLE) AS sxxt,
             CAST(count(*) AS DOUBLE) AS k
      FROM g
    ),
    ssb_t AS (
      -- ssb = sum n_g*(mean_g - mean)^2, per-term quantized: the terms are
      -- deviation-sized, so the 1e3 fold never nears the BIGINT clamp
      SELECT CAST(sum(CAST(floor(CAST(g.n AS DOUBLE)
                       * ((CAST(g.sxd AS DOUBLE) / CAST(g.n AS DOUBLE))
                          - (t.sxt / t.nt))
                       * ((CAST(g.sxd AS DOUBLE) / CAST(g.n AS DOUBLE))
                          - (t.sxt / t.nt))
                       * 1000) AS DECIMAL(38,0))) AS DOUBLE) / 1000 AS ssb
      FROM g, tot t
    ),
    parts AS (
      SELECT
        (t.sxxt - ((t.sxt * t.sxt) / t.nt)) AS sst,
        b.ssb AS ssb, t.nt AS nt, t.k AS k
      FROM tot t, ssb_t b
    )
    SELECT CAST(nt AS BIGINT) AS n_obs, CAST(k AS INT) AS n_groups,
           floor((ssb / 1e4) * 1e2 + 0.5) / 1e2 AS ss_between_dsq,
           floor(((sst - ssb) / 1e4) * 1e2 + 0.5) / 1e2 AS ss_within_dsq,
           floor(((ssb / (k - 1)) / ((sst - ssb) / (nt - k))) * 1e6 + 0.5) / 1e6
             AS f_stat
    FROM parts
    """,
)
def stats_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value by ISO day-of-week: the k-sample
    mean-difference screen (does weekday matter?). SS_total and
    SS_between decompose from per-group quantized-exact moment sums —
    the same DECIMAL(38) fold as skew/kurtosis, grouped — so the F
    statistic is a fixed arithmetic expression over exact inputs,
    frounded once. A large F with these degrees of freedom
    (k−1, n−k) sends the analyst to the per-day means; the operator's
    job is the decomposition, done in ONE pass.

    Scale: one 7-group aggregate with map-side combine; everything
    after is 7-row arithmetic. The moment partials merge by addition —
    incremental/streaming-ready like every moment-based stat here.
    """
    o = table(spark, sf_dir, "orders")
    q = o.select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("int").alias("dow"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    g = q.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sxd"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxxd"),
    )
    g = g.localCheckpoint(eager=False)  # 7 rows; feeds totals + ssb terms
    # Exactness: cross-group sums stay DECIMAL (order-free). ssb uses the
    # n*(mean_g - mean)^2 form because its terms are DEVIATION-sized:
    # the raw sum-of-squares form sx^2/n is ~1e19 at sf0.1 and Spark's
    # floor(double) -> BIGINT silently SATURATES at Long.MAX (SCALE.md) —
    # the deviation form keeps every quantized term far from the clamp.
    tot = g.agg(
        F.sum("n").cast("double").alias("nt"),
        F.sum("sxd").cast("double").alias("sxt"),
        F.sum("sxxd").cast("double").alias("sxxt"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    mean_g = F.col("sxd").cast("double") / F.col("n").cast("double")
    mean_all = F.col("sxt") / F.col("nt")
    term = F.col("n").cast("double") * (mean_g - mean_all) * (mean_g - mean_all)
    ssb_t = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            (
                F.sum(F.floor(term * 1000).cast("decimal(38,0)")).cast("double")
                / 1000
            ).alias("ssb")
        )
    )
    tot = tot.crossJoin(F.broadcast(ssb_t))
    nt, sxt, sxxt, k, ssb = (
        F.col(c) for c in ("nt", "sxt", "sxxt", "k", "ssb")
    )
    sst = sxxt - ((sxt * sxt) / nt)
    return tot.select(
        nt.cast("bigint").alias("n_obs"),
        k.cast("int").alias("n_groups"),
        # dollars^2 units keep fround's floor(x*100) far below the
        # BIGINT saturation point at every SF (SCALE.md: floor clamp)
        fround(ssb / 1e4, 2).alias("ss_between_dsq"),
        fround((sst - ssb) / 1e4, 2).alias("ss_within_dsq"),
        fround((ssb / (k - 1)) / ((sst - ssb) / (nt - k)), 6).alias("f_stat"),
    )


def _band_cases_sql() -> str:
    rows = ", ".join(f"({b}, {r})" for b, r in _TUNE_CONFIGS)
    return f"(VALUES {rows}) cfg(b, r)"


@query(
    "dedup_lsh_band_tuning",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
               AS g
      FROM toks
    ),
    sig AS (
      SELECT doc_id, p.perm AS perm,
             min(CAST({_MD5_SQL.format(x="g || '#' || CAST(p.perm AS VARCHAR)")}
                      AS BIGINT)) AS sig
      FROM sh, range({_TUNE_PERMS}) p(perm)
      GROUP BY doc_id, p.perm
    ),
    banded AS (
      SELECT cfg.b, cfg.r, s.doc_id, s.perm // cfg.r AS band,
             CAST({_MD5_SQL.format(x="CAST(s.perm // cfg.r AS VARCHAR) || ':' || string_agg(CAST(s.sig AS VARCHAR), ',' ORDER BY s.perm)")}
                  AS BIGINT) AS bh
      FROM sig s, {_band_cases_sql()}
      GROUP BY cfg.b, cfg.r, s.doc_id, s.perm // cfg.r
    ),
    buckets AS (
      SELECT b, r, band, bh, count(*) AS sz
      FROM banded GROUP BY b, r, band, bh
    )
    SELECT CAST(b AS INT) AS bands, CAST(r AS INT) AS rows_per_band,
           CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_colliding_buckets,
           CAST(sum(sz * (sz - 1) / 2) AS BIGINT) AS n_candidate_pairs,
           CAST(max(sz) AS BIGINT) AS max_bucket
    FROM buckets GROUP BY b, r ORDER BY bands DESC
    """,
)
def dedup_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-tuning report: from ONE 16-perm MinHash signature set,
    the candidate-pair cost of each (bands × rows-per-band) split —
    the first operational question of any LSH deployment (more bands =
    higher recall AND more candidates; this measures the 'more
    candidates' side on the actual corpus, per config, before
    committing a threshold). Band keys hash the ordered signature
    slice through the md5 family, so DuckDB rebuilds every bucket
    exactly.

    Scale: signatures are computed ONCE (checkpointed) and the per-
    config banding is a projection over them — the report costs
    |configs| band-aggregates over signature-sized data, never a pair
    join (candidate counts come from bucket sizes: Σ C(sz,2)).
    """
    d = fan_out(table(spark, sf_dir, "documents"))  # 16 md5 perms per
    # posting above a 1-row-group scan — full width, not one core (r13)
    toks = d.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    ).filter(F.size("t") >= 3)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + 1),
                        F.element_at("t", i + 2),
                    ),
                )
            )
        ).alias("g"),
    )
    sig = (
        sh.select(
            "doc_id",
            "g",
            F.explode(F.sequence(F.lit(0), F.lit(_TUNE_PERMS - 1))).alias("perm"),
        )
        .select(
            "doc_id",
            "perm",
            _md5_long(F.concat_ws("#", F.col("g"), F.col("perm"))).alias("h"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("sig"))
        .localCheckpoint(eager=False)  # ONE signature pass; every config reuses it
    )
    outs = []
    for b, r in _TUNE_CONFIGS:
        banded = (
            sig.withColumn("band", F.expr(f"perm DIV {r}"))
            .groupBy("doc_id", "band")
            .agg(
                F.expr(
                    "listagg(CAST(sig AS STRING), ',') "
                    "WITHIN GROUP (ORDER BY perm)"
                ).alias("slice")
            )
            .select(
                "band",
                _md5_long(
                    F.concat_ws(
                        ":", F.col("band").cast("string"), F.col("slice")
                    )
                ).alias("bh"),
            )
        )
        buckets = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("sz"))
        outs.append(
            buckets.agg(
                F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_colliding_buckets"),
                F.sum((F.col("sz") * (F.col("sz") - 1)) / 2)
                .cast("bigint")
                .alias("n_candidate_pairs"),
                F.max("sz").cast("bigint").alias("max_bucket"),
            ).select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_colliding_buckets",
                "n_candidate_pairs",
                "max_bucket",
            )
        )
    out = outs[0]
    for o2 in outs[1:]:
        out = out.unionByName(o2)
    return out.orderBy(F.desc("bands"))
