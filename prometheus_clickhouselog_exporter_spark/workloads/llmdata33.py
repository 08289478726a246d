"""Round 10 batch: lexical-richness battery (Yule/Simpson/Sichel/
Honoré), term burstiness, corpus BLEU-2 over deterministic doc pairs,
and Krippendorff's alpha inter-rater reliability — census-exact,
DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has no text analytics; §2.3 north-star LLM-data
territory. Methods are public: Yule 1944 (K), Simpson 1949, Sichel
1975, Honoré 1979, Church & Gale 1995 (burstiness/adaptation),
Papineni et al. 2002 (BLEU), Krippendorff 2004 (alpha, nominal metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import MD5_SQL, fan_out, fround, md5_long, query, table

# --- lexical richness battery ------------------------------------------------

_RICH_ORACLE = """
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    census AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    ),
    agg AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v,
             CAST(count_if(c = 1) AS BIGINT) AS v1,
             CAST(count_if(c = 2) AS BIGINT) AS v2,
             CAST(sum(c * c) AS BIGINT) AS sc2
      FROM census GROUP BY source
    )
    SELECT source, n AS n_tokens, v AS vocab,
           floor(1e4 * (CAST(sc2 AS DOUBLE) - n)
                 / (CAST(n AS DOUBLE) * n) * 1e6 + 0.5) / 1e6 AS yule_k,
           floor(CAST(sc2 - n AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)) * 1e9 + 0.5) / 1e9
             AS simpson_d,
           floor(CAST(v2 AS DOUBLE) / v * 1e6 + 0.5) / 1e6 AS sichel_s,
           CASE WHEN v1 < v THEN
             floor(100.0 * ln(CAST(n AS DOUBLE))
                   / (1.0 - CAST(v1 AS DOUBLE) / v) * 1e6 + 0.5) / 1e6
           END AS honore_r
    FROM agg ORDER BY source
    """


@query("text_lexical_richness", oracle=_RICH_ORACLE)
def text_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness battery per source over the whitespace token
    census: Yule's K = 10⁴(Σc²−N)/N² (Yule 1944 — repeat-rate,
    length-invariant), Simpson's D = Σc(c−1)/(N(N−1)) (the probability
    two random tokens coincide), Sichel's S = V₂/V (dis-legomena share,
    Sichel 1975), and Honoré's R = 100·ln N/(1−V₁/V) (hapax-weighted,
    Honoré 1979; NULL if every type is a hapax — the guard, not a
    crash). Σc(c−1) = Σc²−N keeps Simpson on the same exact integer
    moments as K.

    100 TB: everything derives from ONE (source, token) census with
    map-side partial counts; the battery itself reduces |V| census rows
    to 20 source rows — integer sums, so reduction order is free. The
    only transcendental is ln(N) of an exact integer (hash-stable,
    same libm path both engines — the perplexity family precedent)."""
    toks = fan_out(table(spark, sf_dir, "documents")).select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    census = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = census.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.count_if(F.col("c") == 1).cast("bigint").alias("v1"),
        F.count_if(F.col("c") == 2).cast("bigint").alias("v2"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sc2"),
    )
    nd, vd = F.col("n").cast("double"), F.col("v").cast("double")
    return agg.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab"),
        fround(1e4 * (F.col("sc2").cast("double") - F.col("n")) / (nd * nd), 6)
        .alias("yule_k"),
        fround(
            (F.col("sc2") - F.col("n")).cast("double") / (nd * (F.col("n") - 1)),
            9,
        ).alias("simpson_d"),
        fround(F.col("v2").cast("double") / F.col("v"), 6).alias("sichel_s"),
        F.when(
            F.col("v1") < F.col("v"),
            fround(
                100.0 * F.log(nd) / (1.0 - F.col("v1").cast("double") / vd), 6
            ),
        ).alias("honore_r"),
    ).orderBy("source")


# --- term burstiness (Church & Gale) -----------------------------------------

_BURST_ORACLE = """
    WITH dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
      ) GROUP BY doc_id, tok
    ),
    per_tok AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS df,
             CAST(count_if(c >= 2) AS BIGINT) AS df2,
             CAST(sum(c) AS BIGINT) AS total_c,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM dt GROUP BY tok
      ORDER BY df DESC, total_c DESC, tok LIMIT 50
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT tok, df, total_c,
           floor(((CAST(sum_c2 AS DOUBLE) / n_docs
                   - (CAST(total_c AS DOUBLE) / n_docs)
                     * (CAST(total_c AS DOUBLE) / n_docs))
                  / (CAST(total_c AS DOUBLE) / n_docs)) * 1e6 + 0.5) / 1e6
             AS vmr,
           floor(CAST(df2 AS DOUBLE) / df * 1e6 + 0.5) / 1e6 AS adaptation
    FROM per_tok CROSS JOIN nd
    ORDER BY df DESC, total_c DESC, tok
    """


@query("text_term_burstiness", oracle=_BURST_ORACLE)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness for the 50 highest-document-frequency tokens:
    variance-to-mean ratio of the per-document count ACROSS ALL
    documents (zeros included — computable from moments, never
    materializing zeros: E[x]=Σc/D, E[x²]=Σc²/D), plus Church & Gale
    1995's "adaptation" P(c≥2 | c≥1) = df₂/df. VMR ≈ 1 is Poisson
    (function words); bursty content words score ≫ 1 and low
    adaptation-vs-frequency — the published signal for topicality and
    for boilerplate screens.

    100 TB: (doc, token) census → token census (two map-side-combined
    aggregations), then TakeOrderedAndProject for the top-50 (no
    global window — the sanctioned top-k shape) and a 1-row doc-count
    broadcast. All moments are exact integers."""
    d = fan_out(table(spark, sf_dir, "documents"))
    dt = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per_tok = (
        dt.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.count_if(F.col("c") >= 2).cast("bigint").alias("df2"),
            F.sum("c").cast("bigint").alias("total_c"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
        )
        .orderBy(F.col("df").desc(), F.col("total_c").desc(), "tok")
        .limit(50)
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    mean = F.col("total_c").cast("double") / F.col("n_docs")
    ex2 = F.col("sum_c2").cast("double") / F.col("n_docs")
    return (
        per_tok.crossJoin(F.broadcast(nd))
        .select(
            "tok",
            "df",
            "total_c",
            fround((ex2 - mean * mean) / mean, 6).alias("vmr"),
            fround(F.col("df2").cast("double") / F.col("df"), 6).alias(
                "adaptation"
            ),
        )
        .orderBy(F.col("df").desc(), F.col("total_c").desc(), "tok")
    )


# --- corpus BLEU-2 over deterministic doc pairs -------------------------------

_BLEU_ORACLE = """
    WITH tok AS (
      SELECT doc_id, lang, doc_id // 2 AS pair_id, doc_id % 2 AS side,
             string_split(text, ' ') AS ws
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    grams AS (
      SELECT pair_id, side, lang, 1 AS n, unnest(ws) AS gram FROM tok
      UNION ALL
      SELECT pair_id, side, lang, 2 AS n,
             unnest([ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))])
               AS gram
      FROM tok
    ),
    cnt AS (
      SELECT pair_id, side, n, any_value(lang) AS lang, gram,
             CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY pair_id, side, n, gram
    ),
    cand AS (SELECT pair_id, n, lang, gram, c FROM cnt WHERE side = 1),
    ref AS (SELECT pair_id, n, gram, c AS cr FROM cnt WHERE side = 0),
    scored AS (
      SELECT cd.pair_id, cd.n, any_value(cd.lang) AS lang,
             CAST(sum(least(cd.c, coalesce(r.cr, 0))) AS BIGINT) AS clip,
             CAST(sum(cd.c) AS BIGINT) AS tot
      FROM cand cd LEFT JOIN ref r USING (pair_id, n, gram)
      GROUP BY cd.pair_id, cd.n
    ),
    wide AS (
      SELECT pair_id, any_value(lang) AS lang,
             max(CASE WHEN n = 1 THEN clip END) AS clip1,
             max(CASE WHEN n = 1 THEN tot END) AS tot1,
             max(CASE WHEN n = 2 THEN clip END) AS clip2,
             max(CASE WHEN n = 2 THEN tot END) AS tot2
      FROM scored GROUP BY pair_id
    ),
    reflen AS (
      SELECT pair_id, CAST(sum(c) AS BIGINT) AS rlen
      FROM cnt WHERE side = 0 AND n = 1 GROUP BY pair_id
    ),
    pairs AS (
      SELECT w.lang,
             CAST(floor(sqrt((CAST(w.clip1 AS DOUBLE) / w.tot1)
                             * (CAST(w.clip2 AS DOUBLE) / w.tot2))
                        * 1e9 + 0.5) AS BIGINT) AS q9,
             CAST(floor(CAST(w.tot1 AS DOUBLE) / r.rlen * 1e9 + 0.5)
                  AS BIGINT) AS lr9
      FROM wide w JOIN reflen r USING (pair_id)
      WHERE w.tot2 IS NOT NULL
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS pairs,
           floor(CAST(sum(q9) AS DOUBLE) / count(*) / 1e9 * 1e9 + 0.5) / 1e9
             AS avg_bleu2_nobp,
           floor(CAST(sum(lr9) AS DOUBLE) / count(*) / 1e9 * 1e9 + 0.5) / 1e9
             AS avg_len_ratio
    FROM pairs GROUP BY lang ORDER BY lang
    """


@query("eval_bleu_pairs", oracle=_BLEU_ORACLE)
def eval_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-2 precision (Papineni et al. 2002) over the same
    deterministic pairing as eval_rouge2_pairs (doc 2i = reference,
    doc 2i+1 = candidate): pₙ = Σ clipped n-gram matches / Σ candidate
    n-grams for n∈{1,2}; the score is the geometric mean √(p₁p₂) —
    IEEE sqrt, not exp/ln — published separately from the length ratio
    |cand|/|ref| (from which the brevity penalty exp(1−1/ratio) is a
    consumer-side scalar; keeping exp out keeps the hash contract on
    exact integer ratios). Zero-overlap pairs score 0 (no smoothing —
    documented).

    100 TB: one tokenize pass emits unigram+bigram censuses together
    (UNION of projections over the same exploded frame); the clip join
    is keyed (pair, n, gram) — pair-local; per-pair scores quantize to
    integers before the per-lang mean."""
    tok = (
        fan_out(table(spark, sf_dir, "documents"))
        .select(
            "lang",
            (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
            F.pmod("doc_id", F.lit(2)).alias("side"),
            F.split("text", " ").alias("ws"),
        )
        .where(F.size("ws") >= 2)
    )
    uni = tok.select(
        "pair_id", "side", "lang", F.lit(1).alias("n"),
        F.explode("ws").alias("gram"),
    )
    bi = tok.select(
        "pair_id", "side", "lang", F.lit(2).alias("n"),
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> ws[i-1] || ' ' || ws[i])")
        ).alias("gram"),
    )
    cnt = (
        uni.unionByName(bi)
        .groupBy("pair_id", "side", "n", "gram")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=False)  # consumers: cand, ref, reflen
    )
    cand = cnt.where(F.col("side") == 1).drop("side")
    ref = cnt.where(F.col("side") == 0).select(
        "pair_id", "n", "gram", F.col("c").alias("cr")
    )
    scored = (
        cand.join(ref, ["pair_id", "n", "gram"], "left")
        .groupBy("pair_id", "n")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum(F.least(F.col("c"), F.coalesce(F.col("cr"), F.lit(0))))
            .cast("bigint")
            .alias("clip"),
            F.sum("c").cast("bigint").alias("tot"),
        )
    )
    wide = scored.groupBy("pair_id").agg(
        F.any_value("lang").alias("lang"),
        F.max(F.when(F.col("n") == 1, F.col("clip"))).alias("clip1"),
        F.max(F.when(F.col("n") == 1, F.col("tot"))).alias("tot1"),
        F.max(F.when(F.col("n") == 2, F.col("clip"))).alias("clip2"),
        F.max(F.when(F.col("n") == 2, F.col("tot"))).alias("tot2"),
    )
    reflen = (
        cnt.where((F.col("side") == 0) & (F.col("n") == 1))
        .groupBy("pair_id")
        .agg(F.sum("c").cast("bigint").alias("rlen"))
    )
    p1 = F.col("clip1").cast("double") / F.col("tot1")
    p2 = F.col("clip2").cast("double") / F.col("tot2")
    pairs = (
        wide.join(reflen, "pair_id")
        .where(F.col("tot2").isNotNull())
        .select(
            "lang",
            F.floor(F.sqrt(p1 * p2) * 1e9 + F.lit(0.5)).cast("bigint").alias("q9"),
            F.floor(
                F.col("tot1").cast("double") / F.col("rlen") * 1e9 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lr9"),
        )
    )
    n = F.count(F.lit(1))
    return (
        pairs.groupBy("lang")
        .agg(
            n.cast("bigint").alias("pairs"),
            fround(F.sum("q9").cast("double") / n / 1e9, 9).alias(
                "avg_bleu2_nobp"
            ),
            fround(F.sum("lr9").cast("double") / n / 1e9, 9).alias(
                "avg_len_ratio"
            ),
        )
        .orderBy("lang")
    )


# --- Krippendorff's alpha (nominal) ------------------------------------------

_H = MD5_SQL.format


def _alpha_sql() -> str:
    hb = _H(x="('b|' || o_orderkey)")
    hcp = _H(x="('cp|' || o_orderkey)")
    hcf = _H(x="('cf|' || o_orderkey)")
    return f"""
    WITH base AS (
      SELECT o_orderkey AS item,
             CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 'hi'
                  WHEN substr(o_orderpriority, 1, 1) = '3' THEN 'mid'
                  ELSE 'lo' END AS c0,
             {hb} % 10 AS hb, {hcp} % 5 AS hcp, {hcf} % 7 AS hcf
      FROM orders
    ),
    lab AS (
      SELECT item, c0,
             CASE c0 WHEN 'hi' THEN 'mid' WHEN 'mid' THEN 'lo'
                     ELSE 'hi' END AS c1,
             CASE c0 WHEN 'hi' THEN 'lo' WHEN 'mid' THEN 'hi'
                     ELSE 'mid' END AS c2,
             hb, hcp, hcf,
             CASE WHEN hcp <> 0 THEN 3 ELSE 2 END AS m
      FROM base
    ),
    ratings AS (
      SELECT item, 'a' AS rater, c0 AS label, m FROM lab
      UNION ALL
      SELECT item, 'b', CASE WHEN hb = 0 THEN c1 ELSE c0 END, m FROM lab
      UNION ALL
      SELECT item, 'c', CASE WHEN hcf = 0 THEN c2 ELSE c0 END, m
      FROM lab WHERE hcp <> 0
    ),
    o2 AS (
      SELECT r1.label AS c, r2.label AS k,
             CAST(sum(2 // (r1.m - 1)) AS BIGINT) AS w2
      FROM ratings r1 JOIN ratings r2
        ON r1.item = r2.item AND r1.rater <> r2.rater
      GROUP BY r1.label, r2.label
    ),
    marg AS (
      SELECT CAST(sum(w2) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN c = k THEN w2 ELSE 0 END) AS BIGINT)
               AS agree2,
             CAST(sum(CASE WHEN c <> k THEN w2 ELSE 0 END) AS BIGINT)
               AS off2
      FROM o2
    ),
    nc AS (
      SELECT c, CAST(sum(w2) AS BIGINT) AS n2c FROM o2 GROUP BY c
    ),
    sq AS (
      SELECT CAST(sum(n2c * n2c) AS BIGINT) AS sum_n2c_sq FROM nc
    ),
    items AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(m) AS BIGINT) AS n_ratings
      FROM lab
    )
    SELECT i.n_items, i.n_ratings, m.agree2, m.off2,
           floor((1.0 - (CAST(m.off2 AS DOUBLE) / 2.0 / (m.n2 / 2.0))
                        / ((CAST(m.n2 AS DOUBLE) / 2.0 * (m.n2 / 2.0)
                            - CAST(s.sum_n2c_sq AS DOUBLE) / 4.0)
                           / (m.n2 / 2.0 * (m.n2 / 2.0 - 1.0))))
                 * 1e9 + 0.5) / 1e9 AS alpha
    FROM marg m CROSS JOIN sq s CROSS JOIN items i
    """


@query("eval_krippendorff_alpha", oracle=_alpha_sql())
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (Krippendorff 2004, nominal metric) over a
    deterministic 3-rater annotation grid: rater a = the item's true
    class (priority→{hi,mid,lo}), rater b = a 10%-hash-noised copy,
    rater c = a 1/7-noised copy that SKIPS 20% of items — exercising
    the unequal-coverage case alpha exists for (items with mᵤ raters
    contribute each ordered pair at weight 1/(mᵤ−1) to the coincidence
    matrix; mᵤ∈{2,3} makes 2/(mᵤ−1) an exact integer, so the whole
    matrix is integer-exact at 2× scale). α = 1 − D_o/D_e with
    D_o = Σ_{c≠k}o_ck/n and D_e = Σ_{c≠k}n_c n_k/(n(n−1)).

    100 TB: the coincidence matrix never materializes — an item's
    contribution is a closed form of its class-count vector
    (diag Σ_c cnt(cnt−1)/(m−1), off (m(m−1)−Σ_c cnt(cnt−1))/(m−1),
    marginal n_c = cnt_c), so the WHOLE statistic is ONE scan + ONE
    1-row aggregation: no pair explosion, no self-join, no rescan."""
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
    lab = o.select(
        F.col("o_orderkey").alias("item"),
        c0.alias("c0"),
        F.when(hb == 0, cyc1).otherwise(c0).alias("lb"),
        F.when(hcf == 0, cyc2).otherwise(c0).alias("lc"),
        (hcp != 0).alias("has_c"),
    )
    # item-local fold: with only 3 classes the per-item coincidence
    # contribution is a function of the item's class-count vector
    # (cnt_hi, cnt_mid, cnt_lo): diag Σc cnt(cnt−1)/(m−1), off
    # (m(m−1) − Σc cnt(cnt−1))/(m−1), marginal n_c = cnt_c — so ONE
    # aggregation yields every scalar the alpha needs (no pair
    # explosion, no self-join, no o2 rescan)
    def cls_cnt(label: str):
        out = F.lit(0)
        for col in ("c0", "lb"):
            out = out + F.when(F.col(col) == label, 1).otherwise(0)
        return (
            out
            + F.when(F.col("has_c") & (F.col("lc") == label), 1).otherwise(0)
        ).cast("bigint")

    ch, cm, cl = cls_cnt("hi"), cls_cnt("mid"), cls_cnt("lo")
    m = F.when(F.col("has_c"), F.lit(3)).otherwise(F.lit(2)).cast("bigint")
    w2 = F.when(F.col("has_c"), F.lit(1)).otherwise(F.lit(2)).cast("bigint")
    diag_raw = ch * (ch - 1) + cm * (cm - 1) + cl * (cl - 1)
    agg = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(m).cast("bigint").alias("n_ratings"),
        F.sum(w2 * diag_raw).cast("bigint").alias("agree2"),
        F.sum(w2 * (m * (m - 1) - diag_raw)).cast("bigint").alias("off2"),
        F.sum(ch).cast("bigint").alias("nc_hi"),
        F.sum(cm).cast("bigint").alias("nc_mid"),
        F.sum(cl).cast("bigint").alias("nc_lo"),
    )
    # reproduce the oracle's 2x-scaled integers exactly: n2 = 2·Σm,
    # n2_c = 2·n_c, sum_n2c_sq = 4·Σ n_c²
    agg = agg.select(
        "*",
        (F.lit(2) * F.col("n_ratings")).alias("n2"),
        (
            F.lit(4)
            * (
                F.col("nc_hi") * F.col("nc_hi")
                + F.col("nc_mid") * F.col("nc_mid")
                + F.col("nc_lo") * F.col("nc_lo")
            )
        ).alias("sum_n2c_sq"),
    )
    n_half = F.col("n2").cast("double") / 2.0
    d_o = F.col("off2").cast("double") / 2.0 / n_half
    d_e = (
        n_half * n_half - F.col("sum_n2c_sq").cast("double") / 4.0
    ) / (n_half * (n_half - 1.0))
    return agg.select(
        "n_items",
        "n_ratings",
        "agree2",
        "off2",
        fround(F.lit(1.0) - d_o / d_e, 9).alias("alpha"),
    )
