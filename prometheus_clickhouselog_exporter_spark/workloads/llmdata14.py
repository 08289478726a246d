"""LLM-data ops, round 6 batch 2: the Gopher repetition-filter battery
(Rae et al. 2021, Table A1 — the industry-standard pre-training quality
gates, as also shipped by DataTrove/NeMo-Curator): per-document top
n-gram character fractions (n=2,3,4) and duplicated n-gram character
coverage (n=5,10, union-of-spans semantics), plus the non-repetition
word-form rules (mean word length, alpha-word fraction, stopword hits).

The single-token half of the battery already exists
(text_repetition_filter); this module adds the n-gram half, which is
where the real boilerplate signal lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

# Gopher Table A1 thresholds for the n-gram family.
_TOP_THRESH = {2: 0.20, 3: 0.18, 4: 0.16}
_DUP_THRESH = {5: 0.15, 10: 0.10}


@query(
    "text_gopher_ngram_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS total,
             string_split(text, ' ') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    nums AS (SELECT t.i FROM range(0, 128) t(i)),
    pos AS (
      SELECT t.doc_id, t.total, t.tk, CAST(n.i AS BIGINT) AS p,
             coalesce(sum(length(t.tk[n.i + 1]) + 1) OVER (
               PARTITION BY t.doc_id ORDER BY n.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      FROM toks t JOIN nums n ON n.i < len(t.tk)
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, total, u.n, p, start,
             array_to_string(tk[p + 1 : p + u.n], ' ') AS gram,
             CAST(length(array_to_string(tk[p + 1 : p + u.n], ' '))
                  AS BIGINT) AS gramlen
      FROM pos, (SELECT unnest([2, 3, 4, 5, 10]) AS n) u
      WHERE p + u.n <= len(tk)
    ),
    topg AS (
      SELECT doc_id, total, n, gram, gramlen,
             CAST(count(*) AS BIGINT) AS c
      FROM grams WHERE n IN (2, 3, 4)
      GROUP BY 1, 2, 3, 4, 5
    ),
    top1 AS (
      SELECT doc_id, total, n, c * gramlen AS cov,
             row_number() OVER (PARTITION BY doc_id, n
                                ORDER BY c DESC, gramlen DESC, gram) AS rk
      FROM topg
    ),
    topw AS (
      SELECT doc_id,
             max(CASE WHEN n = 2 THEN cov END) AS cov2,
             max(CASE WHEN n = 3 THEN cov END) AS cov3,
             max(CASE WHEN n = 4 THEN cov END) AS cov4
      FROM top1 WHERE rk = 1 GROUP BY 1
    ),
    dup_occ AS (
      SELECT doc_id, total, n, start, start + gramlen - 1 AS endc,
             count(*) OVER (PARTITION BY doc_id, n, gram) AS cnt
      FROM grams WHERE n IN (5, 10)
    ),
    isl AS (
      SELECT doc_id, total, n, start, endc,
             CASE WHEN start > coalesce(max(endc) OVER (
                    PARTITION BY doc_id, n ORDER BY start, endc
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS brk
      FROM dup_occ WHERE cnt >= 2
    ),
    isl2 AS (
      SELECT doc_id, total, n, start, endc,
             sum(brk) OVER (PARTITION BY doc_id, n ORDER BY start, endc
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl_id
      FROM isl
    ),
    cov AS (
      SELECT doc_id, n, max(endc) - min(start) + 1 AS clen
      FROM isl2 GROUP BY doc_id, n, isl_id
    ),
    dupw AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN n = 5 THEN clen END) AS BIGINT) AS dcov5,
             CAST(sum(CASE WHEN n = 10 THEN clen END) AS BIGINT) AS dcov10
      FROM cov GROUP BY 1
    )
    SELECT t.doc_id,
           floor(CAST(coalesce(w.cov2, 0) AS DOUBLE) / t.total * 1e4 + 0.5)
             / 1e4 AS top2_frac,
           floor(CAST(coalesce(w.cov3, 0) AS DOUBLE) / t.total * 1e4 + 0.5)
             / 1e4 AS top3_frac,
           floor(CAST(coalesce(w.cov4, 0) AS DOUBLE) / t.total * 1e4 + 0.5)
             / 1e4 AS top4_frac,
           floor(CAST(coalesce(d.dcov5, 0) AS DOUBLE) / t.total * 1e4 + 0.5)
             / 1e4 AS dup5_frac,
           floor(CAST(coalesce(d.dcov10, 0) AS DOUBLE) / t.total * 1e4 + 0.5)
             / 1e4 AS dup10_frac,
           (CAST(coalesce(w.cov2, 0) AS DOUBLE) / t.total <= 0.20
            AND CAST(coalesce(w.cov3, 0) AS DOUBLE) / t.total <= 0.18
            AND CAST(coalesce(w.cov4, 0) AS DOUBLE) / t.total <= 0.16
            AND CAST(coalesce(d.dcov5, 0) AS DOUBLE) / t.total <= 0.15
            AND CAST(coalesce(d.dcov10, 0) AS DOUBLE) / t.total <= 0.10)
             AS keep
    FROM toks t
    LEFT JOIN topw w USING (doc_id)
    LEFT JOIN dupw d USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_gopher_ngram_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher n-gram repetition gates, exactly as published: per document,
    the character fraction covered by the single most frequent n-gram
    (n=2,3,4; coverage = count x char length, top chosen by count desc
    then length desc then lexicographic — a deterministic total order)
    and the character fraction covered by the UNION of all duplicated
    (within-doc count >= 2) n-gram spans (n=5,10; overlapping spans
    merged by gaps-and-islands so no character is double-counted). The
    keep rule applies the published thresholds (0.20/0.18/0.16 top,
    0.15/0.10 dup).

    Plan: ONE documents scan -> one positions explode with per-doc char
    offsets (prefix-sum window, partitioned by doc — never global) ->
    an in-row explode to the (n, gram, start) long form, checkpointed
    once; the top-gram branch is a hash agg + per-(doc,n) WindowGroupLimit,
    the dup branch is count-over + islands windows on the same partition
    key. All per-doc windows are bounded by document length.

    100 TB: gram rows are 5x token positions — scan-stage fan-out, no
    join; every window partitions by doc_id (+n), so the shuffle is one
    repartition of slim (doc, n, gram-hash, start) rows. Fail-loud past
    the 128-token oracle bound via the shared suffix guard pattern."""
    docs = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tk = F.split("text", " ")
    toks = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("total"),
        F.when(
            F.size(tk) > 128,
            F.raise_error(
                F.concat(
                    F.lit("text_gopher_ngram_filter: document "),
                    F.col("doc_id").cast("string"),
                    F.lit(" exceeds the 128-token oracle bound"),
                )
            ).cast("array<string>"),
        ).otherwise(tk).alias("tk"),
    )
    pos = toks.select(
        "doc_id", "total", "tk", F.posexplode("tk").alias("p", "tok")
    )
    woff = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = pos.select(
        "doc_id",
        "total",
        "tk",
        F.col("p").cast("bigint").alias("p"),
        F.coalesce(
            F.sum(F.length("tok") + 1).over(woff), F.lit(0).cast("bigint")
        ).alias("start"),
    )
    gram_structs = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col("p") + n <= F.size("tk"),
                    F.struct(
                        F.lit(n).alias("n"),
                        F.array_join(
                            F.slice("tk", F.col("p") + 1, n), " "
                        ).alias("gram"),
                    ),
                )
                for n in (2, 3, 4, 5, 10)
            ]
        )
    )
    grams = (
        pos.select(
            "doc_id", "total", "p", "start", F.explode(gram_structs).alias("g")
        )
        .select(
            "doc_id",
            "total",
            "p",
            "start",
            F.col("g.n").alias("n"),
            F.col("g.gram").alias("gram"),
            F.length("g.gram").cast("bigint").alias("gramlen"),
        )
        .localCheckpoint(eager=False)  # feeds top-gram AND dup branches
    )
    # Branch A: top n-gram coverage for n in (2,3,4)
    topg = (
        grams.filter(F.col("n").isin(2, 3, 4))
        .groupBy("doc_id", "n", "gram", "gramlen")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wtop = Window.partitionBy("doc_id", "n").orderBy(
        F.desc("c"), F.desc("gramlen"), "gram"
    )
    topw = (
        topg.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("n") == n, F.col("c") * F.col("gramlen"))
                ).alias(f"cov{n}")
                for n in (2, 3, 4)
            ]
        )
    )
    # Branch B: duplicated n-gram char coverage (union of spans) for n in (5,10)
    occ = grams.filter(F.col("n").isin(5, 10)).select(
        "doc_id",
        "n",
        "start",
        (F.col("start") + F.col("gramlen") - 1).alias("endc"),
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id", "n", "gram"))
        .alias("cnt"),
    )
    wisl = Window.partitionBy("doc_id", "n").orderBy("start", "endc")
    prev_end = F.max("endc").over(wisl.rowsBetween(Window.unboundedPreceding, -1))
    isl = occ.filter(F.col("cnt") >= 2).select(
        "doc_id",
        "n",
        "start",
        "endc",
        F.when(F.col("start") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("brk"),
    )
    isl = isl.withColumn(
        "isl_id",
        F.sum("brk").over(wisl.rowsBetween(Window.unboundedPreceding, 0)),
    )
    cov = isl.groupBy("doc_id", "n", "isl_id").agg(
        (F.max("endc") - F.min("start") + 1).alias("clen")
    )
    dupw = cov.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("n") == n, F.col("clen")))
            .cast("bigint")
            .alias(f"dcov{n}")
            for n in (5, 10)
        ]
    )
    base = toks.select("doc_id", "total")
    out = base.join(topw, "doc_id", "left").join(dupw, "doc_id", "left")
    fr = {}
    for col, n in [("cov2", 2), ("cov3", 3), ("cov4", 4)]:
        fr[f"top{n}_frac"] = (
            F.coalesce(F.col(col), F.lit(0)).cast("double") / F.col("total")
        )
    for col, n in [("dcov5", 5), ("dcov10", 10)]:
        fr[f"dup{n}_frac"] = (
            F.coalesce(F.col(col), F.lit(0)).cast("double") / F.col("total")
        )
    keep = (
        (fr["top2_frac"] <= _TOP_THRESH[2])
        & (fr["top3_frac"] <= _TOP_THRESH[3])
        & (fr["top4_frac"] <= _TOP_THRESH[4])
        & (fr["dup5_frac"] <= _DUP_THRESH[5])
        & (fr["dup10_frac"] <= _DUP_THRESH[10])
    )
    return out.select(
        "doc_id",
        fround(fr["top2_frac"], 4).alias("top2_frac"),
        fround(fr["top3_frac"], 4).alias("top3_frac"),
        fround(fr["top4_frac"], 4).alias("top4_frac"),
        fround(fr["dup5_frac"], 4).alias("dup5_frac"),
        fround(fr["dup10_frac"], 4).alias("dup10_frac"),
        keep.alias("keep"),
    ).orderBy("doc_id")


@query(
    "text_gopher_quality_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      WHERE text IS NOT NULL
    ),
    w AS (
      SELECT doc_id, len(tk) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT)
               AS sum_len,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
               AS BIGINT) AS n_alpha,
             CAST(len(list_filter(tk, x -> x IN ('the','be','to','of','and',
                  'that','have','with'))) AS BIGINT) AS n_stop
      FROM t
    )
    SELECT doc_id, n_words,
           floor(CAST(sum_len AS DOUBLE) / n_words * 1e4 + 0.5) / 1e4
             AS mean_word_len,
           floor(CAST(n_alpha AS DOUBLE) / n_words * 1e4 + 0.5) / 1e4
             AS alpha_frac,
           n_stop,
           (n_words BETWEEN 50 AND 100000
            AND CAST(sum_len AS DOUBLE) / n_words BETWEEN 3 AND 10
            AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
            AND n_stop >= 2) AS keep
    FROM w ORDER BY doc_id
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-repetition half of the Gopher quality rules: word count in
    [50, 100k], mean word length in [3, 10], >= 80% of words contain an
    alphabetic character, and at least 2 of the 8 canonical English stop
    words present — the cheap lexical gates applied before any
    model-based scoring.

    All four statistics fold in the scan stage from one tokens split
    (higher-order aggregate expressions, no explode, no shuffle beyond
    the trivial per-doc projection); at 100 TB this is a pure map over
    the corpus with zero exchanges."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tk = F.split("text", " ")
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    n_words = F.size(tk)
    sum_len = F.aggregate(
        tk, F.lit(0).cast("bigint"), lambda s, x: s + F.length(x)
    )
    n_alpha = F.size(F.filter(tk, lambda x: x.rlike("[A-Za-z]"))).cast("bigint")
    n_stop = F.size(
        F.filter(tk, lambda x: x.isin(*stops))
    ).cast("bigint")
    base = d.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_len.alias("sum_len"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_words")
    alpha_frac = F.col("n_alpha").cast("double") / F.col("n_words")
    keep = (
        F.col("n_words").between(50, 100000)
        & mean_len.between(3, 10)
        & (alpha_frac >= 0.8)
        & (F.col("n_stop") >= 2)
    )
    return base.select(
        "doc_id",
        "n_words",
        fround(mean_len, 4).alias("mean_word_len"),
        fround(alpha_frac, 4).alias("alpha_frac"),
        "n_stop",
        keep.alias("keep"),
    ).orderBy("doc_id")
