"""Round 7 batch 9: iterative proportional fitting (raking) and
token-sort-ratio fuzzy matching.

IPF/raking is the survey-statistics standard for reweighting a sample
to known margins — the operation a dataset-mixing pipeline runs when
the corpus' (source × lang) cell counts must hit target shares without
per-cell targets. Two scaling sweeps unroll as plain joins over the
bounded cell table; every scale factor is a ratio of exact counts, so
the fit is engine-invariant. Token-sort-ratio is fuzzywuzzy/rapidfuzz's
signature scorer (sort the tokens, then Levenshtein ratio) — the
word-order-insensitive member the ER family's fuzzy join lacked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "sample_raking_ipf",
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(DISTINCT source) AS BIGINT) AS ns,
                   CAST(count(DISTINCT lang) AS BIGINT) AS nl
            FROM cells),
    -- every sweep's denominator folds integer-quantized summands
    -- (floor(n*w*1e6 + .5) as BIGINT), so no float sum's reduction
    -- order is on the hash path (the quantized-folds rule)
    r1 AS MATERIALIZED (
      SELECT c.source, c.lang, c.n,
             1.0 * ((CAST(t.nt AS DOUBLE) / t.ns)
               / (sum(CAST(floor(c.n * 1.0 * 1e6 + 0.5) AS BIGINT))
                    OVER (PARTITION BY c.source) / 1e6)) AS w
      FROM cells c, tot t
    ),
    c1 AS MATERIALIZED (
      SELECT r.source, r.lang, r.n,
             r.w * ((SELECT CAST(nt AS DOUBLE) / nl FROM tot)
                    / (sum(CAST(floor(r.n * r.w * 1e6 + 0.5) AS BIGINT))
                         OVER (PARTITION BY r.lang) / 1e6)) AS w
      FROM r1 r
    ),
    r2 AS MATERIALIZED (
      SELECT c.source, c.lang, c.n,
             c.w * ((SELECT CAST(nt AS DOUBLE) / ns FROM tot)
                    / (sum(CAST(floor(c.n * c.w * 1e6 + 0.5) AS BIGINT))
                         OVER (PARTITION BY c.source) / 1e6)) AS w
      FROM c1 c
    ),
    c2 AS (
      SELECT r.source, r.lang, r.n,
             r.w * ((SELECT CAST(nt AS DOUBLE) / nl FROM tot)
                    / (sum(CAST(floor(r.n * r.w * 1e6 + 0.5) AS BIGINT))
                         OVER (PARTITION BY r.lang) / 1e6)) AS w
      FROM r2 r
    )
    SELECT source, lang, n AS n_docs,
           floor(w * 1e6 + 0.5) / 1e6 AS weight,
           floor(n * w * 1e4 + 0.5) / 1e4 AS weighted_docs
    FROM c2 ORDER BY source, lang
    """,
)
def sample_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the (source × lang)
    cell table to UNIFORM source and lang margins — two full sweeps
    (row-scale, col-scale) unrolled, the Deming-Stephan procedure every
    survey-weighting and dataset-mixing stack implements. After sweep 2
    the lang margins are exact and source margins are within the
    IPF convergence gap (pinned in tests); every sweep's margin
    denominator folds INTEGER-quantized summands (exact BIGINT window
    sums), so no float reduction order touches the hash and both
    engines land on identical doubles.

    100 TB: the sweeps run on the |sources × langs| CELL table (never
    per document — map-side counts first); applying the final weights
    to documents is one broadcast join. Margin windows partition by
    source/lang over the bounded cell frame."""
    cells = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # 4 sweep passes re-read it
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count_distinct("source").cast("bigint").alias("ns"),
        F.count_distinct("lang").cast("bigint").alias("nl"),
    )
    from pyspark.sql import Window

    w = cells.crossJoin(F.broadcast(tot)).withColumn("w", F.lit(1.0))

    def sweep(df: DataFrame, key: str, parts: str) -> DataFrame:
        target = F.col("nt").cast("double") / F.col(parts)
        # denominator folds integer-quantized summands — exact BIGINT
        # sum, so partition order can't perturb a bit (quantized-folds)
        denom = (
            F.sum(
                F.floor(F.col("n") * F.col("w") * 1e6 + F.lit(0.5)).cast("long")
            ).over(
                Window.partitionBy(key).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            / 1e6
        )
        return df.withColumn("w", F.col("w") * (target / denom))

    # iteration 1 row sweep folds the initial w=1 in: target/row_total
    out = sweep(w, "source", "ns")
    out = sweep(out, "lang", "nl")
    out = sweep(out, "source", "ns")
    out = sweep(out, "lang", "nl")
    return out.select(
        "source",
        "lang",
        F.col("n").alias("n_docs"),
        fround(F.col("w"), 6).alias("weight"),
        fround(F.col("n") * F.col("w"), 4).alias("weighted_docs"),
    ).orderBy("source", "lang")


@query(
    "er_token_sort_ratio_pairs",
    oracle="""
    WITH nm AS (
      SELECT DISTINCT p_name, string_split(p_name, ' ')[2] AS blk,
             array_to_string(list_sort(string_split(p_name, ' ')), ' ')
               AS sorted_name
      FROM part
    ),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(floor((1.0 - CAST(levenshtein(a.sorted_name, b.sorted_name)
                                    AS DOUBLE)
                               / greatest(length(a.sorted_name),
                                          length(b.sorted_name)))
                        * 100 * 1e4 + 0.5) / 1e4 AS DOUBLE) AS ratio
      FROM nm a JOIN nm b ON a.blk = b.blk AND a.p_name < b.p_name
    )
    SELECT name_a, name_b, ratio FROM pairs
    WHERE ratio >= 80.0
    ORDER BY ratio DESC, name_a, name_b LIMIT 50
    """,
)
def er_token_sort_ratio_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fuzzywuzzy/rapidfuzz ``token_sort_ratio``: sort each name's
    tokens, join, then 100·(1 − levenshtein/max_len) — the scorer that
    treats 'coral lemon plum' and 'plum coral lemon' as identical,
    which raw Levenshtein (the ER family's existing fuzzy join) scores
    as distant. Blocked candidate pairs, threshold 80, top-50 report.

    100 TB: token-sort is an in-row array_sort (no shuffle); pairs stay
    block-bounded; the Levenshtein cost matrix is per-pair bounded by
    name length. Quantized (1e-4) before the threshold compare."""
    nm = (
        table(spark, sf_dir, "part")
        .select(
            "p_name",
            F.split("p_name", " ").getItem(1).alias("blk"),
            F.array_join(F.array_sort(F.split("p_name", " ")), " ").alias(
                "sorted_name"
            ),
        )
        .distinct()
    )
    a = nm.select(
        F.col("p_name").alias("name_a"),
        "blk",
        F.col("sorted_name").alias("sa"),
    )
    b = nm.select(
        F.col("p_name").alias("name_b"),
        F.col("blk").alias("blk_b"),
        F.col("sorted_name").alias("sb"),
    )
    ratio = fround(
        (
            1.0
            - F.levenshtein("sa", "sb").cast("double")
            / F.greatest(F.length("sa"), F.length("sb"))
        )
        * 100,
        4,
    )
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .select("name_a", "name_b", ratio.alias("ratio"))
        .filter(F.col("ratio") >= 80.0)
        .orderBy(F.desc("ratio"), "name_a", "name_b")
        .limit(50)
    )
