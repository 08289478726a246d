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

from .core import fround, md5_long, query, table


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


@query(
    "similarity_mmr_diversified",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, c.vec_id,
             floor(list_dot_product(q.qe, c.e)
                   / (sqrt(list_dot_product(q.qe, q.qe))
                      * sqrt(list_dot_product(c.e, c.e))) * 1e6 + 0.5) / 1e6
               AS rel
      FROM q CROSS JOIN c WHERE q.query_id <> c.vec_id
    ),
    cands AS MATERIALIZED (
      SELECT query_id, vec_id, rel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rel DESC, vec_id) AS rk
      FROM scored
    ),
    top AS MATERIALIZED (SELECT * FROM cands WHERE rk <= 10),
    sims AS MATERIALIZED (
      SELECT a.query_id, a.vec_id AS i, b.vec_id AS j,
             floor(list_dot_product(ca.e, cb.e)
                   / (sqrt(list_dot_product(ca.e, ca.e))
                      * sqrt(list_dot_product(cb.e, cb.e))) * 1e6 + 0.5) / 1e6
               AS sim
      FROM top a JOIN top b
        ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
      JOIN c ca ON ca.vec_id = a.vec_id
      JOIN c cb ON cb.vec_id = b.vec_id
    ),
    s1 AS MATERIALIZED (
      SELECT query_id, vec_id AS s1_id, rel AS rel1 FROM top WHERE rk = 1
    ),
    st2 AS MATERIALIZED (
      SELECT t.query_id, t.vec_id, t.rel,
             0.7 * t.rel - 0.3 * s.sim AS score
      FROM top t
      JOIN s1 ON s1.query_id = t.query_id AND t.vec_id <> s1.s1_id
      JOIN sims s ON s.query_id = t.query_id AND s.i = t.vec_id
                 AND s.j = s1.s1_id
    ),
    s2 AS MATERIALIZED (
      SELECT query_id, vec_id AS s2_id, score AS score2 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, vec_id) AS r
        FROM st2) WHERE r = 1
    ),
    st3 AS (
      SELECT t.query_id, t.vec_id, t.rel,
             0.7 * t.rel - 0.3 * greatest(sa.sim, sb.sim) AS score
      FROM top t
      JOIN s1 ON s1.query_id = t.query_id AND t.vec_id <> s1.s1_id
      JOIN s2 ON s2.query_id = t.query_id AND t.vec_id <> s2.s2_id
      JOIN sims sa ON sa.query_id = t.query_id AND sa.i = t.vec_id
                  AND sa.j = s1.s1_id
      JOIN sims sb ON sb.query_id = t.query_id AND sb.i = t.vec_id
                  AND sb.j = s2.s2_id
    ),
    s3 AS (
      SELECT query_id, vec_id AS s3_id, score AS score3 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, vec_id) AS r
        FROM st3) WHERE r = 1
    )
    SELECT query_id, pos, nbr_id,
           floor(score * 1e6 + 0.5) / 1e6 AS mmr_score
    FROM (
      SELECT s1.query_id, 1 AS pos, s1.s1_id AS nbr_id,
             0.7 * s1.rel1 AS score FROM s1
      UNION ALL
      SELECT query_id, 2, s2_id, score2 FROM s2
      UNION ALL
      SELECT query_id, 3, s3_id, score3 FROM s3
    ) ORDER BY query_id, pos
    """,
)
def similarity_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell-Goldstein) diversified
    retrieval, 3 selections unrolled: greedily pick argmax of
    0.7·relevance − 0.3·max-similarity-to-already-selected from the
    top-10 cosine candidates — the de-duplicating re-ranker retrieval
    and data-curation pipelines run so the k results aren't k copies.
    Relevance and pairwise sims quantize (1e-6) BEFORE the argmax
    compares, so selection can't flip on a last-ulp libm divergence;
    each greedy step is a per-query WindowGroupLimit over the bounded
    candidate frame.

    100 TB: candidates come from any ANN rung (here exact top-10);
    pairwise sims are |queries|·k² rows; each MMR step is one keyed
    join + one per-query top-1 window. k steps = k joins — fine for
    re-ranking k's (5-50), never corpus-scale."""
    from ..operators.similarity import cosine_topk, dot, normalize

    emb = table(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    qdf = emb.filter(F.col("vec_id") < 8)
    cands = cosine_topk(emb, qdf, "embedding", "vec_id", "vec_id", k=10)
    top = cands.select(
        "query_id", "nbr_id", fround(F.col("cosine"), 6).alias("rel")
    ).localCheckpoint(eager=False)  # 3 greedy steps re-read it
    cn = emb.select(
        F.col("vec_id").alias("_id"), normalize(F.col("embedding")).alias("_v")
    )
    a = top.select("query_id", F.col("nbr_id").alias("i")).join(
        cn.withColumnRenamed("_id", "i").withColumnRenamed("_v", "_vi"), "i"
    )
    b = top.select(F.col("query_id").alias("_qb"), F.col("nbr_id").alias("j")).join(
        cn.withColumnRenamed("_id", "j").withColumnRenamed("_v", "_vj"), "j"
    )
    sims = (
        a.join(b, (F.col("_qb") == F.col("query_id")) & (F.col("i") != F.col("j")))
        .select(
            "query_id",
            "i",
            "j",
            fround(dot(F.col("_vi"), F.col("_vj")), 6).alias("sim"),
        )
        .localCheckpoint(eager=False)  # step-2 and both step-3 joins
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id")
    s1 = (
        top.withColumn(
            "r", F.row_number().over(wq.orderBy(F.desc("rel"), "nbr_id"))
        )
        .filter(F.col("r") == 1)
        .select("query_id", F.col("nbr_id").alias("s1_id"), F.col("rel").alias("rel1"))
    )
    s2s = sims.select(
        F.col("query_id").alias("_q2"),
        F.col("i").alias("_i2"),
        F.col("j").alias("_j2"),
        F.col("sim").alias("_sim0"),
    )
    st2 = (
        top.join(s1, "query_id")
        .filter(F.col("nbr_id") != F.col("s1_id"))
        .join(
            s2s,
            (F.col("_q2") == F.col("query_id"))
            & (F.col("_i2") == F.col("nbr_id"))
            & (F.col("_j2") == F.col("s1_id")),
        )
        .select("query_id", "nbr_id", "rel", "s1_id",
                (0.7 * F.col("rel") - 0.3 * F.col("_sim0")).alias("score"))
    )
    s2 = (
        st2.withColumn(
            "r", F.row_number().over(wq.orderBy(F.desc("score"), "nbr_id"))
        )
        .filter(F.col("r") == 1)
        .select("query_id", F.col("nbr_id").alias("s2_id"), F.col("score").alias("score2"))
    )
    sa = sims.select(F.col("query_id").alias("_q3"), F.col("i").alias("_i3"),
                     F.col("j").alias("_j3"), F.col("sim").alias("_sim1"))
    sb = sims.select(F.col("query_id").alias("_q4"), F.col("i").alias("_i4"),
                     F.col("j").alias("_j4"), F.col("sim").alias("_sim2"))
    st3 = (
        top.join(s1, "query_id")
        .join(s2, "query_id")
        .filter((F.col("nbr_id") != F.col("s1_id")) & (F.col("nbr_id") != F.col("s2_id")))
        .join(sa, (F.col("_q3") == F.col("query_id")) & (F.col("_i3") == F.col("nbr_id"))
              & (F.col("_j3") == F.col("s1_id")))
        .join(sb, (F.col("_q4") == F.col("query_id")) & (F.col("_i4") == F.col("nbr_id"))
              & (F.col("_j4") == F.col("s2_id")))
        .select("query_id", "nbr_id", "rel",
                (0.7 * F.col("rel") - 0.3 * F.greatest("_sim1", "_sim2")).alias("score"))
    )
    s3 = (
        st3.withColumn(
            "r", F.row_number().over(wq.orderBy(F.desc("score"), "nbr_id"))
        )
        .filter(F.col("r") == 1)
        .select("query_id", F.col("nbr_id").alias("s3_id"), F.col("score").alias("score3"))
    )
    out = (
        s1.select("query_id", F.lit(1).alias("pos"), F.col("s1_id").alias("nbr_id"),
                  (0.7 * F.col("rel1")).alias("score"))
        .unionByName(s2.select("query_id", F.lit(2).alias("pos"),
                               F.col("s2_id").alias("nbr_id"),
                               F.col("score2").alias("score")))
        .unionByName(s3.select("query_id", F.lit(3).alias("pos"),
                               F.col("s3_id").alias("nbr_id"),
                               F.col("score3").alias("score")))
    )
    return out.select(
        "query_id", "pos", "nbr_id", fround(F.col("score"), 6).alias("mmr_score")
    ).orderBy("query_id", "pos")


@query(
    "layout_rendezvous_assignment",
    oracle="""
    WITH shards AS (SELECT unnest(range(0, 9)) AS s),
    scored AS (
      SELECT d.doc_id, s.s,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                       || CAST(s.s AS VARCHAR)), 1, 12))
                  AS UBIGINT) AS h
      FROM documents d, shards s
    ),
    at8 AS (
      SELECT doc_id, max_by(s, h * 16 + s) AS shard8 FROM scored
      WHERE s < 8 GROUP BY doc_id
    ),
    at9 AS (
      SELECT doc_id, max_by(s, h * 16 + s) AS shard9 FROM scored GROUP BY doc_id
    ),
    j AS MATERIALIZED (
      SELECT a8.doc_id, a8.shard8, a9.shard9,
             a8.shard8 <> a9.shard9 AS moved
      FROM at8 a8 JOIN at9 a9 ON a9.doc_id = a8.doc_id
    ),
    summary AS (
      SELECT CAST(count_if(moved) AS BIGINT) AS n_moved,
             floor(CAST(count_if(moved) AS DOUBLE) / count(*) * 1e6 + 0.5)
               / 1e6 AS moved_frac,
             CAST(count_if(moved AND shard9 <> 8) AS BIGINT)
               AS n_moved_elsewhere
      FROM j
    )
    SELECT g.shard9 AS shard,
           CAST(count(*) AS BIGINT) AS n_at9,
           CAST(count_if(NOT g.moved) AS BIGINT) AS n_stable,
           s.n_moved, s.moved_frac,
           s.n_moved_elsewhere = 0 AS moves_only_into_new
    FROM j g, summary s
    GROUP BY g.shard9, s.n_moved, s.moved_frac, s.n_moved_elsewhere
    ORDER BY shard
    """,
)
def layout_rendezvous_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing — the consistent
    shard-assignment scheme a 100 TB ingestion layer uses so growing
    the fleet doesn't reshuffle the world: shard(doc) = argmax over
    shards of hash(doc, shard). Computed at N=8 and N=9 in one scan;
    the defining guarantee is certified as a literal boolean — every
    document that moves when shard 8 joins moves INTO shard 8 (HRW's
    minimal-disruption property: an argmax can only change when the NEW
    candidate wins), and the moved fraction lands near 1/9.

    100 TB: per-doc work is |shards| hash evaluations in-row (the
    explode is in-plan, never a shuffle); assignment needs no
    coordination state at all — the property that makes HRW the
    stateless alternative to ring-based consistent hashing."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    shards = F.explode(F.sequence(F.lit(0), F.lit(8))).alias("s")
    scored = d.select("doc_id", shards).select(
        "doc_id",
        "s",
        md5_long(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("s").cast("string"))
        ).alias("h"),
    )
    at8 = (
        scored.filter(F.col("s") < 8)
        .groupBy("doc_id")
        .agg(F.max_by("s", F.col("h") * 16 + F.col("s")).alias("shard8"))
    )
    at9 = scored.groupBy("doc_id").agg(
        F.max_by("s", F.col("h") * 16 + F.col("s")).alias("shard9")
    )
    j = (
        at8.join(at9, "doc_id")
        .withColumn("moved", F.col("shard8") != F.col("shard9"))
        .localCheckpoint(eager=False)  # summary + per-shard fold
    )
    summary = j.agg(
        F.count_if(F.col("moved")).cast("bigint").alias("n_moved"),
        fround(
            F.count_if(F.col("moved")).cast("double") / F.count(F.lit(1)), 6
        ).alias("moved_frac"),
        F.count_if(F.col("moved") & (F.col("shard9") != 8))
        .cast("bigint")
        .alias("n_moved_elsewhere"),
    )
    return (
        j.groupBy(F.col("shard9").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_at9"),
            F.count_if(~F.col("moved")).cast("bigint").alias("n_stable"),
        )
        .crossJoin(F.broadcast(summary))
        .select(
            "shard",
            "n_at9",
            "n_stable",
            "n_moved",
            "moved_frac",
            (F.col("n_moved_elsewhere") == 0).alias("moves_only_into_new"),
        )
        .orderBy("shard")
    )
