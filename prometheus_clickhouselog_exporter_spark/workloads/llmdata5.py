"""LLM-data batch, round 3 batch 4: Matryoshka-truncation recall.

Embedding pipelines routinely truncate Matryoshka-style embeddings to
cut index cost; the decision input is "how much of the full-dimension
neighborhood survives at k dims". This measures it exactly: top-10
overlap and the truncated rank of the full-dimension top-1 neighbor,
per query. Same cross-engine machinery as similarity_cosine_topk
(sequential-fold dot product + round-6 + vec_id tiebreak — the
precedent that hashes exactly vs DuckDB's list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import ANN_CERT_ORACLE, corpus_key, fan_out, query, table


@query(
    "embedding_matryoshka_overlap",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  round(list_dot_product(q.qe, c.ce) /
                        (sqrt(list_dot_product(q.qe, q.qe)) *
                         sqrt(list_dot_product(c.ce, c.ce))), 6) AS cos_full,
                  round(list_dot_product(q.qe[1:16], c.ce[1:16]) /
                        (sqrt(list_dot_product(q.qe[1:16], q.qe[1:16])) *
                         sqrt(list_dot_product(c.ce[1:16], c.ce[1:16]))), 6)
                    AS cos_trunc
           FROM q CROSS JOIN c
           WHERE q.query_id <> c.vec_id
         ),
         ranked AS (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_full DESC, vec_id)
                    AS rk_full,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_trunc DESC, vec_id)
                    AS rk_trunc
           FROM scored
         )
    SELECT query_id,
           CAST(count_if(rk_full <= 10 AND rk_trunc <= 10) AS BIGINT)
             AS n_overlap,
           max(CASE WHEN rk_full = 1 THEN rk_trunc END) AS top1_trunc_rank
    FROM ranked GROUP BY query_id
    """,
)
def embedding_matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall: score every (query, candidate) pair
    with BOTH the full 64-dim cosine and the first-16-dims cosine in ONE
    corpus pass, rank both per query, and report the top-10 overlap plus
    where the true (full-dim) nearest neighbor lands in the truncated
    ranking. n_overlap near 10 ⇒ the 16-dim prefix index is safe;
    top1_trunc_rank bounds the re-rank window a truncated first stage
    needs.

    Determinism: both cosines are sequential-fold dot products rounded
    to 6 digits with vec_id tiebreaks — the exact recipe
    similarity_cosine_topk already hash-matches DuckDB with.

    100 TB: queries broadcast; the corpus is scanned ONCE and both
    scores ride the same row (no second pass for the truncated index —
    slice the array in place). The rank windows partition by query_id
    (one shuffle of (query, vec_id, 2 floats) — vectors dropped before
    the exchange); per-query candidate sets are corpus-sized, so the
    production shape truncates candidates with a coarse filter first
    (LSH/IVF from operators/similarity.py) and this operator becomes
    the re-rank + evaluation kernel.
    """
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = emb.select("vec_id", as_double.alias("ce"))
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), as_double.alias("qe")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    def cos(a, b):
        return F.round(dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 6)

    qe16 = F.slice(F.col("qe"), 1, 16)
    ce16 = F.slice(F.col("ce"), 1, 16)
    scored = corpus.join(
        F.broadcast(queries), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        "vec_id",
        cos(F.col("qe"), F.col("ce")).alias("cos_full"),
        cos(qe16, ce16).alias("cos_trunc"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cos_full").desc(), "vec_id")
    wt = Window.partitionBy("query_id").orderBy(F.col("cos_trunc").desc(), "vec_id")
    ranked = scored.select(
        "query_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wt).alias("rk_trunc"),
    )
    return ranked.groupBy("query_id").agg(
        F.count_if((F.col("rk_full") <= 10) & (F.col("rk_trunc") <= 10)).alias(
            "n_overlap"
        ),
        F.max(F.when(F.col("rk_full") == 1, F.col("rk_trunc"))).alias(
            "top1_trunc_rank"
        ),
    )


@query(
    "quantile_cont_doclen",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.50) AS p50,
           quantile_cont(n_chars, 0.90) AS p90,
           count(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def quantile_cont_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous (interpolated) quantiles per language — completes the
    quantile family: discrete-by-rank (quantile_disc_doclen), GK sketch
    (sketch_quantile_tokens), and now the linear-interpolation exact
    form both engines define identically (pos = (n−1)·p, v_lo +
    frac·(v_hi−v_lo)).

    No rounding anywhere: inputs are integers, interpolation is one
    subtraction/multiply/add on exact doubles — the engines reproduce
    each other to the last ulp (verified including the 7.9000…01
    artifact at p90 of {1,2,3,10}). Selection has no reduction-order
    hazard, unlike sums.

    100 TB: exact percentile sorts within groups (bounded group count —
    languages); the unbounded-group path is the mergeable
    percentile_approx sketch twin. One exchange by lang.
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.25)).alias("p25"),
        F.percentile("n_chars", F.lit(0.50)).alias("p50"),
        F.percentile("n_chars", F.lit(0.90)).alias("p90"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query("similarity_graph_expand_topk", oracle=ANN_CERT_ORACLE)
def similarity_graph_expand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-expansion ANN: weak LSH candidates + one hop over a
    bucket-built kNN graph, exact cosine re-rank of the union — the
    HNSW/NN-descent neighbor-expansion idea in batch form. Measured
    recall at defaults: base 31-49% → expanded 79-91% (2-2.5× lift from
    an id-only join; pinned in tests/test_llmdata2.py).

    Emitted as the certify_topk_bound certificate: every returned
    neighbor's true cosine within ε=0.10 of the exact 10th-best
    (measured worst margin 0.036 across 3 SFs — the expansion hop makes
    this the tightest approximate rung after LSH). Formerly rows-only
    (seeded numpy projections have no SQL equivalent); the oracle now
    value-hashes the certificate.
    """
    from ..operators.similarity import certify_topk_bound, graph_expand_topk

    # r14: fan_out removed -- driver-regressed ANN ladder rung; see the
    # rationale comment at similarity_lsh_topk (llmdata.py) and
    # OPTIMIZATION_r14.md.
    emb = table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=False
    )  # scan once: ANN op + certifier exact/rescore reuse it
    queries_df = emb.filter(F.col("vec_id") < 8)
    ap = graph_expand_topk(
        emb, queries_df, "embedding", "vec_id", "vec_id", k=10,
        train_cache_key=corpus_key(sf_dir, "embeddings"),
    )
    return certify_topk_bound(emb, ap, "embedding", "vec_id", queries_df, "vec_id", k=10, eps=0.10)
