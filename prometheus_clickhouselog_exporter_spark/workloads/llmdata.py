"""LLM-training-data pipeline operators over documents/embeddings
(SURVEY §2.3): dedup, similarity search, text analysis.

Scale doctrine: every operator here must avoid the O(n²) trap — exact dedup
is a hash aggregate; near-dup goes through blocking (inverted index / LSH
bands) so the pair space is candidate pairs, not the cross product;
similarity search has a brute-force oracle-checkable baseline and an
LSH-bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import fround, query, table


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep lowest doc_id.

    100 TB: group on the 128-bit digest, never the text — the shuffle
    carries 16 bytes + id per row instead of document bodies.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("h")
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(*)                                             AS n_docs,
           sum(len(string_split(text, ' ')))                    AS total_tokens,
           floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000              AS avg_tokens,
           floor(CAST(sum(n_chars) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000              AS avg_chars,
           max(len(string_split(text, ' ')))                    AS max_tokens
    FROM documents
    GROUP BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-language corpus stats (whitespace tokenizer).

    100 TB: `size(split())` is evaluated in the scan stage; the shuffle is
    5 language groups of partial aggregates.
    """
    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    n = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        n.alias("n_docs"),
        F.sum(ntok).alias("total_tokens"),
        fround(F.sum(ntok).cast("double") / n, 4).alias("avg_tokens"),
        fround(F.sum("n_chars").cast("double") / n, 4).alias("avg_chars"),
        F.max(ntok).alias("max_tokens"),
    )


@query(
    "similarity_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
         scored AS (
           SELECT q.query_id, c.vec_id, c.label,
                  round(list_dot_product(q.qe, c.ce) /
                        (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))), 6)
                    AS cosine
           FROM q CROSS JOIN c
           WHERE q.query_id <> c.vec_id
         )
    SELECT query_id, vec_id, label, cosine, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rk
          FROM scored)
    WHERE rk <= 10
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the corpus.

    The dot product is a pure expression (`zip_with` + `aggregate`) in
    double precision — no UDF. 100 TB: queries broadcast, corpus scanned
    once, per-partition top-k via the row_number window (WindowGroupLimit
    pushes the limit below the shuffle). The LSH-bucketed variant
    (`similarity_lsh_topk`, operators/similarity.py) is the scale path when
    the query set itself is large.
    """
    emb = table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = emb.select(F.col("vec_id"), F.col("label"), as_double.alias("ce"))
    queries = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), as_double.alias("qe"))
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)

    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qe"), F.col("ce"))
                / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ce"), F.col("ce")))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", "label", "cosine")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )
