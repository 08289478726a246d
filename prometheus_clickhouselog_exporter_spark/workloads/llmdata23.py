"""LLM-data ops, round 8 batch 2: the RAG retrieval stack — BM25
lexical scoring, reciprocal-rank fusion of two retrievers, and ranked-
retrieval quality metrics (recall@k / MRR / NDCG).

These are the three operators a retrieval-augmented pipeline runs at
corpus scale that the registry's ANN ladder (similarity_*) doesn't yet
cover: the lexical scorer that complements dense retrieval, the fusion
rule that combines the two rankings without score calibration, and the
evaluation harness that grades any retriever against an exact-search
ground truth.

Cross-engine float discipline: every per-term / per-rank floating-point
gain is quantized to integer micro-units BEFORE summation (per-cell
quantization makes each term identical in both engines; integer sums
are reduction-order-free), per the SCALE.md quantized-folds rule.

Reference parity note: /root/reference has no retrieval surface
(query.go:1-289 is log parsing); §2.3 north-star territory.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, fround, query, table

_K1, _B = 1.2, 0.75  # BM25 standard parameters
_RRF_K = 60  # Cormack et al. reciprocal-rank-fusion constant


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _q8(col):
    """Per-component int8-style quantizer (round-half-up via floor —
    identical in Spark and DuckDB), the cheap second retriever."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * 127 + F.lit(0.5)).cast("bigint"))


def _idot(a, b):
    """Integer dot product — reduction-order-free by construction."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )


_TOKS_SQL = """
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents WHERE text IS NOT NULL
"""


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len_d FROM dt GROUP BY doc_id),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len_d) AS BIGINT) AS total_len
          FROM dl),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok),
    qterms AS (
      SELECT tok, df FROM (
        SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS rk
        FROM df WHERE length(tok) >= 4
      ) WHERE rk <= 3
    ),
    contrib AS (
      SELECT dt.doc_id,
             CAST(floor(
               ln(1.0 + (n.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (dt.tf * ({_K1} + 1.0))
               / (dt.tf + {_K1} * (1.0 - {_B} + {_B} * dl.len_d
                                   / (CAST(n.total_len AS DOUBLE) / n.n_docs)))
               * 1e6 + 0.5) AS BIGINT) AS c_q
      FROM dt
      JOIN qterms q ON q.tok = dt.tok
      JOIN dl ON dl.doc_id = dt.doc_id
      CROSS JOIN n
    )
    SELECT doc_id, CAST(sum(c_q) AS BIGINT) AS bm25_q,
           CAST(row_number() OVER (ORDER BY sum(c_q) DESC, doc_id) AS BIGINT)
             AS rk
    FROM contrib GROUP BY doc_id
    ORDER BY rk LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) over the documents table for a 3-term query
    derived IN-PLAN (the 3 highest-document-frequency tokens of length
    >= 4 — deterministic, so both engines pose the same query): top-20
    documents by score. Per-(doc,term) contributions idf*tf_norm are
    quantized to integer micro-units before the per-doc sum, so the
    ranking cannot flip on float reduction order.

    100 TB: one tokenize scan feeds tf/df/length aggregates (token- and
    doc-keyed shuffles); the query-term table is 3 rows broadcast; the
    final ranking is a TakeOrderedAndProject top-20, never a global
    sort. This is the standard inverted-index-free BM25 evaluation
    shape — posting lists ARE the (tok-keyed) dt aggregate."""
    toks = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
            ).alias("tok"),
        )
        .localCheckpoint(eager=False)  # feeds tf, df, and doc-length aggregates
    )
    dt = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    dl = dt.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("len_d"))
    n = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len_d").cast("bigint").alias("total_len"),
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    qterms = (
        df.filter(F.length("tok") >= 4)
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("df"), F.col("tok")))
        )
        .filter(F.col("rk") <= 3)
        .select("tok", "df")
    )
    avglen = F.col("total_len").cast("double") / F.col("n_docs")
    contrib = (
        dt.join(F.broadcast(qterms), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.floor(
                F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (_K1 + 1.0))
                / (
                    F.col("tf")
                    + _K1 * (1.0 - _B + _B * F.col("len_d") / avglen)
                )
                * 1e6
                + F.lit(0.5)
            ).cast("bigint").alias("c_q"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("c_q").cast("bigint").alias("bm25_q"))
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25_q"), F.col("doc_id")))
            .cast("bigint"),
        )
        .filter(F.col("rk") <= 20)
        .orderBy("rk")
    )


# Shared SQL: the two retriever rankings over embeddings — A = exact
# cosine (rounded to 6, the registry's standard), B = int8-quantized
# integer dot product (reduction-order-free). Self-matches excluded.
_RANKINGS_SQL = """
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings),
pairs AS (
  SELECT q.query_id, c.vec_id,
         round(list_dot_product(q.qe, c.ce) /
               (sqrt(list_dot_product(q.qe, q.qe))
                * sqrt(list_dot_product(c.ce, c.ce))), 6) AS cosine,
         CAST(list_sum(list_transform(list_zip(q.qe, c.ce),
              x -> CAST(floor(x[1] * 127 + 0.5) AS BIGINT)
                   * CAST(floor(x[2] * 127 + 0.5) AS BIGINT))) AS BIGINT)
           AS idot
  FROM q CROSS JOIN c WHERE q.query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS BIGINT) AS ra,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY idot DESC, vec_id) AS BIGINT) AS rb
  FROM pairs
)
"""


def _rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, ra, rb): both retrievers' full rankings from
    ONE corpus×queries pass (the cosine and the integer dot ride the
    same joined row, so the corpus is scanned once)."""
    emb = fan_out(table(spark, sf_dir, "embeddings")).localCheckpoint(eager=False)
    corpus = emb.select(
        "vec_id", _as_double("embedding").alias("ce"), _q8("embedding").alias("c8")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        _as_double("embedding").alias("qe"),
        _q8("embedding").alias("q8"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    pairs = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("qe"), F.col("ce"))
                / (
                    F.sqrt(dot(F.col("qe"), F.col("qe")))
                    * F.sqrt(dot(F.col("ce"), F.col("ce")))
                ),
                6,
            ).alias("cosine"),
            _idot(F.col("q8"), F.col("c8")).alias("idot"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    wb = Window.partitionBy("query_id").orderBy(F.desc("idot"), F.col("vec_id"))
    return pairs.select(
        "query_id",
        "vec_id",
        F.row_number().over(wa).cast("bigint").alias("ra"),
        F.row_number().over(wb).cast("bigint").alias("rb"),
    )


@query(
    "similarity_rrf_fusion",
    oracle=f"""
    WITH {_RANKINGS_SQL}
    SELECT query_id, vec_id, rrf_q, rk FROM (
      SELECT query_id, vec_id,
             CAST(CASE WHEN ra <= 20
                       THEN floor(1e9 / ({_RRF_K} + ra)) ELSE 0 END
                + CASE WHEN rb <= 20
                       THEN floor(1e9 / ({_RRF_K} + rb)) ELSE 0 END
                  AS BIGINT) AS rrf_q,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY (CASE WHEN ra <= 20
                              THEN floor(1e9 / ({_RRF_K} + ra)) ELSE 0 END
                       + CASE WHEN rb <= 20
                              THEN floor(1e9 / ({_RRF_K} + rb)) ELSE 0 END) DESC,
                 vec_id) AS BIGINT) AS rk
      FROM ranked WHERE ra <= 20 OR rb <= 20
    ) WHERE rk <= 10 ORDER BY query_id, rk
    """,
)
def similarity_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher's published
    rule, k=60) of two retrievers — exact cosine and int8-quantized
    dot — each contributing its top-20: fused(d) = sum 1/(k+rank_r(d)),
    quantized as floor(1e9/(k+r)) so the sum is integer. Top-10 fused
    results per query. RRF is THE calibration-free way to merge dense
    and lexical rankings (no score normalization across retrievers).

    100 TB: both rankings come from one corpus scan (the cosine and
    integer dot ride the same broadcast-join row); the fusion itself
    touches only rank-truncated rows (<= 40 per query)."""
    ranked = _rankings(spark, sf_dir)
    gain = lambda r, lim: F.when(  # noqa: E731
        r <= lim, F.floor(F.lit(1e9) / (_RRF_K + r))
    ).otherwise(F.lit(0))
    fused = (
        ranked.filter((F.col("ra") <= 20) | (F.col("rb") <= 20))
        .select(
            "query_id",
            "vec_id",
            (gain(F.col("ra"), 20) + gain(F.col("rb"), 20))
            .cast("bigint")
            .alias("rrf_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_q"), F.col("vec_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .orderBy("query_id", "rk")
    )


@query(
    "eval_retrieval_metrics",
    oracle=f"""
    WITH {_RANKINGS_SQL},
    truth AS (SELECT query_id, vec_id FROM ranked WHERE ra <= 10),
    retr AS (SELECT query_id, vec_id, rb FROM ranked WHERE rb <= 10),
    hits AS (
      SELECT r.query_id, r.rb,
             (t.vec_id IS NOT NULL) AS rel
      FROM retr r LEFT JOIN truth t
        ON t.query_id = r.query_id AND t.vec_id = r.vec_id
    ),
    idcg AS (
      SELECT CAST(sum(CAST(floor(1e6 / log2(i + 1) + 0.5) AS BIGINT))
                  AS BIGINT) AS idcg_q
      FROM range(1, 11) t(i)
    )
    SELECT query_id,
           CAST(count_if(rel) AS BIGINT) AS n_hits,
           floor(count_if(rel) / 10.0 * 1e4 + 0.5) / 1e4 AS recall_at10,
           floor(coalesce(1.0 / min(CASE WHEN rel THEN rb END), 0.0) * 1e6
                 + 0.5) / 1e6 AS mrr_at10,
           floor(CAST(sum(CASE WHEN rel
                     THEN CAST(floor(1e6 / log2(rb + 1) + 0.5) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
                 / (SELECT idcg_q FROM idcg) * 1e6 + 0.5) / 1e6 AS ndcg_at10
    FROM hits GROUP BY query_id ORDER BY query_id
    """,
)
def eval_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval quality metrics — recall@10, MRR@10, NDCG@10
    (binary relevance) — grading the int8-quantized retriever against
    exact-cosine top-10 ground truth, per query. Position gains
    1/log2(i+1) are quantized to integer micro-units before the DCG
    sum; IDCG is the same 10-term quantized sum, so NDCG is a ratio of
    integers.

    This is the evaluation harness every ANN rung in the registry can
    be graded by (swap retriever B); the certify_topk_bound family
    bounds score ERROR, this measures rank-quality the way IR does.

    100 TB: ground truth on a sampled query set (here 8 queries) is the
    standard practice; everything after the two rankings is rank-
    truncated (<= 10 rows per query)."""
    ranked = _rankings(spark, sf_dir)
    truth = ranked.filter(F.col("ra") <= 10).select(
        "query_id", F.col("vec_id").alias("t_vec")
    )
    retr = ranked.filter(F.col("rb") <= 10).select("query_id", "vec_id", "rb")
    hits = retr.join(
        truth,
        (retr["query_id"] == truth["query_id"]) & (retr["vec_id"] == truth["t_vec"]),
        "left",
    ).select(
        retr["query_id"],
        "rb",
        truth["t_vec"].isNotNull().alias("rel"),
    )
    # IDCG@10 = sum of the same quantized gains at ranks 1..10 (constant)
    idcg_q = sum(int(1e6 / math.log2(i + 1) + 0.5) for i in range(1, 11))
    gain_q = F.floor(F.lit(1e6) / F.log2(F.col("rb") + 1) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.count_if(F.col("rel")).cast("bigint").alias("n_hits"),
            fround(F.count_if(F.col("rel")) / F.lit(10.0), 4).alias("recall_at10"),
            fround(
                F.coalesce(
                    F.lit(1.0) / F.min(F.when(F.col("rel"), F.col("rb"))),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr_at10"),
            fround(
                F.sum(F.when(F.col("rel"), gain_q).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.lit(float(idcg_q)),
                6,
            ).alias("ndcg_at10"),
        )
        .orderBy("query_id")
    )
