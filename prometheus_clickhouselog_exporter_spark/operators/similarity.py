"""Similarity search over embedding columns (SURVEY §2.3).

Two tiers:
- ``cosine_topk`` — exact brute force: broadcast the query set, scan the
  corpus once, per-group top-k window. The correctness baseline, and the
  right plan whenever |queries| is small.
- ``lsh_bucketed_topk`` — random-hyperplane LSH (signed projections) for
  corpus-scale query sets: both sides hash to sign-pattern buckets, the
  join is an equi-join on bucket, exact cosine re-ranks within buckets.
  Projections are generated from a fixed seed on the driver and applied by
  an Arrow-vectorized Pandas UDF (one matrix multiply per batch — the one
  place where numpy genuinely beats per-element expressions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def normalize(col: Column) -> Column:
    v = as_double(col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
    return F.transform(v, lambda x: x / norm)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (broadcast queries)."""
    c = corpus.select(F.col(id_col).alias("nbr_id"), normalize(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), normalize(F.col(vec_col)).alias("_qv"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("nbr_id"))
        .withColumn("cosine", dot(F.col("_qv"), F.col("_cv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nbr_id", "cosine", "rk")
    )


def _sign_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int, n_probe: int = 0):
    """Pandas UDF: embedding → array of LSH bucket ids, one per hash table.

    Multi-table LSH is what makes sign-random-projection usable: a single
    k-bit table's collision probability at angle θ is (1−θ/π)^k (≈9% for
    k=6 at 60°); unioning L independent tables lifts per-neighbor recall
    to 1−(1−p)^L. The table index is encoded into the bucket id, so the
    downstream join is a single equi-join after explode.

    The projection tensor derives from ``seed`` identically in every task
    (numpy default_rng is deterministic) — no broadcast variable needed,
    and task retries replay identically.
    """
    planes = np.random.default_rng(seed).standard_normal((n_tables, dim, n_planes))
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        outs = []
        for t in range(n_tables):
            proj = m @ planes[t]  # (batch, n_planes)
            base = ((proj > 0) @ weights) + (t << n_planes)
            outs.append(base)
            if n_probe:
                # multi-probe: also emit the buckets reached by flipping
                # the lowest-|margin| sign bits — the neighbors a vector
                # most plausibly landed in instead.
                order = np.argsort(np.abs(proj), axis=1)
                for p in range(min(n_probe, n_planes)):
                    outs.append(base ^ weights[order[:, p]])
        return pd.Series(list(np.stack(outs, axis=1)))

    return buckets


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 24,
    n_probe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: explode per-table sign-buckets, equi-join on
    bucket id, dedup candidates, exact cosine re-rank.

    Defaults are recall-biased: 24 tables × 3 probes measures 98.8% top-10
    recall vs brute force on the sf0.001 corpus (pinned ≥0.9 in
    tests/test_llmdata.py); drop n_tables/n_probe for speed-biased setups.

    100 TB: the corpus is hashed once (Arrow batches) and shuffled once on
    bucket id; candidates per query ≈ L × (1+n_probe) × corpus/2^k,
    tunable via (n_planes ↑ precision, n_tables / n_probe ↑ recall).
    Multi-probe flips the query's lowest-margin sign bits — extra probes
    cost only query-side explode rows, never corpus re-hashing.
    """
    c_buckets = _sign_buckets_udf(dim, n_planes, n_tables, seed)
    q_buckets = _sign_buckets_udf(dim, n_planes, n_tables, seed, n_probe=n_probe)
    c_base = corpus.select(F.col(id_col).alias("nbr_id"), normalize(F.col(vec_col)).alias("_cv"))
    q_base = queries.select(
        F.col(query_id_col).alias("query_id"), normalize(F.col(vec_col)).alias("_qv")
    )
    # Bucket join + dedup carry ONLY ids — the float vectors never ride the
    # candidate-dedup shuffle (at 100 TB the exploded candidate stream is
    # L×(1+probe)× the corpus; shipping 64 doubles per row there dominates).
    # Vectors rejoin once per *distinct* candidate pair afterwards.
    c_ids = c_base.withColumn("_bucket", F.explode(c_buckets(F.col("_cv")))).select(
        "nbr_id", "_bucket"
    )
    q_ids = q_base.withColumn("_bucket", F.explode(q_buckets(F.col("_qv")))).select(
        "query_id", "_bucket"
    )
    pairs = (
        c_ids.join(q_ids, ["_bucket"])
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .dropDuplicates(["query_id", "nbr_id"])
    )
    cands = pairs.join(c_base, "nbr_id").join(q_base, "query_id")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        cands.withColumn("cosine", dot(F.col("_qv"), F.col("_cv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nbr_id", "cosine", "rk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    each corpus vector assigned to its nearest centroid cell, each query
    probing its ``n_probe`` nearest cells, exact cosine re-rank inside.

    The quantizer is MLlib KMeans with a fixed seed (deterministic); the
    centroid matrix is tiny and rides into an Arrow-batched assignment UDF.
    100 TB: training samples the corpus; assignment is one scan; the probe
    join shuffles on cell id, touching n_probe/n_centroids of the corpus
    per query — the standard FAISS-style recall/cost dial.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c_norm = corpus.select(F.col(id_col).alias("nbr_id"), normalize(F.col(vec_col)).alias("_cv"))
    # Quantizer trains on a bounded sample, never the full corpus: ~256
    # vectors/centroid (the FAISS guideline), selected by ordering on a
    # seeded hash of the id and taking the first max_train rows. That plans
    # as TakeOrderedAndProject — per-partition top-K + one merge, a SINGLE
    # scan — so there is no count() prerequisite job and no full-sort
    # shuffle, yet the sample is uniform (hash order ⊥ storage order) and
    # deterministic across retries. At 100 TB KMeans still sees ≤max_train.
    max_train = max(2048, 256 * n_centroids)
    train = (
        c_norm.orderBy(F.xxhash64(F.col("nbr_id"), F.lit(seed)))
        .limit(max_train)
        .select(array_to_vector(F.col("_cv")).alias("features"))
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(train)
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])  # (C, dim)

    def cell_udf(n_cells: int):
        @F.pandas_udf("array<int>")
        def cells(vecs: pd.Series) -> pd.Series:
            m = np.vstack(vecs.to_numpy())
            sims = m @ centroids.T  # cosine order == dot order (all normalized-ish)
            order = np.argsort(-sims, axis=1)[:, :n_cells].astype(np.int32)
            return pd.Series(list(order))

        return cells

    assigned = c_norm.withColumn("_cell", F.element_at(cell_udf(1)(F.col("_cv")), 1))
    probed = (
        queries.select(F.col(query_id_col).alias("query_id"), normalize(F.col(vec_col)).alias("_qv"))
        .withColumn("_cell", F.explode(cell_udf(n_probe)(F.col("_qv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        assigned.join(probed, ["_cell"])
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cosine", dot(F.col("_qv"), F.col("_cv")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nbr_id", "cosine", "rk")
    )
