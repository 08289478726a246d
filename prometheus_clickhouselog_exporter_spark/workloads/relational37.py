"""Round 7 batch 12: Wald's SPRT (sequential testing) and a
sensitivity-stratified k-means coreset with a cost certificate.

SPRT is the sequential-analysis classic a monitoring pipeline runs when
it wants decisions at the earliest defensible moment instead of at a
fixed sample size: accumulate per-observation log-likelihood ratios,
stop when the running sum crosses ln((1−β)/α) (accept H1) or
ln(β/(1−α)) (accept H0). The LLR increments and thresholds are
CONSTANTS — computed once in Python and injected as repr() literals
into BOTH plans (the SCALE.md inject-shared-literals rule), so no libm
call of either engine is on the hash path.

The coreset is the data-reduction step large-scale clustering actually
ships: a small weighted subset whose cost under ANY candidate centroid
set approximates the full corpus' cost. Centroids here are driver-fit
on a bounded sample (the PQ doctrine), so the oracle takes the
certificate form (literal booleans): the coreset's weighted cost must
sit within 25% of the full cost on the same centroids.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, md5_long, query, table

# SPRT parameters: H0 purchase-rate p0 vs H1 p1, alpha = beta = 0.05.
_P0, _P1 = 0.20, 0.35
_LLR_HIT = repr(math.log(_P1 / _P0))  # purchase observed
_LLR_MISS = repr(math.log((1 - _P1) / (1 - _P0)))  # any other event
_A = repr(math.log((1 - 0.05) / 0.05))  # accept H1 above
_B = repr(math.log(0.05 / (1 - 0.05)))  # accept H0 below


@query(
    "stats_sprt_sequential",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'purchase' THEN {_LLR_HIT}
                      ELSE {_LLR_MISS} END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS llr,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS i
      FROM events
    ),
    crossings AS (
      SELECT user_id, i, llr,
             CASE WHEN llr >= {_A} THEN 'accept_h1'
                  WHEN llr <= {_B} THEN 'accept_h0' END AS hit
      FROM seq
    ),
    first_cross AS (
      SELECT user_id, min(i) AS first_cross_n FROM crossings
      WHERE hit IS NOT NULL GROUP BY user_id
    ),
    decision AS (
      SELECT c.user_id, c.hit AS decision, f.first_cross_n
      FROM crossings c JOIN first_cross f
        ON f.user_id = c.user_id AND c.i = f.first_cross_n
    )
    SELECT s.user_id,
           CAST(max(s.i) AS BIGINT) AS n_events,
           coalesce(max(d.decision), 'undecided') AS decision,
           CAST(max(d.first_cross_n) AS BIGINT) AS first_cross_n,
           floor(max_by(s.llr, s.i) * 1e6 + 0.5) / 1e6 AS final_llr
    FROM seq s LEFT JOIN decision d ON d.user_id = s.user_id
    GROUP BY s.user_id ORDER BY s.user_id
    """,
)
def stats_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test per user stream: is
    this user's purchase rate p1=0.35 (H1) or p0=0.20 (H0)? (The corpus
    rate is ~0.20, so H0 should win for most users once their stream is
    long enough — hypotheses chosen so BOTH decision branches and the
    undecided tail are live at every SF, per the dormant-branch rule.) The running
    LLR crosses ln(19) → accept H1, −ln(19) → accept H0, else undecided
    at stream end; the decision and its FIRST-crossing sample number
    are the operator's output — the earliest-possible-decision property
    is SPRT's whole point (Wald: minimal expected sample size among all
    tests of the same error rates). LLR increments and thresholds are
    injected literals; the running sum adds identical doubles in
    identical order in both engines.

    100 TB: one user-keyed window pass; per-user state for a streaming
    twin is one double + one flag (the CEP fold family)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    inc = F.when(
        F.col("event_type") == "purchase", F.lit(float(_LLR_HIT))
    ).otherwise(F.lit(float(_LLR_MISS)))
    seq = e.select(
        "user_id",
        F.sum(inc).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("llr"),
        F.row_number().over(w).alias("i"),
    ).localCheckpoint(eager=False)  # crossings + final-row fold
    hit = (
        F.when(F.col("llr") >= float(_A), F.lit("accept_h1"))
        .when(F.col("llr") <= float(_B), F.lit("accept_h0"))
    )
    crossings = seq.select("user_id", "i", "llr", hit.alias("hit"))
    first_cross = (
        crossings.filter(F.col("hit").isNotNull())
        .groupBy("user_id")
        .agg(F.min("i").alias("first_cross_n"))
        .select(
            F.col("user_id").alias("_fu"),
            "first_cross_n",
        )
    )
    decision = crossings.join(
        first_cross,
        (F.col("_fu") == F.col("user_id"))
        & (F.col("first_cross_n") == F.col("i")),
    ).select(
        F.col("_fu").alias("_du"),
        F.col("hit").alias("decision"),
        "first_cross_n",
    )
    return (
        seq.join(decision, seq["user_id"] == F.col("_du"), "left")
        .groupBy("user_id")
        .agg(
            F.max("i").cast("bigint").alias("n_events"),
            F.coalesce(F.max("decision"), F.lit("undecided")).alias("decision"),
            F.max("first_cross_n").cast("bigint").alias("first_cross_n"),
            fround(F.max_by(F.col("llr"), F.col("i")), 6).alias("final_llr"),
        )
        .orderBy("user_id")
    )


@query(
    "sample_coreset_kmeans",
    oracle="""
    SELECT CAST(r.i AS INT) AS centroid,
           true AS cost_within_25pct
    FROM range(4) r(i) ORDER BY centroid
    """,
)
def sample_coreset_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitivity-stratified k-means coreset with a COST CERTIFICATE:
    centroids fit driver-side on a bounded hash-ordered sample (the PQ/
    IVF doctrine), every vector's squared distance to its centroid
    computed distributed (Arrow batches, quantized to exact integer
    micro-units), then a 256-point coreset built from two deterministic
    strata — the highest-sensitivity points (largest d², the ones a
    subsample must not miss) plus a hash-systematic slice of the rest,
    each rest-point carrying weight |rest|/|slice|. The certificate,
    per centroid and emitted as the literal booleans the oracle states:
    the coreset's WEIGHTED cost is within 25% of the full corpus cost
    on the same centroids (measured ≤ 8% at all three SFs) — the
    defining coreset property, checked on real data rather than assumed
    from the sampling theorem.

    100 TB: the distance pass is one scan (broadcast centroid matrix);
    stratum selection is two TakeOrderedAndProject-shaped bounded
    selections; the certificate pass re-reads only the 256-row coreset
    plus the full-cost aggregate already computed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    k, m_top, m_sys = 4, 128, 128
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    ).localCheckpoint(eager=False)  # train sample + distance pass
    train = (
        emb.orderBy(F.xxhash64(F.col("vec_id"), F.lit(7)))
        .limit(2048)
        .select(array_to_vector(F.col("e")).alias("features"))
    )
    model = KMeans(k=k, seed=7, maxIter=20).fit(train)
    cents = np.vstack([np.asarray(c) for c in model.clusterCenters()])

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            c = d2.argmin(axis=1)
            best = d2[np.arange(len(x)), c]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "c": c.astype(np.int32),
                    # quantized exact micro-units (int64 fold discipline)
                    "d2q": np.floor(best * 1e6 + 0.5).astype(np.int64),
                }
            )

    scored = emb.mapInPandas(
        assign, "vec_id long, c int, d2q long"
    ).localCheckpoint(eager=False)  # full cost + both strata read it
    full = scored.groupBy("c").agg(F.sum("d2q").alias("full_cost_q"))
    top = (
        scored.orderBy(F.desc("d2q"), "vec_id")
        .limit(m_top)
        .select("vec_id", "c", "d2q", F.lit(1.0).alias("w"))
    )
    rest = scored.join(top.select("vec_id"), "vec_id", "left_anti")
    # per-CENTROID systematic strata: a global slice leaves small
    # centroids under-sampled and their per-centroid cost estimate
    # useless (measured: 25% bound broken at sf0.01+); hash-ranked
    # top-32 per centroid with weight rest_c/32 makes every centroid's
    # estimate carry the same relative sampling rate
    per_c = m_sys // k
    from pyspark.sql import Window as _W

    wc = _W.partitionBy("c").orderBy(
        F.xxhash64(F.col("vec_id"), F.lit(99)), "vec_id"
    )
    rest_counts = rest.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_rest_c")
    )
    sys_slice = (
        rest.withColumn("rkc", F.row_number().over(wc))
        .filter(F.col("rkc") <= per_c)
        .join(F.broadcast(rest_counts), "c")
        .select(
            "vec_id",
            "c",
            "d2q",
            (F.col("n_rest_c").cast("double") / F.least(
                F.lit(per_c), F.col("n_rest_c")
            )).alias("w"),
        )
    )
    coreset = top.unionByName(sys_slice)
    core_cost = coreset.groupBy("c").agg(
        F.sum(F.col("w") * F.col("d2q")).alias("core_cost_q")
    )
    out = (
        full.join(core_cost, "c", "left")
        .select(
            F.col("c").alias("centroid"),
            (
                F.abs(
                    F.coalesce(F.col("core_cost_q"), F.lit(0.0))
                    - F.col("full_cost_q")
                )
                <= 0.25 * F.col("full_cost_q")
            ).alias("cost_within_25pct"),
        )
        .orderBy("centroid")
    )
    return out


@query(
    "sample_kfold_assignment",
    oracle="""
    WITH assign AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                            || '|fold'), 1, 12))
                       AS UBIGINT) % 5 AS BIGINT) AS fold
      FROM documents
    )
    SELECT source, fold, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM assign GROUP BY source, fold ORDER BY source, fold
    """,
)
def sample_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k = 5) by
    content hash — the split every evaluation pipeline needs to be
    REPRODUCIBLE and leakage-free: a document's fold is a pure function
    of its identity (survives reshuffles, re-ingestion, engine swaps),
    per-(source, fold) counts audit the balance the hash guarantees in
    expectation. Pairs with split_train_valid_test (single split) and
    the raking/Neyman allocation rows as the assignment member of the
    sampling family.

    100 TB: scan-stage hash + one map-side-combined aggregate; the
    assignment never materializes state (the property that makes
    hash-folds the only split that scales)."""
    d = table(spark, sf_dir, "documents")
    fold = (
        md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("|fold"))) % 5
    ).cast("bigint")
    return (
        d.select("doc_id", "source", fold.alias("fold"))
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .orderBy("source", "fold")
    )
