"""Round 7 batch 5b: weight-of-evidence feature binning and ZCA
whitening — two model-prep operators (credit-scoring's standard
monotonic-feature encoder; the decorrelation transform embedding
pipelines apply before products/quantization).

ZCA follows the repo's bounded-driver-fit doctrine (PQ codebooks,
IVF centroids): the covariance is computed DISTRIBUTED with the
quantized-BIGINT moment kernel (llmdata6 discipline), only the d×d
matrix ever reaches the driver (4096 doubles at d=64, corpus-size-
independent), eigendecomposition runs there, and the whitening matrix
broadcasts back into an Arrow-batched GEMM. Verification is the ANN-
certificate shape: the whitened covariance must be the identity within
ε, asserted per dimension as literal booleans the oracle states.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, fround, query, table


@query(
    "ml_woe_iv_binning",
    oracle="""
    WITH g AS (
      SELECT n_chars, CAST(count(*) AS BIGINT) AS k,
             CAST(count_if(lang = 'en') AS BIGINT) AS kg
      FROM documents GROUP BY n_chars
    ),
    r AS (
      SELECT n_chars, k, kg,
             coalesce(sum(k) OVER (ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum,
             sum(k) OVER () AS n
      FROM g
    ),
    cnt AS (
      SELECT CAST((cum * 10) // n AS INT) AS bin,
             CAST(sum(kg) AS BIGINT) AS n_good,
             CAST(sum(k - kg) AS BIGINT) AS n_bad
      FROM r GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_good) AS BIGINT) AS tg,
             CAST(sum(n_bad) AS BIGINT) AS tb
      FROM cnt
    )
    SELECT bin, n_good, n_bad,
           floor(ln(((n_good + 0.5) / (tg + 0.5))
                    / ((n_bad + 0.5) / (tb + 0.5))) * 1e6 + 0.5) / 1e6
             AS woe,
           floor((((n_good + 0.5) / (tg + 0.5)) - ((n_bad + 0.5) / (tb + 0.5)))
                 * ln(((n_good + 0.5) / (tg + 0.5))
                      / ((n_bad + 0.5) / (tb + 0.5))) * 1e6 + 0.5) / 1e6
             AS iv_contrib
    FROM cnt, tot ORDER BY bin
    """,
)
def ml_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature binning (the
    credit-scoring standard, used in data pipelines to rank features
    and detect drift): documents bin into VALUE-ATOMIC n_chars deciles
    (bin = ⌊cum_exclusive·10/n⌋ over the distinct-value rank table —
    the hist_equidepth discipline: ties never split, no corpus-sized
    ntile window), label = (lang = 'en'); WOE_b = ln(good-share /
    bad-share) with the +0.5 Laplace smoothing that keeps empty cells
    finite, IV contribution = (share-diff)·WOE. ln is the one libm call
    (data-dependent but well inside the regime every entropy/TF-IDF
    query already certifies); quantized at 1e-6 on both engines before
    hashing.

    100 TB: counts fold map-side per distinct value; the sweep window
    runs over the DISTINCT-value series behind the aggregate (the
    bounded-global-window invariant holds); WOE arithmetic is
    bin-cardinality."""
    g = table(spark, sf_dir, "documents").groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.count_if(F.col("lang") == "en").cast("bigint").alias("kg"),
    )
    wv = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = g.select(
        "n_chars",
        "k",
        "kg",
        F.coalesce(F.sum("k").over(wv), F.lit(0)).alias("cum"),
        F.sum("k").over(wall).alias("n"),
    )
    cnt = r.groupBy(
        F.expr("(cum * 10) DIV n").cast("int").alias("bin")
    ).agg(
        F.sum("kg").cast("bigint").alias("n_good"),
        F.sum(F.col("k") - F.col("kg")).cast("bigint").alias("n_bad"),
    ).localCheckpoint(eager=False)  # feeds totals AND the report (docs x2 rescan)
    tot = cnt.agg(
        F.sum("n_good").cast("bigint").alias("tg"),
        F.sum("n_bad").cast("bigint").alias("tb"),
    )
    gs = (F.col("n_good") + 0.5) / (F.col("tg") + 0.5)
    bs = (F.col("n_bad") + 0.5) / (F.col("tb") + 0.5)
    woe = F.log(gs / bs)
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_good",
            "n_bad",
            fround(woe, 6).alias("woe"),
            fround((gs - bs) * woe, 6).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


@query(
    "embedding_zca_whitening",
    oracle="""
    SELECT CAST(r.i AS INT) AS dim, true AS diag_within_eps,
           true AS offdiag_within_eps
    FROM range(64) r(i) ORDER BY dim
    """,
)
def embedding_zca_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening of the embedding corpus, certified: compute the
    64×64 covariance distributed (Arrow-batch outer-product partials as
    exact int64 — the llmdata6 quantized-moment kernel, so the matrix is
    partition-order-invariant), eigendecompose the BOUNDED d×d matrix on
    the driver (the PQ-codebook doctrine: driver work is
    corpus-size-independent), broadcast W = V·diag(1/√(λ+1e-6))·Vᵀ into
    an Arrow GEMM that whitens every vector, then RE-COMPUTE the
    covariance of the whitened corpus with the same kernel and assert —
    per dimension, as the literal booleans the oracle states — that the
    diagonal is 1 within 1e-3 and every off-diagonal is 0 within 1e-3.
    ZCA (vs PCA whitening) is the variant that stays closest to the
    original basis, which is why embedding pipelines prefer it before
    quantization.

    100 TB: two corpus scans (moment pass, verify pass — the second is
    the audit's price), each emitting d + d² int64 partials per Arrow
    batch; the eigh is 64³ flops on the driver. The whitened vectors
    would stream to the sink in deployment; here they exist only inside
    the verify pass."""
    d = 64
    # fan_out: the 1-row-group parquet otherwise runs every Arrow
    # moment/whiten kernel on ONE core (the ledoit-wolf lesson, r13)
    emb = fan_out(table(spark, sf_dir, "embeddings")).select(
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e")
    ).localCheckpoint(eager=False)  # moment pass + verify pass

    def moment_kernel(scale_xx: float = 1e9, scale_x: float = 1e9):
        def gen(batches):
            cap = float(1 << 62)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
                xx = np.floor(np.einsum("ni,nj->nij", x, x) * scale_xx)
                sx = np.floor(x * scale_x)
                if max(np.abs(xx).max(initial=0.0), np.abs(sx).max(initial=0.0)) >= cap:
                    raise OverflowError(
                        "zca moment kernel exceeds the int64 budget; "
                        "lower the quantization scales"
                    )
                yield pd.DataFrame(
                    {
                        "cell": np.arange(d * d + d, dtype=np.int64),
                        "q": np.concatenate(
                            [
                                xx.astype(np.int64).sum(axis=0).ravel(),
                                sx.astype(np.int64).sum(axis=0),
                            ]
                        ),
                    }
                )

        return gen

    def collect_moments(frame: DataFrame):
        rows = (
            frame.mapInPandas(moment_kernel(), "cell long, q long")
            .groupBy("cell")
            .agg(F.sum("q").alias("q"))
            .collect()
        )
        xx = np.zeros((d, d))
        sx = np.zeros(d)
        for r in rows:
            if r["cell"] < d * d:
                xx[r["cell"] // d, r["cell"] % d] = r["q"] / 1e9
            else:
                sx[r["cell"] - d * d] = r["q"] / 1e9
        return xx, sx

    n = emb.count()
    xx, sx = collect_moments(emb)
    mu = sx / n
    cov = xx / n - np.outer(mu, mu)
    lam, vec = np.linalg.eigh(cov)
    w = vec @ np.diag(1.0 / np.sqrt(lam + 1e-6)) @ vec.T

    def whiten(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            y = (x - mu) @ w.T
            yield pd.DataFrame({"e": list(y)})

    whitened = emb.mapInPandas(whiten, "e array<double>")
    yy, sy = collect_moments(whitened)
    muy = sy / n
    cov_w = yy / n - np.outer(muy, muy)
    eps = 1e-3
    out = [
        (
            i,
            bool(abs(cov_w[i, i] - 1.0) <= eps),
            bool(
                max(
                    abs(cov_w[i, j]) for j in range(d) if j != i
                )
                <= eps
            ),
        )
        for i in range(d)
    ]
    return spark.createDataFrame(
        out, "dim int, diag_within_eps boolean, offdiag_within_eps boolean"
    ).orderBy("dim")
