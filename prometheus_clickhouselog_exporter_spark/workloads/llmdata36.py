"""Round 10 batch: MinHash estimate-vs-exact Jaccard calibration —
the sketch-quality certificate for the dedup family.

Reference parity note: /root/reference has no sketch surface; §2.3
north-star LLM-data territory. Method public: Broder 1997 (MinHash
unbiasedness — E[matches/P] = J), calibration-curve evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import MD5_SQL, fan_out, fround, md5_long, query, table

_P = 32  # permutations

_CAL_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(s) AS g FROM sh),
    keep AS (SELECT g FROM post GROUP BY g HAVING count(*) <= 4),
    post2 AS (SELECT doc_id, g FROM post WHERE g IN (SELECT g FROM keep)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              FROM post2 GROUP BY doc_id),
    common AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS c
      FROM post2 l JOIN post2 r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b,
             CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jexact
      FROM common
      JOIN sizes sa ON common.id_a = sa.doc_id
      JOIN sizes sb ON common.id_b = sb.doc_id
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.1
    ),
    sigs AS (
      SELECT doc_id, r.p,
             min({MD5_SQL.format(x="(r.p || '|' || g)")}) AS mh
      FROM post2, range({_P}) r(p)
      GROUP BY doc_id, r.p
    ),
    est AS (
      SELECT pr.id_a, pr.id_b, pr.jexact,
             CAST(count_if(a.mh = b.mh) AS BIGINT) AS matches
      FROM pairs pr
      JOIN sigs a ON a.doc_id = pr.id_a
      JOIN sigs b ON b.doc_id = pr.id_b AND b.p = a.p
      GROUP BY 1, 2, 3
    ),
    binned AS (
      SELECT least(CAST(floor(jexact * 10) AS BIGINT), 9) AS bin,
             matches,
             CAST(floor(jexact * 1e9 + 0.5) AS BIGINT) AS jq
      FROM est
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
           floor(CAST(sum(matches) AS DOUBLE) / ({_P} * count(*))
                 * 1e6 + 0.5) / 1e6 AS avg_est,
           floor(CAST(sum(jq) AS DOUBLE) / 1e9 / count(*) * 1e6 + 0.5) / 1e6
             AS avg_exact,
           floor((CAST(sum(matches) AS DOUBLE) / ({_P} * count(*))
                  - CAST(sum(jq) AS DOUBLE) / 1e9 / count(*)) * 1e6 + 0.5)
             / 1e6 AS bias
    FROM binned GROUP BY bin ORDER BY bin
    """


@query("dedup_minhash_calibration", oracle=_CAL_ORACLE)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration curve (Broder 1997 unbiasedness, audited):
    for every pruned-shingle pair with exact Jaccard ≥ 0.1, the 32-perm
    signature agreement fraction is compared to the exact Jaccard,
    binned by exact-Jaccard decile — avg_est ≈ avg_exact per bin IS the
    sketch's calibration contract, and `bias` quantifies the finite-P
    deviation the LSH band-tuning math assumes away. Sketch and exact
    run over the SAME df ≤ 4-pruned shingle sets, so the curve measures
    the ESTIMATOR, not a universe mismatch. Per-pair statistics are
    integers (matches of 32; jexact quantized 1e-9) so bin means are
    exact integer ratios.

    100 TB: signatures are |postings|×P min-folds (map-side combined,
    the standard MinHash build); the estimate join is pair-keyed against
    P-row signatures — candidate-bounded, never corpus². The exact side
    reuses the pruned posting join the Jaccard family already bounds."""
    toks = (
        fan_out(table(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= 3)
    )
    post = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> t[i-1] || ' ' || t[i] || ' ' || t[i+1])"
                )
            )
        ).alias("g"),
    )
    keep = post.groupBy("g").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") <= 4
    )
    post2 = post.join(keep.select("g"), "g").localCheckpoint(
        eager=False
    )  # consumers: sizes, pair join (both sides), signatures
    sizes = post2.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rhs = post2.select(F.col("g"), F.col("doc_id").alias("id_b"))
    common = (
        post2.join(rhs, "g")
        .where(F.col("doc_id") < F.col("id_b"))
        .groupBy(F.col("doc_id").alias("id_a"), "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jex = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    pairs = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jex >= 0.1)
        .select("id_a", "id_b", jex.alias("jexact"))
    )
    perms = F.explode(F.array(*[F.lit(p) for p in range(_P)])).alias("p")
    sigs = (
        post2.select("doc_id", "g", perms)
        .select(
            "doc_id",
            "p",
            md5_long(
                F.concat(F.col("p").cast("string"), F.lit("|"), F.col("g"))
            ).alias("h"),
        )
        .groupBy("doc_id", "p")
        .agg(F.min("h").alias("mh"))
        .localCheckpoint(eager=False)  # joined on both pair sides
    )
    a = sigs.select(
        F.col("doc_id").alias("id_a"), "p", F.col("mh").alias("mha")
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b2"),
        F.col("p").alias("pb"),
        F.col("mh").alias("mhb"),
    )
    est = (
        pairs.join(a, "id_a")
        .join(
            b,
            (F.col("id_b") == F.col("id_b2")) & (F.col("p") == F.col("pb")),
        )
        .groupBy("id_a", "id_b", "jexact")
        .agg(
            F.count_if(F.col("mha") == F.col("mhb"))
            .cast("bigint")
            .alias("matches")
        )
    )
    binned = est.select(
        F.least(F.floor(F.col("jexact") * 10).cast("bigint"), F.lit(9)).alias(
            "bin"
        ),
        "matches",
        F.floor(F.col("jexact") * 1e9 + F.lit(0.5)).cast("bigint").alias("jq"),
    )
    n = F.count(F.lit(1))
    avg_est = F.sum("matches").cast("double") / (_P * n)
    avg_ex = F.sum("jq").cast("double") / 1e9 / n
    return (
        binned.groupBy("bin")
        .agg(
            n.cast("bigint").alias("n_pairs"),
            fround(avg_est, 6).alias("avg_est"),
            fround(avg_ex, 6).alias("avg_exact"),
            fround(avg_est - avg_ex, 6).alias("bias"),
        )
        .orderBy("bin")
    )
