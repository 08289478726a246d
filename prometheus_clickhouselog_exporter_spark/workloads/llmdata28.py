"""LLM-data ops, round 9 batch 1: consistent-weighted-sampling sketch
for weighted Jaccard (the ICWS path the r8 verdict ordered —
`dedup_weighted_jaccard`'s docstring names it as the corpus-scale
plan, relational10.py).

The exact weighted-Jaccard query is pair-quadratic by construction
(every qualifying pair is output). The sketch path bounds the PAIR
SPACE instead: each document folds to a fixed-size signature whose
per-position collision probability IS the (capped) weighted Jaccard,
banded signatures generate candidates, and only candidates are
re-ranked exactly. For INTEGER weights, consistent weighted sampling
reduces to MinHash over the replica multiset {(tok, 1..tf)} (Ioffe
2010 §2 — the "explicit replication" construction; the continuous
ICWS replaces it only to avoid materializing replicas, which the
prefix-min trick below avoids anyway): signatures need
min_{j<=tf} h(tok, j, perm), and because h is doc-independent that
min is a PREFIX-MIN over j computable once per (token, perm) — the
replica fan-out is |vocab|·cap·perms, never corpus-sized.

Cross-engine determinism: the md5 12-hex hash family (core.MD5_SQL),
identical prefix-min windows (bounded: <=cap rows per partition), and
integer cross-multiplied thresholds — the whole pipeline, candidates
included, is value-hash-matched against DuckDB.

Reference parity note: /root/reference has no dedup surface
(query.go:1-289); §2.3 north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, md5_long, query, table

_P = 32  # signature positions (perms)
_R = 4  # band width -> 8 bands; P(candidate|J) = 1-(1-J^4)^8
_CAP = 8  # replica cap per token in the SKETCH (re-rank uses raw tf)
_HASH_X = "tok || '#' || CAST(r.r AS VARCHAR) || '#' || CAST(p.perm AS VARCHAR)"


@query(
    "dedup_weighted_jaccard_icws",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    tokmax AS (
      SELECT tok, least(max(tf), {_CAP}) AS mw FROM tf GROUP BY tok
    ),
    pref0 AS (
      SELECT tok, r.r AS r, p.perm AS perm,
             CAST({MD5_SQL.format(x=_HASH_X)} AS BIGINT) AS h
      FROM tokmax, range(1, {_CAP} + 1) r(r), range({_P}) p(perm)
      WHERE r.r <= mw
    ),
    pref AS (
      SELECT tok, r, perm,
             min(h) OVER (PARTITION BY tok, perm ORDER BY r
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pm
      FROM pref0
    ),
    sigs AS MATERIALIZED (
      SELECT f.doc_id, p.perm, min(p.pm) AS sig
      FROM tf f JOIN pref p
        ON p.tok = f.tok AND p.r = least(f.tf, {_CAP})
      GROUP BY 1, 2
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, perm // {_R} AS band,
             min(CASE WHEN perm % {_R} = 0 THEN sig END) AS s0,
             min(CASE WHEN perm % {_R} = 1 THEN sig END) AS s1,
             min(CASE WHEN perm % {_R} = 2 THEN sig END) AS s2,
             min(CASE WHEN perm % {_R} = 3 THEN sig END) AS s3
      FROM sigs GROUP BY 1, 2
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.s0 = b.s0 AND a.s1 = b.s1
       AND a.s2 = b.s2 AND a.s3 = b.s3 AND a.doc_id < b.doc_id
    ),
    totals AS (SELECT doc_id, sum(tf) AS t FROM tf GROUP BY doc_id),
    mins AS (
      SELECT c.id_a, c.id_b, sum(least(fa.tf, fb.tf)) AS smin
      FROM cand c
      JOIN tf fa ON fa.doc_id = c.id_a
      JOIN tf fb ON fb.doc_id = c.id_b AND fb.tok = fa.tok
      GROUP BY 1, 2
    )
    SELECT m.id_a, m.id_b,
           CAST(m.smin AS BIGINT) AS sum_min,
           CAST(ta.t + tb.t - m.smin AS BIGINT) AS sum_max,
           CAST(m.smin AS DOUBLE)
             / CAST(ta.t + tb.t - m.smin AS DOUBLE) AS weighted_jaccard
    FROM mins m
    JOIN totals ta ON ta.doc_id = m.id_a
    JOIN totals tb ON tb.doc_id = m.id_b
    WHERE m.smin * 9 >= (ta.t + tb.t) * 4
    ORDER BY m.id_a, m.id_b
    """,
)
def dedup_weighted_jaccard_icws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Jaccard near-dup detection by CONSISTENT WEIGHTED
    SAMPLING sketch + banded candidate join + exact re-rank — the
    corpus-scale path `dedup_weighted_jaccard` names: neither the
    quadratic dense-profile pair join nor the full posting join runs;
    pair work is bounded by the sketch collisions.

    Pipeline: (1) per-(token, perm) PREFIX-MINIMA of md5 hashes over
    replica index 1..min(tf,cap) — signatures of the replica multiset
    without replicating the corpus (fan-out = |V|·cap·P rows, window
    partitions <=cap rows); (2) per-doc signature = min over its
    tokens' prefix-minima at r = its tf (one postings join, P-fanned
    map-side); (3) signatures banded 4-wide into 8 bands, equal bands
    → candidate (P[cand|J] = 1−(1−J⁴)⁸: 0.985 at J=0.8, 0.07 at
    J=0.3); (4) candidates re-ranked EXACTLY on raw term frequencies,
    kept at J >= 0.8 via the integer cross-multiply 9·Σmin >= 4·(Tₐ+T_b).
    Output schema matches the exact query; at sf0.1 banding recalls
    256/256 of the exact J>=0.8 pairs (pinned >=0.9 in
    tests/test_llmdata28.py against the full pair join).

    Re-rank dispatch (the dedup_weighted_jaccard adaptive rule): on a
    tiny vocabulary (<=2048 — this corpus: 31 tokens) candidates meet
    dense vocab-indexed tf profiles in a broadcast join and Σmin is a
    per-row zip_with fold (no exploded shuffle); on a real vocabulary
    the posting join runs RESTRICTED TO CANDIDATES — both are exact,
    so the oracle's posting form certifies either. This corpus is the
    sketch's worst case (31 shared tokens make most pairs similar:
    2.5M candidates of 12.5M pairs at sf0.1); on a web corpus with
    J~0 background, candidates ≈ true near-dups and the pair space
    collapses — which is the whole point of ICWS.

    100 TB: signature build is one postings-shaped shuffle (P partials
    fold map-side per doc); banding shuffles |docs|·8 fixed-width
    rows; candidate dedup + re-rank shuffle candidate-cardinality
    rows. cap bounds sketch error on repetitive docs (re-rank is on
    raw tf, so caps cost recall only, never precision).

    Ref cite: none — /root/reference has no dedup surface."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # sigs join + totals + re-rank
    )
    tokmax = tf.groupBy("tok").agg(
        F.least(F.max("tf"), F.lit(_CAP)).cast("int").alias("mw")
    )
    pref0 = tokmax.select(
        "tok",
        F.explode(F.sequence(F.lit(1), F.col("mw"))).alias("r"),
    ).select(
        "tok",
        "r",
        F.explode(F.sequence(F.lit(0), F.lit(_P - 1))).alias("perm"),
    ).select(
        "tok",
        "r",
        "perm",
        md5_long(F.concat_ws("#", F.col("tok"), F.col("r"), F.col("perm"))).alias(
            "h"
        ),
    )
    wpm = (
        Window.partitionBy("tok", "perm")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = pref0.select("tok", "r", "perm", F.min("h").over(wpm).alias("pm"))
    sigs = (
        tf.withColumn("r", F.least(F.col("tf"), F.lit(_CAP)).cast("int"))
        .join(pref, ["tok", "r"])
        .groupBy("doc_id", "perm")
        .agg(F.min("pm").alias("sig"))
        .localCheckpoint(eager=False)  # both band sides
    )
    bands = (
        sigs.groupBy("doc_id", (F.col("perm") / _R).cast("int").alias("band"))
        .agg(
            *[
                F.min(F.when(F.col("perm") % _R == i, F.col("sig"))).alias(
                    f"s{i}"
                )
                for i in range(_R)
            ]
        )
        .localCheckpoint(eager=False)  # self-joined a/b
    )
    bkeys = ["band"] + [f"s{i}" for i in range(_R)]
    a = bands.select(F.col("doc_id").alias("id_a"), *bkeys)
    b = bands.select(F.col("doc_id").alias("id_b"), *bkeys)
    cand = (
        a.join(b, bkeys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=False)  # re-rank probes it twice
    )
    totals = tf.groupBy("doc_id").agg(F.sum("tf").alias("t"))
    n_vocab = tokmax.count()
    if n_vocab <= 2048:
        # dense re-rank: candidates meet broadcast vocab-indexed profiles
        vidx = tokmax.select("tok").withColumn(
            "i", F.row_number().over(Window.orderBy("tok")).cast("int")
        )
        prof = (
            tf.join(F.broadcast(vidx), "tok")
            .groupBy("doc_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("i"), F.col("tf")))
                ).alias("m"),
                F.sum("tf").alias("t"),
            )
            .select(
                "doc_id",
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_vocab)),
                    lambda i: F.coalesce(
                        F.element_at(F.col("m"), i), F.lit(0).cast("bigint")
                    ),
                ).alias("v"),
                "t",
            )
        )
        pa = prof.select(
            F.col("doc_id").alias("id_a"),
            F.col("v").alias("va"),
            F.col("t").alias("ta"),
        )
        pb = prof.select(
            F.col("doc_id").alias("id_b"),
            F.col("v").alias("vb"),
            F.col("t").alias("tb"),
        )
        smin = F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: F.least(x, y)),
            F.lit(0).cast("bigint"),
            lambda s, x: s + x,
        )
        pairs = (
            cand.repartition(spark.sparkContext.defaultParallelism)
            .join(F.broadcast(pa), "id_a")
            .join(F.broadcast(pb), "id_b")
            .withColumn("smin", smin)
        )
    else:
        # posting re-rank RESTRICTED TO CANDIDATES (candidate-bounded)
        fa = tf.select(
            F.col("doc_id").alias("id_a"), "tok", F.col("tf").alias("tfa")
        )
        fb = tf.select(
            F.col("doc_id").alias("id_b"), "tok", F.col("tf").alias("tfb")
        )
        ta_t = totals.select(
            F.col("doc_id").alias("id_a"), F.col("t").alias("ta")
        )
        tb_t = totals.select(
            F.col("doc_id").alias("id_b"), F.col("t").alias("tb")
        )
        pairs = (
            cand.join(fa, "id_a")
            .join(fb, ["id_b", "tok"])
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.least("tfa", "tfb")).alias("smin"))
            .join(ta_t, "id_a")
            .join(tb_t, "id_b")
        )
    smax = F.col("ta") + F.col("tb") - F.col("smin")
    return (
        pairs.where(F.col("smin") * 9 >= (F.col("ta") + F.col("tb")) * 4)
        .select(
            "id_a",
            "id_b",
            F.col("smin").cast("bigint").alias("sum_min"),
            smax.cast("bigint").alias("sum_max"),
            (F.col("smin").cast("double") / smax.cast("double")).alias(
                "weighted_jaccard"
            ),
        )
        .orderBy("id_a", "id_b")
    )
