"""Round 10 batch: winnowing fingerprints, centroid silhouette, cosine
radius search, and decile lift/gains — four LLM-data/eval operators,
integer-moment exact or per-row quantized deterministic, every one
DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these surfaces; §2.3 north-star territory.
Methods are public: winnowing document fingerprinting (Schleimer,
Wilkerson & Aiken 2003, the MOSS algorithm), simplified (centroid)
silhouette (Rousseeuw 1987 variant), range similarity search, and the
classic cumulative gains/lift table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.distrank import exclusive_prefix, ntile_from_rank
from .core import fan_out, fround, md5_long, query, table, MD5_SQL

# --- winnowing fingerprints ---------------------------------------------------

_WIN_W = 4  # winnowing window (selects >=1 fingerprint per w k-grams)
_WIN_DF_CAP = 50  # stop-gram guard: drop fingerprints in more docs
_WIN_SHARED_MIN = 3

_WINNOW_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    kg AS (
      SELECT doc_id, p,
             {MD5_SQL.format(x="ws[p] || ' ' || ws[p+1] || ' ' || ws[p+2]")}
               AS h
      FROM tok, unnest(range(1, len(ws) - 1)) AS t(p)
    ),
    sel AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
               AS fp,
             p,
             max(p) OVER (PARTITION BY doc_id) AS pmax
      FROM kg
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM sel WHERE p <= pmax - {_WIN_W - 1}
    ),
    ok AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_DF_CAP}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_fp
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      WHERE a.fp IN (SELECT fp FROM ok)
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, shared_fp FROM pairs
    WHERE shared_fp >= {_WIN_SHARED_MIN}
    ORDER BY doc_a, doc_b
    """


@query("dedup_winnowing_fingerprints", oracle=_WINNOW_ORACLE)
def dedup_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003, MOSS): hash every
    3-gram of tokens, keep the minimum hash of each sliding window of
    w=4 positions (the guarantee: any shared substring of >= w+k-1
    tokens yields a shared fingerprint), dedup to the doc's fingerprint
    set, then report doc pairs sharing >= 3 fingerprints. The
    distinct-min-per-window variant needs no tie-position convention,
    so both engines select identical fingerprint sets.

    100 TB: per-doc windows only (bounded by doc length); the pair join
    is keyed on fingerprint value with a document-frequency cap
    (<=50 docs per fingerprint — the same stop-gram guard the pruned
    postings dedup uses) so no hot hash fans out quadratically; the
    shuffle carries (doc_id, fp) longs, never text."""
    tok = (
        fan_out(table(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= 3)
    )
    kg = tok.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(ws) - 2),"
                " i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))"
            )
        ).alias("p", "kgram"),
    ).select("doc_id", "p", md5_long(F.col("kgram")).alias("h"))
    wsel = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    wmax = Window.partitionBy("doc_id")
    sel = kg.select(
        "doc_id",
        F.min("h").over(wsel).alias("fp"),
        "p",
        F.max("p").over(wmax).alias("pmax"),
    )
    fps = (
        sel.where(F.col("p") <= F.col("pmax") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=False)  # both sides of the pair join + DF cap
    )
    ok = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") <= _WIN_DF_CAP
    )
    a = fps.join(ok.select("fp"), "fp", "left_semi")
    b = a.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
        .where(F.col("shared_fp") >= _WIN_SHARED_MIN)
    )
    return pairs.orderBy("doc_a", "doc_b")


# --- centroid (simplified) silhouette ------------------------------------------

_SIL_K = 4


def _dist2_sql(seed: str) -> str:
    # |e - s|^2 expanded through list_dot_product so BOTH engines combine
    # the same three sequential-fold dots (the repo's matched primitive)
    return (
        f"greatest(0.0, list_dot_product(e, e)"
        f" - 2 * list_dot_product(e, {seed})"
        f" + list_dot_product({seed}, {seed}))"
    )


_SIL_ORACLE = f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    seeds AS (
      SELECT {', '.join(
          f"any_value(CASE WHEN vec_id = {c} THEN e END) AS s{c}"
          for c in range(_SIL_K))}
      FROM base WHERE vec_id < {_SIL_K}
    ),
    d AS (
      SELECT vec_id,
             {', '.join(f"sqrt({_dist2_sql(f's{c}')}) AS d{c}"
                        for c in range(_SIL_K))}
      FROM base CROSS JOIN seeds
    ),
    asg AS (
      SELECT vec_id, least(d0, d1, d2, d3) AS a,
             CASE WHEN d0 = least(d0, d1, d2, d3) THEN 0
                  WHEN d1 = least(d0, d1, d2, d3) THEN 1
                  WHEN d2 = least(d0, d1, d2, d3) THEN 2
                  ELSE 3 END AS cluster,
             d0, d1, d2, d3
      FROM d
    ),
    s AS (
      SELECT vec_id, cluster, a,
             least(CASE WHEN cluster = 0 THEN 1e300 ELSE d0 END,
                   CASE WHEN cluster = 1 THEN 1e300 ELSE d1 END,
                   CASE WHEN cluster = 2 THEN 1e300 ELSE d2 END,
                   CASE WHEN cluster = 3 THEN 1e300 ELSE d3 END) AS b
      FROM asg
    ),
    q AS (
      SELECT cluster,
             CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor((b - a) / greatest(a, b) * 1e9 + 0.5)
                            AS BIGINT) END AS q9
      FROM s
    )
    SELECT cluster, CAST(count(*) AS BIGINT) AS n,
           floor(CAST(sum(q9) AS DOUBLE) / count(*) / 1e9 * 1e9 + 0.5) / 1e9
             AS mean_silhouette
    FROM q GROUP BY cluster ORDER BY cluster
    """


@query("ml_silhouette_centroid", oracle=_SIL_ORACLE)
def ml_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid) silhouette (Rousseeuw 1987 variant used at
    scale): assign each vector to its nearest of k=4 fixed seed
    centroids (vec_id 0..3), then s(i) = (b-a)/max(a,b) with a = the
    distance to the own centroid and b = the nearest other centroid —
    O(N*k) instead of the O(N^2) full silhouette. Distances expand
    |e-s|^2 = e.e - 2e.s + s.s through the repo's matched cross-engine
    dot primitive (aggregate(zip_with) = list_dot_product, both
    sequential folds over f32->f64 exact widenings), so both engines
    compute identical doubles; per-point scores quantize at 1e-9
    before the per-cluster integer-sum mean.

    100 TB: the seeds are a 1-row broadcast (16 scalars); scoring is a
    stateless map over the corpus with map-side-combinable means. The
    full-pairwise silhouette is intentionally NOT offered — this is the
    form that survives a 10^9-vector corpus."""
    from ..operators.similarity import as_double, dot

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    seeds = base.where(F.col("vec_id") < _SIL_K).agg(
        *[
            F.any_value(F.when(F.col("vec_id") == c, F.col("e")), True).alias(
                f"s{c}"
            )
            for c in range(_SIL_K)
        ]
    )
    d = base.join(F.broadcast(seeds))
    dists = []
    for c in range(_SIL_K):
        s = F.col(f"s{c}")
        d2 = F.greatest(
            F.lit(0.0),
            dot(F.col("e"), F.col("e")) - 2 * dot(F.col("e"), s) + dot(s, s),
        )
        dists.append(F.sqrt(d2).alias(f"d{c}"))
    d = d.select("vec_id", *dists)
    m = F.least(*[F.col(f"d{c}") for c in range(_SIL_K)])
    cluster = (
        F.when(F.col("d0") == m, 0)
        .when(F.col("d1") == m, 1)
        .when(F.col("d2") == m, 2)
        .otherwise(3)
    )
    asg = d.select("vec_id", m.alias("a"), cluster.alias("cluster"), "d0", "d1", "d2", "d3")
    b = F.least(
        *[
            F.when(F.col("cluster") == c, F.lit(1e300)).otherwise(F.col(f"d{c}"))
            for c in range(_SIL_K)
        ]
    )
    q9 = F.when(
        F.greatest(F.col("a"), b) == 0, F.lit(0).cast("bigint")
    ).otherwise(
        F.floor((b - F.col("a")) / F.greatest(F.col("a"), b) * 1e9 + 0.5).cast(
            "bigint"
        )
    )
    q = asg.select("cluster", q9.alias("q9"))
    return (
        q.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            fround(F.sum("q9").cast("double") / F.count(F.lit(1)) / 1e9, 9).alias(
                "mean_silhouette"
            ),
        )
        .orderBy("cluster")
    )


# --- cosine radius search -------------------------------------------------------

_RAD_NQ = 8
_RAD_T = 0.25


_RADIUS_ORACLE = f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e
      FROM embeddings
      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    q AS (SELECT vec_id AS query_id, e AS qe FROM base WHERE vec_id < {_RAD_NQ}),
    scored AS (
      SELECT q.query_id, b.vec_id,
             list_dot_product(qe, e)
               / (sqrt(list_dot_product(qe, qe))
                  * sqrt(list_dot_product(e, e))) AS cosine
      FROM q CROSS JOIN base b WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_within,
           CAST(sum(vec_id) AS BIGINT) AS id_checksum,
           floor(min(cosine) * 1e9 + 0.5) / 1e9 AS min_cosine
    FROM scored WHERE cosine >= {_RAD_T}
    GROUP BY query_id ORDER BY query_id
    """


@query("similarity_radius_search", oracle=_RADIUS_ORACLE)
def similarity_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search: ALL neighbors with cosine >=
    0.25 for each of 8 query vectors (the synthetic 64-dim corpus is
    near-orthogonal — measured 99th-percentile cosine ~0.29, so 0.25
    keeps 6-14 live neighbors per query at every SF) — the complement of the top-k
    family (retrieval wants "everything this similar", dedup wants a
    fixed candidate budget). The dot products are the repo's matched
    cross-engine primitive (Spark aggregate(zip_with) left fold =
    DuckDB list_dot_product, both sequential) over f32->f64 exact
    widenings; zero-norm vectors excluded by a dot-positive predicate.

    100 TB: queries broadcast (a q x d matrix, KBs); the corpus side is
    one stateless scan — linear in N, embarrassingly parallel, no
    shuffle beyond the per-query aggregate. The bucketed accelerations
    (sign-LSH multiprobe, IVF) live in similarity_lsh_topk /
    similarity_ivf_topk; a bucketed radius variant would reuse their
    cell assignment with a cos-radius -> cell-ring bound and exact
    re-check, trading recall certificates for scan reduction."""
    from ..operators.similarity import as_double, dot

    emb = table(spark, sf_dir, "embeddings")
    ed = as_double(F.col("embedding"))
    base = (
        emb.select("vec_id", ed.alias("e"))
        .where(dot(F.col("e"), F.col("e")) > 0)
        .localCheckpoint(eager=False)  # queries + corpus side
    )
    # self-norms factored to the PRE-join projections (O(q+N) folds, not
    # O(q*N): the pair projection re-folded the query norm once per corpus
    # row and the corpus norm once per query). Same expression over the
    # same values -> identical doubles -> the oracle hash cannot move.
    q = base.where(F.col("vec_id") < _RAD_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.sqrt(dot(F.col("e"), F.col("e"))).alias("nq"),
    )
    corpus = base.select(
        "vec_id", "e", F.sqrt(dot(F.col("e"), F.col("e"))).alias("nc")
    )
    joined = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cosine = dot(F.col("qe"), F.col("e")) / (F.col("nq") * F.col("nc"))
    scored = joined.select("query_id", "vec_id", cosine.alias("cosine"))
    return (
        scored.where(F.col("cosine") >= _RAD_T)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_within"),
            F.sum("vec_id").cast("bigint").alias("id_checksum"),
            fround(F.min("cosine"), 9).alias("min_cosine"),
        )
        .orderBy("query_id")
    )


# --- decile lift / gains table ---------------------------------------------------

_LIFT_ORACLE = """
    WITH scored AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             CAST(l_quantity AS BIGINT) * 100
               + CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS s,
             l_orderkey * 8 + l_linenumber AS pk
      FROM lineitem
    ),
    t AS (
      SELECT y, ntile(10) OVER (ORDER BY s DESC, pk DESC) AS decile FROM scored
    ),
    pd AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM t GROUP BY decile
    ),
    cum AS (
      SELECT a.decile, any_value(a.n) AS n, any_value(a.pos) AS pos,
             CAST(sum(b.n) AS BIGINT) AS cum_n,
             CAST(sum(b.pos) AS BIGINT) AS cum_pos
      FROM pd a JOIN pd b ON b.decile <= a.decile
      GROUP BY a.decile
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS gn, CAST(sum(pos) AS BIGINT) AS gp
            FROM pd)
    SELECT decile, n, pos,
           floor(CAST(cum_pos AS DOUBLE) / gp * 1e6 + 0.5) / 1e6 AS gains,
           floor((CAST(cum_pos AS DOUBLE) / cum_n)
                 / (CAST(gp AS DOUBLE) / gn) * 1e6 + 0.5) / 1e6 AS lift
    FROM cum CROSS JOIN tot ORDER BY decile
    """


@query("ml_lift_gains_deciles", oracle=_LIFT_ORACLE)
def ml_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains & lift table: score lineitem rows with a
    deterministic linear score (quantity cents + discount), rank
    descending, cut into 10 deciles, and report per-decile positives,
    cumulative gains (share of all positives captured) and lift
    (decile response rate over base rate) — the standard model-eval
    artifact. The global descending rank rides operators/distrank
    (exclusive_prefix over the packed (score, pk) key) and
    ntile_from_rank reproduces ANSI ntile() exactly, so NO corpus-sized
    window exists; the DuckDB oracle's real ntile() certifies the
    arithmetic end-to-end.

    100 TB: two bounded prefix tiers for the rank, one groupBy(decile)
    census (10 cells), a 10x10 self-join for cumulatives, and a 1-row
    broadcast total. Packing asserts pk < 2^41 fail-loud."""
    scored = table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            F.col("l_quantity").cast("bigint") * 100
            + F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint")
        ).alias("s"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("bigint").alias("pk"),
    )
    guard = F.assert_true(
        (F.col("pk") >= 0) & (F.col("pk") < (1 << 41)) & (F.col("s") < (1 << 22)),
        F.lit("ml_lift_gains_deciles: key packing overflow"),
    )
    keyed = scored.select(
        "y",
        F.when(guard.isNull(), (F.col("s") * F.lit(1 << 41)) + F.col("pk")).alias(
            "key"
        ),
    ).localCheckpoint(eager=False)  # rank tiers + total count
    ranked = exclusive_prefix(keyed, "key", ascending=False, out="pre")
    tot = keyed.agg(F.count(F.lit(1)).cast("bigint").alias("gn"))
    t = ranked.join(F.broadcast(tot)).select(
        "y",
        ntile_from_rank(F.col("pre") + 1, F.col("gn"), 10).cast("bigint").alias(
            "decile"
        ),
    )
    pd_ = t.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    ).localCheckpoint(eager=False)  # cum self-join + totals
    cum = (
        pd_.alias("a")
        .join(pd_.alias("b"), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(
            F.any_value("a.n").alias("n"),
            F.any_value("a.pos").alias("pos"),
            F.sum("b.n").cast("bigint").alias("cum_n"),
            F.sum("b.pos").cast("bigint").alias("cum_pos"),
        )
    )
    gt = pd_.agg(
        F.sum("n").cast("bigint").alias("gn"), F.sum("pos").cast("bigint").alias("gp")
    )
    out = cum.join(F.broadcast(gt))
    gains = F.col("cum_pos").cast("double") / F.col("gp")
    lift = (F.col("cum_pos").cast("double") / F.col("cum_n")) / (
        F.col("gp").cast("double") / F.col("gn")
    )
    return out.select(
        "decile",
        "n",
        "pos",
        fround(gains, 6).alias("gains"),
        fround(lift, 6).alias("lift"),
    ).orderBy("decile")
