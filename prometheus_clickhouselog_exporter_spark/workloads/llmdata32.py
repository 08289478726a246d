"""Round 10 batch: MATTR lexical diversity, content-defined chunking,
capture–recapture dedup-completeness estimation, and orthogonal
Procrustes alignment — four LLM-data operators, integer-moment exact or
certificate-pinned deterministic, every one DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these surfaces; §2.3 north-star territory.
Methods are public: MATTR (Covington & McFall 2010), content-defined
chunking (Muthitacharoen et al. 2001, LBFS; gear/Rabin-style boundary
masks), the Lincoln–Petersen / Chapman capture–recapture estimator, and
orthogonal Procrustes (Schönemann 1966).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, fround, md5_long, query, table, MD5_SQL

# --- MATTR moving-average type-token ratio --------------------------------------

_MATTR_W = 15

_MATTR_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tokv,
             generate_subscripts(string_split(text, ' '), 1) AS p,
             len(string_split(text, ' ')) AS L
      FROM documents WHERE len(string_split(text, ' ')) >= {_MATTR_W}
    ),
    prev AS (
      SELECT doc_id, lang, p, L,
             coalesce(lag(p) OVER (PARTITION BY doc_id, tokv ORDER BY p), 0)
               AS pv
      FROM tok
    ),
    contrib AS (
      SELECT doc_id, any_value(lang) AS lang, any_value(L) AS L,
             CAST(sum(greatest(0,
               least(p, L - {_MATTR_W} + 1)
               - greatest(1, greatest(p - {_MATTR_W} + 1, pv + 1)) + 1))
               AS BIGINT) AS s
      FROM prev GROUP BY doc_id
    ),
    q AS (
      SELECT lang,
             (s * 1000000000) // ({_MATTR_W} * (L - {_MATTR_W} + 1)) AS q9
      FROM contrib
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS docs,
           floor(CAST(sum(q9) AS DOUBLE) / count(*) / 1e9 * 1e9 + 0.5) / 1e9
             AS avg_mattr
    FROM q GROUP BY lang ORDER BY lang
    """


@query("text_mattr_diversity", oracle=_MATTR_ORACLE)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR lexical diversity (Covington & McFall 2010): the mean
    type-token ratio over every sliding window of W=15 tokens. Instead
    of materializing L-W+1 windows per doc, each token position counts
    the windows in which it is the FIRST in-window occurrence of its
    type — an exact closed form from the previous-occurrence lag:
    contribution(p) = max(0, min(p, L-W+1) - max(1, p-W+1, prev+1) + 1),
    and MATTR = sum(contributions) / (W * (L-W+1)). Everything is exact
    integer arithmetic; the per-doc score quantizes at 1e-9 via integer
    floor-division before the per-lang integer-sum mean.

    100 TB: the only window partitions by (doc, token) — bounded by
    per-doc type frequency; the rest is two map-side-combinable
    groupBys. O(tokens), not O(tokens * W)."""
    tok = (
        fan_out(table(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= _MATTR_W)
        .select(
            "doc_id",
            "lang",
            F.size("ws").alias("L"),
            F.posexplode("ws").alias("p0", "tokv"),
        )
        .withColumn("p", F.col("p0") + 1)
    )
    wlag = Window.partitionBy("doc_id", "tokv").orderBy("p")
    prev = tok.select(
        "doc_id",
        "lang",
        "p",
        "L",
        F.coalesce(F.lag("p").over(wlag), F.lit(0)).alias("pv"),
    )
    lastw = F.col("L") - _MATTR_W + 1
    first_i = F.greatest(
        F.lit(1), F.greatest(F.col("p") - _MATTR_W + 1, F.col("pv") + 1)
    )
    contrib = (
        prev.groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.any_value("L").alias("L"),
            F.sum(
                F.greatest(F.lit(0), F.least(F.col("p"), lastw) - first_i + 1)
            )
            .cast("bigint")
            .alias("s"),
        )
    )
    q9 = F.expr(
        f"(s * 1000000000) div ({_MATTR_W} * (L - {_MATTR_W} + 1))"
    )
    q = contrib.select("lang", q9.alias("q9"))
    return (
        q.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            fround(F.sum("q9").cast("double") / F.count(F.lit(1)) / 1e9, 9).alias(
                "avg_mattr"
            ),
        )
        .orderBy("lang")
    )


# --- content-defined chunking dedup ----------------------------------------------

_CDC_MASK = 8  # boundary when 3-gram hash % 8 == 0 -> ~8-token chunks

_CDC_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tokv,
             generate_subscripts(string_split(text, ' '), 1) AS p
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    h AS (
      SELECT doc_id, p, tokv,
             CASE WHEN lead(tokv, 1) OVER w IS NULL
                    OR lead(tokv, 2) OVER w IS NULL THEN 0
                  WHEN {MD5_SQL.format(
                      x="tokv || ' ' || lead(tokv, 1) OVER w || ' ' || lead(tokv, 2) OVER w")}
                       % {_CDC_MASK} = 0 THEN 1
                  ELSE 0 END AS boundary
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    cid AS (
      SELECT doc_id, p, tokv,
             coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM h
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             {MD5_SQL.format(x="string_agg(tokv, ' ' ORDER BY p)")} AS ch,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM cid GROUP BY doc_id, chunk_id
    ),
    census AS (
      SELECT ch, CAST(count(*) AS BIGINT) AS occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             any_value(n_tokens) AS n_tokens
      FROM chunks GROUP BY ch
    )
    SELECT CAST(sum(occurrences) AS BIGINT) AS total_chunks,
           CAST(count(*) AS BIGINT) AS distinct_chunks,
           CAST(count(*) FILTER (n_docs > 1) AS BIGINT) AS cross_doc_chunks,
           CAST(sum((occurrences - 1) * n_tokens) AS BIGINT)
             AS dedupable_tokens
    FROM census
    """


@query("dedup_cdc_chunking", oracle=_CDC_ORACLE)
def dedup_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (LBFS, Muthitacharoen et al. 2001):
    chunk boundaries fall where the rolling 3-gram hash % 8 == 0, so an
    insertion in one doc shifts only its local chunk — unlike fixed-size
    chunking, identical passages align across docs regardless of offset.
    Chunks are content-addressed (md5 of the ordered token run) and the
    census reports total/distinct/cross-doc chunks plus the dedupable
    token mass. Chunk assembly uses ORDER-PINNED aggregation
    (array_sort(collect_list(struct(p, tok))) / string_agg ORDER BY) —
    never a bare collect_list.

    100 TB: boundary detection and chunk-id assignment are per-doc
    windows (bounded by doc length); the census shuffles (chunk_hash)
    longs with map-side combine. This is the storage-dedup primitive
    fixed chunking (dedup_chunk_containment) cannot express."""
    tok = (
        fan_out(table(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= 3)
        .select("doc_id", F.posexplode("ws").alias("p", "tokv"))
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    nxt1 = F.lead("tokv", 1).over(w)
    nxt2 = F.lead("tokv", 2).over(w)
    gram = F.concat_ws(" ", F.col("tokv"), nxt1, nxt2)
    boundary = (
        F.when(nxt1.isNull() | nxt2.isNull(), F.lit(0))
        .when(F.pmod(md5_long(gram), F.lit(_CDC_MASK)) == 0, F.lit(1))
        .otherwise(F.lit(0))
    )
    h = tok.select("doc_id", "p", "tokv", boundary.alias("boundary"))
    wcum = w.rowsBetween(Window.unboundedPreceding, -1)
    cid = h.select(
        "doc_id",
        "p",
        "tokv",
        F.coalesce(F.sum("boundary").over(wcum), F.lit(0)).alias("chunk_id"),
    )
    ordered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "tokv"))),
            lambda x: x["tokv"],
        ),
        " ",
    )
    chunks = cid.groupBy("doc_id", "chunk_id").agg(
        md5_long(ordered).alias("ch"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )
    census = chunks.groupBy("ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("occurrences"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.any_value("n_tokens").alias("n_tokens"),
    )
    return census.agg(
        F.sum("occurrences").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
        F.count_if(F.col("n_docs") > 1).cast("bigint").alias("cross_doc_chunks"),
        F.sum((F.col("occurrences") - 1) * F.col("n_tokens"))
        .cast("bigint")
        .alias("dedupable_tokens"),
    )


# --- capture-recapture dedup completeness -----------------------------------------

_CR_DF_CAP = 50

_CR_SQL_CAPTURE = """
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM {m} a JOIN {m} b ON a.mh = b.mh AND a.doc_id < b.doc_id
      WHERE a.mh IN (SELECT mh FROM {m} GROUP BY mh
                     HAVING count(*) <= {cap})
"""

_CR_ORACLE = f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tokv
      FROM documents
    ),
    ma AS (
      SELECT doc_id,
             min({MD5_SQL.format(x="tokv || '|A'")}) AS mh
      FROM tok GROUP BY doc_id
    ),
    mb AS (
      SELECT doc_id,
             min({MD5_SQL.format(x="tokv || '|B'")}) AS mh
      FROM tok GROUP BY doc_id
    ),
    ca AS ({_CR_SQL_CAPTURE.format(m='ma', cap=_CR_DF_CAP)}),
    cb AS ({_CR_SQL_CAPTURE.format(m='mb', cap=_CR_DF_CAP)}),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM ca),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM cb),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m
          FROM ca JOIN cb USING (doc_a, doc_b))
    SELECT n1, n2, m,
           CAST((n1 + 1) * (n2 + 1) AS BIGINT) // (m + 1) - 1
             AS chapman_estimate
    FROM n1 CROSS JOIN n2 CROSS JOIN m
    """


@query("dedup_capture_recapture_estimate", oracle=_CR_ORACLE)
def dedup_capture_recapture_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capture–recapture estimation of the near-duplicate pair
    population (Lincoln–Petersen with the Chapman bias correction):
    two INDEPENDENT captures, each the pair set sharing a doc-level
    min-hash under a distinct salt — a min-hash collision samples a
    similar pair with probability equal to its Jaccard, so each capture
    is a Jaccard-weighted draw from the same population and
    N-hat = (n1+1)(n2+1)/(m+1) - 1 estimates the total mass the LSH
    pipeline should eventually surface. This is the completeness audit
    a dedup pipeline runs to decide whether MORE bands are worth it.
    The estimate is an exact integer floor-division — no floats at all.

    100 TB: each capture is one groupBy(doc) min + a DF-capped
    hash-keyed pair join (the stop-gram guard again); the overlap is a
    pair-keyed equi-join of two pair lists that are tiny relative to
    the corpus."""
    tok = (
        fan_out(table(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(F.split("text", " ")).alias("tokv"))
        .distinct()
        .localCheckpoint(eager=False)  # two capture passes
    )

    def capture(salt: str) -> DataFrame:
        mh = tok.groupBy("doc_id").agg(
            F.min(md5_long(F.concat(F.col("tokv"), F.lit(f"|{salt}")))).alias("mh")
        ).localCheckpoint(eager=False)  # DF cap + both join sides
        ok = mh.groupBy("mh").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= _CR_DF_CAP
        )
        a = mh.join(ok.select("mh"), "mh", "left_semi")
        b = a.select("mh", F.col("doc_id").alias("doc_b"))
        return (
            a.join(b, "mh")
            .where(F.col("doc_id") < F.col("doc_b"))
            .select(F.col("doc_id").alias("doc_a"), "doc_b")
        )

    ca = capture("A").localCheckpoint(eager=False)
    cb = capture("B").localCheckpoint(eager=False)
    n1 = ca.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = cb.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    m = ca.join(cb, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    return (
        n1.join(F.broadcast(n2))
        .join(F.broadcast(m))
        .select(
            "n1",
            "n2",
            "m",
            F.expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1").alias(
                "chapman_estimate"
            ),
        )
    )


# --- orthogonal Procrustes alignment certificate -----------------------------------

_PRO_D = 32
_PRO_Q = 10**6

_PRO_ORACLE = f"""
    SELECT CAST({_PRO_D} AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           true AS improved, true AS r_orthogonal
    FROM embeddings
    """


@query("embedding_procrustes_alignment", oracle=_PRO_ORACLE)
def embedding_procrustes_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthogonal Procrustes (Schönemann 1966): the rotation R = U V^T
    from the SVD of M = X^T Y aligning the first 32 embedding dims (X)
    onto the last 32 (Y) — the embedding-space alignment step model
    surgery / cross-encoder distillation pipelines run. The three
    moment matrices (X^T X, X^T Y, Y^T Y) are distributed integer sums
    of per-cell quantized products (1e-6 grid, the CKA/ZCA discipline:
    d^2-bounded, deterministic); only the 32x32 SVD runs on the driver
    (bounded by dim, not data — the documented coarse-trainer class).
    Both residuals then come from the SAME moment matrices via
    ||XR - Y||_F^2 = tr(R^T Sxx R) - 2 tr(R^T Sxy) + tr(Syy), so the
    certificate (alignment improved; R^T R = I within 1e-9) is exact
    given the quantized moments; pytest pins the numeric residuals.

    Certificate-style oracle (the ANN-rung pattern): DuckDB cannot SVD,
    so the hash pins n/dim plus the two literal booleans; the numeric
    contract lives in tests/test_r10_batch6.py.

    100 TB: one pass builds all three moment matrices as 3*d^2 exact
    int64 sums (map-side combinable); driver work is O(d^3) on a 32x32
    matrix regardless of corpus size."""
    # fan_out: the single-row-group embeddings parquet otherwise pins
    # the d^2-per-row moment fan-out to ONE core (the ledoit-wolf
    # lesson, SCALE.md r13)
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    d = _PRO_D
    q = _PRO_Q
    # quantized per-cell products, summed as exact int64
    cells = emb.select(
        F.expr(
            f"""
            flatten(transform(sequence(0, {d - 1}), i ->
              transform(sequence(0, {d - 1}), j -> struct(
                i as i, j as j,
                cast(floor(cast(embedding[i] as double)
                           * cast(embedding[j] as double) * {q} + 0.5) as bigint)
                  as xx,
                cast(floor(cast(embedding[i] as double)
                           * cast(embedding[j + {d}] as double) * {q} + 0.5)
                     as bigint) as xy,
                cast(floor(cast(embedding[i + {d}] as double)
                           * cast(embedding[j + {d}] as double) * {q} + 0.5)
                     as bigint) as yy))))
            """
        ).alias("cells")
    ).select(F.explode("cells").alias("c")).select(
        F.col("c.i").alias("i"),
        F.col("c.j").alias("j"),
        F.col("c.xx").alias("xx"),
        F.col("c.xy").alias("xy"),
        F.col("c.yy").alias("yy"),
    )
    mom = (
        cells.groupBy("i", "j")
        .agg(
            F.sum("xx").alias("sxx"),
            F.sum("xy").alias("sxy"),
            F.sum("yy").alias("syy"),
        )
        .collect()  # bounded: exactly d^2 = 1024 rows, corpus-independent
    )
    sxx = np.zeros((d, d))
    sxy = np.zeros((d, d))
    syy = np.zeros((d, d))
    for r in mom:
        sxx[r.i, r.j] = r.sxx / q
        sxy[r.i, r.j] = r.sxy / q
        syy[r.i, r.j] = r.syy / q
    u, _, vt = np.linalg.svd(sxy)
    rot = u @ vt
    before = float(np.trace(sxx) - 2 * np.trace(sxy) + np.trace(syy))
    after = float(
        np.trace(rot.T @ sxx @ rot) - 2 * np.trace(rot.T @ sxy) + np.trace(syy)
    )
    orth = float(np.abs(rot.T @ rot - np.eye(d)).max())
    n = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # stash numerics for pytest without polluting the hashed schema
    embedding_procrustes_alignment.last_numerics = {
        "residual_identity": before,
        "residual_rotated": after,
        "orthogonality_err": orth,
    }
    return n.select(
        F.lit(d).cast("bigint").alias("dim"),
        "n",
        F.lit(bool(after <= before + 1e-9)).alias("improved"),
        F.lit(bool(orth < 1e-9)).alias("r_orthogonal"),
    )
