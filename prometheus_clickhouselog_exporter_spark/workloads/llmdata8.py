"""LLM-data battery, round 3 batch 16: perceptual-hash image dedup,
shingle novelty profiling, and embedding dead-dimension pruning.

The pHash row is the multimodal×dedup crossover the image lane was
built for: a REAL decode → 8×8 aHash → Hamming candidate ranking,
pixel-certified end to end by an oracle that re-derives every sampled
cell from the synthesis formulas (the same discipline as
multimodal_image_features/resize/scene_cuts). Shingle novelty measures
each document's marginal contribution to the corpus — the decreasing-
returns curve dataset curation tracks as ingestion proceeds. Dead-dim
pruning turns the per-dimension variance screen into the actionable
report (which dims to drop, what variance share survives) that sits
in front of embedding_matryoshka_overlap's truncation decision.

Float discipline per workloads/core.py; the pHash lane is INTEGER
end-to-end (scaled luma, division-free mean threshold, bit_count
Hamming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL as _MD5_SQL, fround, md5_long as _md5_long, query, table


@query(
    "multimodal_image_phash_dedup",
    oracle="""
    WITH ids AS (
      SELECT doc_id, 16 + doc_id % 16 AS w, 8 + (doc_id * 3) % 16 AS h
      FROM documents WHERE doc_id < 64
    ),
    cells AS (
      SELECT i.doc_id, gy.i AS gi, gx.j AS gj,
             (gy.i * 8 + gx.j) AS pos,
             299 * ((7 * ((gx.j * i.w) // 8) + i.doc_id) % 256)
             + 587 * ((11 * ((gy.i * i.h) // 8) + i.doc_id) % 256)
             + 114 * ((((gx.j * i.w) // 8) + ((gy.i * i.h) // 8)) % 256)
               AS lum
      FROM ids i, range(8) gy(i), range(8) gx(j)
    ),
    tot AS (
      SELECT doc_id, sum(lum) AS t FROM cells GROUP BY doc_id
    ),
    bits AS (
      SELECT c.doc_id, c.pos,
             CASE WHEN 64 * c.lum > t.t THEN 1 ELSE 0 END AS bit
      FROM cells c JOIN tot t ON c.doc_id = t.doc_id
    ),
    hashes AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN pos < 32
                           THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END)
                  AS BIGINT) AS h_hi,
             CAST(sum(CASE WHEN pos >= 32
                           THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END)
                  AS BIGINT) AS h_lo
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.h_hi, b.h_hi))
                + bit_count(xor(a.h_lo, b.h_lo)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    ORDER BY hamming, id_a, id_b LIMIT 20
    """,
)
def multimodal_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the REAL image
    lane: synthesize spec-correct BMPs, DECODE them (bottom-up/BGR/
    padding traps live), aHash each into 64 bits (8×8 NN grid, integer
    luma, division-free mean threshold), and rank pairs by Hamming
    distance — the image-dedup primitive (aHash is the no-DCT member
    of the pHash family). INTEGER end-to-end, and the oracle
    re-derives every sampled cell, the threshold, the packed bit
    halves, and every pairwise distance from the synthesis formulas —
    a wrong flip, stride, sample index, or bit order anywhere in the
    decode/hash chain shifts some Hamming distance and hash-diverges.

    Scale: hashing is scan-stage mapInPandas (blobs never shuffle —
    only two BIGINTs per image survive). The all-pairs ranking here is
    the bounded-probe exact kernel; at corpus scale the SAME two-column
    hash table feeds the banded-LSH bucket join (split the 64 bits
    into 4×16-bit bands → dedup_minhash_lsh's plan shape) instead of
    a pair join.
    """
    from ..operators.multimodal import ahash_bmp, synth_bmp

    d = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 64
    )
    hashes = ahash_bmp(synth_bmp(d, "doc_id")).localCheckpoint(
        eager=False
    )  # 64 rows of (id, hi, lo); decoded ONCE, joined twice
    a, b = hashes.alias("a"), hashes.alias("b")
    ham = (
        F.bit_count(F.col("a.h_hi").bitwiseXOR(F.col("b.h_hi")))
        + F.bit_count(F.col("a.h_lo").bitwiseXOR(F.col("b.h_lo")))
    ).cast("int")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .orderBy("hamming", "id_a", "id_b")
        .limit(20)
    )


@query(
    "text_shingle_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST(CAST(('0x' || substr(md5(
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             ), 1, 12)) AS UBIGINT) AS BIGINT) AS gh
      FROM toks
    ),
    owner AS (
      SELECT gh, min(doc_id) AS first_doc FROM sh GROUP BY gh
    ),
    per_doc AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN o.first_doc = s.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM sh s JOIN owner o ON s.gh = o.gh
      GROUP BY s.doc_id
    ),
    deciles AS (
      SELECT doc_id, n_shingles, n_novel,
             ntile(10) OVER (ORDER BY doc_id) AS decile
      FROM per_doc
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_shingles) AS BIGINT) AS shingles,
           CAST(sum(n_novel) AS BIGINT) AS novel,
           floor((CAST(sum(n_novel) AS DOUBLE)
                  / CAST(sum(n_shingles) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS novelty_rate
    FROM deciles GROUP BY decile ORDER BY decile
    """,
)
def text_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty curve of the corpus: for each ingestion decile
    (by doc_id order), the share of its 3-gram shingles never seen in
    any earlier document — the decreasing-returns measurement behind
    'is more of this source still adding information?'. First-seen
    ownership is min(doc_id) per shingle (the dedup_chunk_paragraph
    first-doc-wins discipline), all counts exact.

    Scale: one distinct (doc, shingle-hash) pass, one min-aggregate
    keyed by shingle, one join back on the shingle key — the inverted-
    index shape. The decile assignment is DISTRIBUTED rank arithmetic
    (r9, replacing a no-partition ntile window the open-domain linter
    flagged — per_doc is doc-cardinality, which grows with the corpus):
    rank = operators/distrank.exclusive_prefix over doc_id (+1), and
    ntile_from_rank reproduces the ANSI ntile bucket-size algorithm
    from (rank, total) arithmetically — identical on both engines, so
    the oracle keeps its ntile window and the hash proves the rewrite.
    Incremental form: the owner table IS the state — new batches probe
    and extend it.
    """
    from ..operators.distrank import exclusive_prefix, ntile_from_rank
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.lower("text"), " ").alias("t")).filter(
        F.size("t") >= 3
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 2),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at("t", i),
                            F.element_at("t", i + 1),
                            F.element_at("t", i + 2),
                        ),
                    )
                )
            ).alias("g"),
        )
        .select("doc_id", _md5_long(F.col("g")).alias("gh"))
        .distinct()
        .localCheckpoint(eager=False)  # 8-byte shingle postings; owner + join
    )
    owner = sh.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(owner, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .localCheckpoint(eager=False)  # ranked twice inside exclusive_prefix
    )
    n_docs_total = per_doc.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    deciles = (
        exclusive_prefix(per_doc, "doc_id", out="pre")
        .crossJoin(F.broadcast(n_docs_total))
        .withColumn(
            "decile", ntile_from_rank(F.col("pre") + 1, F.col("nd"), 10)
        )
    )
    return (
        deciles.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_shingles").cast("bigint").alias("shingles"),
            F.sum("n_novel").cast("bigint").alias("novel"),
            fround(
                F.sum("n_novel").cast("double")
                / F.sum("n_shingles").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("decile")
    )


@query(
    "embedding_dead_dims",
    oracle="""
    WITH x_long AS (
      SELECT vec_id, r.j AS j, CAST(embedding[r.j + 1] AS DOUBLE) AS xj
      FROM embeddings, range(64) r(j)
    ),
    stats AS (
      SELECT j,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(floor(xj * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sx,
             CAST(sum(CAST(floor(xj * xj * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS sxx
      FROM x_long GROUP BY j
    ),
    vr AS (
      -- per-dim variance quantized to BIGINT so every cross-dim sum
      -- (total + running) is order-free integer arithmetic
      SELECT j, ((sxx / n) - ((sx / n) * (sx / n))) AS var,
             CAST(floor(((sxx / n) - ((sx / n) * (sx / n))) * 1e12) AS BIGINT)
               AS qvar
      FROM stats
    ),
    ranked AS (
      SELECT j, var, qvar,
             row_number() OVER (ORDER BY qvar, j) AS rk,
             sum(qvar) OVER () AS vtot,
             sum(qvar) OVER (ORDER BY qvar, j
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS vcum
      FROM vr
    )
    SELECT CAST(j AS INT) AS dim, CAST(rk AS INT) AS variance_rank,
           floor(var * 1e6 + 0.5) / 1e6 AS variance,
           floor((CAST(vcum AS DOUBLE) / CAST(vtot AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS cum_var_share_dropped,
           (vcum * 100 < vtot) AS prunable_at_1pct
    FROM ranked WHERE rk <= 16 ORDER BY variance_rank
    """,
)
def embedding_dead_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-dimension pruning report: the 16 LOWEST-variance embedding
    dimensions, with the cumulative variance share lost if every dim
    up to this rank were dropped, and a 1%-budget prunability flag —
    the actionable front end to the truncation decision
    embedding_matryoshka_overlap evaluates (that row asks 'does rank
    survive truncation?'; this one asks 'which dims are safe to cut at
    all?'). Variances come from the quantized-exact per-dim moment
    fold (the embedding_outlier_zdist recipe), so ranking and
    cumulative shares are deterministic.

    Scale: one in-row explode + (dim)-keyed moment aggregate — 64
    groups with map-side combine; everything after is 64-row window
    arithmetic.
    """
    emb = table(spark, sf_dir, "embeddings")
    x_long = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("j", "xv"),
    ).select("vec_id", "j", F.col("xv").cast("double").alias("xj"))
    stats = x_long.groupBy("j").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(F.floor(F.col("xj") * 1e9).cast("bigint")).cast("double") / 1e9).alias(
            "sx"
        ),
        (
            F.sum(F.floor(F.col("xj") * F.col("xj") * 1e9).cast("bigint")).cast(
                "double"
            )
            / 1e9
        ).alias("sxx"),
    )
    var = (F.col("sxx") / F.col("n")) - (
        (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))
    )
    # variance quantizes to BIGINT before ANY cross-dim sum (total or
    # running) — the order-free fold rule; ranking also keys on qvar so
    # rank, shares, and the prune flag are all integer-derived
    vr = stats.select("j", var.alias("var"), F.floor(var * 1e12).cast("bigint").alias("qvar"))
    wo = Window.orderBy("qvar", "j")
    ranked = vr.select(
        "j",
        "var",
        "qvar",
        F.row_number().over(wo).alias("rk"),
        F.sum("qvar").over(Window.partitionBy()).alias("vtot"),
        F.sum("qvar").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("vcum"),
    )
    return (
        ranked.filter(F.col("rk") <= 16)
        .select(
            F.col("j").cast("int").alias("dim"),
            F.col("rk").cast("int").alias("variance_rank"),
            fround(F.col("var"), 6).alias("variance"),
            fround(
                F.col("vcum").cast("double") / F.col("vtot").cast("double"), 6
            ).alias("cum_var_share_dropped"),
            (F.col("vcum") * 100 < F.col("vtot")).alias("prunable_at_1pct"),
        )
        .orderBy("variance_rank")
    )


@query(
    "multimodal_phash_banded_candidates",
    oracle="""
    WITH ids AS (
      SELECT doc_id, 16 + doc_id % 16 AS w, 8 + (doc_id * 3) % 16 AS h
      FROM documents WHERE doc_id < 64
    ),
    cells AS (
      SELECT i.doc_id, (gy.i * 8 + gx.j) AS pos,
             299 * ((7 * ((gx.j * i.w) // 8) + i.doc_id) % 256)
             + 587 * ((11 * ((gy.i * i.h) // 8) + i.doc_id) % 256)
             + 114 * ((((gx.j * i.w) // 8) + ((gy.i * i.h) // 8)) % 256)
               AS lum
      FROM ids i, range(8) gy(i), range(8) gx(j)
    ),
    tot AS (SELECT doc_id, sum(lum) AS t FROM cells GROUP BY doc_id),
    bits AS (
      SELECT c.doc_id, c.pos,
             CASE WHEN 64 * c.lum > t.t THEN 1 ELSE 0 END AS bit
      FROM cells c JOIN tot t ON c.doc_id = t.doc_id
    ),
    hashes AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN pos < 32
                           THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END)
                  AS BIGINT) AS h_hi,
             CAST(sum(CASE WHEN pos >= 32
                           THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END)
                  AS BIGINT) AS h_lo
      FROM bits GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, b.band,
             CASE WHEN b.band = 0 THEN h_lo & 65535
                  WHEN b.band = 1 THEN (h_lo >> 16) & 65535
                  WHEN b.band = 2 THEN h_hi & 65535
                  ELSE (h_hi >> 16) & 65535 END AS bh
      FROM hashes, range(4) b(band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
             CAST(bit_count(xor(x.h_hi, y.h_hi))
                  + bit_count(xor(x.h_lo, y.h_lo)) AS INT) AS hamming
      FROM cand c
      JOIN hashes x ON x.doc_id = c.id_a
      JOIN hashes y ON y.doc_id = c.id_b
    )
    SELECT id_a, id_b, hamming
    FROM verified WHERE hamming <= 12
    ORDER BY hamming, id_a, id_b
    """,
)
def multimodal_phash_banded_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path multimodal_image_phash_dedup's docstring promises:
    Hamming-LSH over the same aHash table — split the 64 bits into four
    16-bit bands, bucket-join on (band, band value) so only images
    sharing an EXACT 16-bit slice ever pair (pigeonhole guarantee:
    any pair with Hamming < 4 — fewer differing bits than bands —
    MUST share an untouched band; beyond that, candidacy is
    probabilistic, the standard LSH recall/cost trade), then verify
    candidates with the true bit_count distance and keep ≤ 12. Same plan
    family as dedup_minhash_lsh, instantiated for Hamming space.

    Scale: the pair join is over band buckets, never all-pairs; the
    candidate dedup carries ids only and the hash table joins back at
    sketch size (two BIGINTs per image). Verification is scan-stage
    integer ops.
    """
    from ..operators.multimodal import ahash_bmp, synth_bmp

    d = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 64
    )
    hashes = ahash_bmp(synth_bmp(d, "doc_id")).localCheckpoint(
        eager=False
    )  # (id, hi, lo); feeds bands + both verify sides
    bands = hashes.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        "h_hi",
        "h_lo",
    ).select(
        "doc_id",
        "band",
        F.when(F.col("band") == 0, F.col("h_lo").bitwiseAND(65535))
        .when(F.col("band") == 1, F.shiftright("h_lo", 16).bitwiseAND(65535))
        .when(F.col("band") == 2, F.col("h_hi").bitwiseAND(65535))
        .otherwise(F.shiftright("h_hi", 16).bitwiseAND(65535))
        .alias("bh"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    x = hashes.select(
        F.col("doc_id").alias("xid"),
        F.col("h_hi").alias("xhi"),
        F.col("h_lo").alias("xlo"),
    )
    y = hashes.select(
        F.col("doc_id").alias("yid"),
        F.col("h_hi").alias("yhi"),
        F.col("h_lo").alias("ylo"),
    )
    ham = (
        F.bit_count(F.col("xhi").bitwiseXOR(F.col("yhi")))
        + F.bit_count(F.col("xlo").bitwiseXOR(F.col("ylo")))
    ).cast("int")
    return (
        cand.join(F.broadcast(x), F.col("id_a") == F.col("xid"))
        .join(F.broadcast(y), F.col("id_b") == F.col("yid"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 12)
        .orderBy("hamming", "id_a", "id_b")
    )
