"""Training-data pipeline operators, round 3 batch 2+: entity-resolution
blocking join, k-anonymity suppression, per-cohort anomaly scoring,
closed-form EWMA, embedding quantization (scalar audit + PQ-ADC +
IVF-PQ), JL random projection, TF-IDF top terms, and the certified
real-audio multimodal lane.

All are standard curation/analytics moves re-expressed as single
Catalyst plans: the ER pattern is the blocking-join shape every record
linkage system uses (block key → in-block verify, never all-pairs); the
EWMA shows how a sequential recurrence becomes ONE aggregation via its
algebraic closed form; the quantization family is the compression step
an ANN serving tier runs before indexing (16x memory cut for float32
vectors at 8-bit PQ codes).

Reference analog: these generalize the exporter's enrich-and-aggregate
loop (query.go:180-268) from log sessions to corpus records; none have a
direct single-node counterpart because they only matter at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, ANN_CERT_ORACLE, corpus_key, fround, money, query, table


@query(
    "er_blocked_name_match",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[2] AS blk FROM part
    )
    SELECT a.p_partkey,
           count(*)                         AS n_candidates,
           CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
           CAST(min(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_lev
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
    GROUP BY a.p_partkey
    """,
)
def er_blocked_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocking join: parts sharing a block key (the
    name's noun — in real linkage a phonetic/sorted-neighborhood key) are
    candidate pairs; edit distance ≤ 2 inside the block confirms a match.
    Per record: candidate count, match count, closest distance.

    Plan shape — DISTINCT-FIRST: heavy-duplication domains (names, URLs,
    addresses — this corpus has 64 distinct names over 20k rows at sf0.1)
    make the record-level block join quadratic in the duplication factor:
    record pairs = Σ|block|² ≈ 50M here, measured 45 s. Comparing the
    DISTINCT (name, count) table pairwise instead (64² capped by block)
    and fanning per-name stats back to records by a broadcast join gives
    the identical result in ~0.4 s: pair work collapses by the squared
    duplication factor and the record table never shuffles at all.

    100 TB: the distinct-name table is bounded by vocabulary, not corpus
    (the crawl-scale analog: canonical URLs/domains); when distinct ≈ n
    (synthetic keys) this degenerates gracefully to the classic blocked
    join — Σ|b|² distinct pairs, never all-pairs — with AQE skew-split
    and a block-size cap (dedup_ngram_jaccard's posting prune) bounding
    the hot "smith" block. Levenshtein is JVM codegen, no UDF, and only
    ever runs on DISTINCT pairs.
    """
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.split("p_name", " ").getItem(1).alias("blk")
    )
    # Vocabulary-sized distinct table feeding both pair sides —
    # checkpoint once (SCALE.md doctrine) so the part scan+distinct
    # doesn't run 3× (once per alias plus the record fan-back).
    names = (
        p.groupBy("blk", "p_name").agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = names.select("blk", F.col("p_name").alias("na"), F.col("cnt").alias("ca"))
    b = names.select("blk", F.col("p_name").alias("nb"), F.col("cnt").alias("cb"))
    lev = F.levenshtein(F.col("na"), F.col("nb"))
    per_name = (
        a.join(b, "blk")
        .select("na", "ca", "cb", lev.alias("lev"), (F.col("na") == F.col("nb")).alias("self"))
        .groupBy("na", "ca")
        .agg(
            F.sum("cb").alias("tot_block"),
            F.sum(F.when(F.col("lev") <= 2, F.col("cb")).otherwise(0)).alias("match_cnt"),
            F.min(F.when(~F.col("self"), F.col("lev"))).alias("min_other"),
        )
    )
    return (
        p.join(F.broadcast(per_name), p["p_name"] == per_name["na"])
        .select(
            "p_partkey",
            (F.col("tot_block") - 1).alias("n_candidates"),
            (F.col("match_cnt") - 1).alias("n_matches"),
            F.when(F.col("ca") >= 2, F.lit(0))
            .otherwise(F.col("min_other"))
            .cast("long")
            .alias("min_lev"),
        )
        .filter(F.col("n_candidates") > 0)
    )


@query(
    "kanon_group_suppression",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING count(*) >= 12
    """,
)
def kanon_group_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate: aggregate by quasi-identifier columns and
    SUPPRESS groups smaller than k=12 — the PII-hygiene step before
    publishing per-cohort statistics from training data (rare combinations
    identify individuals). Sums stay in exact DECIMAL (cross-engine float
    discipline, workloads/core.py).

    100 TB: one partial+final aggregation; the HAVING filter is evaluated
    post-agg on group-count rows, so suppressed groups never materialize
    output. No extra pass over the data for the gate.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(money(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
        )
        .filter(F.col("n_customers") >= 12)
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           floor((e.value - s.m) / s.sd * 10000 + 0.5) / 10000 AS zscore
    FROM events e JOIN s USING (event_type)
    WHERE e.value IS NOT NULL AND abs(e.value - s.m) / s.sd > 3
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cohort anomaly flagging: events whose value sits more than 3
    population standard deviations from their event-type mean. The
    data-quality outlier gate a curation pipeline runs on numeric
    telemetry before aggregating it.

    100 TB: the stats side is a 5-row aggregate — broadcast back onto the
    scan, so the detector is ONE full pass + a map-side join; no shuffle
    of the event stream. (A windowed variant would shuffle by type; the
    broadcast form is strictly better for global-per-cohort stats.)
    """
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_pop("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        e.join(F.broadcast(s), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", "value", fround(z, 4).alias("zscore"))
    )


@query(
    "ewma_user_value",
    oracle="""
    WITH ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*)    OVER (PARTITION BY user_id) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           floor(sum(CASE WHEN rn = 1 THEN value * pow(0.8, n - 1)
                          ELSE 0.2 * value * pow(0.8, n - rn) END) * 10000 + 0.5)
             / 10000 AS ewma
    FROM ordered GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values
    (final smoothed level, α = 0.2) — the classic "sequential recurrence"
    that looks like it needs an ordered loop:

        s_i = α·v_i + (1−α)·s_{i−1},  s_1 = v_1

    computed instead from the closed form
    s_n = Σ_{i≥2} α(1−α)^{n−i} v_i + (1−α)^{n−1} v_1 — ONE window (rank +
    per-user count ride the same (user_id, ts) sort) and ONE aggregation.

    100 TB: no iterative driver loop, no applyInPandas; the recurrence
    becomes algebra and Catalyst sees a plain shuffle-once window + agg.
    The weights (1−α)^(n−i) underflow to 0.0 identically in any IEEE
    engine for ancient events, which is also the semantics you want.
    """
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    t = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1, F.col("value") * F.pow(F.lit(0.8), F.col("n") - 1)
    ).otherwise(0.2 * F.col("value") * F.pow(F.lit(0.8), F.col("n") - F.col("rn")))
    return t.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        fround(F.sum(term), 4).alias("ewma"),
    )


@query(
    "embedding_scalar_quantization",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    stats AS (
      SELECT dim, min(v) AS mn, max(v) AS mx FROM dims GROUP BY dim
    ),
    coded AS (
      SELECT d.vec_id, d.label, d.v,
             d.mn + floor((d.v - d.mn) / (d.mx - d.mn) * 255 + 0.5)
                    * (d.mx - d.mn) / 255 AS deq
      FROM (SELECT dims.*, stats.mn, stats.mx FROM dims JOIN stats USING (dim)) d
    ),
    per_vec AS (
      SELECT vec_id, label, avg((v - deq) * (v - deq)) AS mse
      FROM coded GROUP BY vec_id, label
    )
    SELECT label, count(*) AS n_vecs,
           floor(avg(mse) * 1e9 * 10000 + 0.5) / 10000 AS mse_x1e9
    FROM per_vec GROUP BY label
    """,
)
def embedding_scalar_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension min-max) int8 quantization of the embedding
    table with reconstruction-error audit: codes q = round((v−mn)/(mx−mn)
    ·255), dequantized v' = mn + q·(mx−mn)/255, per-label mean squared
    reconstruction error (×1e9 for legible rounding). The compression
    step before ANN indexing — 4× memory cut for float32 vectors, and
    the audit says what it costs in fidelity per label.

    100 TB: dimension stats are a 64-row aggregate over the posexploded
    scan (partial agg makes the shuffle 64 rows/partition); they broadcast
    back, so quantize+audit is scan-stage arithmetic. The same plan shape
    writes the actual int8 codes (select q instead of the error) — the
    audit and the export share one pass.
    """
    emb = table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding")).alias("dim", "vf")
    ).select("vec_id", "label", "dim", F.col("vf").cast("double").alias("v"))
    stats = dims.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    scale = (F.col("mx") - F.col("mn")) / 255
    q = F.floor((F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255 + F.lit(0.5))
    deq = F.col("mn") + q * scale
    err = (F.col("v") - deq) * (F.col("v") - deq)
    per_vec = (
        dims.join(F.broadcast(stats), "dim")
        .groupBy("vec_id", "label")
        .agg(F.avg(err).alias("mse"))
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        fround(F.avg("mse") * 1e9, 4).alias("mse_x1e9"),
    )


def _jl_signs(dim: int, k: int):
    """±1 Achlioptas projection signs derived from md5 — the SAME value is
    computable in any engine with an md5 function, so the projection needs
    no RNG state and the oracle can rebuild the matrix bit-for-bit:
    sign(i,j) = +1 iff the first hex digit of md5("jl:i:j") is even."""
    import hashlib

    import numpy as np

    m = np.empty((dim, k), dtype=np.float64)
    for i in range(dim):
        for j in range(k):
            h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
            m[i, j] = 1.0 if int(h[0], 16) % 2 == 0 else -1.0
    return m


@query(
    "embedding_random_projection",
    oracle="""
    WITH sgn AS (
      SELECT j, i,
             CASE WHEN CAST(('0x' || substr(md5('jl:' || i || ':' || j), 1, 1)) AS INT)
                       % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM generate_series(0, 15) t1(j), generate_series(0, 63) t2(i)
    )
    SELECT e.vec_id, s.j AS out_dim,
           floor(sum(CAST(e.embedding[s.i + 1] AS DOUBLE) * s.s) / sqrt(16)
                 * 10000 + 0.5) / 10000 AS y
    FROM embeddings e, sgn s
    GROUP BY e.vec_id, s.j
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction 64 → 16 with a ±1
    (Achlioptas) projection whose signs derive from md5, not an RNG — so
    every task, every retry, and the DuckDB oracle rebuild the identical
    matrix from nothing but (i, j). The projection itself is one numpy
    matmul per Arrow batch (matrix multiply has no vectorized expression
    form — the same "Pandas UDF where expressions can't" rule as the
    blocked-GEMM kernel).

    100 TB: embarrassingly parallel scan-stage map, no shuffle at all;
    the 64×16 matrix is rebuilt per task from the closed form (nothing
    broadcast). JL guarantees pairwise-distance preservation at
    k = O(ln n / ε²) — the standard pre-step before ANN indexing when
    vectors arrive wider than the index wants.
    """
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    dim, k = 64, 16
    m = _jl_signs(dim, k) / (k**0.5)

    def gen(batches):
        import numpy as np

        for pdf in batches:
            v = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            y = v @ m
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), k),
                    "out_dim": np.tile(np.arange(k, dtype=np.int64), n),
                    "y": y.reshape(-1),
                }
            )

    out = emb.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id bigint, out_dim bigint, y double"
    )
    return out.select("vec_id", "out_dim", fround(F.col("y"), 4).alias("y"))


@query(
    "text_tfidf_topterms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * (n.n_docs + 1) / (df.df + 1) AS score
      FROM tf JOIN df USING (tok), n
    ),
    ranked AS (
      SELECT doc_id, tok, floor(score * 10000 + 0.5) / 10000 AS score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, tok) AS rk
      FROM scored
    )
    SELECT doc_id, tok, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf, with the
    LOG-FREE idf variant idf = (N+1)/(df+1): the ratio of exact integers
    under one IEEE division is bit-identical in every engine, whereas
    ln() is libm-specific and a 1-ulp divergence could flip a rank
    boundary. (Monotone in df like the log form; documented trade.)

    100 TB: tf is one (doc, token) aggregation, localCheckpoint'd so the
    df aggregation and the score join read it instead of re-running the
    tokenize+explode+agg chain per consumer (checkpoint-once doctrine,
    SCALE.md; previously documents×3). N stays its own scan — it is a
    count(*) with every column pruned (footer-metadata cheap), and
    deriving it from tf would miss NULL-text documents. The per-doc
    top-3 plans as WindowGroupLimit — map-side top-N below the doc
    shuffle, the sample_source_quota trick.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = (
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df_, "tok").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "tok",
        fround(
            F.col("tf") * (F.col("n_docs") + 1) / (F.col("df") + 1), 4
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "score", "rk")
    )


@query(
    "multimodal_audio_features",
    oracle="""
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(2000 AS INT) AS n_samples,
           CAST(100 + (doc_id % 25) * 8 AS DOUBLE) AS dominant_freq_hz
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio pipeline end-to-end: synthesize spec-correct RIFF/WAVE
    PCM16 blobs (sine at 100 + (id%25)·8 Hz — an exact FFT bin), decode
    them back with the pure-numpy WAV parser, and extract the dominant
    frequency via rfft. The oracle PREDICTS the DSP result
    arithmetically: if header parsing, PCM decoding, or the FFT feature
    were wrong anywhere, the hash would diverge. This is the certified
    (non-stub) lane of the multimodal story; image/video remain gated on
    codec libraries.

    100 TB: encode and decode are scan-stage mapInPandas (no shuffle);
    blobs are dropped inside the decode operator so only the slim feature
    columns ever reach an exchange — the wide-row rule for media columns.
    """
    from ..operators.multimodal import decode_wav_features, synth_wav

    d = table(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 200)
    wav = synth_wav(d, "doc_id")
    feats = decode_wav_features(wav)
    return feats.select("doc_id", "sample_rate", "n_samples", "dominant_freq_hz")


@query("similarity_pq_adc_topk", oracle=ANN_CERT_ORACLE)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate nearest neighbors, emitted as the
    certify_topk_bound certificate: every returned neighbor's TRUE
    cosine (re-scored — PQ ranks by compressed ADC distance) within
    ε=0.30 of the exact 10th-best (measured worst margin 0.147 across
    3 SFs; the loosest rung of the ladder, as 16-byte codes should be).
    Formerly rows-only (k-means codebooks are not SQL-reproducible);
    recall floors stay pinned in tests/test_llmdata.py. Completes the
    ANN ladder: brute force (exact) → sign-LSH (bucketed) → IVF
    (cell-probed) → PQ-ADC (compressed scan): 16 bytes/vector,
    distances via n_sub table lookups, the FAISS IndexPQ shape."""
    from ..operators.similarity import certify_topk_bound, pq_adc_topk

    emb = fan_out(table(spark, sf_dir, "embeddings")).localCheckpoint(
        eager=False
    )  # scan once: ANN op + certifier exact/rescore reuse it
    queries_df = emb.filter(F.col("vec_id") < 8)
    ap = pq_adc_topk(
        emb, queries_df, "embedding", "vec_id", "vec_id", k=10,
        train_cache_key=corpus_key(sf_dir, "embeddings"),
    )
    return certify_topk_bound(emb, ap, "embedding", "vec_id", queries_df, "vec_id", k=10, eps=0.30)


@query("similarity_ivfpq_topk", oracle=ANN_CERT_ORACLE)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate nearest neighbors, emitted as the
    certify_topk_bound certificate (ε=0.30; measured worst margin 0.134
    across 3 SFs). Formerly rows-only; recall pinned in
    tests/test_llmdata.py. The production FAISS shape: coarse cells
    prune the corpus to n_probe/n_cells, residual PQ codes (16
    bytes/vector) score candidates by ADC table lookups — on this iid
    corpus recall ~= the IVF pruning ceiling, i.e. residual coding costs
    almost nothing."""
    from ..operators.similarity import certify_topk_bound, ivfpq_topk

    emb = fan_out(table(spark, sf_dir, "embeddings")).localCheckpoint(
        eager=False
    )  # scan once: ANN op + certifier exact/rescore reuse it
    queries_df = emb.filter(F.col("vec_id") < 8)
    ap = ivfpq_topk(
        emb, queries_df, "embedding", "vec_id", "vec_id", k=10,
        train_cache_key=corpus_key(sf_dir, "embeddings"),
    )
    return certify_topk_bound(emb, ap, "embedding", "vec_id", queries_df, "vec_id", k=10, eps=0.30)


@query(
    "text_token_bpe_regex",
    oracle=r"""
    WITH toks AS (
      SELECT e.event_type, t.tok
      FROM events e,
           unnest(regexp_extract_all(e.props,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS t(tok)
    )
    SELECT event_type,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN regexp_matches(tok, '^[A-Za-z]+$') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_word,
           CAST(sum(CASE WHEN regexp_matches(tok, '^[0-9]+$') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_number,
           -- regexp_matches (partial, = Spark rlike), NOT '~' which DuckDB
           -- binds to regexp_full_match and would reject '99' here
           CAST(sum(CASE WHEN regexp_matches(tok, '^[A-Za-z0-9]') THEN 0 ELSE 1 END)
                AS BIGINT) AS n_punct,
           count(DISTINCT tok) AS n_vocab
    FROM toks GROUP BY event_type
    """,
)
def text_token_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counting (the GPT-2 pre-tokenizer's shape,
    restricted to character classes both Java regex and RE2 treat
    identically: letter runs | digit runs | punctuation runs). Run over
    the punctuation-rich JSON props column — word/number/punct splits and
    vocabulary size per event type, the token-budget accounting step of a
    training-data pipeline when the real tokenizer is not on the cluster.

    100 TB: regexp_extract_all + explode evaluate in the scan stage; the
    per-type aggregation's distinct-count re-keys by (type, tok), which
    partial aggregation collapses to vocabulary cardinality per mapper.
    """
    e = table(spark, sf_dir, "events")
    toks = e.select(
        "event_type",
        F.explode(
            F.expr(r"regexp_extract_all(props, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+', 0)")
        ).alias("tok"),
    )
    is_word = F.col("tok").rlike(r"^[A-Za-z]+$")
    is_num = F.col("tok").rlike(r"^[0-9]+$")
    is_alnum_start = F.col("tok").rlike(r"^[A-Za-z0-9]")
    return toks.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(is_word, 1).otherwise(0)).alias("n_word"),
        F.sum(F.when(is_num, 1).otherwise(0)).alias("n_number"),
        F.sum(F.when(is_alnum_start, 0).otherwise(1)).alias("n_punct"),
        F.countDistinct("tok").alias("n_vocab"),
    )


@query(
    "multimodal_image_features",
    oracle="""
    WITH ids AS (
      SELECT doc_id, 16 + doc_id % 16 AS w, 8 + (doc_id * 3) % 16 AS h
      FROM documents WHERE doc_id < 64
    ),
    px AS (
      SELECT i.doc_id, i.w, i.h,
             (7 * x.x + i.doc_id) % 256 AS r,
             (11 * y.y + i.doc_id) % 256 AS g,
             (x.x + y.y) % 256 AS b
      FROM ids i,
           unnest(range(0, i.w)) AS x(x),
           unnest(range(0, i.h)) AS y(y)
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           avg(r) AS mean_r, avg(g) AS mean_g, avg(b) AS mean_b,
           CAST((22 + doc_id) % 256 AS INT) AS probe_g12
    FROM px GROUP BY doc_id, w, h
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image pipeline end-to-end: synthesize spec-correct 24-bit
    BMPs (bottom-up rows, BGR order, 4-byte row padding — the three
    classic decode traps), decode them back with the pure-numpy BMP
    parser, and extract per-channel means plus a positional probe pixel.
    The oracle PREDICTS every feature arithmetically from the pixel
    formulas — a wrong vertical flip, channel order, or padding stride
    anywhere would hash-diverge (the probe pixel G(x=1, y=2) is
    specifically what a forgotten flip corrupts). Companion to the
    certified audio lane (multimodal_audio_features); only compressed
    codecs (JPEG/PNG/video) remain library-gated.

    100 TB: encode and decode are scan-stage mapInPandas; blobs are
    dropped inside the decode operator so only slim feature columns ever
    reach an exchange (the wide-row rule for media columns).
    """
    from ..operators.multimodal import decode_bmp_features, synth_bmp

    d = table(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 64)
    bmp = synth_bmp(d, "doc_id")
    feats = decode_bmp_features(bmp)
    return feats.select(
        "doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "probe_g12"
    )


@query(
    "multimodal_video_features",
    oracle="""
    WITH ids AS (
      SELECT doc_id, 16 + (doc_id % 8) * 2 AS w, 8 + (doc_id % 6) * 2 AS h,
             3 + doc_id % 4 AS nf
      FROM documents WHERE doc_id < 48
    ),
    smp AS (
      SELECT i.doc_id, i.w, i.h, i.nf,
             (5 * x.x + 3 * y.y + 17 * t.t + i.doc_id) % 256 AS yv
      FROM ids i,
           unnest(range(0, i.w)) AS x(x),
           unnest(range(0, i.h)) AS y(y),
           unnest(range(0, i.nf)) AS t(t)
    ),
    mo AS (
      SELECT i.doc_id,
             avg(abs((5 * x.x + 3 * y.y + 17 * t.t + i.doc_id) % 256
                     - (5 * x.x + 3 * y.y + 17 * (t.t - 1) + i.doc_id) % 256))
               AS motion
      FROM ids i,
           unnest(range(1, i.nf)) AS t(t),
           unnest(range(0, i.w)) AS x(x),
           unnest(range(0, i.h)) AS y(y)
      GROUP BY i.doc_id
    )
    SELECT s.doc_id,
           CAST(max(s.w) AS INT) AS width,
           CAST(max(s.h) AS INT) AS height,
           CAST(max(s.nf) AS INT) AS n_frames,
           avg(s.yv) AS mean_y,
           max(mo.motion) AS motion,
           CAST((28 + s.doc_id) % 256 AS INT) AS probe_y
    FROM smp s JOIN mo USING (doc_id)
    GROUP BY s.doc_id
    """,
)
def multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pipeline end-to-end, completing the modality trio:
    synthesize YUV4MPEG2 streams (the uncompressed interchange container
    ffmpeg/mpv/x264 accept — like BMP and WAV it needs no codec
    library), decode them back with the pure-numpy y4m parser, and
    extract temporal features: clip luma mean, mean inter-frame |ΔY|
    motion, and a probe sample Y(1,2) of frame 1. The oracle PREDICTS
    all of it arithmetically from the sample formulas — a plane-offset
    miscount (reading chroma as luma), a frame-marker skip, or a wrong
    frame count hash-diverges. Only compressed codecs (H.264/VP9/JPEG)
    remain library-gated, as documented stubs.

    100 TB: encode/decode are scan-stage mapInPandas; media bytes never
    reach an exchange (features extracted, blobs dropped in-operator).
    Frame sampling for training (every-nth-frame) composes as a second
    mapInPandas over the same stream — `frame_sample_stub` shows the
    row-expanding shape.
    """
    from ..operators.multimodal import decode_y4m_features, synth_y4m

    d = table(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 48)
    vid = synth_y4m(d, "doc_id")
    feats = decode_y4m_features(vid)
    return feats.select(
        "doc_id", "width", "height", "n_frames", "mean_y", "motion", "probe_y"
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH ids AS (
      SELECT doc_id, 16 + (doc_id % 8) * 2 AS w, 8 + (doc_id % 6) * 2 AS h,
             3 + doc_id % 4 AS nf
      FROM documents WHERE doc_id < 48
    ),
    kept AS (
      SELECT i.doc_id, i.w, i.h, t.t
      FROM ids i, unnest(range(0, i.nf)) AS t(t)
      WHERE t.t % 2 = 0
    )
    SELECT k.doc_id, CAST(k.t AS INT) AS frame_idx,
           CAST(k.w AS INT) AS width, CAST(k.h AS INT) AS height,
           avg((5 * x.x + 3 * y.y + 17 * k.t + k.doc_id) % 256)
             AS frame_mean_y
    FROM kept k,
         unnest(range(0, k.w)) AS x(x),
         unnest(range(0, k.h)) AS y(y)
    GROUP BY k.doc_id, k.t, k.w, k.h
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame extraction over the REAL video lane: every
    2nd frame of each y4m clip becomes its own row with per-frame luma
    mean — the one-media-row → k-training-rows shape a vision pipeline
    runs before feature extraction. Data-dependent fan-out (frame count
    varies per clip) is why this is mapInPandas rather than a fixed
    explode. The oracle predicts each kept frame's mean arithmetically,
    so a stride bug that sampled the wrong frames or mis-walked plane
    offsets hash-diverges.

    100 TB: decode + sample is scan-stage; output rows are slim feature
    tuples (no pixels), so the downstream shuffle (if any) carries
    O(kept frames) small rows. Keep-every-n composes with the
    deterministic samplers (operators/sampling.py) for clip-level
    subsetting first.
    """
    from ..operators.multimodal import sample_y4m_frames, synth_y4m

    d = table(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 48)
    return sample_y4m_frames(synth_y4m(d, "doc_id"))


@query(
    "multimodal_image_resize",
    oracle="""
    WITH ids AS (
      SELECT doc_id, 16 + doc_id % 16 AS w, 8 + (doc_id * 3) % 16 AS h
      FROM documents WHERE doc_id < 64
    ),
    px AS (
      SELECT i.doc_id,
             (7 * ((x.x * i.w) // 8) + i.doc_id) % 256 AS r,
             (11 * ((y.y * i.h) // 8) + i.doc_id) % 256 AS g,
             (((x.x * i.w) // 8) + ((y.y * i.h) // 8)) % 256 AS b
      FROM ids i,
           unnest(range(0, 8)) AS x(x),
           unnest(range(0, 8)) AS y(y)
    )
    SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           avg(r) AS mean_r, avg(g) AS mean_g, avg(b) AS mean_b,
           CAST((11 * ((2 * (8 + (doc_id * 3) % 16)) // 8) + doc_id) % 256
                AS INT) AS probe_g12
    FROM px GROUP BY doc_id
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image preprocessing cycle: synthesize BMP → nearest-neighbor
    resize to 8×8 (blob-in/blob-out, RE-ENCODING a spec-correct BMP) →
    decode the RESIZED blob → per-channel features. The oracle predicts
    everything through the NN index map (src = (dst · src_dim) // 8):
    a wrong index rounding, a resize that forgot the bottom-up order,
    or a re-encode stride bug all hash-diverge. This is the standard
    vision-pipeline preprocessing step (decode → resize → features) run
    end-to-end with certified arithmetic.

    100 TB: three chained mapInPandas stages fuse into one scan-stage
    Python runner (no exchange between them); resized blobs are ~16×
    smaller than sources, so downstream stages that must keep pixels
    ship the reduced bytes.
    """
    from ..operators.multimodal import decode_bmp_features, resize_bmp, synth_bmp

    d = table(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 64)
    small = resize_bmp(synth_bmp(d, "doc_id"))
    return decode_bmp_features(small).select(
        "doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "probe_g12"
    )
