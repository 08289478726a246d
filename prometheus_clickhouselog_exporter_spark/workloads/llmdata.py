"""LLM-training-data pipeline operators over documents/embeddings
(SURVEY §2.3): dedup, similarity search, text analysis.

Scale doctrine: every operator here must avoid the O(n²) trap — exact dedup
is a hash aggregate; near-dup goes through blocking (inverted index / LSH
bands) so the pair space is candidate pairs, not the cross product;
similarity search has a brute-force oracle-checkable baseline and an
LSH-bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import (
    embedding_cosine_pairs_blocked,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    word_shingles,
)
from ..operators.multimodal import attach_fake_media, decode_features
from ..operators.similarity import lsh_bucketed_topk
from ..operators.textstats import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)
from .core import ANN_CERT_ORACLE, corpus_key, fan_out, fround, query, table


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep lowest doc_id.

    100 TB: group on the 128-bit digest, never the text — the shuffle
    carries 16 bytes + id per row instead of document bodies.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("h")
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(*)                                             AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)    AS total_tokens,
           floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000              AS avg_tokens,
           floor(CAST(sum(n_chars) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000              AS avg_chars,
           max(len(string_split(text, ' ')))                    AS max_tokens
    FROM documents
    GROUP BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-language corpus stats (whitespace tokenizer).

    100 TB: `size(split())` is evaluated in the scan stage; the shuffle is
    5 language groups of partial aggregates.
    """
    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    n = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        n.alias("n_docs"),
        F.sum(ntok).alias("total_tokens"),
        fround(F.sum(ntok).cast("double") / n, 4).alias("avg_tokens"),
        fround(F.sum("n_chars").cast("double") / n, 4).alias("avg_chars"),
        F.max(ntok).alias("max_tokens"),
    )


@query(
    "similarity_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
         scored AS (
           SELECT q.query_id, c.vec_id, c.label,
                  round(list_dot_product(q.qe, c.ce) /
                        (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.ce, c.ce))), 6)
                    AS cosine
           FROM q CROSS JOIN c
           WHERE q.query_id <> c.vec_id
         )
    SELECT query_id, vec_id, label, cosine, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rk
          FROM scored)
    WHERE rk <= 10
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the corpus.

    The dot product is a pure expression (`zip_with` + `aggregate`) in
    double precision — no UDF. 100 TB: queries broadcast, corpus scanned
    once, per-partition top-k via the row_number window (WindowGroupLimit
    pushes the limit below the shuffle). The LSH-bucketed variant
    (`similarity_lsh_topk`, operators/similarity.py) is the scale path when
    the query set itself is large.
    """
    # r14: fan_out removed -- driver-regressed rung (0.36->0.60 s,
    # scaling ratio 0.61 at PERF_r13); local A/B a wash (see r14 notes).
    emb = table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = emb.select(F.col("vec_id"), F.col("label"), as_double.alias("ce"))
    queries = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), as_double.alias("qe"))
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)

    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qe"), F.col("ce"))
                / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ce"), F.col("ce")))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", "label", "cosine")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )


# DuckDB rendering of the 3-word-shingle exact-Jaccard pair search, used as
# the oracle for BOTH the exact operator and the MinHash-LSH operator (the
# LSH path verifies candidates with exact Jaccard, and at sf0.01 its band
# recall is 100% — deterministic, no RNG anywhere — so approx == exact).
_SHINGLE_JACCARD_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 2 + 1),
                                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(s) AS g FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
      FROM post l JOIN post r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, c / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON common.id_a = sa.doc_id
    JOIN sizes sb ON common.id_b = sb.doc_id
    WHERE c / (sa.n + sb.n - c) >= 0.5
"""


@query("dedup_minhash_lsh", oracle=_SHINGLE_JACCARD_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection: 3-word shingles → 32-perm MinHash →
    8 banded buckets → candidate equi-join → exact-Jaccard verification.

    Oracle-checked against brute-force shingle Jaccard: the LSH path is
    fully deterministic (fixed hash family, no RNG) and its band recall on
    this corpus is 100%, so the approximate plan must reproduce the exact
    answer. 100 TB: the pair space never materializes — only same-bucket
    candidates shuffle, and verification joins carry shingle arrays for
    candidates only.
    """
    d = fan_out(table(spark, sf_dir, "documents")).filter(F.size(F.split(F.col("text"), " ")) >= 3)
    return minhash_lsh_dedup(d, "text", "doc_id", threshold=0.5)


@query("dedup_ngram_jaccard", oracle=_SHINGLE_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard via inverted-index join —
    the brute-force twin of dedup_minhash_lsh, same oracle.

    100 TB: posting-list join bounded by co-occurring shingles (31-word
    vocab → ~30k distinct shingles here); the classic prefix/length filters
    slot in as pre-join pruning when corpora grow.
    """
    d = fan_out(table(spark, sf_dir, "documents")).filter(F.size(F.split(F.col("text"), " ")) >= 3)
    toks = d.select(
        F.col("doc_id").alias("_id"), word_shingles(F.col("text"), 3).alias("_t")
    ).localCheckpoint(eager=False)  # shingle once; sizes + both join sides reuse
    sizes = toks.select("_id", F.size("_t").alias("_n"))
    posting = toks.select("_id", F.explode("_t").alias("g"))
    l, r = posting.alias("l"), posting.alias("r")
    common = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c") / (F.col("sa._n") + F.col("sb._n") - F.col("c"))
    return (
        common.join(sa, common.id_a == F.col("sa._id"))
        .join(sb, common.id_b == F.col("sb._id"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )


@query(
    "dedup_simhash",
    oracle="""
    WITH feats AS (
      SELECT DISTINCT doc_id,
             array_to_string(w[CAST(i AS BIGINT):CAST(i AS BIGINT)+2], ' ') AS f
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
           UNNEST(range(1, greatest(len(w) - 1, 2))) AS u(i)
    ),
    hashed AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(f), 1, 15)) AS UBIGINT) AS BIGINT) AS h
      FROM feats
    ),
    votes AS (
      SELECT doc_id, b,
             sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, UNNEST(range(0, 64)) AS bb(b)
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0
                           THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sim
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) with pigeonhole band blocking.

    ORACLE-CHECKED since r2: the driver variant derives feature hashes
    from md5 (60 bits — the one hash both engines compute bit-identically)
    so DuckDB rebuilds the full fingerprint from first principles — per-bit
    ±1 votes, sign assembly, Hamming pairs — and the banded Spark plan must
    reproduce the brute-force pair set exactly. (The operator's default
    stays xxhash64, the cheaper JVM hash, exercised by the recall suite;
    measured recall on the planted pairs: md5 23/25 vs xxhash64 20/25.)
    Precision on this corpus is weak by construction (31-word vocabulary ⇒
    token multisets collide) — the documented SimHash failure mode.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    return simhash_dedup(d, "text", "doc_id", max_hamming=3, hash_fn="md5_60").withColumn(
        "hamming", F.col("hamming").cast("long")
    )


@query(
    "dedup_embedding_topk_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, floor(cos * 10000 + 0.5) / 10000 AS cosine
    FROM pairs ORDER BY cos DESC, id_a, id_b LIMIT 20
    """,
)
def dedup_embedding_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: global top-20 most-similar pairs by cosine.

    (Thresholding is the production form; top-k keeps the oracle result
    non-empty on this corpus, whose closest pair sits near cos 0.5.)
    100 TB: this exact plan is the per-bucket re-rank inside the LSH path —
    global brute force is only run at validation scale.
    """
    emb = table(spark, sf_dir, "embeddings")
    pairs = embedding_cosine_pairs_blocked(
        emb, "embedding", "vec_id", threshold=-1.0, per_blockpair_topk=20
    )
    return (
        pairs.orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(20)
        .select("id_a", "id_b", fround(F.col("cosine"), 4).alias("cosine"))
    )


_Q = "string_split(lower(text), ' ')"


def _hits(langs: str) -> str:
    return f"len(list_filter({_Q}, x -> list_contains({langs}, x)))"


_LANG_LISTS = {
    "en": "['the','and','of','to','in','is','that','for']",
    "de": "['der','die','das','und','ist','nicht','ein','zu']",
    "fr": "['le','la','les','et','est','pas','une','pour']",
    "es": "['el','la','los','y','es','no','una','para']",
    "zh": "['的','是','不','了','在','人','有','我']",
}


@query(
    "text_quality_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_hits(_LANG_LISTS["en"])} AS h_en,
             {_hits(_LANG_LISTS["de"])} AS h_de,
             {_hits(_LANG_LISTS["fr"])} AS h_fr,
             {_hits(_LANG_LISTS["es"])} AS h_es,
             {_hits(_LANG_LISTS["zh"])} AS h_zh,
             len({_Q}) AS n_tokens,
             CAST(list_sum(list_transform({_Q},
               w -> 1 + CAST(floor(greatest(len(w) - 1, 0) / 4) AS INTEGER))) AS BIGINT) AS bpe_tokens,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_symbols
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN h_en >= greatest(h_de, h_fr, h_es, h_zh, 1) THEN 'en'
                WHEN h_de >= greatest(h_fr, h_es, h_zh, 1) THEN 'de'
                WHEN h_fr >= greatest(h_es, h_zh, 1) THEN 'fr'
                WHEN h_es >= greatest(h_zh, 1) THEN 'es'
                WHEN h_zh >= 1 THEN 'zh'
                ELSE 'und' END AS lang_pred,
           n_tokens, bpe_tokens,
           (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END
            + CASE WHEN n_chars * 1.0 / greatest(n_tokens, 1) >= 2.0
                    AND n_chars * 1.0 / greatest(n_tokens, 1) <= 12.0 THEN 0.25 ELSE 0.0 END
            + CASE WHEN n_digits * 1.0 / greatest(n_chars, 1) <= 0.3 THEN 0.25 ELSE 0.0 END
            + CASE WHEN n_symbols * 1.0 / greatest(n_chars, 1) <= 0.2 THEN 0.25 ELSE 0.0 END)
             AS quality
    FROM scored
    """,
)
def text_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit argmax), quality score, and
    whitespace + BPE-ish token counts per document — the cheap pre-filters
    a training-data pipeline runs over every document.

    100 TB: all pure row-local expressions in the scan stage; zero shuffle.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "lang",
        language_id(F.col("text")).alias("lang_pred"),
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(0, list_transform(string_split(lower(text), ' '),
                                            w -> len(w) * 7 + ascii(substr(w, 1, 1)))),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (mod 1e9+7),
    reproduced bit-for-bit by the DuckDB oracle."""
    d = fan_out(table(spark, sf_dir, "documents"))
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query("similarity_lsh_topk", oracle=ANN_CERT_ORACLE)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors via random-hyperplane LSH buckets
    (Arrow-vectorized projection), exact cosine re-rank inside buckets —
    emitted as the error-bound certificate (certify_topk_bound): every
    returned neighbor's true cosine within ε=0.10 of the exact 10th-best
    (measured worst margin 0.020 across 3 SFs). Formerly rows-only
    (seeded numpy projections have no SQL equivalent); the oracle now
    value-hashes the certificate, and pytest still pins recall floors
    against brute force."""
    from ..operators.similarity import certify_topk_bound

    # r14: fan_out REMOVED here (r13 wave a1f5056). The driver measured
    # this ladder rung 2-4x SLOWER at local[32] than at 8 cores with the
    # fan_out (PERF_r13 scaling block), and a 5-round interleaved A/B on
    # the r14 box shows the fan_out gains nothing for these multi-job,
    # driver-looped kernels (arms within noise) -- the repartition only
    # adds a 32-task exchange + checkpoint topology per job on a tiny
    # frame. The single-kernel consumers (ledoit, power-iter, zca,
    # procrustes, semdedup, pq/ivfpq...) KEEP their fan_out: same A/B
    # shows 1.4-2.9x wins there. At cluster scale fan_out is a no-op
    # (enough splits), so removal only changes local-mode topology.
    emb = table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=False
    )  # scan once: ANN op + certifier exact/rescore reuse it
    queries_df = emb.filter(F.col("vec_id") < 8)
    ap = lsh_bucketed_topk(emb, queries_df, "embedding", "vec_id", "vec_id", k=10, n_planes=6)
    return certify_topk_bound(emb, ap, "embedding", "vec_id", queries_df, "vec_id", k=10, eps=0.10)


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 64 + 16 AS INTEGER)     AS width,
           CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height,
           8 + length(CAST(doc_id AS VARCHAR))   AS payload_bytes,
           CAST(list_sum(list_transform(string_split('payload-' || CAST(doc_id AS VARCHAR), ''),
                                   c -> ascii(c))) % 65536 AS BIGINT) AS checksum
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: synthesize a binary media blob per
    document (FAKE1 container), run the Arrow-batched mapInPandas decode,
    emit typed features. The oracle recomputes the features arithmetically
    from doc_id — proving the binary encode→decode round-trip, batch
    shapes, and schema handling are all correct. Real decoders (PIL/ffmpeg)
    replace one stub function; the Spark plumbing is what's being graded.
    """
    d = fan_out(table(spark, sf_dir, "documents")).select("doc_id")
    media = attach_fake_media(d, "doc_id", kind="image")
    return decode_features(media).select("doc_id", "width", "height", "payload_bytes", "checksum")


@query("similarity_ivf_topk", oracle=ANN_CERT_ORACLE)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 neighbors (k-means coarse quantizer, 4-of-16
    cells probed, exact re-rank), emitted as the certify_topk_bound
    certificate: every returned neighbor's true cosine within ε=0.15 of
    the exact 10th-best (measured worst margin 0.066 across 3 SFs).
    Formerly rows-only (the quantizer is MLlib-specific); pytest still
    pins recall against brute force."""
    from ..operators.similarity import certify_topk_bound, ivf_topk

    # r14: fan_out removed -- same rationale as the lsh rung above.
    emb = table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=False
    )  # scan once: ANN op + certifier exact/rescore reuse it
    queries_df = emb.filter(F.col("vec_id") < 8)
    ap = ivf_topk(
        emb, queries_df, "embedding", "vec_id", "vec_id", k=10,
        train_cache_key=corpus_key(sf_dir, "embeddings"),
    )
    return certify_topk_bound(emb, ap, "embedding", "vec_id", queries_df, "vec_id", k=10, eps=0.15)
