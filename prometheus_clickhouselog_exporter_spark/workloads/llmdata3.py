"""LLM-data ops III: benchmark decontamination, temperature-mixture
sampling, and sequence packing — the curation steps between "filtered
corpus" and "training run" that the earlier batteries didn't cover.

Reference parity note: the reference engine (query.go) has no analog —
these are north-star extensions per SURVEY §2.3 / the brief's
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.sampling import hash_bucket
from .core import query, table


@query(
    "decontam_ngram_overlap",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(w[CAST(i AS BIGINT):CAST(i AS BIGINT)+4], ' ') AS g
      FROM tok, UNNEST(range(1, greatest(len(w) - 3, 2))) AS t(i)
    )
    SELECT t.doc_id, CAST(count(DISTINCT t.g) AS BIGINT) AS n_shared_ngrams
    FROM (SELECT doc_id, g FROM grams WHERE source <> 'src0') t
    JOIN (SELECT DISTINCT g FROM grams WHERE source = 'src0') b USING (g)
    GROUP BY t.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: training documents sharing any 5-word
    shingle with the benchmark set (source 'src0' stands in for an eval
    suite), with the count of distinct shared shingles — the
    GPT-3/PaLM-style n-gram overlap check every training corpus runs
    before a job.

    100 TB: the benchmark side is tiny (eval suites are KBs), so its
    distinct shingle-hash set BROADCASTS; the training corpus is shingled
    in the scan stage and probe-joined without any wide shuffle of text —
    only (doc_id, 64-bit shingle hash) pairs reach the one groupBy
    exchange, and only for rows that hit the broadcast filter. Hash
    equality stands in for string equality (64-bit xxhash collisions are
    negligible at any corpus size vs the eval-set cardinality).

    Shingle plan: tokens are hashed ONCE behind a Generate barrier
    (explode of a 1-element array — without it, project collapse inlines
    the token-hash array into every element_at and re-hashes the whole
    document per gram), then each 5-gram hash combines five token hashes
    — no per-gram string allocation. Measured 6x over string shingling
    at sf0.1 (0.58s vs 3.39s).
    """
    d = table(spark, sf_dir, "documents")

    def grams(df: DataFrame) -> DataFrame:
        toks = F.split(F.lower(F.col("text")), r"\s+")
        th = F.transform(toks, lambda t: F.xxhash64(t))
        base = df.select("doc_id", F.explode(F.array(th)).alias("_th"))
        idx = F.sequence(F.lit(1), F.greatest(F.size(F.col("_th")) - 4, F.lit(1)))
        gh = F.transform(
            idx,
            lambda i: F.xxhash64(
                F.try_element_at(F.col("_th"), i),
                F.try_element_at(F.col("_th"), i + 1),
                F.try_element_at(F.col("_th"), i + 2),
                F.try_element_at(F.col("_th"), i + 3),
                F.try_element_at(F.col("_th"), i + 4),
            ),
        )
        return base.select("doc_id", F.explode(F.array_distinct(gh)).alias("_gh"))

    bench = grams(d.filter(F.col("source") == "src0")).select("_gh").dropDuplicates()
    train = grams(d.filter(F.col("source") != "src0"))
    return (
        train.join(F.broadcast(bench), "_gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("_gh").alias("n_shared_ngrams"))
    )


@query(
    "sample_mixture_temperature",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs,
             CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
      FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, n_docs,
             floor(sqrt(p) / max(sqrt(p)) OVER () * 10000) AS keep_buckets
      FROM counts
    )
    SELECT r.lang, r.n_docs,
           floor(r.keep_buckets) / 10000 AS keep_rate,
           CAST(count(CASE WHEN
                  CAST(('0x' || substr(md5(d.text), 1, 8)) AS UBIGINT) % 10000
                    < r.keep_buckets THEN 1 END) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r USING (lang)
    GROUP BY 1, 2, 3
    """,
)
def sample_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixture (T=2 ⇒ weight ∝ √share,
    the multilingual-LM standard for up-weighting tail languages): compute
    per-language keep rates normalized to the largest language, then keep
    each document by a CONTENT-ADDRESSED md5 bucket — the same document
    is kept or dropped identically regardless of partitioning, executor
    count, or retries (no RNG state anywhere).

    Rate arithmetic is collision-free across engines: integral counts →
    one division → sqrt → one division → floor to integer buckets; every
    step is a single IEEE op both engines execute identically.

    100 TB: the rate table is |languages| rows and broadcasts; the keep
    decision is a row-local expression in the scan stage; the per-lang
    tallies are a 5-group aggregate. Nothing shuffles document bodies.
    """
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    rates = (
        counts.withColumn("_p", F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all))
        .withColumn(
            "keep_buckets",
            F.floor(F.sqrt("_p") / F.max(F.sqrt("_p")).over(w_all) * 10000),
        )
        .select("lang", "n_docs", "keep_buckets")
    )
    kept = F.count(
        F.when(hash_bucket(F.col("text")) < F.col("keep_buckets"), 1)
    ).alias("n_kept")
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", (F.col("keep_buckets") / 10000).alias("keep_rate"))
        .agg(kept)
    )


@query(
    "pack_sequences_blocks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split_regex(text, '\\s+')) AS n_tok
      FROM documents
    ),
    placed AS (
      SELECT lang, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT lang,
           CAST(floor((cum - n_tok) / 512) AS BIGINT) AS block,
           CAST(count(*) AS BIGINT)        AS docs_started,
           CAST(sum(n_tok) AS BIGINT)      AS block_doc_tokens,
           CAST(min(doc_id) AS BIGINT)     AS first_doc_id
    FROM placed
    GROUP BY 1, 2
    """,
)
def pack_sequences_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate each language's documents
    in doc_id order and chunk the token stream into fixed 512-token
    blocks; report, per block, how many documents START there and their
    token mass — the packing manifest a dataloader needs to slice a
    tokenized corpus into training sequences deterministically.

    The assignment is a prefix-sum (window cumsum per lang ordered by
    doc_id) — pure engine work, no per-row Python, deterministic given
    the (lang, doc_id) order.

    100 TB: one shuffle on lang for the window; the running sum is a
    single ordered pass per partition. For real corpora the partition key
    becomes (lang, shard) so no single language serializes — same plan,
    finer key. Token counts are integral, so cumsum is exact.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), r"\s+")).alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    placed = toks.withColumn("cum", F.sum("n_tok").over(w))
    return (
        placed.withColumn(
            "block", F.floor((F.col("cum") - F.col("n_tok")) / 512).cast("long")
        )
        .groupBy("lang", "block")
        .agg(
            F.count(F.lit(1)).alias("docs_started"),
            F.sum("n_tok").cast("long").alias("block_doc_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


@query(
    "sample_weighted_systematic",
    oracle="""
    WITH placed AS (
      SELECT doc_id, lang,
             len(string_split_regex(text, '\\s+')) AS w,
             sum(len(string_split_regex(text, '\\s+'))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(w) AS BIGINT)    AS tokens_total,
           CAST(count(CASE WHEN cum // 256 > (cum - w) // 256 THEN 1 END)
                AS BIGINT)           AS n_sampled,
           CAST(sum(CASE WHEN cum // 256 > (cum - w) // 256 THEN w END)
                AS BIGINT)           AS tokens_sampled
    FROM placed
    GROUP BY lang
    """,
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without RNG: systematic selection along the
    token-count prefix sum — a document is selected iff its weight span
    crosses a 256-token stride boundary, giving inclusion probability
    ∝ min(1, w/256) (the PPS "dollar-unit sampling" estimator). The
    ROADMAP's weighted-reservoir item shipped in this ln-free form:
    Efraimidis-Spirtakis keys need pow/ln whose last-ulp behavior differs
    between engines' libm, while this is INTEGER-ONLY arithmetic —
    bit-identical everywhere, deterministic under retries, and the
    selected set is reproducible from (lang, doc_id) order alone.

    100 TB: same single window-per-stratum shuffle as the packing
    manifest; selection is row-local; per-lang tallies close the plan.
    Report is per-lang so the driver hash certifies the exact sample.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), r"\s+")).alias("w")
    )
    win = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    placed = toks.withColumn("cum", F.sum("w").over(win))
    hit = F.floor(F.col("cum") / 256) > F.floor((F.col("cum") - F.col("w")) / 256)
    return placed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").cast("long").alias("tokens_total"),
        F.count(F.when(hit, 1)).alias("n_sampled"),
        F.sum(F.when(hit, F.col("w"))).cast("long").alias("tokens_sampled"),
    )
