"""LLM-data ops, round 8 batch 7: bigram-LM perplexity scoring
(CCNet-style quality filtering), the PSI drift monitor as a REAL
stream, and a small-file compaction planner.

Perplexity filtering is the canonical model-based corpus-quality
screen (CCNet trains a KenLM and keeps low-perplexity documents); the
registry form trains an add-1-smoothed token bigram model on a
deterministic 80% split and scores the held-out 20% — per-transition
log-probabilities quantize to integer micro-nats BEFORE the per-doc
sum (the naive-Bayes discipline, llmdata19), so scores are ratios of
identical integers on both engines.

Reference parity note: /root/reference has none of these surfaces
(query.go:1-289); §2.3 north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_TRAIN_CUT = 8000  # md5 bucket < 8000 of 10000 → ~80% train split
_PSI_CUT = "2024-01-16 00:00:00"  # ref/cur boundary (drift_psi_value_halves)
_BIN_TARGET = 200_000  # compaction target bytes per output bin


def _split_bucket_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS UBIGINT) % 10000"


@query(
    "text_lm_perplexity_heldout",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source, text,
             {_split_bucket_sql('text')} < {_TRAIN_CUT} AS is_train
      FROM documents WHERE text IS NOT NULL
    ),
    toks AS (
      SELECT doc_id, is_train, tok, pos FROM (
        SELECT doc_id, is_train,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS t
        FROM docs
      ), LATERAL (
        SELECT unnest(t) AS tok, generate_subscripts(t, 1) AS pos
      )
    ),
    seq AS (
      SELECT doc_id, is_train, tok,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM toks
    ),
    train_pairs AS (
      SELECT prev, tok, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE is_train AND prev IS NOT NULL GROUP BY 1, 2
    ),
    ctx AS (
      SELECT prev, CAST(sum(c) AS BIGINT) AS c_prev
      FROM train_pairs GROUP BY prev
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM toks WHERE is_train
    ),
    held AS (
      SELECT s.doc_id, s.prev, s.tok
      FROM seq s WHERE NOT s.is_train AND s.prev IS NOT NULL
    ),
    scored AS (
      SELECT h.doc_id,
             CAST(floor(ln((coalesce(tp.c, 0) + 1.0)
                           / (coalesce(cx.c_prev, 0) + vb.v)) * 1e6 + 0.5)
                  AS BIGINT) AS lp_q
      FROM held h
      LEFT JOIN train_pairs tp ON tp.prev = h.prev AND tp.tok = h.tok
      LEFT JOIN ctx cx ON cx.prev = h.prev
      CROSS JOIN vocab vb
    )
    SELECT s.doc_id, d.source,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(-sum(s.lp_q) AS BIGINT) AS nll_q,
           floor(exp(-sum(s.lp_q) / (count(*) * 1e6)) * 1e4 + 0.5) / 1e4
             AS perplexity
    FROM scored s JOIN docs d ON d.doc_id = s.doc_id
    GROUP BY s.doc_id, d.source
    ORDER BY s.doc_id
    """,
)
def text_lm_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity quality scoring: train an add-1-smoothed
    token bigram model on a deterministic md5 80% of the corpus, score
    every held-out document's transitions with
    p(tok|prev) = (c+1)/(c_prev+|V|) — unseen contexts degrade to
    1/|V| — and report per-document NLL (integer micro-nats) and
    perplexity exp(NLL/n). Low perplexity = looks like the training
    corpus; the CCNet keep/bucket decision is one threshold on this
    column.

    100 TB: the model is vocab²-bounded aggregates broadcast back onto
    one held-out scan (token-keyed shuffles only); per-transition logs
    quantize before the per-doc integer sum, so the score can never
    flip on reduction order. Swap the bigram counts for a trained KenLM
    when a real LM is available — identical plan shape."""
    from ..operators.sampling import hash_bucket

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            "text",
            (hash_bucket(F.col("text")) < _TRAIN_CUT).alias("is_train"),
        )
        .localCheckpoint(eager=False)  # feeds tokens AND the output join
    )
    toks = docs.select(
        "doc_id",
        "is_train",
        F.posexplode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("pos", "tok"),
    )
    seq = toks.withColumn(
        "prev",
        F.lag("tok").over(Window.partitionBy("doc_id").orderBy("pos")),
    ).localCheckpoint(eager=False)  # train pairs, vocab, held-out reuse
    train_pairs = (
        seq.filter(F.col("is_train") & F.col("prev").isNotNull())
        .groupBy("prev", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # ctx totals + the scoring join
    )
    ctx = train_pairs.groupBy("prev").agg(
        F.sum("c").cast("bigint").alias("c_prev")
    )
    vocab = (
        seq.filter(F.col("is_train"))
        .select("tok")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    held = seq.filter(~F.col("is_train") & F.col("prev").isNotNull()).select(
        "doc_id", "prev", "tok"
    )
    lp_q = F.floor(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v"))
        )
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        held.join(F.broadcast(train_pairs), ["prev", "tok"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp_q.alias("lp_q"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            (-F.sum("lp_q")).cast("bigint").alias("nll_q"),
        )
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_transitions",
            "nll_q",
            fround(
                F.exp(F.col("nll_q") / (F.col("n_transitions") * 1e6)), 4
            ).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


@query(
    "streaming_psi_fidelity",
    oracle=f"""
    WITH bucketed AS (
      SELECT CASE WHEN ts < TIMESTAMP '{_PSI_CUT}' THEN 'ref' ELSE 'cur' END
               AS half,
             least(CAST(floor(value / 50) AS BIGINT), 7) AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT bucket,
             CAST(sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cur
      FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts)
    SELECT c.bucket, c.n_ref, c.n_cur,
           CASE WHEN c.n_ref = 0 OR c.n_cur = 0 THEN NULL
                ELSE floor((CAST(c.n_cur AS DOUBLE) / t.tc
                            - CAST(c.n_ref AS DOUBLE) / t.tr)
                     * ln((CAST(c.n_cur AS DOUBLE) / t.tc)
                          / (CAST(c.n_ref AS DOUBLE) / t.tr))
                     * 1000000 + 0.5) / 1000000 END AS psi_term
    FROM counts c, tot t ORDER BY c.bucket
    """,
)
def streaming_psi_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSI drift monitor maintained BY A REAL STREAM: the reference
    distribution (first half-month) is a batch aggregate broadcast into
    the plan; the CURRENT half arrives as a multi-file stream whose
    per-bucket counts accumulate through Spark's stateful streaming
    aggregation (update mode). The final per-bucket (n_ref, n_cur,
    psi_term) rows must hash-match the batch PSI query exactly —
    bucket counting is a commutative monoid, so batch/stream equality
    holds at every micro-batch boundary; the drift score itself is
    computed AFTER the final state (same quantization as the batch
    twin, drift_psi_value_halves).

    100 TB/streaming: state is 8 bucket counters regardless of stream
    volume; this is how a production monitor actually runs — yesterday's
    snapshot as the frozen ref, today's events folding in live."""
    from .llmdata11 import _fidelity_tmp, _materialize, _run_stream_to_memory

    tmp = _fidelity_tmp("psi-fidelity-")
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(7))
    cut = F.lit(_PSI_CUT).cast("timestamp")
    ref = (
        ev.filter(F.col("ts") < cut)
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ref"))
    )
    from .llmdata11 import _cached_corpus

    cur_side = ev.filter(F.col("ts") >= cut).select(bucket.alias("bucket"))
    corpus = _cached_corpus(
        ("psi", sf_dir),
        lambda p: cur_side.repartition(4)
        .write.mode("overwrite")
        .parquet(f"{p}/in"),
    )
    stream = (
        spark.readStream.schema("bucket long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{corpus}/in")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cur"))
    )
    sink = _run_stream_to_memory(spark, stream, tmp)
    cur = sink.groupBy("bucket").agg(F.max("n_cur").alias("n_cur"))
    counts = (
        ref.join(cur, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
        )
        .localCheckpoint(eager=False)  # totals + the term projection
    )
    tot = counts.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    q = F.col("n_cur").cast("double") / F.col("tc")
    p = F.col("n_ref").cast("double") / F.col("tr")
    out = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                fround((q - p) * F.log(q / p), 6),
            ).alias("psi_term"),
        )
        .orderBy("bucket")
    )
    return _materialize(
        spark,
        tmp,
        out,
        "bucket bigint, n_ref bigint, n_cur bigint, psi_term double",
    )


@query(
    "layout_compaction_bins",
    oracle=f"""
    WITH files AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(count(*) * 100 AS BIGINT) AS size_bytes
      FROM events GROUP BY 1, 2
    ),
    ordered AS (
      SELECT day, event_type, size_bytes,
             coalesce(sum(size_bytes) OVER (
               ORDER BY size_bytes DESC, day, event_type
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before_bytes
      FROM files
    )
    SELECT bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           CAST(max(size_bytes) AS BIGINT) AS largest_file,
           CAST(min(size_bytes) AS BIGINT) AS smallest_file
    FROM (
      SELECT size_bytes,
             CAST(before_bytes // {_BIN_TARGET} AS BIGINT) AS bin_id
      FROM ordered
    )
    GROUP BY bin_id ORDER BY bin_id
    """,
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: the lake's per-(day, type) files
    (sizes simulated as 100 B/row) are packed size-descending into
    ~target-size output bins by prefix-sum division — bin =
    ⌊bytes-before/target⌋, the deterministic one-window form of
    next-fit-decreasing. Output: per-bin file count, total bytes, and
    size extremes — the job manifest a compactor executes. Everything
    is exact integers.

    100 TB: the input is FILE-cardinality metadata (a lake listing),
    never data rows — the one global window rides a bounded exchange
    above the day×type aggregate, the same sweep-line argument as the
    backlog queries. Real compactors (Iceberg/Delta OPTIMIZE) use
    exactly this greedy shape because FFD's per-bin backtracking buys
    <1% packing over next-fit-decreasing at lake file-size skews.
    Companion: layout_compaction_maxrecords (llmdata17) governs the
    WRITE side (maxRecordsPerFile round-trip); this plans the
    read-side merge of the small files that slipped through."""
    files = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        )
        .agg((F.count(F.lit(1)) * 100).cast("bigint").alias("size_bytes"))
    )
    w = Window.orderBy(
        F.desc("size_bytes"), F.col("day"), F.col("event_type")
    ).rowsBetween(Window.unboundedPreceding, -1)
    ordered = files.select(
        "size_bytes",
        F.coalesce(F.sum("size_bytes").over(w), F.lit(0)).alias("before_bytes"),
    )
    return (
        ordered.select(
            "size_bytes",
            F.expr(f"before_bytes div {_BIN_TARGET}").alias("bin_id"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("size_bytes").cast("bigint").alias("total_bytes"),
            F.max("size_bytes").cast("bigint").alias("largest_file"),
            F.min("size_bytes").cast("bigint").alias("smallest_file"),
        )
        .orderBy("bin_id")
    )
