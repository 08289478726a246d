"""LLM-data ops, round 4 batch 3: chunk-level containment dedup
(composing the r4 sliding-window chunker) and cryptographic
content-address parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, fround, md5_long, query, table

_CH_SIZE, _CH_STRIDE = 120, 90


@query(
    "dedup_chunk_containment",
    oracle=f"""
    WITH nums AS (SELECT t.i FROM range(0, 1024) t(i)),
    chunks AS (
      SELECT DISTINCT d.doc_id,
             CAST(CAST(('0x' || substr(md5(substr(d.text,
                    CAST(n.i * {_CH_STRIDE} + 1 AS INT), {_CH_SIZE})), 1, 12))
                  AS UBIGINT) AS BIGINT) AS h
      FROM documents d
      JOIN nums n ON n.i <= greatest((length(d.text) - 1) // {_CH_STRIDE}, 0)
      WHERE d.text IS NOT NULL
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
              FROM chunks GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM chunks a JOIN chunks b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.doc_a, s.doc_b, s.n_shared, sa.n_chunks AS n_a, sb.n_chunks AS n_b,
           floor((CAST(s.n_shared AS DOUBLE) / sa.n_chunks) * 1e6 + 0.5) / 1e6
             AS containment_a
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.doc_a
    JOIN sizes sb ON sb.doc_id = s.doc_b
    WHERE CAST(s.n_shared AS DOUBLE) / sa.n_chunks >= 0.5
    ORDER BY s.doc_a, s.doc_b
    """,
)
def dedup_chunk_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-LEVEL containment dedup — the composition the r4 chunker
    exists for: documents whose 120-char sliding chunks substantially
    reappear in another document (containment = |shared hashes| /
    |A's hashes| ≥ 0.5) — catching partial-copy and quote-inclusion
    duplication at sub-document granularity, between the whole-doc
    digest (exact dedup) and the shingle measures (MinHash/containment
    on words). The join is DISTINCT-FIRST on 8-byte chunk hashes (the
    inverted-index discipline: posting lists of hashes, never text),
    pair space bounded by co-occurring chunks.

    100 TB: chunking is scan-stage; the self-join shuffles hash+doc_id
    pairs; stop-chunk removal (drop hashes with huge posting lists —
    boilerplate headers) bounds the worst bucket exactly as stop-
    shingles do for MinHash-LSH."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n = F.length("text")
    # fail-loud at the oracle's 1024-chunk numbers-table bound (the
    # text_chunk_sliding_windows guard — the raise feeds the sequence
    # bound so pruning can't drop it)
    bound = F.when(
        n > _CH_STRIDE * 1024,
        F.raise_error(
            F.concat(
                F.lit("dedup_chunk_containment: document "),
                F.col("doc_id").cast("string"),
                F.lit(" exceeds the 1024-chunk oracle bound; raise the "
                      "nums range in the oracle and this guard together"),
            )
        ).cast("int"),
    ).otherwise(F.greatest(F.floor((n - 1) / _CH_STRIDE).cast("int"), F.lit(0)))
    idx = F.explode(F.sequence(F.lit(0), bound)).alias("i")
    chunk = F.substring(F.col("text"), F.col("i") * _CH_STRIDE + 1, F.lit(_CH_SIZE))
    chunks = (
        d.select("doc_id", "text", idx)
        .select("doc_id", md5_long(chunk).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)  # posting list; join sides + sizes
    )
    sizes = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    a = chunks.select(F.col("doc_id").alias("doc_a"), "h")
    b = chunks.select(F.col("doc_id").alias("doc_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("n_b"))
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("n_shared").cast("double") / F.col("n_a") >= 0.5)
    )
    return out.select(
        "doc_a",
        "doc_b",
        "n_shared",
        "n_a",
        "n_b",
        fround(F.col("n_shared").cast("double") / F.col("n_a"), 6).alias(
            "containment_a"
        ),
    ).orderBy("doc_a", "doc_b")


@query(
    "text_content_addresses",
    oracle=f"""
    SELECT doc_id,
           CAST({MD5_SQL.format(x="text")} % 1000000007 AS BIGINT) AS md5_mod,
           substr(sha256(text), 1, 16) AS sha256_prefix,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 500 ORDER BY doc_id
    """,
)
def text_content_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-address parity battery: the two hash families a
    content-addressed corpus store runs — the engine-portable 48-bit
    md5 fold (workloads/core.md5_long, modularly reduced so the BIGINT
    stays positive on both engines) and SHA-256 (Spark `sha2(·, 256)`
    vs DuckDB `sha256`, both over the UTF-8 bytes — the multibyte zh
    documents are the cross-engine trap this certifies). A corpus
    store keys blobs by these digests; a single mismatched byte in
    encoding handling shows up as a hash mismatch here first."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        (md5_long(F.col("text")) % 1000000007).alias("md5_mod"),
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("sha256_prefix"),
        F.length("text").cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


def _langid_case_sql() -> str:
    from .llmdata import _LANG_LISTS, _hits

    hits = {k: _hits(v) for k, v in _LANG_LISTS.items()}
    return f"""
      CASE WHEN {hits['en']} >= greatest({hits['de']}, {hits['fr']}, {hits['es']}, {hits['zh']}, 1) THEN 'en'
           WHEN {hits['de']} >= greatest({hits['fr']}, {hits['es']}, {hits['zh']}, 1) THEN 'de'
           WHEN {hits['fr']} >= greatest({hits['es']}, {hits['zh']}, 1) THEN 'fr'
           WHEN {hits['es']} >= greatest({hits['zh']}, 1) THEN 'es'
           WHEN {hits['zh']} >= 1 THEN 'zh'
           ELSE 'und' END
    """


def _register_langid_confusion():
    oracle = f"""
    WITH pred AS (
      SELECT lang, {_langid_case_sql()} AS lang_pred FROM documents
    ),
    cells AS (
      SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1)
    SELECT c.lang, c.lang_pred, c.n,
           floor((CAST(c.n AS DOUBLE) / t.n_true) * 1e6 + 0.5) / 1e6 AS row_share
    FROM cells c JOIN tot t ON t.lang = c.lang
    ORDER BY c.lang, c.lang_pred
    """

    @query("langid_confusion_matrix", oracle=oracle)
    def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Language-ID EVALUATION — the confusion matrix of the stopword
        argmax heuristic (operators/textstats.language_id) against the
        corpus's labeled lang column: per (true, predicted) cell the
        count and the row share (per-language recall on the diagonal).
        This is the model-evaluation report shape — crosstab + normalized
        shares — applied to the engine's own classifier, so a stopword
        list edit that silently degrades a language shows up as a moved
        diagonal share. Classification is the certified scan-stage
        expression; the matrix is one (langs × langs)-bounded aggregate.
        """
        from ..operators.textstats import language_id

        d = table(spark, sf_dir, "documents")
        cells = (
            d.select("lang", language_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang", "lang_pred")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = cells.groupBy("lang").agg(F.sum("n").alias("n_true"))
        return (
            cells.join(tot, "lang")
            .select(
                "lang",
                "lang_pred",
                "n",
                fround(F.col("n").cast("double") / F.col("n_true"), 6).alias(
                    "row_share"
                ),
            )
            .orderBy("lang", "lang_pred")
        )

    return langid_confusion_matrix


langid_confusion_matrix = _register_langid_confusion()


@query(
    "user_sequence_surprisal",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pairs AS (SELECT user_id, prev, event_type FROM seq WHERE prev IS NOT NULL),
    model AS (
      SELECT prev, event_type, CAST(count(*) AS BIGINT) AS c
      FROM pairs GROUP BY 1, 2
    ),
    m2 AS (
      SELECT prev, event_type, c,
             CAST(sum(c) OVER (PARTITION BY prev) AS BIGINT) AS c_prev
      FROM model
    )
    SELECT p.user_id,
           CAST(count(*) AS BIGINT) AS n_transitions,
           floor((-sum(log2(CAST(m.c AS DOUBLE) / m.c_prev)))
                 * 1e4 + 0.5) / 1e4 AS surprisal_bits
    FROM pairs p
    JOIN m2 m ON m.prev = p.prev AND m.event_type = p.event_type
    GROUP BY p.user_id
    ORDER BY p.user_id
    """,
)
def user_sequence_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SEQUENCE SURPRISAL under the corpus's own first-order
    Markov model (events_markov_transitions' matrix turned into a
    scorer): each user's transition stream scored by −Σ log₂ p(next |
    prev) with p from exact global pair counts — the behavioral
    anomaly metric (bots and broken clients produce improbable orbits;
    high bits-per-transition is the flag). Counts are exact integers;
    the log fold is the one float aggregate, frounded at 1e-4 (libm
    ulp discipline per the PSI note — a magnitude, not a rank key).

    Scale: transitions via per-user lag windows (partitioned); the
    model is |types|²-bounded and broadcast back onto the transition
    stream; the per-user fold is one aggregate. Self-scoring note: the
    model is trained on the full stream including each scored user —
    fine for an anomaly SCREEN (the brief's use), not a held-out
    perplexity."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .localCheckpoint(eager=False)  # transitions; model + scoring
    )
    model = pairs.groupBy("prev", "event_type").agg(F.count(F.lit(1)).alias("c"))
    m2 = model.withColumn(
        "c_prev", F.sum("c").over(Window.partitionBy("prev"))
    )
    p = F.col("c").cast("double") / F.col("c_prev")
    return (
        pairs.join(F.broadcast(m2), ["prev", "event_type"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            fround(-F.sum(F.log2(p)), 4).alias("surprisal_bits"),
        )
        .orderBy("user_id")
    )


@query(
    "dq_column_profile",
    oracle="""
    SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(min(event_id) AS VARCHAR) AS min_val,
           CAST(max(event_id) AS VARCHAR) AS max_val
    FROM events
    UNION ALL
    SELECT 'user_id', count(*),
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*),
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT),
           min(event_type), max(event_type)
    FROM events
    UNION ALL
    SELECT 'value', count(*),
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT CAST(floor(value * 100) AS BIGINT)) AS BIGINT),
           CAST(CAST(floor(min(value) * 100) AS BIGINT) AS VARCHAR),
           CAST(CAST(floor(max(value) * 100) AS BIGINT) AS VARCHAR)
    FROM events
    ORDER BY col
    """,
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide COLUMN PROFILE of the events table — the ANALYZE /
    first-look report every engine user runs on an unfamiliar table:
    per column, row count, null count, exact distinct cardinality, and
    stringified min/max (strings so heterogeneous column types share
    one report schema and hash identically across engines; the double
    column profiles its exact-cents quantization per the float
    discipline). One SELECT per column in ONE job — Spark computes all
    four profiles in a single pass over the scan because the branches
    union AFTER aggregation (4 aggregates over one shuffle-free scan
    each; at 100 TB swap exact distinct for the HLL lane per column).
    Complements dq_expectations_report (rule checks) with the
    open-ended profile that writes the rules."""
    e = table(spark, sf_dir, "events").localCheckpoint(eager=False)

    def prof(col: str, valexpr, distinct_expr) -> DataFrame:
        return e.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct(distinct_expr).alias("n_distinct"),
            F.min(valexpr).cast("string").alias("min_val"),
            F.max(valexpr).cast("string").alias("max_val"),
        )

    cents = F.floor(F.col("value") * 100).cast("bigint")
    out = (
        prof("event_id", F.col("event_id"), F.col("event_id"))
        .unionByName(prof("user_id", F.col("user_id"), F.col("user_id")))
        .unionByName(prof("event_type", F.col("event_type"), F.col("event_type")))
        .unionByName(prof("value", cents, cents))
    )
    return out.orderBy("col")


@query(
    "streaming_enrich_static_fidelity",
    oracle="""
    SELECT e.event_type, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN e.value IS NOT NULL
                    THEN CAST(floor(e.value * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cents
    FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def streaming_enrich_static_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL stream-static broadcast join
    (streaming/joins.enrich_stream_static: the dimension re-resolved and
    broadcast per micro-batch) over the events stream against the
    nation table (user_id % 25 as the synthetic foreign key) and
    value-hash-matches the enriched per-(type, nation) rollup against
    the plain SQL join — the last streaming operator family without a
    hash certification. The stream side never shuffles (broadcast dim);
    the rollup is the update-mode aggregate downstream."""
    from ..streaming.joins import enrich_stream_static
    from .llmdata11 import (
        _cached_corpus,
        _fidelity_tmp,
        _materialize,
        _run_stream_to_memory,
    )

    tmp = _fidelity_tmp("enrich-fidelity-")  # per-run ckpt/sink only
    ev = table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    corpus = _cached_corpus(
        ("enrich", sf_dir),
        lambda p: ev.write.mode("overwrite").parquet(f"{p}/in"),
    )
    dim = table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey")).alias("nkey"), F.col("n_name").alias("nation")
    )
    # how="inner" to match the INNER-join oracle exactly: a stream key
    # missing from the dim (e.g. a negative user_id under Spark's
    # sign-preserving %) must drop, not surface as a NULL-nation group.
    stream = enrich_stream_static(
        spark.readStream.schema(
            "event_type string, user_id bigint, value double"
        )
        .parquet(f"{corpus}/in")
        .withColumn("nkey", F.col("user_id") % 25),
        dim,
        key="nkey",
        how="inner",
    )
    agg = stream.groupBy("event_type", "nation").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.floor(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("cents"),
    )
    out = _run_stream_to_memory(spark, agg, tmp, mode="complete").orderBy(
        "event_type", "nation"
    )
    return _materialize(
        spark, tmp, out,
        "event_type string, nation string, n_rows bigint, cents bigint",
    )


@query(
    "streaming_gapfill_fidelity",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
             floor(sum(value) * 100 + 0.5) / 100 AS total
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    b AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
    nums AS (SELECT t.i FROM range(0, 4096) t(i)),
    grid AS (
      SELECT b.event_type, b.lo + CAST(n.i AS INT) AS day
      FROM b JOIN nums n ON n.i <= hi - lo
    )
    SELECT g.event_type, CAST(g.day AS VARCHAR) AS day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n,
           last_value(d.total IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total,
           d.day IS NULL AS is_filled
    FROM grid g LEFT JOIN daily d
      ON d.event_type = g.event_type AND d.day = g.day
    ORDER BY 1, 2
    """,
)
def streaming_gapfill_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL streaming calendar gap-fill
    (streaming/gapfill.gapfill_stream: append-mode
    applyInPandasWithState carrying one boundary observation per key —
    the timer-family operator, r4 directive #6) over the per-type daily
    series and value-hash-matches the emitted regularized series
    against the batch calendar-grid + forward-fill SQL recomputation
    (the timeseries_gapfill_daily shape). Append-mode rows are final
    the batch they appear, so the emitted set is batch-split-invariant
    and the comparison is exact: same days, same carried doubles (the
    fill COPIES the observed frounded total, never recomputes it), same
    is_filled flags. Timer eviction (series close) is golden-tested in
    tests/test_streaming_gapfill.py — a processing-time timer never
    quiesces under processAllAvailable, so the fidelity run uses
    NoTimeout where drain semantics are exact."""
    from ..streaming.gapfill import gapfill_stream
    from .llmdata11 import _fidelity_tmp, _materialize, _run_stream_to_memory

    tmp = _fidelity_tmp("gapfill-fidelity-")
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), fround(F.sum("value"), 2).alias("total"))
    )
    # Fail-loud at the oracle's 4096-day numbers-table bound (no-silent-
    # caps rule): a wider span must raise, not let the SQL grid drop days.
    guard = daily.agg(
        F.when(
            F.datediff(F.max("day"), F.min("day")) >= 4096,
            F.raise_error(F.lit(
                "streaming_gapfill_fidelity: calendar span exceeds the "
                "4096-day oracle bound; raise the nums range and this "
                "guard together"
            )),
        ).otherwise(F.lit(0)).alias("_g")
    )
    daily.crossJoin(F.broadcast(guard)).drop("_g").write.mode("overwrite").parquet(
        f"{tmp}/in"
    )
    stream = gapfill_stream(
        spark.readStream.schema(
            "event_type string, day date, n bigint, total double"
        ).parquet(f"{tmp}/in")
    )
    out = _run_stream_to_memory(spark, stream, tmp, mode="append").select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n",
        "total",
        "is_filled",
    ).orderBy("event_type", "day")
    return _materialize(
        spark, tmp, out,
        "event_type string, day string, n bigint, total double, is_filled boolean",
    )
