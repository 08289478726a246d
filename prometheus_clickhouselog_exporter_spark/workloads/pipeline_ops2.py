"""Training-data pipeline operators, round 3: exact-substring span dedup
(the suffix-array use case, k-gram anchored), incremental corpus dedup via
a pure-expression Bloom prefilter, and per-source quota capping.

Reference analog: the exporter's dup-session guard (query.go:91-95) is a
membership test against already-seen keys; ``dedup_incremental_bloom``
is that decision at corpus scale with a scan-side filter. The other two
are standard LLM-curation moves (Lee et al. 2022 exact-substring dedup;
C4/RefinedWeb per-domain caps) re-expressed as Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_might_contain
from ..operators.sampling import stratified_sample
from .core import fan_out, fround, query, table

_K = 8  # span/chunk width in tokens


@query(
    "dedup_substring_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
      FROM toks, unnest(generate_series(1, len(t) - 7)) AS g(i)
      WHERE len(t) >= 8
    ),
    marked AS (
      SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS cnt FROM grams
    ),
    dup AS (SELECT doc_id, pos FROM marked WHERE cnt > 1),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM dup
    ),
    isl2 AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, island, count(*) AS n_grams,
             min(pos) AS s, max(pos) AS e
      FROM isl2 GROUP BY doc_id, island
    ),
    perdoc AS (
      SELECT doc_id,
             CAST(sum(n_grams) AS BIGINT) AS n_dup_grams,
             count(*) AS n_spans,
             CAST(sum(e - s + 8) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_dup_grams, p.n_spans, p.dup_tokens,
           floor(CAST(p.dup_tokens AS DOUBLE) / len(k.t) * 1000000 + 0.5)
             / 1000000 AS dup_ratio
    FROM perdoc p JOIN toks k USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection, k-gram anchored (Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better",
    without the monolithic suffix array): a token belongs to a duplicated
    substring of length ≥ k iff it is covered by a sliding k-gram that
    occurs ≥ 2 times corpus-wide. Per doc: duplicated-gram count, merged
    span count (adjacent/overlapping gram hits coalesced via
    gaps-and-islands), duplicated-token coverage and ratio.

    The union of duplicated k-grams EXACTLY characterizes duplicated
    spans ≥ k tokens — a duplicated span of length L contributes its
    L−k+1 grams, and every duplicated gram is itself a duplicated span —
    so this computes the same coverage the suffix-array method yields,
    with only groupable per-gram state (no global sort).

    Plan: tokens hash once behind a Generate barrier (the shingle-hash
    trick, see ``operators.dedup.shingle_hashes``); grams are 8-byte
    xxhash64 combines, so the gram shuffle carries (doc_id, pos, 8B hash),
    never strings. One shuffle on gram hash (occurrence-count window), one
    shuffle on doc_id under which Catalyst stacks the lag window, the
    running-sum window, and both downstream aggregations (partitioning on
    doc_id satisfies every (doc_id, …) clustering), then a join back to
    per-doc token counts — kept separate so the gram shuffle stays slim.

    100 TB: gram rows ≈ corpus token count × 12 B; the hot key (a
    boilerplate gram) is exactly what gets counted, and the count window
    is an agg-join in disguise with partial aggregation. No stage holds a
    document's text after the scan.

    Precision bound: gram identity is the 64-bit combined xxhash64, so two
    DISTINCT grams collide with probability ~n²/2^64 (≈10⁻⁴ expected false
    dup-grams at 10⁹ grams; material only past ~10^11 grams, where the
    shuffle-the-strings alternative stops being linear). This is the
    deliberate trade for an 8-byte gram shuffle; the oracle compares gram
    STRINGS and agrees at every tested SF.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    base = d.select(F.col("doc_id"), F.explode(F.array(th)).alias("th")).filter(
        F.size("th") >= _K
    )
    idx = F.sequence(F.lit(1), F.size("th") - (_K - 1))
    gh = F.transform(
        idx, lambda i: F.xxhash64(*[F.element_at(F.col("th"), i + j) for j in range(_K)])
    )
    grams = base.select("doc_id", F.posexplode(gh).alias("pos", "gh"))

    cnt = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    dup = grams.select("doc_id", "pos", cnt.alias("cnt")).filter(F.col("cnt") > 1)

    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(wdoc) <= _K, 0).otherwise(1)
    island = F.sum("brk").over(wdoc.rowsBetween(Window.unboundedPreceding, 0))
    isl = dup.select("doc_id", "pos", brk.alias("brk")).select(
        "doc_id", "pos", island.alias("island")
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("n_grams"), F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    perdoc = spans.groupBy("doc_id").agg(
        F.sum("n_grams").alias("n_dup_grams"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + _K).alias("dup_tokens"),
    )
    lens = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    return perdoc.join(lens, "doc_id").select(
        "doc_id",
        "n_dup_grams",
        "n_spans",
        "dup_tokens",
        fround(F.col("dup_tokens").cast("double") / F.col("n_tok"), 6).alias("dup_ratio"),
    )


@query(
    "dedup_incremental_bloom",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS tk
      FROM documents WHERE len(string_split(text, ' ')) >= 8
    ),
    ch AS (
      SELECT doc_id, lang, source, array_to_string(tk[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM t, unnest(range(0, CAST(floor(len(tk) / 8) AS BIGINT))) AS u(i)
    ),
    corpus AS (SELECT DISTINCT chunk FROM ch WHERE source <> 'src0'),
    batch AS (SELECT doc_id, lang, chunk FROM ch WHERE source = 'src0')
    SELECT doc_id, lang, count(*) AS n_chunks,
           CAST(sum(CASE WHEN chunk IN (SELECT chunk FROM corpus)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           sum(CASE WHEN chunk IN (SELECT chunk FROM corpus)
                    THEN 1 ELSE 0 END) > 0 AS is_dup
    FROM batch GROUP BY doc_id, lang
    """,
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch (source src0) against the existing
    corpus (every other source) at chunk granularity, Bloom-prefiltered:
    build a bitset Bloom over the corpus's aligned 8-token chunks
    (ONE m/64-row shuffle, bitmap collected driver-side like Spark's own
    runtime bloom filters), embed it as a plan literal, and filter batch
    chunks IN THE SCAN STAGE — chunks the bloom rejects are definitely
    new and never shuffle. Only bloom candidates pay the exact
    verification semi-join, and that join compares the chunk STRINGS —
    not their 64-bit hashes, which at 10^12-chunk scale would admit
    ~n²/2^64 false overlaps — so the result is EXACT: a Bloom filter has
    no false negatives and string equality eliminates false positives.
    The verify shuffle stays narrow via a SECOND bloom, built over the
    (small) candidate set and applied to the corpus scan, so the corpus
    contributes only ~overlap-sized strings to the verify join rather
    than every chunk.

    This is the reference's dup-session membership check (query.go:91-95)
    generalized to corpus scale — and the standard shape for "dedup
    today's crawl against 100 TB of yesterday". The tokenize+explode
    chunk expansion (the CPU-heavy part) runs ONCE over a single
    documents scan and is localCheckpoint'd (checkpoint-once doctrine,
    SCALE.md); all four consumers — bitmap build, bloom-pruned corpus
    verify, batch candidate filter, per-doc totals — read the
    materialized chunks instead of re-scanning and re-chunking 3×.
    The checkpoint is chunk-expansion-sized (~the text volume); on a
    storage-tight cluster trade it back for a second scan by dropping
    the checkpoint on the corpus side only.
    """
    docs = table(spark, sf_dir, "documents")

    def chunks(df: DataFrame) -> DataFrame:
        t = df.select(
            "doc_id", "lang", "source", F.split(F.col("text"), " ").alias("tk")
        ).filter(F.size("tk") >= _K)
        n_chunks = F.floor(F.size("tk") / _K).cast("int")
        return t.select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
            "tk",
        ).select(
            "doc_id",
            "lang",
            "source",
            F.array_join(F.slice("tk", F.col("i") * _K + 1, F.lit(_K)), " ").alias("chunk"),
        )

    m_bits, k = 1 << 20, 3
    all_chunks = chunks(fan_out(docs)).localCheckpoint(eager=False)
    corpus_chunks = all_chunks.filter(F.col("source") != "src0")
    bitmap = bloom_build(corpus_chunks, F.col("chunk"), m_bits=m_bits, k=k)

    batch_chunks = all_chunks.filter(F.col("source") == "src0")
    cand = batch_chunks.filter(bloom_might_contain(F.col("chunk"), bitmap, m_bits, k))
    # The candidate set is ~overlap-sized, so its bloom can be 8x smaller
    # (16 KiB literal) while keeping FP negligible for the corpus prune.
    cm_bits = 1 << 17
    cand_bitmap = bloom_build(cand.select("chunk"), F.col("chunk"), m_bits=cm_bits, k=k)
    corpus_verify = corpus_chunks.select("chunk").filter(
        bloom_might_contain(F.col("chunk"), cand_bitmap, cm_bits, k)
    )
    hits = cand.select("doc_id", "chunk").join(corpus_verify, "chunk", "left_semi")
    overlap = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_overlap"))
    per_doc = batch_chunks.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("n_chunks"))
    return per_doc.join(overlap, "doc_id", "left").select(
        "doc_id",
        "lang",
        "n_chunks",
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("is_dup"),
    )


@query(
    "curation_manifest_end2end",
    oracle="""
    WITH gated AS (
      SELECT doc_id, lang, source, text,
             len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE n_chars >= 120
    ),
    deduped AS (
      SELECT * FROM (
        SELECT g.*, min(doc_id) OVER (PARTITION BY text) AS first_doc FROM gated g
      ) WHERE doc_id = first_doc
    ),
    quotaed AS (
      SELECT * FROM (
        SELECT d.*, row_number() OVER (PARTITION BY source
                                       ORDER BY md5(text), doc_id) AS rk
        FROM deduped d
      ) WHERE rk <= 15
    ),
    sampled AS (
      SELECT * FROM quotaed
      WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 10000
            < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 7500 ELSE 10000 END
    )
    SELECT lang,
           count(*)                        AS n_docs,
           CAST(sum(n_tok) AS BIGINT)      AS total_tokens,
           CAST(floor(sum(n_tok) / 512) AS BIGINT) AS n_blocks,
           CAST(sum(doc_id) AS BIGINT)     AS id_checksum
    FROM sampled GROUP BY lang
    """,
)
def curation_manifest_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as ONE Catalyst plan: length gate →
    exact dedup (first-doc-wins over full text) → per-source quota
    (md5-rank ≤ 15) → per-language mixture downsample (content-addressed,
    en 50% / zh 75% / rest kept) → per-language packing manifest stats
    (docs, tokens, full 512-token blocks, id checksum).

    The point is composition: each stage is the already-certified
    operator (``dedup_exact``'s window, ``sample_source_quota``'s
    WindowGroupLimit rank, ``deterministic_sample``'s scan predicate),
    and chaining them costs exactly the union of their shuffles — the
    gate and the sample are scan-stage predicates that Catalyst pushes
    below/between the two windows, so the plan is: scan → text window →
    source window → final agg. Every stage is deterministic
    (content-addressed), so the oracle reproduces the exact same kept
    set and checksum cross-engine — the property that makes a 100 TB
    curation run auditable and resumable.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 120)
    d = d.select(
        "doc_id", "lang", "source", "text",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("text"))
    deduped = d.select("*", first_doc.alias("first_doc")).filter(
        F.col("doc_id") == F.col("first_doc")
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.md5(F.col("text")), F.col("doc_id"))
    )
    quotaed = deduped.select("*", rk.alias("rk")).filter(F.col("rk") <= 15)
    sampled = stratified_sample(
        quotaed, F.col("text"), "lang", {"en": 0.5, "zh": 0.75}, default_fraction=1.0
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.floor(F.sum("n_tok") / 512).alias("n_blocks"),
        F.sum("doc_id").alias("id_checksum"),
    )


@query(
    "sample_source_quota",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rk
      FROM documents
    )
    SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM r WHERE rk <= 10 GROUP BY source
    """,
)
def sample_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (C4/RefinedWeb-style domain balancing): keep at
    most 10 documents per source, chosen by md5(text) rank — a
    content-addressed, deterministic "random" order that is identical
    across runs, partitionings, and engines (the oracle reproduces the
    exact kept set; doc_id breaks md5 ties).

    Plan: the rank-≤-quota filter over a row_number window is recognized
    by Catalyst as WindowGroupLimit — each map task keeps only its local
    top-10 per source BEFORE the shuffle, so the exchange carries
    O(sources × quota × partitions) rows, not the corpus. That is what
    makes a per-domain cap feasible when one domain is 30% of 100 TB.
    """
    d = table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.md5(F.col("text")), F.col("doc_id"))
    )
    kept = d.select("source", "doc_id", rk.alias("rk")).filter(F.col("rk") <= 10)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )
