"""LLM-data battery, round 3 batch 19: vocabulary coverage budgeting
and the dedup→quality selection-bias audit.

Two curation follow-ups. The coverage curve answers the tokenizer-
budget question the Zipf audit (text_zipf_topranks) sets up: what
fraction of corpus TOKENS does a top-k vocabulary cover, for the k
values actually considered? The dedup-quality impact report closes a
loop between two existing operator families: after prefix-canonical
dedup (dedup_canonical_provenance's grouping), do the DROPPED
documents differ systematically in quality from the kept ones? —
selection-bias measurement every dedup deployment owes its consumers
(dedup that preferentially drops long/clean documents silently shifts
the training distribution).

Float discipline per workloads/core.py: counts exact, means from
quantized sums, ratios frounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL as _MD5_SQL
from .core import fround
from .core import md5_long as _md5_long
from .core import query, table

_VOCAB_KS = [10, 30, 100, 300]


@query(
    "text_vocab_coverage_curve",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f
      FROM tok WHERE w <> '' GROUP BY w
    ),
    ranked AS (
      SELECT f,
             row_number() OVER (ORDER BY f DESC, w) AS rk,
             sum(f) OVER () AS tot,
             sum(f) OVER (ORDER BY f DESC, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM freq
    ),
    ks AS (SELECT unnest(ARRAY{_VOCAB_KS}) AS k)
    SELECT CAST(ks.k AS INT) AS vocab_size,
           CAST(max(CASE WHEN rk <= ks.k THEN cum END) AS BIGINT)
             AS tokens_covered,
           CAST(max(tot) AS BIGINT) AS tokens_total,
           floor((CAST(max(CASE WHEN rk <= ks.k THEN cum END) AS DOUBLE)
                  / CAST(max(tot) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS coverage
    FROM ranked, ks GROUP BY ks.k ORDER BY vocab_size
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-budget coverage curve: for each candidate vocabulary
    size k, the exact share of corpus token OCCURRENCES covered by the
    top-k types — the decision input for tokenizer/vocab truncation
    (text_zipf_topranks shows the curve's shape; this row evaluates
    the actual budgets). Coverage at k is the cumulative frequency at
    rank k, read off ONE ranked pass — k values share the window
    rather than re-scanning per budget.

    Scale: one token-count aggregate, one vocabulary-sized rank
    window, a 4-row budget join. The curve is monotone by
    construction — pinned in tests.
    """
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    wo = Window.orderBy(F.desc("f"), "w")
    ranked = freq.select(
        "f",
        F.row_number().over(wo).alias("rk"),
        F.sum("f").over(Window.partitionBy()).alias("tot"),
        F.sum("f").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    ks = spark.createDataFrame([(k,) for k in _VOCAB_KS], "k int")
    covered = F.max(F.when(F.col("rk") <= F.col("k"), F.col("cum")))
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("int").alias("vocab_size"))
        .agg(
            covered.cast("bigint").alias("tokens_covered"),
            F.max("tot").cast("bigint").alias("tokens_total"),
            fround(covered.cast("double") / F.max("tot").cast("double"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("vocab_size")
    )


@query(
    "curation_dedup_quality_impact",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
             CAST({_MD5_SQL.format(x="array_to_string(string_split(lower(text), ' ')[1:5], ' ')")}
                  AS BIGINT) AS th
      FROM documents
    ),
    keep AS (
      SELECT th, min(doc_id) AS keeper FROM h GROUP BY th
    ),
    tagged AS (
      SELECT h.doc_id, h.n_chars, h.n_words,
             CASE WHEN h.doc_id = k.keeper THEN 'kept' ELSE 'dropped' END
               AS fate
      FROM h JOIN keep k ON h.th = k.th
    )
    SELECT fate,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           floor((CAST(sum(n_chars) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4
             AS mean_chars,
           floor((CAST(sum(n_words) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4
             AS mean_words
    FROM tagged GROUP BY fate ORDER BY fate
    """,
)
def curation_dedup_quality_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection-bias audit for dedup: tag every document 'kept' or
    'dropped' under the prefix-canonical policy (min-id per
    syndication group — dedup_canonical_provenance's grouping) and
    compare the two populations' size/quality profiles. A dedup pass
    whose dropped docs are systematically longer (or cleaner) than its
    kept docs is silently reshaping the training distribution — this
    report is the check that catches it. Counts and char totals are
    exact; means divide exact integers, frounded.

    Scale: digesting and tagging are one hash aggregate + one join on
    the 8-byte group key; the report is a 2-row rollup. Composes with
    any keep-policy by swapping the `keep` rule (provenance rank,
    quality score, random).
    """
    d = table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 1, 5))
    n_words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    h = d.select(
        "doc_id",
        "n_chars",
        n_words.alias("n_words"),
        _md5_long(prefix).alias("th"),
    ).localCheckpoint(eager=False)  # digest rows; feeds keeper agg + tagging
    keep = h.groupBy("th").agg(F.min("doc_id").alias("keeper"))
    tagged = h.join(keep, "th").select(
        "n_chars",
        "n_words",
        F.when(F.col("doc_id") == F.col("keeper"), "kept")
        .otherwise("dropped")
        .alias("fate"),
    )
    return (
        tagged.groupBy("fate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            fround(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_chars"),
            fround(
                F.sum("n_words").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_words"),
        )
        .orderBy("fate")
    )


@query(
    "multimodal_audio_vad",
    oracle="""
    WITH ids AS (
      SELECT doc_id FROM documents WHERE doc_id < 60
    ),
    frames AS (
      SELECT i.doc_id, b.b AS frame,
             CASE WHEN (i.doc_id + b.b) % 3 <> 0 THEN 1 ELSE 0 END AS active
      FROM ids i, range(10) b(b)
    ),
    runs AS (
      SELECT doc_id, frame, active,
             CASE WHEN active = 1
                   AND coalesce(lag(active) OVER (PARTITION BY doc_id
                                                  ORDER BY frame), 0) = 0
                  THEN 1 ELSE 0 END AS seg_start
      FROM frames
    ),
    segs AS (
      SELECT doc_id, frame, active,
             sum(seg_start) OVER (PARTITION BY doc_id ORDER BY frame) AS seg_id
      FROM runs
    ),
    seg_lens AS (
      SELECT doc_id, seg_id, count(*) AS len
      FROM segs WHERE active = 1 GROUP BY doc_id, seg_id
    )
    SELECT f.doc_id,
           CAST(10 AS INT) AS n_frames,
           CAST(sum(f.active) AS INT) AS n_active,
           CAST((SELECT count(*) FROM seg_lens s WHERE s.doc_id = f.doc_id)
                AS INT) AS n_segments,
           CAST((SELECT max(len) FROM seg_lens s WHERE s.doc_id = f.doc_id)
                AS INT) AS longest_run,
           CAST(min(CASE WHEN f.active = 1 THEN f.frame END) AS INT)
             AS first_active
    FROM frames f GROUP BY f.doc_id ORDER BY f.doc_id
    """,
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over the REAL audio lane: synthesize
    gated WAVs (every third 200-sample block is digital silence, the
    pattern pure id arithmetic), DECODE them, score frames by exact
    integer energy, and reduce to segment statistics — the
    speech-segmentation primitive of any audio curation pipeline
    (silence stripping, utterance splitting). The oracle replays the
    gating formula and the gaps-and-islands segmentation in SQL — a
    framing offset, threshold error, or run-length bug anywhere in
    the decode/VAD chain diverges some document's row.

    Scale: synth+decode+VAD are ONE scan-stage mapInPandas chain —
    blobs never shuffle; only five small integers per document
    survive. Frame energy in int64 stays 7 orders of magnitude under
    the overflow clamp (SCALE.md floor rule applied to sums).
    """
    from ..operators.multimodal import synth_wav_gated, vad_wav

    d = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 60
    )
    out = vad_wav(synth_wav_gated(d, "doc_id"))
    return out.select(
        "doc_id",
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("n_active").cast("int").alias("n_active"),
        F.col("n_segments").cast("int").alias("n_segments"),
        F.col("longest_run").cast("int").alias("longest_run"),
        F.col("first_active").cast("int").alias("first_active"),
    ).orderBy("doc_id")
