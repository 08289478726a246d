"""LLM-data ops, round 8 batch 6: RAKE keyword extraction and zone-map
file skipping.

RAKE (Rapid Automatic Keyword Extraction, Rose et al. 2010 — public
method) is the classic statistics-only keyphrase extractor: split each
document into candidate phrases at stopword boundaries, score every
word by degree/frequency over the phrase graph, score a phrase as the
sum of its word scores. Stopwords are derived IN-PLAN (the corpus' top
frequency tokens — deterministic, so both engines face the same list,
the text_bm25_topk trick). All scores are exact integers (deg·1e6 div
freq — integer floor division), so the ranking cannot flip on float
reduction order.

Zone-map skipping is the lake-layout counterpart of partition pruning:
per-file min/max column statistics let a range predicate skip whole
files, and HOW MUCH it skips is a property of the LAYOUT. The query
materializes both layouts' zone maps from one scan, counts the files a
predicate must read under each, and certifies the pruned scan returns
exactly the full-scan answer.

Reference parity note: /root/reference has neither text analytics nor
a columnar layout (query.go:1-289); §2.3 north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import query, table

_N_STOP = 5  # in-plan stopword list size (corpus top-N tokens)
_TOP_PHRASES = 20

_ZM_FILES = 64  # simulated files per layout
_ZM_LO, _ZM_HI = 100.0, 120.0  # the range predicate being served


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t <> '') AS t
        FROM documents WHERE text IS NOT NULL
      ), LATERAL (
        SELECT unnest(t) AS tok, generate_subscripts(t, 1) AS pos
      )
    ),
    stop AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
        FROM toks GROUP BY tok
      ) WHERE rk <= {_N_STOP}
    ),
    nonstop AS (
      SELECT doc_id, tok, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM toks WHERE tok NOT IN (SELECT tok FROM stop)
    ),
    inst AS (
      SELECT doc_id, tok, pos, grp,
             CAST(count(*) OVER (PARTITION BY doc_id, grp) AS BIGINT) AS l
      FROM nonstop
    ),
    word AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(l) AS BIGINT) AS deg
      FROM inst GROUP BY tok
    ),
    scored AS (
      SELECT i.doc_id, i.grp,
             string_agg(i.tok, ' ' ORDER BY i.pos) AS phrase,
             CAST(max(i.l) AS BIGINT) AS n_words,
             CAST(sum(w.deg * 1000000 // w.freq) AS BIGINT) AS score_q
      FROM inst i JOIN word w ON w.tok = i.tok
      GROUP BY i.doc_id, i.grp
    )
    SELECT phrase, n_words, score_q, n_occurrences, rk FROM (
      SELECT phrase,
             CAST(max(n_words) AS BIGINT) AS n_words,
             CAST(max(score_q) AS BIGINT) AS score_q,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(row_number() OVER (
               ORDER BY max(score_q) DESC, phrase) AS BIGINT) AS rk
      FROM scored GROUP BY phrase
    ) WHERE rk <= {_TOP_PHRASES}
    ORDER BY rk
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction: candidate phrases are maximal stopword-
    free token runs (gaps-and-islands per document: pos − row_number is
    constant within a run), word score = degree/frequency over phrase
    instances (degree counts the word's co-membership, itself included),
    phrase score = Σ member-word scores. Stopwords are the corpus' top-5
    tokens, derived in-plan; word scores quantize as deg·1e6 div freq
    (integer), so phrase scores are integer sums. Top-20 phrase texts
    with occurrence counts.

    100 TB: one tokenize scan; islands use per-DOCUMENT windows (never
    global); word stats are a vocab-keyed aggregate broadcast back; the
    only corpus-sized shuffles are the (doc,grp) phrase folds. The
    final ranking window sits above a phrase-cardinality aggregate."""
    toks = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
            ).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
        .localCheckpoint(eager=False)  # feeds stopword agg AND the islands
    )
    stop = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.col("tok")))
        )
        .filter(F.col("rk") <= _N_STOP)
        .select("tok")
    )
    nonstop = toks.join(F.broadcast(stop), "tok", "left_anti").withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    inst = nonstop.withColumn(
        "l",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id", "grp"))
        .cast("bigint"),
    ).localCheckpoint(eager=False)  # feeds word stats AND phrase folds
    word = inst.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("l").cast("bigint").alias("deg"),
    )
    scored = (
        inst.join(F.broadcast(word), "tok")
        .groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda t: t.getField("tok"),
                ),
            ).alias("phrase"),
            F.max("l").cast("bigint").alias("n_words"),
            F.sum(F.expr("deg * 1000000 div freq")).cast("bigint").alias("score_q"),
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.max("n_words").cast("bigint").alias("n_words"),
            F.max("score_q").cast("bigint").alias("score_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("score_q"), F.col("phrase")))
            .cast("bigint"),
        )
        .filter(F.col("rk") <= _TOP_PHRASES)
        .select("phrase", "n_words", "score_q", "n_occurrences", "rk")
        .orderBy("rk")
    )


@query(
    "layout_zonemap_skipping",
    oracle=f"""
    WITH base AS (
      SELECT event_id, value FROM events WHERE value IS NOT NULL
    ),
    mm AS (SELECT min(value) AS vmin, max(value) AS vmax FROM base),
    placed AS (
      SELECT event_id, value,
             event_id % {_ZM_FILES} AS f_rand,
             least(CAST(floor((value - vmin) / (vmax - vmin) * {_ZM_FILES})
                        AS BIGINT), {_ZM_FILES - 1}) AS f_clust
      FROM base CROSS JOIN mm
    ),
    zr AS (
      SELECT f_rand AS f, min(value) AS lo, max(value) AS hi
      FROM placed GROUP BY 1
    ),
    zc AS (
      SELECT f_clust AS f, min(value) AS lo, max(value) AS hi
      FROM placed GROUP BY 1
    ),
    pruned AS (
      SELECT CAST(count(*) AS BIGINT) AS n
      FROM placed
      WHERE f_clust IN (SELECT f FROM zc
                        WHERE hi >= {_ZM_LO} AND lo <= {_ZM_HI})
        AND value BETWEEN {_ZM_LO} AND {_ZM_HI}
    )
    SELECT
      CAST((SELECT count(*) FROM zr) AS BIGINT) AS n_files_rand,
      CAST((SELECT count(*) FROM zc) AS BIGINT) AS n_files_clust,
      CAST((SELECT count(*) FROM zr
            WHERE hi >= {_ZM_LO} AND lo <= {_ZM_HI}) AS BIGINT)
        AS files_scanned_rand,
      CAST((SELECT count(*) FROM zc
            WHERE hi >= {_ZM_LO} AND lo <= {_ZM_HI}) AS BIGINT)
        AS files_scanned_clust,
      CAST((SELECT count(*) FROM placed
            WHERE value BETWEEN {_ZM_LO} AND {_ZM_HI}) AS BIGINT)
        AS rows_matched,
      (SELECT n FROM pruned) = (SELECT count(*) FROM placed
                                WHERE value BETWEEN {_ZM_LO} AND {_ZM_HI})
        AS prune_exact
    """,
)
def layout_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) file skipping, quantified per
    LAYOUT: the same rows are placed into 64 simulated files two ways —
    hash-interleaved (event_id mod 64: every file spans the full value
    range) and value-clustered (equal-width value buckets from a 1-row
    min/max broadcast) — and a fixed range predicate is served from
    each layout's zone map. The clustered layout scans ~the predicate's
    value fraction of files; the interleaved layout scans ALL of them —
    the measured argument for sort/cluster-on-write. `prune_exact`
    certifies the pruned scan (qualifying files, then re-filter)
    returns exactly the full-scan row count — zone maps may over-read
    but never wrong-read.

    100 TB: this is parquet row-group / Iceberg-manifest pruning in
    miniature; the zone map is file-cardinality metadata, the decision
    is metadata-only, and the skip ratio — not the scan speed — is what
    a layout buys. Companion proofs: layout_partitioned_pruning
    (directory-level, plan-asserted) and layout_zorder_manifest
    (multi-column interleave).

    Plan note: the audit's multi-BNLJ flag is the whitelisted class —
    the four crossJoins each broadcast a ONE-ROW aggregate (min/max,
    the two zone-map summaries, the two counts) onto a single output
    row; no corpus-sized side ever enters a nested loop."""
    base = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
        .localCheckpoint(eager=False)  # feeds min/max, placement, counts
    )
    mm = base.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    placed = (
        base.crossJoin(F.broadcast(mm))
        .select(
            "event_id",
            "value",
            (F.col("event_id") % _ZM_FILES).alias("f_rand"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * _ZM_FILES
                ).cast("bigint"),
                F.lit(_ZM_FILES - 1).cast("bigint"),
            ).alias("f_clust"),
        )
        .localCheckpoint(eager=False)  # zone maps + matched counts reuse
    )
    hit = F.col("value").between(_ZM_LO, _ZM_HI)
    zone = lambda c: (  # noqa: E731
        placed.groupBy(F.col(c).alias("f"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.count_if(
                (F.col("hi") >= _ZM_LO) & (F.col("lo") <= _ZM_HI)
            )
            .cast("bigint")
            .alias("scanned"),
        )
    )
    zr, zc = zone("f_rand"), zone("f_clust")
    # pruned scan: qualifying clustered files only, then the predicate
    zc_files = (
        placed.groupBy(F.col("f_clust").alias("f"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .filter((F.col("hi") >= _ZM_LO) & (F.col("lo") <= _ZM_HI))
        .select("f")
    )
    n_pruned = (
        placed.join(F.broadcast(zc_files), placed.f_clust == zc_files.f)
        .filter(hit)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pruned"))
    )
    n_full = placed.filter(hit).agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_matched")
    )
    return (
        zr.select(
            F.col("n_files").alias("n_files_rand"),
            F.col("scanned").alias("files_scanned_rand"),
        )
        .crossJoin(
            F.broadcast(
                zc.select(
                    F.col("n_files").alias("n_files_clust"),
                    F.col("scanned").alias("files_scanned_clust"),
                )
            )
        )
        .crossJoin(F.broadcast(n_full))
        .crossJoin(F.broadcast(n_pruned))
        .select(
            "n_files_rand",
            "n_files_clust",
            "files_scanned_rand",
            "files_scanned_clust",
            "rows_matched",
            (F.col("n_pruned") == F.col("rows_matched")).alias("prune_exact"),
        )
    )
