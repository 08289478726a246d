"""LLM-data ops, round 6 batch 1: suffix-array exact substring
deduplication (the ROADMAP heavy — longest-duplicate-substring
semantics per the public deduplicate-text-datasets recipe, token
granularity), rendered distribution-first.

Method: the classic suffix-array fact — the maximal LCP between any
suffix and the rest of the corpus is achieved at an ADJACENT suffix in
the sorted suffix order — turned into a shuffle-friendly plan. Suffixes
are bucketed by their first TWO tokens; each bucket is a contiguous
block of the global sorted order, so within-bucket adjacency equals
global adjacency for every pair with LCP >= 2 (cross-bucket neighbors
share < 2 tokens, far below the report threshold). No global window,
no boundary stitch needed.

100 TB notes: the bucket key width is the scale dial — two tokens gives
|vocab|^2 buckets (here 31^2; a web corpus gives billions), and k grows
until buckets fit an executor; the per-bucket sort is Spark's own
range-partitioned sort, never a single-partition window (plan_audit
enforces). Suffixes are truncated to _T tokens: exact here because the
corpus max doc length (100 tokens) is below _T = 128, fail-loud past it
(no-silent-caps rule); unbounded documents take the
prefix-doubling extension — implemented in operators/suffixes.py
(suffix_lcp_unbounded: the sort cap doubles while any adjacent pair
ties at it; brute-force-certified on 300-token fixture docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, query, table

_T = 128  # suffix truncation + oracle numbers-table bound (tokens)
_L = 10  # minimum duplicated span worth reporting (tokens)
_ACTION_L = 20  # document-removal policy threshold (tokens)

# Shared SQL prefix: tokenize -> emit (pos, first-two-token bucket,
# truncated suffix) -> sort within bucket -> adjacent LCP. lcps is
# MATERIALIZED because DuckDB inlines CTEs (SCALE.md trap) and the
# per-doc query references it twice (both pair participants).
_SUFFIX_CTE = f"""
WITH nums AS (SELECT t.i FROM range(0, {_T}) t(i)),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tokens
  FROM documents WHERE text IS NOT NULL
),
sufs AS (
  SELECT t.doc_id, CAST(n.i AS BIGINT) AS pos,
         t.tokens[n.i + 1] AS tok1,
         coalesce(t.tokens[n.i + 2], '') AS tok2,
         t.tokens[n.i + 1 : n.i + {_T}] AS suf
  FROM toks t JOIN nums n ON n.i < len(t.tokens)
),
adj AS (
  SELECT doc_id, pos, suf,
         lag(doc_id) OVER w AS pdoc, lag(pos) OVER w AS ppos,
         lag(suf) OVER w AS psuf
  FROM sufs
  WINDOW w AS (PARTITION BY tok1, tok2 ORDER BY suf, doc_id, pos)
),
lcps AS MATERIALIZED (
  SELECT doc_id, pos, pdoc, ppos, (doc_id <> pdoc) AS crossdoc, suf,
         CAST(coalesce(
             nullif(list_position(
                 list_transform(list_zip(suf, psuf), x -> x[1] = x[2]),
                 false), 0) - 1,
             least(len(suf), len(psuf))) AS BIGINT) AS lcp
  FROM adj WHERE psuf IS NOT NULL
)
"""


def _suffix_lcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency rows (doc_id, pos, pdoc, ppos, crossdoc, suf, lcp) for
    every neighboring suffix pair in the bucketed sorted order."""
    # fan_out (r13 optimization pass): the tokenize + posexplode + slice
    # work below is the expensive side of the (tok1, tok2) exchange, and
    # documents.parquet is ONE row group locally — without the fan-out the
    # whole O(positions × _T) suffix build pins to a single core.
    docs = fan_out(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    tokens = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    # Fail-loud at the oracle's numbers-table bound: a document longer
    # than _T tokens would silently lose suffix positions on the SQL
    # side AND truncate LCPs here. The raise feeds the tokens column so
    # pruning can't drop the guard.
    toks = docs.select(
        "doc_id",
        F.when(
            F.size(tokens) > _T,
            F.raise_error(
                F.concat(
                    F.lit("dedup_longest_substring: document "),
                    F.col("doc_id").cast("string"),
                    F.lit(
                        f" exceeds the {_T}-token suffix bound; raise _T "
                        "and the oracle nums range together (or enable "
                        "the prefix-doubling extension)"
                    ),
                )
            ).cast("array<string>"),
        ).otherwise(tokens).alias("tokens"),
    )
    sufs = toks.select(
        "doc_id",
        F.posexplode("tokens").alias("pos", "tok1"),
        F.col("tokens"),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        "tok1",
        F.coalesce(F.get("tokens", F.col("pos") + 1), F.lit("")).alias("tok2"),
        F.slice("tokens", F.col("pos") + 1, _T).alias("suf"),
    )
    from ..operators.suffixes import adjacency_lcp

    return adjacency_lcp(sufs).select(
        "doc_id", "pos", "pdoc", "ppos", "crossdoc", "suf", "lcp"
    )


@query(
    "dedup_longest_substring",
    oracle=_SUFFIX_CTE
    + f""",
parts AS (
  SELECT doc_id AS d, pos AS p, lcp, crossdoc FROM lcps WHERE lcp >= {_L}
  UNION ALL
  SELECT pdoc, ppos, lcp, crossdoc FROM lcps WHERE lcp >= {_L}
)
SELECT d AS doc_id,
       max(lcp) AS longest_dup,
       max(CASE WHEN crossdoc THEN lcp END) AS longest_cross_dup,
       CAST(count(DISTINCT p) AS BIGINT) AS n_dup_starts
FROM parts GROUP BY 1 ORDER BY 1
""",
)
def dedup_longest_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LONGEST duplicated token span (exact, suffix-array
    semantics): for every document, the length in tokens of the longest
    substring that also occurs elsewhere in the corpus (anywhere —
    another document or another position of the same one), plus the
    cross-document-only maximum and the count of duplicated suffix
    starts >= _L tokens. This is the exact quantity the
    deduplicate-text-datasets recipe thresholds on (spans >= 50 tokens
    get cut); the fixed-n `dedup_substring_spans` 8-gram pass is the
    cheap screen, this is the exact instrument.

    Both pair participants are recovered from one adjacency pass via a
    single in-row explode (no rescan of the windowed subplan — the
    checkpoint-once doctrine applied at plan level)."""
    lcps = _suffix_lcp(spark, sf_dir).filter(F.col("lcp") >= _L)
    parts = lcps.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id").alias("d"),
                    F.col("pos").alias("p"),
                    "lcp",
                    "crossdoc",
                ),
                F.struct(
                    F.col("pdoc").alias("d"),
                    F.col("ppos").alias("p"),
                    "lcp",
                    "crossdoc",
                ),
            )
        ).alias("e")
    ).select("e.*")
    return (
        parts.groupBy(F.col("d").alias("doc_id"))
        .agg(
            F.max("lcp").alias("longest_dup"),
            F.max(F.when(F.col("crossdoc"), F.col("lcp"))).alias(
                "longest_cross_dup"
            ),
            F.countDistinct("p").cast("bigint").alias("n_dup_starts"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_longest_substring_topk",
    oracle=_SUFFIX_CTE
    + f"""
SELECT array_to_string(suf[1 : lcp], ' ') AS dup_text,
       lcp AS len_tokens,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM lcps WHERE lcp >= {_L}
GROUP BY 1, 2
ORDER BY len_tokens DESC, dup_text
LIMIT 20
""",
)
def dedup_longest_substring_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 longest duplicated token spans with their literal text and
    adjacency multiplicity — the triage report a dedup operator feeds a
    human before committing to span removal (what IS the boilerplate?).
    Text is reconstructed by slicing the already-materialized suffix to
    its LCP; no second corpus scan."""
    lcps = _suffix_lcp(spark, sf_dir).filter(F.col("lcp") >= _L)
    return (
        lcps.select(
            F.array_join(
                F.slice("suf", F.lit(1), F.col("lcp").cast("int")), " "
            ).alias("dup_text"),
            F.col("lcp").alias("len_tokens"),
        )
        .groupBy("dup_text", "len_tokens")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("len_tokens"), "dup_text")
        .limit(20)
    )


@query(
    "dedup_substring_action",
    oracle=_SUFFIX_CTE
    + f""",
    flagged AS (
      SELECT DISTINCT d FROM (
        SELECT doc_id AS d FROM lcps WHERE lcp >= {_ACTION_L} AND crossdoc
        UNION ALL
        SELECT pdoc FROM lcps WHERE lcp >= {_ACTION_L} AND crossdoc
      )
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count_if(f.d IS NOT NULL) AS BIGINT) AS n_flagged,
           CAST(sum(CASE WHEN f.d IS NULL THEN length(t.text) END)
                AS BIGINT) AS surviving_chars
    FROM documents t LEFT JOIN flagged f ON f.d = t.doc_id
    GROUP BY t.source ORDER BY t.source
    """,
)
def dedup_substring_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION the suffix-array instrument exists for
    (deduplicate-text-datasets' document-removal policy): flag every
    document sharing a cross-document duplicated span of >= 20 (_ACTION_L)
    tokens, report per-source survival (doc counts, flagged counts,
    surviving character volume). Composes _suffix_lcp end-to-end —
    instrument → policy → corpus accounting — the way a curation run
    actually consumes it. (Span-level REMOVAL, cutting just the
    duplicated tokens, is the other published policy; the per-doc span
    coordinates this pipeline already emits are exactly its input.)"""
    lcps = _suffix_lcp(spark, sf_dir).filter(
        (F.col("lcp") >= _ACTION_L) & F.col("crossdoc")
    )
    flagged = (
        lcps.select(
            F.explode(F.array(F.col("doc_id"), F.col("pdoc"))).alias("d")
        )
        .distinct()
        .withColumn("is_flagged", F.lit(True))
    )
    d = table(spark, sf_dir, "documents")
    return (
        d.join(flagged, d["doc_id"] == flagged["d"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("is_flagged").isNotNull()).alias("n_flagged"),
            F.sum(
                F.when(F.col("is_flagged").isNull(), F.length("text"))
            ).cast("bigint").alias("surviving_chars"),
        )
        .orderBy("source")
    )
