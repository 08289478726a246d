"""LLM-data ops, round 7 batch 1: prefix-doubling suffix LCP promoted to
the registry (the r6 verdict's one remaining scale dial).

``dedup_longest_substring`` (llmdata13) is exact only while every
document fits the fixed 128-token suffix truncation, and its shuffle
carries O(positions x 128) token payloads. The unbounded form here runs
``operators/suffixes.suffix_lcp_unbounded`` — the sort-key cap starts at
16 tokens and DOUBLES only while some adjacent pair ties at the cap, so
the shuffle payload is O(positions x final_cap) with final_cap set by
the corpus' true duplicated-prefix mass, not by a guessed constant, and
arbitrarily long documents need no fail-loud bound. The DuckDB oracle
sorts FULL suffixes (no truncation at all), so a hash match certifies
that the doubling loop's termination test ("no adjacent tie at cap" ⇒
truncated order == full order) is airtight, on real corpus data rather
than the 300-token fixtures that certified it in round 6.

Reference parity note: /root/reference has no dedup surface at all
(query.go:1-289 is log parsing); this is §2.3 north-star territory per
SURVEY §2.3 / the deduplicate-text-datasets recipe (exact substring
dedup at token granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.suffixes import suffix_lcp_unbounded
from .core import corpus_key, query, table

_L = 10  # minimum duplicated span worth reporting (tokens) — llmdata13 parity


@query(
    "similarity_hnsw_topk",
    oracle="""
    SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned,
           true AS within_eps
    FROM embeddings WHERE vec_id < 8 ORDER BY vec_id
    """,
)
def similarity_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-LAYER beam search ANN (operators/similarity.hnsw_topk —
    HNSW's hierarchy in batch form: k-means coarse layer scores a
    broadcast (32, dim) centroid matrix per query, precomputed
    per-cell entry nodes hand off to the base kNN graph, then the
    shared greedy-beam kernel walks the base graph with OCCUPANCY-SCALED
    effort — entry_per_cell/beam/hops grow with n/C, HNSW's ef-scaling
    discipline, capped so per-query work stays corpus-size-independent),
    emitted as the certify_topk_bound certificate with ε=0.10 (recall
    0.912 / 0.912 / 0.900 at sf0.001/0.01/0.1 — the sf0.1 figure was
    0.75 under fixed knobs; floor 0.85 pinned at both corpus sizes in
    tests/test_llmdata18.py). Completes the r6 verdict's ANN stretch:
    entry cost is O(n_centroids) per query instead of linear in the
    corpus bucket table."""
    from ..operators.similarity import certify_topk_bound, hnsw_topk

    # r14: fan_out removed -- driver-regressed ANN ladder rung; see the
    # rationale comment at similarity_lsh_topk (llmdata.py) and
    # OPTIMIZATION_r14.md.
    emb = table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=False
    )  # scan once: index build + search + certifier reuse it
    queries_df = emb.filter(F.col("vec_id") < 8)
    ap = hnsw_topk(
        emb, queries_df, "embedding", "vec_id", "vec_id", k=10,
        train_cache_key=corpus_key(sf_dir, "embeddings"),
    )
    return certify_topk_bound(
        emb, ap, "embedding", "vec_id", queries_df, "vec_id", k=10, eps=0.10
    )

# Full-suffix (untruncated) twin of llmdata13's _SUFFIX_CTE: nums spans
# the true max document length and `suf` slices to end-of-document, so
# the oracle is exact for ANY document length — which is the point: the
# Spark side never materializes full suffixes, and the hash gate proves
# its doubling loop reaches the same answer anyway.
_SUFFIX_FULL_CTE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tokens
  FROM documents WHERE text IS NOT NULL
),
nums AS (SELECT unnest(range(0, (SELECT max(len(tokens)) FROM toks))) AS i),
sufs AS (
  SELECT t.doc_id, CAST(n.i AS BIGINT) AS pos,
         t.tokens[n.i + 1] AS tok1,
         coalesce(t.tokens[n.i + 2], '') AS tok2,
         t.tokens[n.i + 1 :] AS suf
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
  SELECT doc_id, pos, pdoc, ppos, (doc_id <> pdoc) AS crossdoc,
         CAST(coalesce(
             nullif(list_position(
                 list_transform(list_zip(suf, psuf), x -> x[1] = x[2]),
                 false), 0) - 1,
             least(len(suf), len(psuf))) AS BIGINT) AS lcp
  FROM adj WHERE psuf IS NOT NULL
)
"""


@query(
    "dedup_longest_substring_unbounded",
    oracle=_SUFFIX_FULL_CTE
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
def dedup_longest_substring_unbounded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document longest duplicated token span — same instrument as
    ``dedup_longest_substring`` but via the prefix-doubling path
    (operators/suffixes.py:69): no truncation bound, no fail-loud doc
    length guard, shuffle payload capped at the smallest power-of-two
    sort key that disambiguates every adjacent suffix pair. The oracle
    sorts FULL suffixes, so hash-green here certifies the doubling
    termination argument end-to-end on corpus data. This is the form
    that should be the default at real scale (VERDICT r6 directive #2).
    """
    docs = table(spark, sf_dir, "documents")
    lcps = suffix_lcp_unbounded(docs, text_col="text", id_col="doc_id").filter(
        F.col("lcp") >= _L
    )
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
