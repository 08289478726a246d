"""LLM-data ops, round 8 batch 1: suffix-dedup form auto-dispatch.

The truncated (one sort, fixed 128-token cap — llmdata13) and
prefix-doubling (no cap, ties-driven re-sorts — llmdata18) substring
dedup forms were a MANUAL per-corpus choice; ``operators/suffixes.
suffix_lcp_auto`` now picks from one cheap 1-row max-doc-length
aggregate (doubling iff any document exceeds the cap — max, not a
percentile, because max IS the truncated form's exactness criterion),
and this registry entry surfaces the decision in a ``form`` column.
The DuckDB oracle sorts FULL suffixes (exact for either form) and
derives the same decision from the same statistic, so the hash gate
certifies both the per-doc results AND the dispatch.

Reference parity note: /root/reference has no dedup surface
(query.go:1-289 is log parsing); §2.3 north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.suffixes import suffix_lcp_auto
from .core import query, table
from .llmdata18 import _SUFFIX_FULL_CTE

_L = 10  # minimum duplicated span worth reporting (tokens) — llmdata13 parity
_CAP = 128  # truncated-form bound — llmdata13's _T


@query(
    "dedup_longest_substring_auto",
    oracle=_SUFFIX_FULL_CTE
    + f""",
parts AS (
  SELECT doc_id AS d, pos AS p, lcp, crossdoc FROM lcps WHERE lcp >= {_L}
  UNION ALL
  SELECT pdoc, ppos, lcp, crossdoc FROM lcps WHERE lcp >= {_L}
),
pick AS (
  SELECT CASE WHEN max(len(tokens)) > {_CAP} THEN 'doubling'
              ELSE 'truncated' END AS form
  FROM toks
)
SELECT d AS doc_id,
       max(lcp) AS longest_dup,
       max(CASE WHEN crossdoc THEN lcp END) AS longest_cross_dup,
       CAST(count(DISTINCT p) AS BIGINT) AS n_dup_starts,
       (SELECT form FROM pick) AS form
FROM parts GROUP BY 1 ORDER BY 1
""",
)
def dedup_longest_substring_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document longest duplicated token span with the suffix form
    AUTO-DISPATCHED (operators/suffixes.suffix_lcp_auto): one 1-row
    max-token-length aggregate picks truncated (max <= 128 — one
    bucketed sort of capped slices) vs prefix-doubling (any longer doc —
    cap grows only while adjacent ties persist). Same per-doc semantics
    as dedup_longest_substring / _unbounded; the chosen form rides along
    as a column so the decision itself is hash-gated against the
    oracle's derivation of the same statistic.

    100 TB: the dispatch costs one scan-side max; both branches are the
    already-certified plans (bucketed sorts, no global windows)."""
    docs = table(spark, sf_dir, "documents")
    lcps, form = suffix_lcp_auto(docs, cap=_CAP)
    lcps = lcps.filter(F.col("lcp") >= _L)
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
        .withColumn("form", F.lit(form))
        .orderBy("doc_id")
    )
