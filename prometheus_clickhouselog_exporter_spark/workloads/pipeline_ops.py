"""Training-data pipeline operators beyond pairwise dedup (SURVEY §2.3):
dedup clustering (the retention decision), deterministic sampling (the
curation decision), corpus distribution stats (quantiles, heavy hitters).

These are the operations that turn pairwise/near-dup machinery into an
actual data pipeline: pairs → clusters → canonical keep-set → stratified
sample → distribution audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import connected_components, minhash_lsh_dedup
from ..operators.sampling import deterministic_sample, hash_bucket, stratified_sample
from .core import fan_out, fround, query, table
from .llmdata import _SHINGLE_JACCARD_SQL


@query(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_SHINGLE_JACCARD_SQL}),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM sym) s
      UNION
      SELECT s.src, reach.r FROM sym s JOIN reach ON s.dst = reach.id
    )
    SELECT id AS doc_id, min(r) AS component, id = min(r) AS keep
    FROM reach GROUP BY id
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → canonical doc per cluster.

    The full retention pipeline: MinHash-LSH pairs (deterministic hash
    family) feed hash-to-min label propagation; each doc in any near-dup
    cluster gets its component id (min doc_id reachable) and a ``keep``
    verdict (it IS the canonical). Oracle: DuckDB recursive CTE computes
    min-reachable-id over the exact-Jaccard pair graph — transitive
    closure recomputed from first principles.

    100 TB: pair generation is the LSH path (no n² stage); the CC loop
    shuffles only nodes-in-pairs (≪ corpus) per round, O(diameter) rounds,
    lineage truncated per round. See ``connected_components``.
    """
    d = fan_out(table(spark, sf_dir, "documents")).filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    pairs = minhash_lsh_dedup(d, "text", "doc_id", threshold=0.5)
    labels = connected_components(pairs)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("id") == F.col("comp")).alias("keep"),
    )


@query(
    "sample_hash_bernoulli",
    oracle="""
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 10000 AS bucket
    FROM documents
    WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 10000 < 2000
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed deterministic 20% sample (md5 bucketing).

    Unlike ``df.sample()`` the kept set is a pure function of document
    text — identical across runs, partitionings, and engines (the oracle
    reproduces the exact same rows in DuckDB, which no RNG sampler can).
    Nested property: this 20% sample contains every smaller-fraction
    sample with the same key. 100 TB: scan-stage predicate, no shuffle.
    """
    d = table(spark, sf_dir, "documents")
    return deterministic_sample(d, F.col("text"), 0.2).select(
        "doc_id", "lang", hash_bucket(F.col("text")).alias("bucket")
    )


@query(
    "sample_stratified_lang",
    oracle="""
    SELECT lang, count(*) AS n_kept, min(doc_id) AS min_doc_id
    FROM documents
    WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 10000
          < CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 7500 ELSE 10000 END
    GROUP BY lang
    """,
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rebalancing: downsample the high-resource languages
    (en→25%, zh→75%), keep everything else — the standard corpus-mixing
    move, as one deterministic scan-stage CASE predicate."""
    d = table(spark, sf_dir, "documents")
    kept = stratified_sample(
        d, F.col("text"), "lang", {"en": 0.25, "zh": 0.75}, default_fraction=1.0
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_doc_id")
    )


@query(
    "text_quantile_stats",
    oracle="""
    SELECT lang,
           floor(quantile_cont(n_chars, 0.25) * 10 + 0.5) / 10 AS p25,
           floor(quantile_cont(n_chars, 0.50) * 10 + 0.5) / 10 AS p50,
           floor(quantile_cont(n_chars, 0.75) * 10 + 0.5) / 10 AS p75,
           floor(quantile_cont(n_chars, 0.95) * 10 + 0.5) / 10 AS p95,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def text_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact length quantiles per language — the distribution audit run
    before/after filtering to catch truncation or boilerplate skew.

    ``percentile`` (exact, interpolating — matches DuckDB quantile_cont on
    integer inputs) rather than ``percentile_approx`` so the oracle can
    hash-match; the approx twin is exercised in ``agg_approx_quantiles``
    (relational2). 100 TB: exact per-group percentile sorts each group —
    fine for bounded group counts (5 langs); the approx sketch is the
    scale path when groups are unbounded.
    """
    d = table(spark, sf_dir, "documents")
    out = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.25)).alias("_p25"),
        F.percentile("n_chars", F.lit(0.50)).alias("_p50"),
        F.percentile("n_chars", F.lit(0.75)).alias("_p75"),
        F.percentile("n_chars", F.lit(0.95)).alias("_p95"),
        F.max("n_chars").alias("max_chars"),
    )
    return out.select(
        "lang",
        fround(F.col("_p25"), 1).alias("p25"),
        fround(F.col("_p50"), 1).alias("p50"),
        fround(F.col("_p75"), 1).alias("p75"),
        fround(F.col("_p95"), 1).alias("p95"),
        "max_chars",
    )


@query(
    "text_repetition_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           floor(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 10000 + 0.5) / 10000
             AS distinct_ratio,
           floor(CAST(list_max(list_transform(list_distinct(toks),
                                d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
                 / len(toks) * 10000 + 0.5) / 10000 AS top_tok_ratio,
           (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
            AND CAST(list_max(list_transform(list_distinct(toks),
                              d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
                / len(toks) <= 0.2) AS keep
    FROM t
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: distinct-token ratio and
    top-single-token frequency ratio per document, with the standard keep
    rule (≥30% distinct tokens, no token >20% of the doc) — the cheap
    boilerplate/spam gate a corpus pass applies before any model-based
    scoring.

    Shape: explode → count per (doc, token) → per-doc max/sum — two
    codegen'd hash aggregations. The pure-expression HOF alternative
    (``textstats.top_token_count``) is shuffle-free but interpreted per
    element (measured ~40× slower on this corpus); aggregation wins at
    every scale where a shuffle is available.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    per_tok = (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    n = F.col("n_tokens")
    distinct_ratio = F.col("n_distinct").cast("double") / n
    top_ratio = F.col("top_c").cast("double") / n
    return stats.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        fround(distinct_ratio, 4).alias("distinct_ratio"),
        fround(top_ratio, 4).alias("top_tok_ratio"),
        ((distinct_ratio >= 0.3) & (top_ratio <= 0.2)).alias("keep"),
    )


@query(
    "heavy_hitter_tokens",
    oracle="""
    SELECT tok, n, doc_freq FROM (
      SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS doc_freq
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ) ORDER BY n DESC, tok LIMIT 20
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens by total frequency (+ document frequency) —
    the stopword/boilerplate detector that feeds posting-list pruning in
    the Jaccard joins.

    100 TB: explode → two-level agg; Spark plans partial counts before the
    shuffle so the exchange carries one row per (partition, token). The
    exact distinct doc_freq rides the same shuffle via count(DISTINCT) —
    Catalyst expands it to a two-phase aggregate; at unbounded vocab the
    approx_count_distinct twin avoids the expansion.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("doc_id").alias("doc_freq")
    )
    return counts.orderBy(F.col("n").desc(), "tok").limit(20)
