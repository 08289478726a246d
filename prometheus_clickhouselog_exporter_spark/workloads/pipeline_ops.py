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

from ..operators.dedup import shingle_hashes, connected_components, minhash_lsh_dedup, word_shingles
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
           CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 10000 AS BIGINT) AS bucket
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
    "sample_coordinated_users",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000 < 1500
    GROUP BY user_id
    """,
)
def sample_coordinated_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinated sampling: hash the JOIN KEY (user_id), not the row —
    a kept user keeps ALL their events, so downstream per-user features
    (counts, funnels, session chains) stay complete on the sample. The
    same bucket rule applied to any other table keyed by user_id yields a
    referentially consistent cross-table sample — the property row-level
    samplers cannot give. 15% of users kept here.

    100 TB: scan-stage predicate on each table independently; no
    coordination state, no join needed to align samples.
    """
    e = table(spark, sf_dir, "events")
    kept = deterministic_sample(e, F.col("user_id").cast("string"), 0.15)
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
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
    "dedup_jaccard_pruned",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 2 + 1),
                                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks
    ),
    post AS (SELECT doc_id, unnest(s) AS g FROM sh),
    keep AS (SELECT g FROM post GROUP BY g HAVING count(*) <= 4),
    post2 AS (SELECT doc_id, g FROM post WHERE g IN (SELECT g FROM keep)),
    sizes AS (SELECT doc_id, count(*) AS n FROM post2 GROUP BY doc_id),
    common AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS c
      FROM post2 l JOIN post2 r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, c / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON common.id_a = sa.doc_id
    JOIN sizes sb ON common.id_b = sb.doc_id
    WHERE c / (sa.n + sb.n - c) >= 0.5
    """,
)
def dedup_jaccard_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle-pruned Jaccard: shingles whose document frequency
    exceeds a limit are dropped BEFORE the posting-list self-join — the
    classic frequency-pruning refinement that bounds the worst posting
    list, here with limit 4 (this corpus's df tops out at 7; at web scale
    the limit is the df where a posting list stops fitting a task).
    Jaccard is then computed over the pruned shingle sets on both sides —
    deterministic, so the oracle reproduces it exactly.

    100 TB: the df pass is one count-agg; the pruning itself is a
    broadcast-able semi-join (keep-set ≪ vocabulary); the pair join's
    worst bucket is bounded by the limit, making the join's skew profile
    a CHOICE instead of a data property.
    """
    d = fan_out(table(spark, sf_dir, "documents")).filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    # hashed shingles (operators/dedup.shingle_hashes): set sizes,
    # document frequencies, and intersection counts are identical
    # modulo 64-bit collisions (repo-standard equivalence) and the
    # output carries only counts/ratios — the string shingle build
    # alone cost ~3 s of this query's sf0.1 wall (r13, the
    # dedup_containment_shingles measurement)
    sh = shingle_hashes(d, "text", "doc_id", 3).select(
        F.col("_sid").alias("_id"), F.col("_shingle_hashes").alias("_sh")
    )
    # posting feeds the df pass AND the prune; pruned feeds sizes and both
    # self-join sides — checkpoint each so the corpus shingles once
    # (plan audit: documents was scanned 8x through recomputed postings).
    posting = sh.select("_id", F.explode("_sh").alias("g")).localCheckpoint(eager=False)
    keep = posting.groupBy("g").agg(F.count(F.lit(1)).alias("_df")).filter(F.col("_df") <= 4)
    pruned = posting.join(F.broadcast(keep.select("g")), "g", "left_semi").localCheckpoint(
        eager=False
    )
    sizes = pruned.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    l, r = pruned.alias("l"), pruned.alias("r")
    common = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c") / (F.col("sa._n") + F.col("sb._n") - F.col("c"))
    return (
        common.join(sa, common.id_a == F.col("sa._id"))
        .join(sb, common.id_b == F.col("sb._id"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
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
