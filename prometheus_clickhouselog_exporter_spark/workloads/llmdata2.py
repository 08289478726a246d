"""LLM-data pipeline operators II (SURVEY §2.3 extensions): PII scrubbing,
chunk-level (paragraph) dedup, HLL sketch cardinality, time-series
gap-fill + forward-fill, and funnel analysis.

The reference has none of this surface (it is a log→metrics exporter,
SURVEY §0); these are the corpus-curation and product-analytics operators
a 100 TB training-data pipeline runs daily, each expressed as pure
Catalyst-planned expressions (no Python UDFs anywhere in this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import fan_out, fround, query, rank_contract_certificate, table

# Deterministic PII synthesis: the driver's documents are word-soup with no
# real PII, so the workload plants it — an email on every doc_id % 3 != 0,
# a phone on every even doc_id — making detection counts verifiable and
# nonzero. Both engines build the identical enriched string.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "pii_detect_scrub",
    oracle="""
    WITH enriched AS (
      SELECT doc_id, lang,
             text
             || CASE WHEN doc_id % 3 <> 0
                     THEN ' contact user' || doc_id || '@mail-' || lang || '.example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                     THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(t, '\\+1-555-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\\+1-555-[0-9]{4}', '[PHONE]', 'g')) AS scrub_hash
    FROM enriched
    """,
)
def pii_detect_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count emails/phones per document and
    emit the hash of the scrubbed text (hash, not the text, keeps the
    compared payload small while still proving byte-identical redaction).

    Patterns avoid backreferences/lookaround so Java regex (Spark) and
    RE2 (DuckDB) agree; Spark's regexp_replace is replace-all by default,
    DuckDB needs the 'g' flag — the oracle carries it.

    100 TB: scan-stage map, no shuffle, whole-stage codegen; the regexes
    run once per doc. This is the shape every real scrub pass has —
    detection counts feed the audit table, the redacted column feeds the
    next pipeline stage.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    email_part = F.when(
        F.col("doc_id") % 3 != 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail-"),
            F.col("lang"),
            F.lit(".example.com"),
        ),
    ).otherwise("")
    phone_part = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    t = F.concat(F.col("text"), email_part, phone_part)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrub_hash"),
    )


@query(
    "dedup_chunk_paragraph",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE len(string_split(text, ' ')) >= 8
    ),
    ch AS (
      SELECT doc_id, array_to_string(tk[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM t, unnest(range(0, CAST(floor(len(tk) / 8) AS BIGINT))) AS u(i)
    ),
    win AS (
      SELECT doc_id, chunk, min(doc_id) OVER (PARTITION BY chunk) AS owner
      FROM ch
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           floor(CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS keep_ratio
    FROM win GROUP BY doc_id
    """,
)
def dedup_chunk_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level (paragraph) dedup, C4-style: split each document into
    aligned 8-token chunks, dedup chunks CORPUS-WIDE with first-doc-wins
    (min doc_id owns the chunk), report per-doc retention. This is the
    sub-document twin of ``dedup_exact_documents`` — boilerplate shared
    across near-dup docs is removed even when no whole document matches.

    Chunking is explode(sequence) + slice — per-row codegen'd expressions,
    not an array HOF lambda (those run interpreted, see SCALE.md).

    100 TB: one explode (rows × ~len/8), one shuffle on the chunk string
    for the min-owner window (an agg-join in disguise; Spark plans the
    window over the hash partitioning), one shuffle back on doc_id. The
    chunk shuffle key is content-addressed so it load-balances; the
    heavy-hitter chunk (empty/boilerplate) is exactly what the op
    removes.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", toks.alias("tk")).filter(F.size("tk") >= 8)
    n_chunks = F.floor(F.size("tk") / 8).cast("int")
    ch = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        "tk",
    ).select(
        "doc_id",
        F.array_join(F.slice("tk", F.col("i") * 8 + 1, F.lit(8)), " ").alias("chunk"),
    )
    owner = F.min("doc_id").over(Window.partitionBy("chunk"))
    win = ch.select("doc_id", "chunk", owner.alias("owner"))
    kept = F.sum(F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0))
    out = win.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"), kept.alias("n_kept")
    )
    return out.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        fround(F.col("n_kept").cast("double") / F.col("n_chunks"), 4).alias("keep_ratio"),
    )


def _hll_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch cardinality (Apache DataSketches via Spark 3.5+
    ``hll_sketch_agg``): per-event-type approximate distinct users next to
    the exact count, plus a ``__merged__`` row whose estimate comes from
    ``hll_union_agg`` over the per-type sketches.

    The merged row is the point: sketches built independently (per
    partition, per day, per type) union WITHOUT rescanning — the property
    that makes distinct-count dashboards O(sketch bytes) instead of
    O(data) at 100 TB. The registry entry (sketch_hll_distinct_users)
    value-hashes this report's deterministic projection: exact counts +
    the ≤5% error bound as literal booleans;
    tests/test_llmdata2.py asserts the numeric tolerances directly.

    Scan shape: ONE events scan folds to distinct (type, user) pairs —
    HLL registers are max-of-hashes, so sketching the distinct pairs is
    state-identical to sketching the raw stream — and the checkpointed
    pair set (exactly count_distinct's own intermediate) feeds the
    per-type sketches, the union row, AND the global exact count
    (checkpoint-once doctrine, SCALE.md; previously events×3).
    """
    e = table(spark, sf_dir, "events")
    pairs = (
        e.select("event_type", "user_id").distinct().localCheckpoint(eager=False)
    )
    per_type = pairs.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("exact_users"),
    ).localCheckpoint(eager=False)
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum(F.lit(0)).alias("_z"),
    ).select(
        F.lit("__merged__").alias("event_type"),
        "approx_users",
        F.lit(None).cast("long").alias("exact_users"),
    )
    global_exact = pairs.agg(
        F.lit("__all_exact__").alias("event_type"),
        F.count_distinct("user_id").cast("long").alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return typed.unionByName(merged).unionByName(global_exact)


@query(
    "sketch_hll_distinct_users",
    oracle="""
    WITH per AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events GROUP BY 1
      UNION ALL
      SELECT '__merged__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    )
    SELECT event_type, exact_users, true AS within_tol
    FROM per ORDER BY event_type
    """,
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-hashed certificate over the HLL report (_hll_report): per
    event type, the EXACT distinct-user count (itself hash-checked
    against SQL) plus the literal boolean that the sketch estimate lands
    within 5% of it; the ``__merged__`` row certifies that the UNION of
    per-type sketches estimates the global cardinality within the same
    tolerance (measured ≤1.2% at 3 SFs, lgK default). Formerly
    rows-only (DuckDB's HLL is a different implementation — but the
    BOUND is deterministic for a fixed implementation and dataset, so it
    hashes; the agg_approx_distinct / Misra-Gries pattern)."""
    rep = _hll_report(spark, sf_dir)
    typed = rep.filter(~F.col("event_type").startswith("__")).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), 0.05 * F.col("exact_users"))
        ).alias("within_tol"),
    )
    wide = (
        rep.groupBy()
        .pivot("event_type", ["__merged__", "__all_exact__"])
        .agg(F.first("approx_users"))
    )
    merged = wide.select(
        F.lit("__merged__").alias("event_type"),
        F.col("__all_exact__").cast("bigint").alias("exact_users"),
        (
            F.abs(F.col("__merged__") - F.col("__all_exact__"))
            <= F.greatest(F.lit(1.0), 0.05 * F.col("__all_exact__"))
        ).alias("within_tol"),
    )
    return typed.unionByName(merged).orderBy("event_type")


def _gk_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_tok) projection duplicated onto a '__all__' pseudo-lang by
    an in-row explode — ONE documents scan covers both the per-language
    and the overall aggregations — and checkpointed so the report and the
    rank-certificate reuse it (checkpoint-once doctrine)."""
    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    return d.select(
        F.explode(F.array(F.col("lang"), F.lit("__all__"))).alias("lang"),
        ntok.alias("n_tok"),
    ).localCheckpoint(eager=False)


def _gk_report(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """Approximate quantiles of document token counts via
    ``percentile_approx`` (Greenwald–Khanna summaries): p25/p50/p75/p95
    per language plus a ``__all__`` row — the length-distribution audit a
    curation pipeline runs before choosing packing/truncation lengths.

    The sketch property is in the PLAN, not the API surface: GK summaries
    build per partition and merge in the final aggregate (partial →
    merge, like any agg), so the shuffle carries O(accuracy) summary
    entries per group, never the values. That is the difference between
    auditing 100 TB's length distribution and sorting it. The registry
    entry (sketch_quantile_tokens) value-hashes the GK rank contract per
    cell; tests/test_llmdata2.py bounds the rank error against the exact
    interpolating percentile and pins determinism across partitionings.
    """
    if base is None:
        base = _gk_base(spark, sf_dir)
    ps = [0.25, 0.5, 0.75, 0.95]
    grid = base.groupBy("lang").agg(
        F.percentile_approx("n_tok", ps, 10000).alias("qs"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    cols = [
        F.element_at("qs", i + 1).alias(f"p{int(p * 100)}") for i, p in enumerate(ps)
    ]
    return grid.select("lang", *cols, "n_docs")


@query(
    "sketch_quantile_tokens",
    oracle="""
    WITH langs AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
      UNION ALL
      SELECT '__all__', CAST(count(*) AS BIGINT) FROM documents
    ),
    ps AS (SELECT unnest(['p25', 'p50', 'p75', 'p95']) AS pct)
    SELECT l.lang, p.pct, l.n_docs, true AS within_rank_eps
    FROM langs l CROSS JOIN ps p
    ORDER BY lang, pct
    """,
)
def sketch_quantile_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-hashed certificate over the GK quantile report (_gk_report):
    for every (language, percentile) cell — '__all__' included — the
    literal boolean that the reported value's TRUE rank interval
    [count(<v)+1, count(<=v)] intersects the GK-guaranteed target window
    (φ·n ± n/accuracy, ±1 for the discrete boundary). This is exactly
    the Greenwald–Khanna ε-rank contract, certified per cell; n_docs is
    additionally hash-checked as the exact group count. Formerly
    rows-only (GK is rank-approximate by contract — but the CONTRACT is
    deterministic, so it hashes; the Misra-Gries pattern).

    Plan: the report's tiny grid (|langs|·4 rows) joins the (lang,
    n_tok) projection once — the exploded lang ∪ '__all__' duplication
    keeps it one documents scan — and folds to rank counts per cell; at
    100 TB this is a broadcast of the grid against a 2-column scan."""
    base = _gk_base(spark, sf_dir)
    rep = _gk_report(spark, sf_dir, base)
    long = rep.select(
        "lang",
        "n_docs",
        F.expr(
            "stack(4, 'p25', p25, 'p50', p50, 'p75', p75, 'p95', p95)"
            " AS (pct, v)"
        ),
    )
    return rank_contract_certificate(
        long, base, "lang", "n_docs", "n_tok", rank_eps=1.0 / 10000
    )


@query(
    "timeseries_gapfill_daily",
    oracle="""
    WITH b AS (SELECT CAST(min(ts) AS DATE) lo, CAST(max(ts) AS DATE) hi FROM events),
    days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
             floor(sum(value) * 100 + 0.5) / 100 AS total
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    grid AS (SELECT u.user_id, d.day FROM users u CROSS JOIN days d)
    SELECT g.user_id, CAST(g.day AS VARCHAR) AS day,
           CAST(coalesce(n, 0) AS BIGINT) AS n_purchases,
           coalesce(total, 0.0) AS total_value,
           last_value(total IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_total
    FROM grid g LEFT JOIN daily d2 ON g.user_id = d2.user_id AND g.day = d2.day
    """,
)
def timeseries_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily purchase totals on a
    COMPLETE calendar grid — missing days materialized (zero-filled
    counts) and forward-filled (last observed total carries over gaps),
    the standard prep before any sequence model / trend computation.

    Grid = distinct users × sequence(min_day, max_day) — the calendar is
    generated, never scanned. Forward fill is ``last(ignorenulls)`` over
    the per-user date order.

    100 TB: the calendar array is a few KB broadcast; the grid explode is
    |users|×|days| rows but only key columns wide; the left join and the
    ffill window share the user_id partitioning (one shuffle). Per-user
    window state is |days| rows — bounded, no skew (every user has the
    same calendar). Scan shape: ONE events scan folds to a checkpointed
    (user, day) pre-aggregate with conditional purchase stats; calendar
    bounds, the distinct-user list, and the daily join side all derive
    from it (checkpoint-once doctrine, SCALE.md; previously events×3) —
    a day with only non-purchase events joins with n=0/total=NULL,
    value-identical to the purchase-only daily table's unmatched row.
    """
    e = table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    pre = (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(is_p, 1).otherwise(0)).alias("n"),
            fround(F.sum(F.when(is_p, F.col("value"))), 2).alias("total"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = pre.agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
    days = bounds.select(
        F.explode(F.sequence("_lo", "_hi", F.expr("interval 1 day"))).alias("day")
    )
    users = pre.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days))
    daily = pre.withColumn("n", F.nullif("n", F.lit(0)))
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_purchases"),
        F.coalesce("total", F.lit(0.0)).alias("total_value"),
        F.last("total", ignorenulls=True).over(w).alias("ffill_total"),
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS v_ts
      FROM events
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
                  OVER (PARTITION BY user_id) AS c_ts
      FROM s1
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
                  OVER (PARTITION BY user_id) AS p_ts
      FROM s2
    ),
    u AS (SELECT user_id, min(v_ts) v_ts, min(c_ts) c_ts, min(p_ts) p_ts
          FROM s3 GROUP BY 1)
    SELECT count(*) AS n_users,
           count(v_ts) AS n_viewed,
           count(c_ts) AS n_clicked,
           count(p_ts) AS n_purchased,
           floor(CAST(sum(CASE WHEN p_ts IS NOT NULL
                               THEN epoch_us(p_ts) - epoch_us(v_ts) END) AS DOUBLE)
                 / count(p_ts) / 3600000000.0 * 1000 + 0.5) / 1000
             AS avg_hours_to_convert
    FROM u
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click-after-view → purchase-after-click per
    user, with stage counts and mean view→purchase latency for
    completers. Each stage anchor is a conditional-min WINDOW over the
    previous anchor — strictly ordered progression, not mere co-presence
    of the three event types.

    The three window passes share one user_id partitioning, so Catalyst
    plans a single shuffle with three Window operators stacked on it.
    Latency sums in exact integer microseconds; only the final mean
    divides (then floor-rounds) — cross-engine deterministic.

    100 TB: one shuffle on user_id; per-user state is that user's events
    (bounded by per-user activity, salting if a bot user dominates);
    final agg is a scalar.
    """
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "v_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "c_ts",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")), F.col("ts")
            )
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.min("v_ts").alias("v_ts"), F.min("c_ts").alias("c_ts"), F.min("p_ts").alias("p_ts")
    )
    lat_us = F.sum(
        F.when(
            F.col("p_ts").isNotNull(),
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("v_ts").cast("timestamp")),
        )
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v_ts").alias("n_viewed"),
        F.count("c_ts").alias("n_clicked"),
        F.count("p_ts").alias("n_purchased"),
        fround(
            lat_us.cast("double") / F.count("p_ts") / F.lit(3_600_000_000.0), 3
        ).alias("avg_hours_to_convert"),
    )


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, pos,
           floor(avg(v) * 1000000 + 0.5) / 1000000 AS centroid_val,
           count(*) AS n_vecs
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the 64-dim embedding column — the training
    step of an IVF index (cluster representatives) and the building block
    of embedding-space dedup/diversity audits.

    Element-wise mean via posexplode + (label, pos) hash aggregate — the
    vector never leaves the JVM and the agg is codegen'd; the HOF
    alternative (``aggregate`` over a zipped struct array) runs
    interpreted per element (SCALE.md). float32 inputs widen to double
    exactly, so cross-engine agreement is pure reduction-order — absorbed
    by fround(6).

    100 TB: the explode is 64× rows but 3 narrow columns; the shuffle
    carries one partial (sum, count) per (label, pos, partition) — map-
    side combine makes wire bytes O(labels × dim × partitions), not
    O(rows). This is the canonical "train k-means on a sample, assign
    full corpus" first half.
    """
    e = table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos0", "v"))
    return (
        ex.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            fround(F.avg("v"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@query(
    "curation_pipeline_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, n_chars, string_split(lower(text), ' ') AS tk,
             min(doc_id) OVER (PARTITION BY text) AS first_doc
      FROM documents
    ),
    stats AS (
      SELECT doc_id, lang, n_chars, first_doc,
             CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS distinct_ratio,
             CAST(list_max(list_transform(list_distinct(tk),
                    d -> len(list_filter(tk, x -> x = d)))) AS DOUBLE)
               / len(tk) AS top_ratio
      FROM toks
    ),
    verdicts AS (
      SELECT lang, n_chars,
             CASE WHEN first_doc <> doc_id THEN 'exact_dup'
                  WHEN n_chars < 120 THEN 'too_short'
                  WHEN NOT (distinct_ratio >= 0.3 AND top_ratio <= 0.2)
                    THEN 'repetitive'
                  ELSE 'keep' END AS verdict
      FROM stats
    )
    SELECT lang, verdict, count(*) AS n_docs,
           floor(avg(n_chars) * 100 + 0.5) / 100 AS avg_chars
    FROM verdicts GROUP BY lang, verdict
    """,
)
def curation_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel with attrition accounting: exact-dup
    removal (first-doc-wins), minimum-length gate, Gopher repetition gate,
    in precedence order; the report is kept/rejected doc counts per
    (lang, verdict) — the table a data-quality review actually reads.

    Composes three already-certified operators in ONE plan: the dup check
    is a min-over-text window, the repetition ratios are the explode+agg
    from ``text_repetition_filter`` joined back on doc_id, the verdict is
    a single CASE. Catalyst fuses the gates into the join's output
    projection.

    100 TB: two shuffles (text-hash window; doc_id join — the explode agg
    reuses the doc_id partitioning for its second agg). Verdict
    precedence means cheap gates short-circuit expensive ones in the
    CASE; at scale you'd ALSO filter before the repetition agg, but the
    report needs every doc's verdict, so all gates run over all docs.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    first_doc = F.min("doc_id").over(Window.partitionBy("text"))
    base = d.select("doc_id", "lang", "n_chars", "text", first_doc.alias("first_doc"))
    per_tok = (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ratios = per_tok.groupBy("doc_id").agg(
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("distinct_ratio"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_ratio"),
    )
    j = base.join(ratios, "doc_id")
    verdict = (
        F.when(F.col("first_doc") != F.col("doc_id"), "exact_dup")
        .when(F.col("n_chars") < 120, "too_short")
        .when(
            ~((F.col("distinct_ratio") >= 0.3) & (F.col("top_ratio") <= 0.2)),
            "repetitive",
        )
        .otherwise("keep")
    )
    return (
        j.select("lang", "n_chars", verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            fround(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


@query(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[i] AS a, tk[i+1] AS b
      FROM toks, unnest(range(1, len(tk))) AS u(i)
      WHERE len(tk) >= 2
    ),
    model AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
    prefix AS (SELECT a, sum(cab) AS ca FROM model GROUP BY 1)
    SELECT doc_id, count(*) AS n_bigrams,
           floor(avg(CAST(cab AS DOUBLE) / ca) * 10000 + 0.5) / 10000
             AS avg_bigram_prob
    FROM bg JOIN model USING (a, b) JOIN prefix USING (a)
    GROUP BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring with a corpus-trained bigram LM: train
    (bigram + prefix counts over the whole corpus) and score (per-doc mean
    transition probability) in ONE plan — the train/score join pattern
    every statistical quality filter (KenLM-style) uses, minus the log
    space (plain probabilities keep the oracle's arithmetic exact-int
    ratios instead of cross-engine `ln`).

    Low-probability docs are "surprising" under the corpus model —
    gibberish or off-distribution — and get filtered or downweighted.

    100 TB: bigram extraction is explode (rows × len), run ONCE — the
    extracted bigram stream is localCheckpoint'd and feeds model
    training AND scoring, and the distinct-bigram model is checkpointed
    for its two consumers (counts + prefix sums), so the documents
    table is scanned once instead of 3× (checkpoint-once doctrine,
    SCALE.md). The bg checkpoint is token-expansion-sized (~2× the
    text volume) — on a storage-tight cluster trade it back for a
    second scan. The prefix table is vocabulary-sized — broadcast it
    while it fits, else it joins on the same `a` hash. In production
    the model trains on a deterministic sample
    (``sample_hash_bernoulli``) and broadcasts to score the full
    corpus — composition this registry already certifies piecewise.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    tk = F.split(F.lower(F.col("text")), " ")
    docs = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 2)
    bg = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i"), "tk"
    ).select(
        "doc_id",
        F.element_at("tk", F.col("i")).alias("a"),
        F.element_at("tk", F.col("i") + 1).alias("b"),
    ).localCheckpoint(eager=False)
    model = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab")).localCheckpoint(
        eager=False
    )
    prefix = model.groupBy("a").agg(F.sum("cab").alias("ca"))
    scored = bg.join(model, ["a", "b"]).join(F.broadcast(prefix), ["a"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        fround(F.avg(F.col("cab").cast("double") / F.col("ca")), 4).alias(
            "avg_bigram_prob"
        ),
    )
