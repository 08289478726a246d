"""Training-data pipeline operators, round 3 batch 3: cohort retention,
last-touch attribution, deterministic train/valid/test splits, robust
(median/MAD) outlier statistics, a Z-order data-layout manifest, BPE
merge induction (the tokenizer-training kernel), C4-style boilerplate
removal by chunk document-frequency, padding-efficiency buckets, and
stateless per-epoch reshuffling.

These are the curation/analytics moves that sit AROUND a 100 TB corpus:
splitting it reproducibly, attributing downstream signal to upstream
exposure, deciding which rows are statistical outliers without a mean
that a single corrupt value can drag, and laying files out so a
two-column range predicate prunes most of them.

Reference analog: all generalize the exporter's enrich-then-aggregate
session loop (query.go:180-268) — retention/attribution are the same
"carry state forward along a user timeline" shape the correlator runs
per query_id; the split/layout ops have no single-node counterpart
because they only matter when the corpus outgrows one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fan_out, fround, query, table
from ..operators.sampling import hash_bucket


@query(
    "cohort_retention_events",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(datediff('day', f.cohort_week,
                           date_trunc('week', e.ts)::DATE) / 7 AS BIGINT)
               AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset,
           count(*) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of their
    first event; for each (cohort, week-offset) the count of users still
    active that many weeks later — the standard engagement triangle.

    Plan shape: the cohort week is a MIN window over ``user_id`` (one
    shuffle, partial min pushed below it), the activity weeks reuse the
    SAME user_id partitioning (Catalyst elides the second exchange), and
    the distinct+count is one more narrow shuffle over (cohort, offset,
    user) triples — three columns, no timestamps, no payloads.

    100 TB: the triangle has O(users × active-weeks) intermediate rows
    but the final output is O(weeks²) regardless of corpus size. The
    user_id shuffle is the only data-sized exchange; AQE handles the
    power-law "whale user" skew (same guard as salted_skew_aggregate).
    Dates cross the driver compare as strings (DuckDB DATE ≠ Spark date
    in pandas hashing — workloads/core.py discipline).
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    w = Window.partitionBy("user_id")
    act = (
        e.withColumn("cohort_week", F.min("wk").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy(
        F.col("cohort_week").cast("string").alias("cohort_week"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_active"))


@query(
    "attribution_last_touch",
    oracle="""
    WITH tl AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click','view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT coalesce(channel, 'direct') AS channel,
           count(*) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM tl WHERE event_type = 'purchase'
    GROUP BY coalesce(channel, 'direct')
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent prior click/view on the same user timeline (or 'direct' when
    nothing precedes it); output is purchases and exact-decimal revenue
    per acquisition channel.

    This is the reference's correlator shape verbatim — "carry the last
    relevant state forward along a per-key timeline, consume it at the
    closing event" (query.go:180-230) — expressed as ``last(...,
    ignorenulls=True)`` over a (ts, event_id)-deterministic frame that
    excludes the current row, so a purchase can never attribute to
    itself even if a click shares its timestamp.

    100 TB: one user_id shuffle; the window carries a single small
    string of state per row (no struct payloads), then the channel
    rollup is an O(channels) aggregate. Contrast with the as-of-join
    formulation (asof_join_click_before_purchase) which pays a range
    join; the window form is strictly cheaper when both sides are the
    same stream. Revenue stays in DECIMAL until the final cast
    (cross-engine float discipline, workloads/core.py).
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chan = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("channel", chan)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "split_train_valid_test",
    oracle="""
    WITH tagged AS (
      SELECT source, n_chars, lang,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS UBIGINT) % 100 < 96 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS UBIGINT) % 100 < 98 THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs
    FROM tagged GROUP BY split, source
    """,
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 96/2/2 train/valid/test split by content-addressed
    hash of the document id, with the per-(split, source) manifest a
    training run records for reproducibility.

    Why hash, not ``randomSplit``: the assignment is a pure function of
    doc_id — identical across runs, engines, partitionings, and corpus
    *growth* (a new document never flips an old one's split, which RNG
    splits cannot guarantee; same nesting property as
    sample_hash_bernoulli). Leakage-safe as long as doc_id is the dedup
    key — near-dup leakage across splits is what dedup_minhash_lsh
    upstream is for.

    100 TB: the split tag is a scan-stage expression (one md5 per row,
    JVM codegen); the manifest is one partial+final aggregate over
    O(splits × sources) groups. Writing the actual split datasets is
    ``df.write.partitionBy("split")`` on the same tagged plan — no
    second pass, no shuffle beyond the agg shown here.
    """
    d = table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id").cast("string"), 100)
    split = (
        F.when(b < 96, "train").when(b < 98, "valid").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@query(
    "stats_robust_mad",
    oracle="""
    WITH med AS (
      SELECT event_type,
             round(median(value), 6) AS median_value
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             round(median(abs(e.value - m.median_value)), 6) AS mad_value
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_type, count(*) AS n_events,
           m.median_value, d.mad_value,
           CAST(sum(CASE WHEN abs(e.value - m.median_value)
                              > 3 * d.mad_value THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type, m.median_value, d.mad_value
    """,
)
def stats_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier statistics: exact median, median absolute
    deviation, and the count of values beyond 3·MAD — the outlier gate a
    curation pipeline uses where mean/stddev would let one corrupt value
    move its own threshold.

    Two exact-percentile passes are inherent (MAD needs the median
    first); both are partial+final aggregates over O(event types)
    groups, and the per-group medians re-enter as a BROADCAST join (the
    stats side is group-cardinality, never data-cardinality). Medians
    are rounded to 6 digits BEFORE the comparison on both engines, so
    the >3·MAD boundary test runs on bit-identical doubles (fround
    discipline, workloads/core.py) — an unrounded interpolated median
    could differ by 1 ulp between engines and flip a boundary row.

    100 TB: exact percentile sorts within each group — fine at O(types)
    group count; for data-cardinality groups the GK-sketch variant
    (sketch_quantile_tokens) is the scale path. The 2-column projection
    is localCheckpoint'd ONCE (checkpoint-once doctrine, SCALE.md
    "Catalyst does NOT dedupe your DAG"): the three percentile/count
    consumers read the materialized (event_type, value) pairs instead
    of re-scanning the fact table 4×.
    """
    e = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .localCheckpoint(eager=False)
    )
    med = e.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 6).alias("median_value")
    )
    dev = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            fround(
                F.expr("percentile(abs(value - median_value), 0.5)"), 6
            ).alias("mad_value")
        )
    )
    stats = med.join(dev, "event_type")
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "median_value", "mad_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("median_value"))
                    > 3 * F.col("mad_value"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "event_type", "n_events", "median_value", "mad_value", "n_outliers"
        )
    )


def _zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """Unrolled Morton interleave for the DuckDB oracle: x gets the odd
    bit positions, y the even ones."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@query(
    "layout_zorder_manifest",
    oracle=f"""
    WITH coords AS (
      SELECT CAST(user_id % 256 AS BIGINT) AS x,
             CAST(least(floor(value * 10), 255) AS BIGINT) AS y
      FROM events
    ),
    z AS (
      SELECT x, y, {_zvalue_sql('x', 'y')} AS zval FROM coords
    )
    SELECT CAST(zval >> 12 AS BIGINT) AS tile,
           count(*) AS n_rows,
           min(zval) AS z_min, max(zval) AS z_max,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM z GROUP BY tile
    """,
)
def layout_zorder_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) layout manifest: interleave the bits of two
    query columns — here user bucket × value decile-bucket — and tile the
    data by the Z-value's top 4 bits. The manifest rows (per-tile counts
    and min/max of BOTH dimensions) are exactly the file-footer stats a
    lakehouse writer records; narrow x_min..x_max AND y_min..y_max per
    tile is what lets a two-column range predicate skip most files,
    which neither column's sort order could do alone.

    The key property the manifest demonstrates: a Z-prefix IS a spatial
    tile, so file assignment is ``zval >> k`` — a scan-stage expression,
    NOT a global sort. The production write is
    ``df.repartitionByRange(n, "zval").sortWithinPartitions("zval")``
    followed by a parquet write; the tile stats here come from the same
    single aggregation either way.

    100 TB: zero joins, one O(tiles)-group aggregate; bit math is
    whole-stage codegen. 16 bits of Z (8 per dimension) addresses 65536
    cells — deepen bits-per-dimension as file counts grow; the prefix
    property (tile = zval >> shift) holds at any depth.
    """
    e = table(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).cast("long")
    y = F.least(F.floor(F.col("value") * 10), F.lit(255)).cast("long")
    zval = None
    for i in range(8):
        for col, off in ((x, 1), (y, 0)):
            term = F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), 2 * i + off
            )
            zval = term if zval is None else zval + term
    return (
        e.select(x.alias("x"), y.alias("y"), zval.alias("zval"))
        .groupBy(F.shiftright("zval", 12).cast("long").alias("tile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


@query(
    "text_bpe_merge_candidates",
    oracle="""
    WITH w AS (
      SELECT t.word AS word, count(*) AS freq
      FROM documents, unnest(string_split(text, ' ')) AS t(word)
      WHERE len(t.word) >= 2
      GROUP BY t.word
    ),
    p AS (
      SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, word, freq
      FROM w, unnest(range(1, len(word))) AS u(i)
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS total,
           count(DISTINCT word) AS n_words
    FROM p GROUP BY pair
    ORDER BY total DESC, pair LIMIT 20
    """,
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training step: count adjacent character pairs across the
    corpus (weighted by word frequency) and return the top-20 merge
    candidates — the kernel a byte-pair-encoding tokenizer trainer runs
    per merge round. Complements text_token_bpe_regex (which APPLIES a
    trained tokenizer; this op is how one gets trained).

    Plan shape — DISTINCT-FIRST again (er_blocked_name_match's lesson):
    pair extraction runs over the VOCABULARY (distinct words + counts),
    not the corpus. The word aggregation is the only corpus-sized
    shuffle; the explode(sequence) fan-out and the pair agg are bounded
    by Σ|word| over distinct words — vocabulary-sized, which Heaps' law
    keeps sublinear in the corpus. Words shorter than 2 chars are
    filtered BEFORE the sequence (Spark's sequence(1, 0) is descending,
    not empty — it would emit phantom positions).

    100 TB: a real trainer iterates this op, re-pairing after each
    merge; each round is the same two bounded aggregations, and the
    vocabulary table is small enough to broadcast back into a re-encode
    pass. Top-20 plans as TakeOrderedAndProject (no global sort);
    (total DESC, pair) ties break deterministically because pair is the
    group key.
    """
    d = table(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = w.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    ).select(
        F.expr("substring(word, i, 2)").alias("pair"), "word", "freq"
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("total"),
            F.countDistinct("word").alias("n_words"),
        )
        .orderBy(F.col("total").desc(), "pair")
        .limit(20)
    )


@query(
    "text_boilerplate_chunk_df",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk
      FROM documents WHERE len(string_split(text, ' ')) >= 8
    ),
    ch AS (
      SELECT doc_id, source,
             array_to_string(tk[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM t, unnest(range(0, CAST(floor(len(tk) / 8) AS BIGINT))) AS u(i)
    ),
    df AS (
      SELECT doc_id, source, chunk,
             count(DISTINCT doc_id) OVER (PARTITION BY chunk) AS df
      FROM ch
    )
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           count(DISTINCT CASE WHEN df >= 3 THEN chunk END)
             AS n_boilerplate_distinct
    FROM df GROUP BY source
    """,
)
def text_boilerplate_chunk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal by document frequency: an 8-token
    chunk that appears in ≥ 3 DISTINCT documents is boilerplate (nav
    menus, license headers, cookie banners) and is struck from EVERY
    document — unlike dedup_chunk_paragraph's first-doc-wins, which
    keeps one copy. Output is the per-source removal manifest a curation
    run logs: how much of each source is shared scaffolding.

    Plan shape: one explode, then chunk df via a two-level aggregate
    (distinct (chunk, doc) partial-aggregates map-side, then an
    O(distinct chunks) count — never a per-row doc-set buffer: a
    collect_set window would pin an O(df) array onto every instance of
    a heavy-hitter chunk, the exact rows this op targets). The df ≥ 3
    survivors — bounded by the corpus's SHARED scaffolding vocabulary,
    not its size — broadcast back onto the chunk stream as the
    is-boilerplate tag, then an O(sources) rollup.

    100 TB: two content-addressed chunk shuffles (df agg + nothing else;
    the tag join is broadcast). At the next scale notch, swap the chunk
    string for xxhash64(chunk) in the shuffle key
    (dedup_substring_spans' trick; 8 bytes instead of ~50) and rejoin
    strings only for the distinct-chunk report.
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", "source", toks.alias("tk")).filter(F.size("tk") >= 8)
    n_chunks = F.floor(F.size("tk") / 8).cast("int")
    ch = d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        "tk",
    ).select(
        "doc_id",
        "source",
        F.array_join(F.slice("tk", F.col("i") * 8 + 1, F.lit(8)), " ").alias(
            "chunk"
        ),
    )
    boiler = (
        ch.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 3)
        .select("chunk", F.lit(True).alias("is_boiler"))
    )
    tagged = ch.join(F.broadcast(boiler), "chunk", "left").select(
        "doc_id",
        "source",
        "chunk",
        F.coalesce("is_boiler", F.lit(False)).alias("is_boiler"),
    )
    return tagged.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_boilerplate"),
        F.countDistinct(F.when(F.col("is_boiler"), F.col("chunk"))).alias(
            "n_boilerplate_distinct"
        ),
    )


@query(
    "pack_padding_efficiency",
    oracle="""
    WITH toks AS (
      SELECT len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    b AS (
      SELECT CAST(ceil(n_tok / 64.0) * 64 AS BIGINT) AS padded_len, n_tok
      FROM toks
    )
    SELECT padded_len,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(padded_len * count(*) AS BIGINT) AS padded_tokens,
           floor((1.0 - CAST(sum(n_tok) AS DOUBLE) / (padded_len * count(*)))
                 * 10000 + 0.5) / 10000 AS waste_ratio
    FROM b GROUP BY padded_len
    """,
)
def pack_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents grouped by their padded
    length (next multiple of 64 tokens), with real vs padded token counts
    and the padding waste ratio per bucket — the number a training run
    checks before choosing between bucketing (this op) and concatenation
    packing (pack_sequences_blocks). Batching same-bucket sequences is
    what makes padding waste the per-bucket constant shown here instead
    of max-length waste.

    100 TB: token count and bucket are scan-stage expressions; one
    O(buckets) aggregate — buckets are bounded by max_len/64 regardless
    of corpus size. The waste ratio uses the floor-based fround
    discipline so both engines emit identical doubles.
    """
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    padded = (F.ceil(n_tok / 64.0) * 64).cast("long")
    return (
        d.select(n_tok.alias("n_tok"), padded.alias("padded_len"))
        .groupBy("padded_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("real_tokens"),
            (F.col("padded_len") * F.count(F.lit(1))).alias("padded_tokens"),
        )
        .select(
            "padded_len",
            "n_docs",
            "real_tokens",
            "padded_tokens",
            fround(
                1.0 - F.col("real_tokens").cast("double") / F.col("padded_tokens"), 4
            ).alias("waste_ratio"),
        )
    )


@query(
    "sample_epoch_shuffle",
    oracle="""
    WITH shuffled AS (
      SELECT e.epoch, d.doc_id,
             row_number() OVER (
               PARTITION BY e.epoch
               ORDER BY md5(e.epoch || ':' || d.doc_id), d.doc_id
             ) AS pos
      FROM documents d, unnest([0, 1, 2]) AS e(epoch)
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, CAST(pos AS BIGINT) AS pos, doc_id
    FROM shuffled WHERE pos <= 5
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch reshuffle: epoch e's data order is the
    sort by md5(e || ':' || doc_id) — a different, uncorrelated
    permutation every epoch with ZERO stored state (no shuffle files, no
    RNG seeds to persist; any worker can recompute any epoch's order).
    Emits the first 5 positions per epoch as the verifiable manifest.

    100 TB: the permutation key is a scan-stage expression; realizing
    epoch order is repartitionByRange + sortWithinPartitions on the key
    — the same layout move as layout_zorder_manifest, never a global
    single-node sort. The head-of-epoch manifest here plans as
    WindowGroupLimit (map-side top-5 per epoch below the exchange).
    The nested-sample property of md5 keys holds per epoch: a 10%
    step-down of the corpus keeps relative order.
    """
    d = table(spark, sf_dir, "documents").select("doc_id")
    e = d.withColumn("epoch", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
    key = F.md5(F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("epoch").orderBy(key, "doc_id")
    return (
        e.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 5)
        .select(F.col("epoch").cast("long"), F.col("pos").cast("long"), "doc_id")
    )


@query(
    "quality_ccnet_buckets",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) * 1000000 + 0.5) / 1000000
               AS qscore
      FROM documents
    ),
    cuts AS (
      SELECT lang,
             floor(quantile_cont(qscore, 1.0/3) * 1000000 + 0.5) / 1000000
               AS p33,
             floor(quantile_cont(qscore, 2.0/3) * 1000000 + 0.5) / 1000000
               AS p66
      FROM scored GROUP BY lang
    )
    SELECT s.lang,
           CASE WHEN s.qscore > c.p66 THEN 'head'
                WHEN s.qscore > c.p33 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           floor(avg(s.qscore) * 10000 + 0.5) / 10000 AS mean_qscore
    FROM scored s JOIN cuts c USING (lang)
    GROUP BY s.lang, bucket
    """,
)
def quality_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style adaptive quality bucketing: score every document by
    lexical diversity (distinct-token ratio — the deterministic stand-in
    for the LM perplexity CCNet uses), then split EACH LANGUAGE at its
    own tercile cuts into head / middle / tail. Adaptive per-group
    thresholds are the point: a fixed global cutoff misclassifies any
    language whose score distribution sits lower, which is exactly the
    bias CCNet's per-language buckets remove.

    Cross-engine discipline: scores AND cut points are fround-rounded
    BEFORE the bucket comparison, so both engines compare identical
    doubles (the stats_robust_mad rule); exact interpolated terciles via
    percentile == quantile_cont.

    100 TB: one scan computes scores (scan-stage expressions); cuts are
    an O(langs) aggregate broadcast back; the bucket rollup is
    O(langs × 3). For data-cardinality groups swap percentile for the
    mergeable GK sketch (sketch_quantile_tokens) — same plan shape.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "lang",
        fround(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("qscore"),
    )
    cuts = scored.groupBy("lang").agg(
        fround(F.expr("percentile(qscore, 1.0D/3)"), 6).alias("p33"),
        fround(F.expr("percentile(qscore, 2.0D/3)"), 6).alias("p66"),
    )
    bucket = (
        F.when(F.col("qscore") > F.col("p66"), "head")
        .when(F.col("qscore") > F.col("p33"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            fround(F.avg("qscore"), 4).alias("mean_qscore"),
        )
    )


@query(
    "quantile_disc_doclen",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p25,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p50,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT)
                         THEN n_chars END) AS BIGINT) AS p75
    FROM ranked GROUP BY lang
    """,
)
def quantile_disc_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE quantiles by rank arithmetic: the p-th quantile is the
    value at row ceil(p·n) of the (value, doc_id)-ordered group — an
    actual corpus value, never an interpolation. This is the float-free
    quantile path: where interpolating percentiles need the
    rounded-before-compare discipline (stats_robust_mad,
    quality_ccnet_buckets), rank selection is integer-exact end to end
    and therefore the safest cross-engine (and cross-RUN, under
    nondeterministic reduction order) form for thresholds that must be
    reproducible bit-for-bit — e.g. published dataset cards.

    Plan shape: one lang-partitioned window (rank + group count ride the
    same sort), one conditional-aggregate rollup to O(langs) rows.
    100 TB: for data-cardinality groups the same selection runs as
    repartitionByRange + per-partition offset lookup (the total-order
    recipe, test_global_sort_via_range_partitioning), or degrades
    gracefully to the GK sketch (sketch_quantile_tokens).
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def pick(p: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * p).cast("long"), F.col("n_chars")
            )
        ).cast("long")

    return ranked.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        pick(0.25).alias("p25"),
        pick(0.50).alias("p50"),
        pick(0.75).alias("p75"),
    )
