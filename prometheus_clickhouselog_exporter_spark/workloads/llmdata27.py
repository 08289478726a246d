"""Round 8 batch 12: the M4 downsampler as a REAL stream (28th
streaming fidelity query) and a snapshot-vs-snapshot column-profile
drift screen.

Streaming M4 is what a live dashboard actually runs: every chart tile
is a per-bucket min/max/first/last fold over an unbounded stream, and
because all four are commutative (first/last made order-free here by
anchoring on the packed event-time key, not arrival order) the final
streamed state must equal the batch M4 exactly — the certificate.

Reference parity note: /root/reference exposes Prometheus gauges, not
charts or profiles (metrics.go:8-75); §2.3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import fround, query, table
from .relational42 import _LTTB_BUCKETS, _M4_SQL

_PSI_CUT = "2024-01-16 00:00:00"  # the repo-wide ref/cur boundary


@query("streaming_m4_fidelity", oracle=_M4_SQL)
def streaming_m4_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 maintained BY A REAL STREAM: points are bucketed batch-side
    (the x-range is a property of the chart viewport, fixed up front),
    re-fed as a multi-file stream, and min/max/min_by/max_by accumulate
    through Spark's stateful streaming aggregation in update mode. The
    final per-bucket rows must hash-match the batch M4 — every one of
    the four reducers is a commutative monoid (first/last anchor on
    the packed event-TIME key, so arrival order is irrelevant), which
    is precisely why M4 dashboards can render from a live stream.

    100 TB/streaming: state is 30 buckets × 4 reducers regardless of
    stream volume — the live-chart sibling of streaming_cms_fidelity's
    counter grid."""
    from .llmdata11 import _fidelity_tmp, _materialize, _run_stream_to_memory

    tmp = _fidelity_tmp("m4-fidelity-")
    pts = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
            .cast("bigint")
            .alias("x"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = pts.agg(F.min("x").alias("x0"), F.max("x").alias("x1"))
    binned = pts.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "x",
        "y",
        F.least(
            F.floor(
                (F.col("x") - F.col("x0"))
                * _LTTB_BUCKETS
                / (F.col("x1") - F.col("x0") + 1).cast("double")
            ).cast("bigint"),
            F.lit(_LTTB_BUCKETS - 1).cast("bigint"),
        ).alias("bkt"),
    )
    from .llmdata11 import _cached_corpus

    corpus = _cached_corpus(
        ("m4", sf_dir),
        lambda p: binned.repartition(4)
        .write.mode("overwrite")
        .parquet(f"{p}/in"),
    )
    stream = (
        spark.readStream.schema("event_id bigint, x bigint, y bigint, bkt bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{corpus}/in")
    )
    ykey_min = F.col("y") * F.lit(1000000000) + F.col("event_id")
    ykey_max = F.col("y") * F.lit(1000000000) - F.col("event_id")
    tkey = F.col("x") * F.lit(1000000000) + F.col("event_id")
    agg = stream.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("y").cast("bigint").alias("y_min"),
        F.min_by("event_id", ykey_min).cast("bigint").alias("y_min_event"),
        F.max("y").cast("bigint").alias("y_max"),
        F.max_by("event_id", ykey_max).cast("bigint").alias("y_max_event"),
        F.min_by("y", tkey).cast("bigint").alias("y_first"),
        F.max_by("y", tkey).cast("bigint").alias("y_last"),
    )
    sink = _run_stream_to_memory(spark, agg, tmp)
    # final state per bucket = the emission with the largest n_points
    # (monotone across batches in update mode)
    final = (
        sink.groupBy("bkt")
        .agg(
            F.max_by(
                F.struct(
                    "n_points",
                    "y_min",
                    "y_min_event",
                    "y_max",
                    "y_max_event",
                    "y_first",
                    "y_last",
                ),
                "n_points",
            ).alias("s")
        )
        .select("bkt", "s.*")
        .orderBy("bkt")
    )
    return _materialize(
        spark,
        tmp,
        final,
        "bkt bigint, n_points bigint, y_min bigint, y_min_event bigint, "
        "y_max bigint, y_max_event bigint, y_first bigint, y_last bigint",
    )


@query(
    "dq_profile_drift",
    oracle=f"""
    WITH halves AS (
      SELECT ts < TIMESTAMP '{_PSI_CUT}' AS is_ref, user_id, event_type,
             value
      FROM events
    ),
    prof AS (
      SELECT 'user_id' AS col,
             CAST(count(CASE WHEN is_ref THEN 1 END) AS BIGINT) AS n_ref,
             CAST(count(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT) AS n_cur,
             CAST(count(CASE WHEN is_ref AND user_id IS NULL THEN 1 END)
                  AS BIGINT) AS nulls_ref,
             CAST(count(CASE WHEN NOT is_ref AND user_id IS NULL THEN 1 END)
                  AS BIGINT) AS nulls_cur,
             CAST(count(DISTINCT CASE WHEN is_ref THEN user_id END)
                  AS BIGINT) AS distinct_ref,
             CAST(count(DISTINCT CASE WHEN NOT is_ref THEN user_id END)
                  AS BIGINT) AS distinct_cur
      FROM halves
      UNION ALL
      SELECT 'event_type',
             CAST(count(CASE WHEN is_ref THEN 1 END) AS BIGINT),
             CAST(count(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT),
             CAST(count(CASE WHEN is_ref AND event_type IS NULL THEN 1 END)
                  AS BIGINT),
             CAST(count(CASE WHEN NOT is_ref AND event_type IS NULL THEN 1 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN is_ref THEN event_type END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN NOT is_ref THEN event_type END)
                  AS BIGINT)
      FROM halves
      UNION ALL
      SELECT 'value',
             CAST(count(CASE WHEN is_ref THEN 1 END) AS BIGINT),
             CAST(count(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT),
             CAST(count(CASE WHEN is_ref AND value IS NULL THEN 1 END)
                  AS BIGINT),
             CAST(count(CASE WHEN NOT is_ref AND value IS NULL THEN 1 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN is_ref
                        THEN CAST(floor(value * 100) AS BIGINT) END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN NOT is_ref
                        THEN CAST(floor(value * 100) AS BIGINT) END)
                  AS BIGINT)
      FROM halves
    )
    SELECT col, n_ref, n_cur, nulls_ref, nulls_cur,
           distinct_ref, distinct_cur,
           floor((CAST(nulls_cur AS DOUBLE) / n_cur
                  - CAST(nulls_ref AS DOUBLE) / n_ref) * 1e6 + 0.5) / 1e6
             AS null_rate_delta,
           floor(CAST(distinct_cur AS DOUBLE)
                 / nullif(distinct_ref, 0) * 1e6 + 0.5) / 1e6
             AS distinct_ratio
    FROM prof ORDER BY col
    """,
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-snapshot column-profile drift: the dq_column_profile
    statistics (row/null/distinct counts) computed for the first and
    second half-month IN ONE conditional scan per column, with the two
    drift readouts every data contract watches — null-rate delta and
    distinct-cardinality ratio. This is the schema-level companion of
    drift_psi_value_halves (value DISTRIBUTION drift) and
    dq_partition_volume_anomaly (volume drift): together they are the
    landing-zone drift console.

    100 TB: one scan per profiled column (the distinct counts keep the
    fan-out per-column), each a map-side-combining conditional
    aggregate; swap exact distinct for HLL sketches past memory — the
    sketch rungs already certify that trade."""
    cut = F.lit(_PSI_CUT).cast("timestamp")
    ev = table(spark, sf_dir, "events").withColumn(
        "is_ref", F.col("ts") < cut
    ).localCheckpoint(eager=False)  # one frame feeds all three profiles

    def prof(col_name: str, keyed):
        r, c = F.col("is_ref"), ~F.col("is_ref")
        return ev.agg(
            F.lit(col_name).alias("col"),
            F.count(F.when(r, F.lit(1))).cast("bigint").alias("n_ref"),
            F.count(F.when(c, F.lit(1))).cast("bigint").alias("n_cur"),
            F.count(F.when(r & keyed.isNull(), F.lit(1)))
            .cast("bigint")
            .alias("nulls_ref"),
            F.count(F.when(c & keyed.isNull(), F.lit(1)))
            .cast("bigint")
            .alias("nulls_cur"),
            F.count_distinct(F.when(r, keyed)).cast("bigint").alias(
                "distinct_ref"
            ),
            F.count_distinct(F.when(c, keyed)).cast("bigint").alias(
                "distinct_cur"
            ),
        )

    prof_all = (
        prof("user_id", F.col("user_id"))
        .unionByName(prof("event_type", F.col("event_type")))
        .unionByName(
            prof("value", F.floor(F.col("value") * 100).cast("bigint"))
        )
    )
    return prof_all.select(
        "col",
        "n_ref",
        "n_cur",
        "nulls_ref",
        "nulls_cur",
        "distinct_ref",
        "distinct_cur",
        F.floor(
            (
                F.col("nulls_cur").cast("double") / F.col("n_cur")
                - F.col("nulls_ref").cast("double") / F.col("n_ref")
            )
            * 1e6
            + F.lit(0.5)
        ).cast("double").alias("null_rate_delta_q"),
        F.floor(
            F.col("distinct_cur").cast("double")
            / F.nullif(F.col("distinct_ref"), F.lit(0))
            * 1e6
            + F.lit(0.5)
        ).cast("double").alias("distinct_ratio_q"),
    ).select(
        "col",
        "n_ref",
        "n_cur",
        "nulls_ref",
        "nulls_cur",
        "distinct_ref",
        "distinct_cur",
        (F.col("null_rate_delta_q") / 1e6).alias("null_rate_delta"),
        (F.col("distinct_ratio_q") / 1e6).alias("distinct_ratio"),
    ).orderBy("col")


@query(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),
    freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY tok
    ),
    ranked AS (
      SELECT CAST(floor(ln(row_number() OVER (ORDER BY f DESC, tok)) * 1e6
                        + 0.5) AS BIGINT) AS lr,
             CAST(floor(ln(f) * 1e6 + 0.5) AS BIGINT) AS lf
      FROM freq
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lr) AS BIGINT) AS sx, CAST(sum(lf) AS BIGINT) AS sy,
             CAST(sum(lr * lr) AS BIGINT) AS sxx,
             CAST(sum(lr * lf) AS BIGINT) AS sxy,
             CAST(sum(lf * lf) AS BIGINT) AS syy
      FROM ranked
    )
    SELECT n AS vocab_size,
           floor((n * sxy - CAST(sx AS DOUBLE) * sy)
                 / (n * sxx - CAST(sx AS DOUBLE) * sx) * 1e6 + 0.5) / 1e6
             AS zipf_slope,
           floor((CAST(sy AS DOUBLE) / n
                  - (n * sxy - CAST(sx AS DOUBLE) * sy)
                    / (n * sxx - CAST(sx AS DOUBLE) * sx)
                    * CAST(sx AS DOUBLE) / n) / 1e6 * 1e6 + 0.5) / 1e6
             AS log_c,
           floor((n * sxy - CAST(sx AS DOUBLE) * sy)
                 * (n * sxy - CAST(sx AS DOUBLE) * sy)
                 / ((n * sxx - CAST(sx AS DOUBLE) * sx)
                    * (n * syy - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) / 1e6
             AS r_squared
    FROM m
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit — the one-row corpus health diagnostic every
    corpus datacard prints: regress ln(frequency) on ln(rank) over the
    vocabulary (both quantized to integer micro-nats BEFORE the moment
    sums, so slope/intercept/R² are ratios of identical integers on
    both engines). A natural-language corpus fits slope ≈ −1 with high
    R²; a deduplicated/boilerplate-heavy or synthetic corpus bends
    away — slope and R² together say which. Companion:
    text_zipf_topranks (relational13) is the rank TABLE that
    deliberately avoids the fit; this is the fit, with the libm ln
    quantized per-point before any reduction so it is hash-safe.

    100 TB — DISTRIBUTED RANK (r9, closing the r8 verdict's weak spot):
    the naive form ranks the vocabulary with a no-partition
    row_number() window — ONE task sorts the whole open token domain
    (10⁸–10⁹ whitespace tokens at web scale). But the moment sums only
    consume the MULTISET of (rank, frequency) pairs: tokens tied at the
    same frequency share lf, and Σlr/Σlr² over a tie group depend only
    on which CONTIGUOUS RANK RANGE the group occupies, never on which
    token takes which rank. So the plan (a) folds the vocabulary to
    per-frequency group sizes — ≤ √(2·total_tokens) rows, since D
    distinct frequencies sum to ≥ D(D+1)/2 tokens; (b) computes each
    group's exclusive rank offset (= tokens with strictly higher f)
    with the two-tier partitioned prefix sum
    (operators/distrank.exclusive_prefix — the
    range_join_value_neighbors_distributed shape) in f-DESC order —
    every Window partitioned by a 4096-wide bucket, top tier a
    fail-loud bounded driver fold; (c) regenerates the rank range
    off+1..off+cnt per group via a CHUNKED explode (64Ki ranks per
    chunk, chunk rows repartitioned so the f=1 group — half the
    vocabulary — spreads across the cluster instead of exploding in
    one task). Identical multiset of (rank, f) pairs ⇒ identical
    moments ⇒ the oracle (DuckDB's row_number form) is unchanged and
    the hash proves the rewrite. Rank generation is O(V) work with no
    global sort anywhere; the regression is the same normal-equation
    fold as ml_ols_cramer in one dimension."""
    from ..operators.distrank import exclusive_prefix

    _RCHUNK = 65536  # ranks generated per exploded chunk row

    toks = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
            ).alias("tok")
        )
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    # (a) frequency groups: f -> number of tokens at that frequency
    fc = freq.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # (b) exclusive prefix in f-DESC order = tokens with strictly higher f
    offs = exclusive_prefix(fc, "f", weight="cnt", ascending=False, out="off")
    # (c) chunked rank-range generation: the multiset {off+1..off+cnt}
    # per frequency group, spread so no single group serializes a task
    chunks = offs.select(
        "f",
        "off",
        "cnt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.floor((F.col("cnt") - 1) / _RCHUNK).cast("bigint"),
            )
        ).alias("c"),
    ).repartition(F.col("f"), F.col("c"))
    ranked = chunks.select(
        "f",
        F.explode(
            F.sequence(
                F.col("off") + F.col("c") * _RCHUNK + 1,
                F.col("off") + F.least(F.col("cnt"), (F.col("c") + 1) * _RCHUNK),
            )
        ).alias("r"),
    ).select(
        F.floor(F.log(F.col("r").cast("double")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("lr"),
        F.floor(F.log(F.col("f").cast("double")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("lf"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lr").cast("bigint").alias("sx"),
        F.sum("lf").cast("bigint").alias("sy"),
        F.sum(F.col("lr") * F.col("lr")).cast("bigint").alias("sxx"),
        F.sum(F.col("lr") * F.col("lf")).cast("bigint").alias("sxy"),
        F.sum(F.col("lf") * F.col("lf")).cast("bigint").alias("syy"),
    )
    D = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = D("n") * D("sxy") - D("sx") * D("sy")
    varx_n = D("n") * D("sxx") - D("sx") * D("sx")
    vary_n = D("n") * D("syy") - D("sy") * D("sy")
    slope = cov_n / varx_n
    return m.select(
        F.col("n").alias("vocab_size"),
        fround(slope, 6).alias("zipf_slope"),
        fround((D("sy") / D("n") - slope * D("sx") / D("n")) / 1e6, 6).alias(
            "log_c"
        ),
        fround(cov_n * cov_n / (varx_n * vary_n), 6).alias("r_squared"),
    )
