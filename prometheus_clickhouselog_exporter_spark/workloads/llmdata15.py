"""Streaming fidelity family, round 6: the OUTER stream-stream join
modes (left, full, right — the null-emission corners where unmatched
rows only appear once the watermark PROVES no partner can arrive),
chained stateful window aggregations (SPARK-40925), and the native
session_window merge path — each value-hash-certified against a batch
arithmetic oracle.

The shared mechanics being certified are delayed NULL-side emission:
outer results for a buffered row are only produced after the event-time
watermark passes its join deadline, i.e. in a LATER micro-batch. The
harness forces that lateness deterministically with
``maxFilesPerTrigger=1`` plus one far-future sentinel file (two
sentinel ids) — feeding an event into EVERY watermarked input (the
global watermark is the MIN across inputs) — so the engine's own
no-data batch runs with a watermark an hour past every real deadline
and ALL null-side rows must have been emitted.
Sentinels are filtered from the result (their own emission would race
the final no-data micro-batch — the only nondeterminism in the design,
excluded by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import query, table
from .llmdata11 import (
    _bump_new_file_mtimes,
    _cached_corpus,
    _fidelity_tmp,
    _logpipe_stream_corpus,
    _materialize,
    _run_stream_to_memory,
    _snapshot_files,
)

_SENTINELS = (99999901, 99999902)


def _append_log_sentinels(spark, tmp: str, m) -> None:
    """Append ONE far-future sentinel log file (one micro-batch under
    maxFilesPerTrigger=1) carrying BOTH sentinel ids. Each sentinel has
    an initial AND a close line at the same instant: join state eviction
    runs on the GLOBAL watermark — the MIN across both watermarked
    inputs — so a sentinel advancing only the open side would leave the
    close-side watermark at the corpus tail and strand every unmatched
    row from the last (delay + max_duration) window (caught live: q-999
    at exactly max ts never emitted).

    r9: the two sentinels used to be two FILES (two micro-batches); one
    file is enough — the batch after it is the engine's own no-data
    batch, which evicts against the sentinel-advanced watermark. One
    fewer ~2.5 s stateful micro-batch per fidelity run, output
    hash-identical (both sentinel ids still exist and are still
    filtered)."""
    import datetime

    rows = []
    for i, sid in enumerate(_SENTINELS, start=1):
        dts = (m + datetime.timedelta(hours=i)).strftime("%Y.%m.%d %H:%M:%S.%f")
        rows.append(
            (f"{dts} [ 1 ] {{q-{sid}}} <Debug> executeQuery: "
             "(from 10.0.0.7:9000) SELECT 1",)
        )
        rows.append(
            (f"{dts} [ 1 ] {{q-{sid}}} <Debug> MemoryTracker: "
             "Peak memory usage (for query): 1.00 MiB.",)
        )
    before = _snapshot_files(f"{tmp}/logs")
    spark.createDataFrame(rows, "value string").coalesce(1).write.mode(
        "append"
    ).text(f"{tmp}/logs")
    # the file source orders pending files oldest-first; bump the
    # sentinel file's mtime so "corpus batch first, sentinel batch
    # second" is a guarantee, not a bet on write-job wall-clock spacing
    _bump_new_file_mtimes(f"{tmp}/logs", before)


def _outer_join_corpus(spark, sf_dir: str) -> str:
    """Session-cached corpus + far-future sentinel file shared by the
    three outer stream-stream join fidelity queries (their corpus, max
    timestamp, and sentinel content are identical — r11, VERDICT r10
    directive #6: each variant used to re-synthesize all of it per
    invocation, 3× per query under the bench's warm+min-of-2 protocol)."""

    def build(d: str) -> None:
        import shutil

        src = _logpipe_stream_corpus(spark, sf_dir)
        shutil.copytree(f"{src}/logs", f"{d}/logs")
        m = (
            table(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull() & (F.col("value") >= 0))
            .agg(F.max("ts"))
            .first()[0]
        )
        _append_log_sentinels(spark, d, m)

    return _cached_corpus(("outerjoin", sf_dir), build)


@query(
    "streaming_outer_join_fidelity",
    oracle="""
    SELECT 'q-' || CAST(event_id AS VARCHAR) AS id,
           ts AS start_time,
           CASE WHEN event_id % 3 <> 0 AND event_id % 7 <= 5
                THEN ts + INTERVAL 1 SECOND * (event_id % 7) END AS end_time,
           CASE WHEN event_id % 3 <> 0 AND event_id % 7 <= 5
                THEN CAST(event_id % 7 AS DOUBLE) END AS elapsed,
           (event_id % 3 <> 0 AND event_id % 7 <= 5) AS matched
    FROM events
    WHERE value IS NOT NULL AND value >= 0
    """,
)
def streaming_outer_join_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL left-outer stream-stream join
    (streaming/joins.join_initial_to_close_outer: both sides
    watermarked, time-bound state, engine-decided orphan emission) as a
    Structured Streaming query over the shared logpipe corpus
    (llmdata11._logpipe_stream_corpus: every qualifying event opens at
    ts; closes at ts + event_id%7 s exist for event_id%3≠0, of which
    %7=6 falls outside the 5 s join window) and value-hash-matches the
    COMPLETE output — matched pairs with elapsed AND unmatched opens
    with NULL close fields — against DuckDB arithmetic. The unmatched
    rows are the reference's ST5 orphan-eviction semantics
    (main.go:125-129) emitted as data instead of a counter; any failure
    of Spark to emit a null-side row (the classic
    watermark-never-advanced bug) shows up as a row-count mismatch."""
    from ..operators.parsing import parse_log_lines
    from ..streaming.joins import join_initial_to_close_outer

    # Sentinel file far past the corpus: with maxFilesPerTrigger=1 it
    # forms a dedicated micro-batch whose sole job is to drag the
    # watermark beyond every real open's outer deadline (open_ts + 5 s +
    # 10 min watermark delay); the engine's no-data batch then evicts.
    # Corpus + sentinel are session-cached and shared by all three outer
    # variants (_outer_join_corpus); per-run state lives in tmp only.
    corpus = _outer_join_corpus(spark, sf_dir)
    tmp = _fidelity_tmp("outerjoin-fidelity-")
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(f"{corpus}/logs")
    )
    joined = join_initial_to_close_outer(
        parse_log_lines(raw), max_duration="5 seconds"
    )
    out = (
        _run_stream_to_memory(
            spark,
            joined.select("id", "start_time", "end_time", "elapsed", "matched"),
            tmp,
            mode="append",
        )
        .filter(~F.col("id").isin(*[f"q-{s}" for s in _SENTINELS]))
        .orderBy("id")
    )
    return _materialize(
        spark,
        tmp,
        out,
        "id string, start_time timestamp, end_time timestamp, "
        "elapsed double, matched boolean",
    )


@query(
    "streaming_chained_windows_fidelity",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT)
                          * 3600 * 1000000) AS hour_start,
           event_type, CAST(count(*) AS BIGINT) AS n
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def streaming_chained_windows_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs CHAINED stateful operators — two cascaded event-time window
    aggregations in ONE streaming query (10-minute tumbling counts
    rolled up into 1-hour tumbling sums via ``window_time``), the
    multiple-stateful-operators capability Spark gained in 3.4/4.0
    (SPARK-40925) — and value-hash-matches the final hourly counts
    against direct SQL arithmetic. Equivalence holds because 10-minute
    windows never straddle hour boundaries, so the two-level rollup must
    equal the one-level hourly count exactly; any watermark
    mis-propagation between the stateful operators (the failure mode
    this capability's design doc centers on) loses or duplicates a
    window and breaks the hash.

    Emission discipline: append mode is mandatory for chained stateful
    ops, so final rows exist only after BOTH windows close — one
    far-future sentinel batch (maxFilesPerTrigger=1, the
    outer-join-fidelity recipe) pushes the watermark past every real
    hour; the sentinel's own type is filtered from the result."""
    from pyspark.sql.functions import window as Fwindow

    tmp = _fidelity_tmp("chainwin-fidelity-")  # per-run ckpt/sink only
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).select(
        "event_type", "ts"
    )

    def build(d: str) -> None:
        # coalesce(1): the corpus MUST be one file — with
        # maxFilesPerTrigger=1 a multi-part corpus becomes multiple
        # micro-batches whose 5-minute watermark would drop later parts'
        # older rows as late data (the _logpipe_stream_corpus
        # discipline, llmdata11).
        ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")
        # collect the 1-row max ONCE — timestamping each sentinel from
        # the lazy agg would re-run the events scan per file write
        m = ev.agg(F.max("ts")).first()[0]
        # one sentinel FILE with both far-future rows (the one-file
        # recipe of _append_log_sentinels): the engine's no-data batch
        # does the final eviction, so a second sentinel batch would buy
        # nothing but ~2.5 s. mtime-bumped to guarantee it sorts last.
        import datetime

        before = _snapshot_files(f"{d}/in")
        spark.createDataFrame(
            [
                ("__sentinel__", m + datetime.timedelta(hours=2 * i))
                for i in (1, 2)
            ],
            "event_type string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(f"{d}/in")
        _bump_new_file_mtimes(f"{d}/in", before)

    corpus = _cached_corpus(("chainwin", sf_dir), build)
    src = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{corpus}/in")
    )
    ten = (
        src.withWatermark("ts", "5 minutes")
        .groupBy(Fwindow("ts", "10 minutes").alias("w10"), "event_type")
        .agg(F.count(F.lit(1)).alias("n10"))
    )
    hourly = (
        ten.groupBy(
            Fwindow(F.window_time("w10"), "1 hour").alias("w60"), "event_type"
        )
        .agg(F.sum("n10").alias("n"))
        .select(
            F.col("w60.start").alias("hour_start"),
            "event_type",
            F.col("n").cast("bigint").alias("n"),
        )
    )
    out = (
        _run_stream_to_memory(spark, hourly, tmp, mode="append")
        .filter(F.col("event_type") != "__sentinel__")
        .orderBy("hour_start", "event_type")
    )
    return _materialize(
        spark, tmp, out, "hour_start timestamp, event_type string, n bigint"
    )


@query(
    "streaming_native_session_fidelity",
    oracle="""
    WITH q AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE ts IS NOT NULL AND event_type <> '__sentinel__'
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS sid
      FROM q
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def streaming_native_session_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs Spark's NATIVE ``session_window`` aggregation (the engine's
    own merging session-state operator — distinct from the
    applyInPandasWithState sessionizer certified in r4) as a real
    Structured Streaming query over the events table and
    value-hash-matches the final (user, session-start, event-count)
    rows against the gaps-and-islands SQL recomputation with the same
    30-minute gap. Append mode + the sentinel-batch recipe closes every
    real session; a session only ever contains one user's events, so
    the island oracle is exact.

    This certifies the session MERGE path (two windows coalescing when
    a bridging event arrives) that tumbling/sliding windows never
    exercise — the state-store operation unique to session windows."""
    from pyspark.sql.functions import session_window

    tmp = _fidelity_tmp("natsess-fidelity-")  # per-run ckpt/sink only
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).select(
        "user_id", "event_type", "ts"
    )

    def build(d: str) -> None:
        ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")
        m = ev.agg(F.max("ts")).first()[0]
        # one sentinel FILE with both far-future rows (one-file recipe),
        # mtime-bumped to guarantee it sorts after the corpus file
        import datetime

        before = _snapshot_files(f"{d}/in")
        spark.createDataFrame(
            [
                (int(-1 - i), "__sentinel__", m + datetime.timedelta(hours=2 * i))
                for i in (1, 2)
            ],
            "user_id long, event_type string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(f"{d}/in")
        _bump_new_file_mtimes(f"{d}/in", before)

    corpus = _cached_corpus(("natsess", sf_dir), build)
    src = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{corpus}/in")
    )
    # Sentinels MUST pass through the watermark node (filtering them
    # before it would leave the watermark at the corpus tail and strand
    # the last session); their negative user_ids keep them in their own
    # sessions, filtered from the OUTPUT instead.
    sess = (
        src.withWatermark("ts", "5 minutes")
        .groupBy(session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )
    out = (
        _run_stream_to_memory(spark, sess, tmp, mode="append")
        .filter(F.col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    )
    return _materialize(
        spark,
        tmp,
        out,
        "user_id long, session_start timestamp, n_events bigint",
    )


@query(
    "streaming_full_outer_join_fidelity",
    oracle="""
    SELECT 'q-' || CAST(event_id AS VARCHAR) AS id,
           ts AS start_time,
           CASE WHEN event_id % 3 <> 0 AND event_id % 7 <= 5
                THEN ts + INTERVAL 1 SECOND * (event_id % 7) END AS end_time,
           CASE WHEN event_id % 3 <> 0 AND event_id % 7 <= 5
                THEN CAST(event_id % 7 AS DOUBLE) END AS elapsed,
           CASE WHEN event_id % 3 <> 0 AND event_id % 7 <= 5
                THEN 'both' ELSE 'open_only' END AS side
    FROM events WHERE value IS NOT NULL AND value >= 0
    UNION ALL
    SELECT 'q-' || CAST(event_id AS VARCHAR),
           NULL, ts + INTERVAL 6 SECOND, NULL, 'close_only'
    FROM events
    WHERE value IS NOT NULL AND value >= 0
      AND event_id % 3 <> 0 AND event_id % 7 = 6
    """,
)
def streaming_full_outer_join_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the FULL OUTER stream-stream join (the third and last join
    mode: matched pairs + orphan opens + orphan CLOSES — a close whose
    open fell outside the 5 s bound becomes its own null-open row once
    the watermark proves it) over the shared logpipe corpus and
    value-hash-matches the complete three-way output against DuckDB
    arithmetic. The close-only rows here are exactly the %7=6 closes
    (6 s > the 5 s join window); their emission exercises the
    right-side state eviction path the left-outer certificate never
    touches."""
    from ..operators.parsing import parse_log_lines
    from ..streaming.joins import join_initial_to_close_outer

    corpus = _outer_join_corpus(spark, sf_dir)  # session-cached + sentinel
    tmp = _fidelity_tmp("outerjoin-fidelity-")
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(f"{corpus}/logs")
    )
    joined = join_initial_to_close_outer(
        parse_log_lines(raw), max_duration="5 seconds", how="fullOuter"
    )
    out = (
        _run_stream_to_memory(
            spark,
            joined.select("id", "start_time", "end_time", "elapsed", "side"),
            tmp,
            mode="append",
        )
        .filter(~F.col("id").isin(*[f"q-{s}" for s in _SENTINELS]))
        .orderBy("id", "side")
    )
    return _materialize(
        spark,
        tmp,
        out,
        "id string, start_time timestamp, end_time timestamp, "
        "elapsed double, side string",
    )


@query(
    "streaming_right_outer_join_fidelity",
    oracle="""
    SELECT 'q-' || CAST(event_id AS VARCHAR) AS id,
           CASE WHEN event_id % 7 <= 5 THEN ts END AS start_time,
           ts + INTERVAL 1 SECOND * (event_id % 7) AS end_time,
           CASE WHEN event_id % 7 <= 5
                THEN CAST(event_id % 7 AS DOUBLE) END AS elapsed,
           CASE WHEN event_id % 7 <= 5 THEN 'both'
                ELSE 'close_only' END AS side
    FROM events
    WHERE value IS NOT NULL AND value >= 0 AND event_id % 3 <> 0
    """,
)
def streaming_right_outer_join_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER stream-stream join — the remaining outer mode:
    every CLOSE row survives (matched to its open inside the 5 s bound,
    or emitted with NULL open fields once the watermark proves no open
    can match), opens without closes vanish. Over the shared corpus the
    preserved side is exactly the %3≠0 events (those have closes), with
    %7=6 closes unmatched. Same sentinel discipline as the left/full
    variants; together the three certificates cover every preserved-side
    eviction path Spark's stream-stream join state machine has."""
    from ..operators.parsing import parse_log_lines
    from ..streaming.joins import join_initial_to_close_outer

    corpus = _outer_join_corpus(spark, sf_dir)  # session-cached + sentinel
    tmp = _fidelity_tmp("outerjoin-fidelity-")
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(f"{corpus}/logs")
    )
    joined = join_initial_to_close_outer(
        parse_log_lines(raw), max_duration="5 seconds", how="rightOuter"
    )
    out = (
        _run_stream_to_memory(
            spark,
            joined.select("id", "start_time", "end_time", "elapsed", "side"),
            tmp,
            mode="append",
        )
        .filter(~F.col("id").isin(*[f"q-{s}" for s in _SENTINELS]))
        .orderBy("id", "side")
    )
    return _materialize(
        spark,
        tmp,
        out,
        "id string, start_time timestamp, end_time timestamp, "
        "elapsed double, side string",
    )
