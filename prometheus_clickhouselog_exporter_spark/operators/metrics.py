"""The reference's 9 Prometheus collectors (metrics.go:8-70) as DataFrame
aggregates over the annotated event table (A1-A9 in SURVEY §2.1).

Counters observe per *line* (not per session), exactly where the reference
calls ``.Inc()`` / ``.Observe()``:
- A1 read_lines: every input line, before any filtering (main.go:119).
- A2 query_count{type}: each non-duplicate valid initial (query.go:127).
- A3 query_errors{type,code}: each found error line (query.go:262).
- A4 chlogexporter_errors{type}: see ``correlate.error_counts``.
- A5 query_time{type}: each found+valid memory line, elapsed = that line's
  dt − session start (query.go:226-228) — observed for INSERTs too, since
  the observe precedes the FullInfo check (query.go:228 vs :231).
- A6-A9: each found+fully-converted stats line (query.go:183-186).

Each snapshot is a handful of small hash aggregates; in streaming these same
expressions run in update mode, giving Prometheus's monotone accumulation
across micro-batches without recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.histogram import (
    BYTES_PER_SEC_BUCKETS,
    BYTES_READ_BUCKETS,
    QUERY_TIME_BUCKETS,
    ROWS_PER_SEC_BUCKETS,
    ROWS_READ_BUCKETS,
    prometheus_histogram,
)
from .correlate import annotate_events


def observed_line_counters(parsed: DataFrame):
    """A1/A2-style counters as ``observe()`` metrics riding the SAME scan:
    attach accumulator-style sums to the parse pipeline so line totals and
    per-kind counts materialize as a side effect of whatever action runs
    next — ZERO extra jobs, no second pass over the source.

    This is the closest Spark analog to the reference's ``.Inc()`` call
    sites (main.go:119, query.go:127): counters updated in the stream of
    processing, not by a separate aggregation. ``metric_snapshot`` remains
    the authoritative grouped form (it can histogram and label); observe()
    is the free-of-charge health-counter tier a 100 TB batch job wants on
    every run — the scan is the expensive part, the counters are not.

    Returns (df, observation): run ANY action on df, then read
    ``observation.get`` — a dict with ``parsed_lines`` plus one counter
    per event kind (unparseable lines never leave ``parse_log_lines``,
    so the source-line total A1 stays with the raw-side counter).
    """
    from pyspark.sql import Observation

    obs = Observation()

    def _n(kind: str):
        return F.sum(F.when(F.col("event_kind") == kind, 1).otherwise(0)).alias(kind)

    observed = parsed.observe(
        obs,
        F.count(F.lit(1)).alias("parsed_lines"),
        _n("initial"),
        _n("stats"),
        _n("memory"),
        _n("error"),
    )
    return observed, obs


def metric_snapshot(raw_lines: DataFrame, parsed: DataFrame) -> dict[str, DataFrame]:
    """Compute all 9 collectors. ``raw_lines`` is the unfiltered source
    (for A1); ``parsed`` is ``parse_log_lines`` output."""
    ev = annotate_events(parsed).cache()

    read_lines = raw_lines.agg(F.count(F.lit(1)).alias("n"))

    exporter_errors = (
        ev.filter(F.col("err_type").isNotNull()).groupBy("err_type").agg(F.count(F.lit(1)).alias("n"))
    )

    query_count = (
        ev.filter(F.col("is_session_line")).groupBy(F.col("stmt_type").alias("type")).agg(F.count(F.lit(1)).alias("n"))
    )

    query_errors = (
        ev.filter(F.col("error_valid"))
        .groupBy(F.col("session_stmt").alias("type"), F.col("error_code").alias("code"))
        .agg(F.count(F.lit(1)).alias("n"))
    )

    mem = ev.filter(F.col("memory_valid")).withColumn(
        "elapsed",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("session_start_ts"))) / 1e6,
    )
    query_time = prometheus_histogram(mem, "elapsed", QUERY_TIME_BUCKETS, ["session_stmt"]).withColumnRenamed(
        "session_stmt", "type"
    )

    stats = ev.filter(F.col("stats_valid"))
    rows_read = prometheus_histogram(stats, "rows_read", ROWS_READ_BUCKETS)
    bytes_read = prometheus_histogram(stats, "bytes_read", BYTES_READ_BUCKETS)
    rows_per_sec = prometheus_histogram(stats, "rps", ROWS_PER_SEC_BUCKETS)
    bytes_per_sec = prometheus_histogram(stats, "speed", BYTES_PER_SEC_BUCKETS)

    return {
        "chlogexporter_read_lines": read_lines,
        "chlogexporter_errors": exporter_errors,
        "clickhouse_query_count": query_count,
        "clickhouse_query_errors": query_errors,
        "clickhouse_query_time": query_time,
        "clickhouse_select_query_rows_read": rows_read,
        "clickhouse_select_query_bytes_read": bytes_read,
        "clickhouse_select_query_rows_per_second": rows_per_sec,
        "clickhouse_select_query_bytes_per_second": bytes_per_sec,
    }
