"""Streaming-semantics tests (SURVEY §5.3): the full corpus through the
real Structured Streaming pipeline, cross-batch state, counter monotonicity,
timeout eviction, and the eviction-then-reuse behavior only streaming can
model (main.go:125-129)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pytest

from prometheus_clickhouselog_exporter_spark.sources.fixtures import (
    FixtureLog,
    initial_line,
    memory_line,
    standard_corpus,
    stats_line,
)
from prometheus_clickhouselog_exporter_spark.streaming import (
    PrometheusSnapshotSink,
    run_log_pipeline,
)

T = datetime(2024, 3, 1, 9, 0, 0)


def _run(spark, tmp_path, files: dict[str, list[str]]):
    """Write each file in order (one micro-batch each), run the pipeline to
    completion, return the sink."""
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    ckpt = tmp_path / "ckpt"
    names = sorted(files)
    FixtureLog(files[names[0]]).write(str(log_dir / names[0]))
    pipe = run_log_pipeline(
        spark, str(log_dir), str(ckpt), PrometheusSnapshotSink(),
        max_files_per_trigger=1,
    )
    try:
        pipe.process_all_available()
        for name in names[1:]:
            FixtureLog(files[name]).write(str(log_dir / name))
            # distinct mtimes so the file source lists them in order
            os.utime(log_dir / name)
            pipe.process_all_available()
    finally:
        pipe.stop()
    return pipe.sink


def test_full_corpus_streaming_matches_batch_goldens(spark, tmp_path):
    sink = _run(spark, tmp_path, {"00.log": standard_corpus().lines})

    assert sink.read_lines == 52
    assert dict(sink.exporter_errors) == {
        "duplicated_initial_query": 1,
        "convert": 1,
        "not_found_query": 3,
    }
    assert dict(sink.query_count) == {"select": 12, "insert": 1, "update": 1, "delete": 1, "other": 1}
    assert dict(sink.query_errors) == {("select", "60"): 1, ("select", "47"): 1}
    # completed sessions: 6 non-insert happy-path + errmem + dup + 5 units
    assert sink.sessions == 13
    qt = sink.histograms["clickhouse_query_time"]
    assert qt["select"].total == 10
    assert qt["insert"].total == 1  # INSERT observed (query.go:228 precedes :231)
    rr = sink.histograms["clickhouse_select_query_rows_read"][""]
    assert rr.total == 12
    assert rr.counts[1e6] == 6
    # exposition renders and carries the counters
    text = sink.render_exposition()
    assert 'chlogexporter_errors{type="not_found_query"} 3' in text
    assert "clickhouse_query_time_bucket" in text


def test_cross_batch_correlation(spark, tmp_path):
    """initial in batch 1, stats+memory in batch 2 → still one session."""
    f1 = [initial_line(T, 1, "q-cross", "10.1.0.1", 9000, "SELECT 1")]
    f2 = [
        stats_line(T + timedelta(seconds=1), 1, "q-cross", 500, "1.00 KiB", 1.0, 500, "1.00 KiB"),
        memory_line(T + timedelta(seconds=2), 1, "q-cross", "1.00 MiB"),
    ]
    sink = _run(spark, tmp_path, {"00.log": f1, "01.log": f2})
    assert sink.sessions == 1
    assert dict(sink.exporter_errors) == {}
    assert sink.histograms["clickhouse_select_query_rows_read"][""].total == 1


def test_id_reuse_after_eviction_opens_fresh_session(spark, tmp_path):
    """After FullInfo eviction the same id is a NEW session — the exact
    map-delete behavior of main.go:125-129 that batch mode cannot model."""
    f1 = [
        initial_line(T, 1, "q-reuse", "10.1.0.1", 9000, "SELECT 1"),
        memory_line(T + timedelta(seconds=1), 1, "q-reuse", "1.00 MiB"),
    ]
    f2 = [
        initial_line(T + timedelta(minutes=1), 2, "q-reuse", "10.1.0.2", 9001, "SELECT 2"),
        memory_line(T + timedelta(minutes=1, seconds=3), 2, "q-reuse", "2.00 MiB"),
    ]
    sink = _run(spark, tmp_path, {"00.log": f1, "01.log": f2})
    assert sink.sessions == 2
    assert dict(sink.exporter_errors) == {}  # NOT a duplicated_initial_query
    assert sink.query_count["select"] == 2


def test_timeout_evicts_leaked_sessions(spark, tmp_path):
    """INSERT and error-only sessions leak forever in the reference
    (SURVEY ST5); the engine's state timeout evicts them.

    NB: while processing-time timers are pending, the engine keeps running
    no-data micro-batches, so `processAllAvailable()` never quiesces —
    the timeout phase must poll the sink instead.
    """
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog([initial_line(T, 1, "q-leak", "10.1.0.1", 9000, "INSERT INTO t VALUES (1)")]).write(
        str(log_dir / "00.log")
    )
    pipe = run_log_pipeline(
        spark, str(log_dir), str(tmp_path / "ckpt"), PrometheusSnapshotSink(),
        timeout_ms=300, max_files_per_trigger=1,
    )
    try:
        # No processAllAvailable here: once a processing-time timer is
        # armed the engine keeps scheduling no-data batches and that call
        # never returns. The micro-batch thread advances on its own; poll.
        deadline = time.time() + 120
        while time.time() < deadline and pipe.sink.timeouts == 0:
            time.sleep(0.5)
    finally:
        pipe.stop()
    assert pipe.sink.timeouts == 1
    assert pipe.sink.sessions == 0
    assert pipe.sink.query_count["insert"] == 1  # session opened, then evicted


def test_rocksdb_state_store_provider(spark, tmp_path):
    """The 100 TB state backend: sessionization on the RocksDB state-store
    provider (state off-heap/on-disk, bounded memory) must produce the
    same results as the default HDFS-backed store."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        f1 = [initial_line(T, 1, "q-rocks", "10.1.0.1", 9000, "SELECT 1")]
        f2 = [
            stats_line(T + timedelta(seconds=1), 1, "q-rocks", 500, "1.00 KiB", 1.0, 500, "1.00 KiB"),
            memory_line(T + timedelta(seconds=2), 1, "q-rocks", "1.00 MiB"),
        ]
        sink = _run(spark, tmp_path, {"00.log": f1, "01.log": f2})
        assert sink.sessions == 1
        assert dict(sink.exporter_errors) == {}
        assert sink.query_count["select"] == 1
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
