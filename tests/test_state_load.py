"""RocksDB state-store load: tens of thousands of OPEN sessions held in
state across micro-batches (the scenario the reference's unbounded Go map
degrades on — SURVEY ST5 — and the scenario a 100 TB log stream produces
constantly: every in-flight query is an open session).

The point being measured: open-session state lives in the state store
(RocksDB: off-heap, spillable, versioned in the checkpoint), NOT in any
driver-side structure, so the open-session count scales with executor
disk, and a later batch can still close any of them correctly.

N defaults small enough for CI (env SPARK_GRAFT_LOAD_N overrides — the
same test drove 100k sessions locally; throughput is printed either way).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from prometheus_clickhouselog_exporter_spark.sources.fixtures import (
    FixtureLog,
    initial_line,
    memory_line,
)
from prometheus_clickhouselog_exporter_spark.streaming import (
    PrometheusSnapshotSink,
    run_log_pipeline,
)

T = datetime(2024, 3, 1, 9, 0, 0)

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_rocksdb_many_open_sessions_load(spark, tmp_path):
    n = int(os.environ.get("SPARK_GRAFT_LOAD_N", "20000"))
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    try:
        log_dir = tmp_path / "logs"
        log_dir.mkdir()
        # batch 1: n initial SELECT lines, all distinct ids — n OPEN sessions
        opens = [
            initial_line(T + timedelta(microseconds=i), i % 997, f"q-{i}",
                         f"10.0.{i % 200}.7", 9000 + i % 999, f"SELECT {i}")
            for i in range(n)
        ]
        FixtureLog(opens).write(str(log_dir / "00.log"))
        pipe = run_log_pipeline(
            spark, str(log_dir), str(tmp_path / "ckpt"),
            PrometheusSnapshotSink(), max_files_per_trigger=1,
        )
        try:
            t0 = time.time()
            pipe.process_all_available()
            open_s = time.time() - t0
            sink = pipe.sink
            assert sink.query_count["select"] == n  # every session opened
            assert sink.sessions == 0               # none completed yet
            assert dict(sink.exporter_errors) == {}

            # batch 2: close every second session — state lookups must hit
            # all of them despite the store now holding n keys.
            closes = [
                memory_line(T + timedelta(seconds=5, microseconds=i), i % 997,
                            f"q-{i}", "1.00 MiB")
                for i in range(0, n, 2)
            ]
            FixtureLog(closes).write(str(log_dir / "01.log"))
            os.utime(log_dir / "01.log")
            t0 = time.time()
            pipe.process_all_available()
            close_s = time.time() - t0

            assert sink.sessions == n // 2
            assert dict(sink.exporter_errors) == {}  # no not_found: state held
            qt = sink.histograms["clickhouse_query_time"]["select"]
            assert qt.total == n // 2
            print(
                f"\nrocksdb load: {n} opens in {open_s:.1f}s "
                f"({n / open_s:,.0f} sessions/s), {n // 2} closes in "
                f"{close_s:.1f}s ({n // 2 / close_s:,.0f}/s)"
            )
        finally:
            pipe.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
