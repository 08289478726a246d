"""RocksDB state-store provider: the 100 TB streaming-state posture
(VERDICT r6 directive #8). The HDFS-backed default keeps every key in
executor heap — fine for the sandbox fidelity corpora, a ceiling at
real key cardinality. RocksDBStateStoreProvider spills state to local
SSD with bounded memory; this suite proves the provider actually
EXECUTES in this distribution (pyspark/jars ships rocksdbjni-9.8.4,
probed r7) and that results are provider-invariant for both stateful
shapes the engine uses: built-in windowed aggregation state and
applyInPandasWithState session state. Changelog checkpointing (upload
per-batch deltas, not full SST snapshots) is exercised on the windowed
run — it is the config that makes commit cost O(changed keys).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from prometheus_clickhouselog_exporter_spark.operators.parsing import parse_log_lines
from prometheus_clickhouselog_exporter_spark.sources.fixtures import (
    FixtureLog,
    initial_line,
    memory_line,
    stats_line,
)
from prometheus_clickhouselog_exporter_spark.streaming.windows import (
    windowed_event_counts,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

T = datetime(2024, 5, 1, 10, 0, 0)


@pytest.fixture()
def rocksdb_conf(spark):
    """Set the provider for queries STARTED inside the with-block; the
    provider is resolved from session conf at query start, so restoring
    afterwards leaves the shared fixture session untouched."""
    prev = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    spark.conf.set(CHANGELOG_CONF, "true")
    yield spark
    if prev is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, prev)
    spark.conf.unset(CHANGELOG_CONF)


def _write_log(log_dir):
    lines = [
        initial_line(T + timedelta(seconds=s), 1, f"q-{i}", "10.0.0.1", 9000, "SELECT 1")
        for i, s in enumerate((5, 20, 70, 130, 200))
    ]
    FixtureLog(lines).write(str(log_dir / "00.log"))


def _run_windowed(spark, log_dir, ckpt, name):
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(log_dir))
    )
    agg = windowed_event_counts(
        parse_log_lines(stream), window="1 minute", watermark="0 seconds",
        extra_keys=(),
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        return {
            (r.window_start, r.n)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()


def test_windowed_agg_provider_invariant(spark, rocksdb_conf, tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    _write_log(log_dir)
    got = _run_windowed(spark, log_dir, tmp_path / "ck_rocks", "rocks_win")
    # expected state: 10:00 → 2, 10:01 → 1, 10:02 → 1, 10:03 → 1
    assert got == {
        (T, 2),
        (T + timedelta(minutes=1), 1),
        (T + timedelta(minutes=2), 1),
        (T + timedelta(minutes=3), 1),
    }
    # the provider actually engaged: RocksDB working dir exists under the
    # checkpoint's state store path
    import glob

    assert glob.glob(str(tmp_path / "ck_rocks" / "state" / "**" / "*.changelog"),
                     recursive=True) or glob.glob(
        str(tmp_path / "ck_rocks" / "state" / "**" / "*.zip"), recursive=True
    )


def test_sessionize_state_provider_invariant(spark, rocksdb_conf, tmp_path):
    """applyInPandasWithState (the reference-fidelity sessionizer, ST1-ST5)
    under RocksDB: same final session rows as the default provider run
    that every golden suite pins."""
    from prometheus_clickhouselog_exporter_spark.operators.correlate import (
        enrich_parsed,
    )
    from prometheus_clickhouselog_exporter_spark.streaming.session_state import (
        sessionize_stream,
    )

    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    lines = [
        initial_line(T, 1, "qa", "10.0.0.1", 9000, "SELECT 1"),
        stats_line(T + timedelta(seconds=1), 1, "qa", 100, "1.00 KiB", 0.5, 200, "2.00 KiB"),
        memory_line(T + timedelta(seconds=2), 1, "qa", "4.00 MiB"),
    ]
    FixtureLog(lines).write(str(log_dir / "00.log"))
    stream = spark.readStream.format("text").load(str(log_dir))
    sessions = sessionize_stream(enrich_parsed(parse_log_lines(stream)))
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("rocks_sessions")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT id, rows_read, memory, full_info FROM rocks_sessions "
            "WHERE row_type = 'session'"
        ).collect()
    finally:
        q.stop()
    assert [(r.id, r.rows_read, r.memory, r.full_info) for r in rows] == [
        ("qa", 100, 4 * 1024 * 1024, True)
    ]
