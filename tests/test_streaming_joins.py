"""Stream-stream join + in-stream dedup semantics (SURVEY §2.2): matches
arrive across micro-batches (state buffers the open side), the time bound
keeps state finite, and duplicate initials are dropped with watermarked
state."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.parsing import parse_log_lines
from prometheus_clickhouselog_exporter_spark.sources.fixtures import (
    FixtureLog,
    initial_line,
    memory_line,
)
from prometheus_clickhouselog_exporter_spark.streaming.joins import (
    dedup_initial_stream,
    enrich_stream_static,
    join_initial_to_close,
    join_initial_to_close_outer,
)

T = datetime(2024, 5, 1, 10, 0, 0)


def _stream(spark, log_dir):
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(log_dir))
    return parse_log_lines(raw)


def test_stream_stream_join_across_batches(spark, tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    # batch 1: two opens, one close (q-a closes immediately).
    FixtureLog(
        [
            initial_line(T, 1, "q-a", "10.0.0.1", 9000, "SELECT 1"),
            initial_line(T + timedelta(seconds=2), 1, "q-b", "10.0.0.2", 9001, "SELECT 2"),
            memory_line(T + timedelta(seconds=1, microseconds=500000), 1, "q-a", "1.00 MiB"),
        ]
    ).write(str(log_dir / "00.log"))

    q = (
        join_initial_to_close(_stream(spark, log_dir), watermark="2 minutes", max_duration="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["id"]: r for r in spark.sql("SELECT * FROM ss_join").collect()}
        assert set(rows) == {"q-a"}
        assert rows["q-a"]["elapsed"] == 1.5

        # batch 2: q-b's close arrives later — the open side was buffered
        # in join state across the batch boundary.
        FixtureLog(
            [memory_line(T + timedelta(seconds=30), 1, "q-b", "2.00 MiB")]
        ).write(str(log_dir / "01.log"))
        q.processAllAvailable()
        rows = {r["id"]: r for r in spark.sql("SELECT * FROM ss_join").collect()}
        assert set(rows) == {"q-a", "q-b"}
        assert rows["q-b"]["elapsed"] == 28.0

        # batch 3: a close OUTSIDE the 1-minute bound never joins.
        FixtureLog(
            [
                initial_line(T + timedelta(minutes=10), 1, "q-slow", "10.0.0.3", 9002, "SELECT 3"),
                memory_line(T + timedelta(minutes=12), 1, "q-slow", "3.00 MiB"),
            ]
        ).write(str(log_dir / "02.log"))
        q.processAllAvailable()
        assert "q-slow" not in {
            r["id"] for r in spark.sql("SELECT * FROM ss_join").collect()
        }
    finally:
        q.stop()


def test_stream_dedup_first_initial_wins(spark, tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog(
        [
            initial_line(T, 1, "q-dup", "10.0.0.1", 9000, "SELECT 1"),
            initial_line(T + timedelta(seconds=1), 1, "q-other", "10.0.0.9", 9009, "SELECT 9"),
        ]
    ).write(str(log_dir / "00.log"))

    q = (
        dedup_initial_stream(_stream(spark, log_dir), watermark="5 minutes")
        .select("id", "host", "port")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: duplicate id with different host — dropped by state.
        FixtureLog(
            [initial_line(T + timedelta(seconds=5), 2, "q-dup", "10.9.9.9", 1234, "SELECT 666")]
        ).write(str(log_dir / "01.log"))
        q.processAllAvailable()
        rows = {r["id"]: r for r in spark.sql("SELECT * FROM dedup_stream").collect()}
        assert set(rows) == {"q-dup", "q-other"}
        assert rows["q-dup"]["host"] == "10.0.0.1"  # first wins (query.go:91-95)
    finally:
        q.stop()


def test_stream_stream_left_outer_emits_orphan_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: the matched pair emits normally;
    the never-closed open emits with NULLs + matched=false only after
    the watermark passes open_ts + max_duration (engine-driven orphan
    detection — the declarative ST5 timeout)."""
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog(
        [
            initial_line(T, 1, "q-a", "10.0.0.1", 9000, "SELECT 1"),
            initial_line(T + timedelta(seconds=2), 1, "q-orphan", "10.0.0.2", 9001, "SELECT 2"),
            memory_line(T + timedelta(seconds=1), 1, "q-a", "1.00 MiB"),
        ]
    ).write(str(log_dir / "00.log"))

    q = (
        join_initial_to_close_outer(
            _stream(spark, log_dir), watermark="1 minute", max_duration="1 minute"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["id"]: r for r in spark.sql("SELECT * FROM ss_outer").collect()}
        assert set(rows) == {"q-a"} and rows["q-a"]["matched"] is True

        # advance event time far beyond open_ts + max_duration + watermark
        # on BOTH inputs (the global watermark is the min across sides);
        # NULL-side emission may trail by one more micro-batch, so push two.
        for i, mins in enumerate((10, 11)):
            FixtureLog(
                [
                    initial_line(T + timedelta(minutes=mins), 9, f"q-adv{i}", "10.0.0.9", 9009, "SELECT 9"),
                    memory_line(T + timedelta(minutes=mins), 9, f"q-adv{i}", "9.00 MiB"),
                ]
            ).write(str(log_dir / f"0{i + 1}.log"))
            q.processAllAvailable()
        rows = {r["id"]: r for r in spark.sql("SELECT * FROM ss_outer").collect()}
        assert "q-orphan" in rows
        orphan = rows["q-orphan"]
        assert orphan["matched"] is False
        assert orphan["end_time"] is None and orphan["elapsed"] is None
        assert orphan["host"] == "10.0.0.2"
    finally:
        q.stop()


def test_join_batch_mode_same_operator(spark, tmp_path):
    """The same operator runs on a bounded DataFrame (watermarks skipped) —
    this is the form the DuckDB oracle can check."""
    p = tmp_path / "b.log"
    FixtureLog(
        [
            initial_line(T, 1, "q-x", "10.0.0.1", 9000, "SELECT 1"),
            memory_line(T + timedelta(seconds=3), 1, "q-x", "1.00 MiB"),
        ]
    ).write(str(p))
    parsed = parse_log_lines(spark.read.text(str(p)))
    rows = join_initial_to_close(parsed).collect()
    assert len(rows) == 1 and rows[0]["elapsed"] == 3.0


def test_stream_static_join_enriches_and_broadcasts(spark, tmp_path):
    """Stream-static: each micro-batch joins the static dim (no watermark,
    no join state); the dim side must broadcast, and rows with no dim
    match survive a left join with NULLs."""
    log_dir = tmp_path / "ss"
    log_dir.mkdir()
    FixtureLog(
        [
            initial_line(T, 1, "q-a", "10.0.0.1", 9000, "SELECT 1"),
            initial_line(T + timedelta(seconds=1), 2, "q-b", "10.0.0.2", 9000, "INSERT INTO t VALUES (1)"),
        ]
    ).write(str(log_dir / "a.log"))
    dim = spark.createDataFrame(
        [("10.0.0.1", "rack-1")], "host string, rack string"
    )
    enriched = enrich_stream_static(_stream(spark, log_dir), dim, "host")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["id"]: r["rack"] for r in spark.sql("SELECT id, rack FROM ss_join").collect()}
    assert rows == {"q-a": "rack-1", "q-b": None}
    # batch form of the same operator plans a broadcast join
    batch = enrich_stream_static(
        parse_log_lines(spark.read.text(str(log_dir / "a.log"))), dim, "host"
    )
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan and "SortMergeJoin" not in plan
