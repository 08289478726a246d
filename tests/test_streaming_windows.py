"""Watermark semantics test (SURVEY §2.2): windowed streaming aggregation
in append mode — a window only emits once the watermark passes its end, and
data later than the watermark is dropped, not aggregated."""

from __future__ import annotations

from datetime import datetime, timedelta

from prometheus_clickhouselog_exporter_spark.operators.parsing import parse_log_lines
from prometheus_clickhouselog_exporter_spark.sources.fixtures import FixtureLog, initial_line
from prometheus_clickhouselog_exporter_spark.streaming.windows import windowed_event_counts

T = datetime(2024, 5, 1, 10, 0, 0)


def _lines(*offsets_sec):
    return [
        initial_line(T + timedelta(seconds=s), 1, f"q-{i}-{s}", "10.0.0.1", 9000, "SELECT 1")
        for i, s in enumerate(offsets_sec)
    ]


def test_watermark_append_emits_closed_windows_and_drops_late(spark, tmp_path):
    """Late data is dropped by WINDOW END vs watermark (Spark's contract):
    a straggler is only discarded once the watermark has passed the end of
    the window it belongs to."""
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    # batch 1: windows [10:00, 10:01) ×2 and [10:01, 10:02) ×1;
    # max event time 10:01:30 → watermark (1 min) becomes 10:00:30.
    FixtureLog(_lines(5, 20, 90)).write(str(log_dir / "00.log"))

    stream = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(log_dir))
    agg = windowed_event_counts(
        parse_log_lines(stream), window="1 minute", watermark="1 minute", extra_keys=()
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode: nothing emitted yet — no window end ≤ watermark.
        assert spark.sql("SELECT * FROM win_counts").count() == 0

        # batch 2: 10:05 advances the watermark to 10:04 — both early
        # windows close and flush on the next batch.
        FixtureLog(_lines(300)).write(str(log_dir / "01.log"))
        q.processAllAvailable()

        # batch 3: straggler at 10:00:10 — its window [10:00, 10:01)
        # ended before the 10:04 watermark ⇒ engine drops it.
        FixtureLog(_lines(10, 400)).write(str(log_dir / "02.log"))
        q.processAllAvailable()
        # one more tick so anything newly closed flushes
        FixtureLog(_lines(500)).write(str(log_dir / "03.log"))
        q.processAllAvailable()

        rows = {str(r["window_start"]): r["n"] for r in spark.sql("SELECT * FROM win_counts").collect()}
        assert rows.get("2024-05-01 10:00:00") == 2  # straggler NOT counted
        assert rows.get("2024-05-01 10:01:00") == 1
        assert rows.get("2024-05-01 10:05:00") == 1
    finally:
        q.stop()


def test_windowed_metric_export_to_parquet(spark, tmp_path):
    """Closed windows land in parquet exactly once (append + watermark)."""
    from prometheus_clickhouselog_exporter_spark.streaming.windows import windowed_metric_export

    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog(_lines(5, 20, 90)).write(str(log_dir / "00.log"))
    stream = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(log_dir))
    q = windowed_metric_export(
        parse_log_lines(stream),
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
        window="1 minute",
        watermark="1 minute",
        extra_keys=(),
    )
    try:
        q.processAllAvailable()
        FixtureLog(_lines(300)).write(str(log_dir / "01.log"))
        q.processAllAvailable()
        FixtureLog(_lines(400)).write(str(log_dir / "02.log"))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {str(r["window_start"]): r["n"] for r in spark.read.parquet(str(tmp_path / "metrics")).collect()}
    assert rows.get("2024-05-01 10:00:00") == 2
    assert rows.get("2024-05-01 10:01:00") == 1
