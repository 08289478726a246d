"""transformWithStateInPandas sessionizer (Spark 4 successor API): must
emit byte-identical rows to the applyInPandasWithState rendering on the
full fidelity corpus (both call the same fold), plus the capabilities the
new API adds — timer-based eviction and batch-bootstrap initial state."""

from __future__ import annotations

import importlib.util
import time
from datetime import datetime, timedelta

import pytest

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("google") is None
    or importlib.util.find_spec("google.protobuf") is None,
    reason="transformWithStateInPandas requires google.protobuf "
    "(stock pyspark dependency, absent in this container)",
)

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.correlate import enrich_parsed
from prometheus_clickhouselog_exporter_spark.operators.parsing import parse_log_lines
from prometheus_clickhouselog_exporter_spark.sources.fixtures import (
    FixtureLog,
    initial_line,
    memory_line,
    standard_corpus,
)
from prometheus_clickhouselog_exporter_spark.streaming.session_state import sessionize_stream
from prometheus_clickhouselog_exporter_spark.streaming.session_tws import sessionize_stream_tws

T = datetime(2024, 6, 1, 8, 0, 0)


def _run_stream(spark, df, tmp_path, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _norm(rows):
    return sorted(
        (tuple(str(v) for v in r) for r in rows),
        key=lambda t: t,
    )


def test_tws_matches_apply_in_pandas_on_corpus(spark, tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog(standard_corpus().lines).write(str(log_dir / "00.log"))
    raw = spark.readStream.format("text").load(str(log_dir))
    enriched = enrich_parsed(parse_log_lines(raw))

    a = _run_stream(spark, sessionize_stream(enriched), tmp_path, "sess_apply")
    b = _run_stream(spark, sessionize_stream_tws(enriched), tmp_path, "sess_tws")
    ra, rb = a.collect(), b.collect()
    assert len(ra) > 0
    assert _norm(ra) == _norm(rb)


def test_tws_timer_evicts_leaked_session(spark, tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    # INSERT session: never completes (query.go:231-233) — only the timer
    # can evict it.
    FixtureLog(
        [initial_line(T, 1, "q-leak", "10.0.0.1", 9000, "INSERT INTO t VALUES (1)")]
    ).write(str(log_dir / "00.log"))
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(log_dir))
    sess = sessionize_stream_tws(enrich_parsed(parse_log_lines(raw)), timeout_ms=1500)
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_timer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = lambda: {  # noqa: E731
            r["row_type"] for r in spark.sql("SELECT row_type FROM tws_timer").collect()
        }
        assert got() == {"obs_initial"}
        # drive further micro-batches past the timer deadline
        deadline = time.time() + 30
        while "timeout_evict" not in got() and time.time() < deadline:
            time.sleep(1.0)
            FixtureLog(
                [initial_line(T + timedelta(seconds=60), 2, "q-tick", "10.0.0.2", 9001, "SELECT 1")]
            ).write(str(log_dir / f"{int(time.time()*1000)}.log"))
            q.processAllAvailable()
        assert "timeout_evict" in got()
        evicted = spark.sql(
            "SELECT * FROM tws_timer WHERE row_type = 'timeout_evict'"
        ).collect()[0]
        assert evicted["id"] == "q-leak" and evicted["stmt_type"] == "insert"
        assert not evicted["full_info"]
    finally:
        q.stop()


def test_tws_initial_state_bootstrap(spark, tmp_path):
    """Batch-backfill handoff: an open session seeded from a batch table
    is closed by a memory line arriving on the stream — elapsed derives
    from the SEEDED start time."""
    seed = spark.createDataFrame(
        [
            (
                "q-seed", "10.0.9.9", 9999, 42, "SELECT seeded", "select",
                int(T.timestamp() * 1_000_000), None, None, None, None, None,
                None, False, None, None,
            )
        ],
        "id string, host string, port bigint, pid bigint, query string, "
        "stmt_type string, start_us bigint, rows_read bigint, bytes_read bigint, "
        "rps bigint, speed bigint, memory bigint, end_us bigint, error boolean, "
        "error_code bigint, error_message string",
    )
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    FixtureLog(
        [memory_line(T + timedelta(seconds=4), 42, "q-seed", "2.00 MiB")]
    ).write(str(log_dir / "00.log"))
    raw = spark.readStream.format("text").load(str(log_dir))
    sess = sessionize_stream_tws(
        enrich_parsed(parse_log_lines(raw)), initial_state=seed
    )
    out = _run_stream(spark, sess, tmp_path, "tws_boot")
    rows = {r["row_type"]: r for r in out.collect()}
    # without the seed this memory line would be not_found_query
    assert "session" in rows, rows
    s = rows["session"]
    assert s["id"] == "q-seed" and s["host"] == "10.0.9.9"
    assert s["memory"] == 2 * 1024 * 1024
    assert s["elapsed"] == 4.0 and s["full_info"]
