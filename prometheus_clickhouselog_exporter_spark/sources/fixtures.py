"""Deterministic ClickHouse-log fixture generator for fidelity tests.

Emits lines in the four shapes the reference parses (query.go:15-18), plus
the scenario corpus SURVEY.md §5 requires: duplicate initial IDs, orphan
stats/memory/error lines, malformed numerics, INSERT sessions, noise lines,
every byte unit. Timestamps use the reference's layout (query.go:110:
``2006.01.02 15:04:05.999999`` → ``yyyy.MM.dd HH:mm:ss.SSSSSS``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta


def _dt(ts: datetime) -> str:
    return ts.strftime("%Y.%m.%d %H:%M:%S.%f")


def initial_line(ts: datetime, pid: int, qid: str, host: str, port: int, sql: str) -> str:
    return f"{_dt(ts)} [ {pid} ] {{{qid}}} <Debug> executeQuery: (from {host}:{port}) {sql}"


def stats_line(
    ts: datetime, pid: int, qid: str, rows: int, bytes_h: str, elapsed: float, rps: int, speed_h: str
) -> str:
    return (
        f"{_dt(ts)} [ {pid} ] {{{qid}}} <Information> executeQuery: "
        f"Read {rows} rows, {bytes_h} in {elapsed:.3f} sec., {rps} rows/sec., {speed_h}/sec."
    )


def memory_line(ts: datetime, pid: int, qid: str, bytes_h: str) -> str:
    return f"{_dt(ts)} [ {pid} ] {{{qid}}} <Debug> MemoryTracker: Peak memory usage (for query): {bytes_h}."


def error_line(ts: datetime, pid: int, qid: str, code: int, message: str) -> str:
    return f"{_dt(ts)} [ {pid} ] {{{qid}}} <Error> executeQuery: Code: {code}, e.displayText() = {message}"


@dataclass
class FixtureLog:
    lines: list[str] = field(default_factory=list)

    def write(self, path: str) -> str:
        with open(path, "w") as f:
            f.write("\n".join(self.lines) + "\n")
        return path


T0 = datetime(2024, 1, 1, 12, 0, 0)


def standard_corpus() -> FixtureLog:
    """The canonical fidelity corpus. Hand-computable goldens live in tests."""
    log = FixtureLog()
    add = log.lines.append

    # --- happy path, one query per statement class (query.go:276-289) ---
    sqls = [
        ("q-sel", "SELECT count() FROM hits", "select"),
        ("q-ins", "INSERT INTO hits VALUES (1)", "insert"),
        ("q-upd", "UPDATE hits SET a = 1", "update"),
        ("q-del", "DELETE FROM hits WHERE a = 1", "delete"),
        ("q-oth", "OPTIMIZE TABLE hits", "other"),
        ("q-cmt", "/* lead comment */ select 1", "select"),
        ("q-uni", "  (SELECT 1) UNION (SELECT 2)", "select"),  # "(" stripped by Preview
    ]
    for i, (qid, sql, _label) in enumerate(sqls):
        t = T0 + timedelta(seconds=10 * i)
        add(initial_line(t, 100 + i, qid, f"10.0.0.{i + 1}", 35000 + i, sql))
        add(stats_line(t + timedelta(seconds=1, milliseconds=200), 100 + i, qid, 1_000_000 * (i + 1), "7.63 MiB", 1.2, 833_333, "6.36 MiB"))
        add(memory_line(t + timedelta(seconds=1, milliseconds=500), 100 + i, qid, "24.00 MiB"))

    # --- error query: initial + error (no memory → session stays open) ---
    t = T0 + timedelta(minutes=5)
    add(initial_line(t, 200, "q-err", "10.0.1.1", 40000, "SELECT * FROM missing"))
    add(error_line(t + timedelta(milliseconds=400), 200, "q-err", 60, "DB::Exception: Table default.missing doesn't exist."))

    # --- error then memory: closes with Error=true ---
    t = T0 + timedelta(minutes=6)
    add(initial_line(t, 201, "q-errmem", "10.0.1.2", 40001, "SELECT broken FROM hits"))
    add(error_line(t + timedelta(milliseconds=100), 201, "q-errmem", 47, "DB::Exception: Unknown identifier: broken."))
    add(memory_line(t + timedelta(milliseconds=200), 201, "q-errmem", "1.00 KiB"))

    # --- duplicate initial id: first record wins (query.go:91-95) ---
    t = T0 + timedelta(minutes=7)
    add(initial_line(t, 300, "q-dup", "10.0.2.1", 41000, "SELECT 1"))
    add(initial_line(t + timedelta(seconds=1), 301, "q-dup", "10.0.2.2", 41001, "SELECT 2"))
    add(memory_line(t + timedelta(seconds=2), 300, "q-dup", "2.00 MiB"))

    # --- orphans: stats/memory/error for never-seen ids (query.go:190,237,270) ---
    t = T0 + timedelta(minutes=8)
    add(stats_line(t, 400, "q-orphan-stats", 5, "1.00 KiB", 0.1, 50, "10.00 KiB"))
    add(memory_line(t + timedelta(seconds=1), 400, "q-orphan-mem", "1.00 MiB"))
    add(error_line(t + timedelta(seconds=2), 400, "q-orphan-err", 62, "DB::Exception: Syntax error"))

    # --- malformed numerics → convert errors (query.go:96-116, 150-176) ---
    t = T0 + timedelta(minutes=9)
    add(initial_line(t, 500, "q-badstats", "10.0.3.1", 42000, "SELECT bad FROM hits"))
    # bytes field with an unparseable unit
    add(stats_line(t + timedelta(seconds=1), 500, "q-badstats", 10, "7.63 XiQ", 1.0, 10, "1.00 MiB"))

    # --- byte units sweep (bytefmt is 1024-based, query.go:150-162) ---
    units = [("1023 B", 1023), ("1.00 KiB", 1024), ("1.00 MiB", 1048576), ("2.50 GiB", 2684354560), ("1.00 TiB", 1099511627776)]
    for i, (h, _b) in enumerate(units):
        qid = f"q-unit-{i}"
        t = T0 + timedelta(minutes=10, seconds=20 * i)
        add(initial_line(t, 600 + i, qid, "10.0.4.1", 43000 + i, f"SELECT {i}"))
        add(stats_line(t + timedelta(seconds=1), 600 + i, qid, 100, h, 1.0, 100, h))
        add(memory_line(t + timedelta(seconds=2), 600 + i, qid, h))

    # --- noise: dropped by the Debug|Information|Error gate (query.go:49-51) ---
    add("2024.01.01 12:20:00.000000 [ 1 ] {} <Trace> Aggregator: Merging aggregated data")
    add("totally unrelated line")
    # passes the coarse gate but matches no regex → dropped silently
    add("2024.01.01 12:20:01.000000 [ 1 ] {} <Debug> SomethingElse: not a query line")
    return log
