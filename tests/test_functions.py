"""Unit tests for the pure-expression helpers (bytefmt parity, sqlparser
Preview parity — query.go:150-162, 276-289)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.functions import classify_statement, parse_bytes

BYTE_CASES = [
    ("1023 B", 1023),
    ("1023B", 1023),
    ("1.00 KiB", 1024),
    ("1.00 KB", 1024),  # bytefmt: KB is 1024-based too
    ("1K", 1024),
    ("7.63 MiB", 8000634),
    ("1.00 MiB", 1048576),
    ("2.50 GiB", 2684354560),
    ("1.00 TiB", 1099511627776),
    ("1.00 PiB", 1125899906842624),
    ("5.09 MiB", 5337251),
    ("  2.00   MiB  ", 2097152),  # whitespace collapsed (query.go:150)
    ("1.5MIB", 1572864),  # bytefmt uppercases its input
    ("1.99 B", 1),  # scaled float truncates (uint64 conversion)
    ("7.63 XiQ", None),  # unknown unit → convert error → NULL
    ("garbage", None),
    ("", None),
]

STMT_CASES = [
    ("SELECT 1", "select"),
    ("  select * from t", "select"),
    ("/* comment */ SELECT 1", "select"),
    ("-- line comment\nSELECT 1", "select"),
    ("/* a */ /* b */  -- c\n  INSERT INTO t VALUES (1)", "insert"),
    ("INSERT INTO t VALUES (1)", "insert"),
    ("UPDATE t SET a=1", "update"),
    ("DELETE FROM t", "delete"),
    ("REPLACE INTO t VALUES (1)", "other"),  # StmtReplace labels as other (query.go:276-289)
    ("OPTIMIZE TABLE t", "other"),
    # sqlparser strips leading non-letters from the first word, so a
    # parenthesized select previews as select.
    ("(SELECT 1) UNION (SELECT 2)", "select"),
    ("SHOW TABLES", "other"),
    ("", "other"),
]


def test_parse_bytes(spark):
    df = spark.createDataFrame([(s,) for s, _ in BYTE_CASES], "s string")
    got = {r["s"]: r["b"] for r in df.select("s", parse_bytes(F.col("s")).alias("b")).collect()}
    for s, want in BYTE_CASES:
        assert got[s] == want, f"{s!r}: got {got[s]}, want {want}"


def test_classify_statement(spark):
    df = spark.createDataFrame([(s,) for s, _ in STMT_CASES], "s string")
    got = {r["s"]: r["t"] for r in df.select("s", classify_statement(F.col("s")).alias("t")).collect()}
    for s, want in STMT_CASES:
        assert got[s] == want, f"{s!r}: got {got[s]}, want {want}"
