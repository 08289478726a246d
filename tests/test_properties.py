"""Property-based spot checks (SURVEY §5.4): byte-size round-trip against
bytefmt arithmetic, and statement classification against an independent
Python reimplementation of sqlparser.Preview — randomized inputs, one Spark
job per hypothesis example (cases are batched into a single DataFrame)."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.functions import classify_statement, parse_bytes

_UNITS = {
    "B": 1, "K": 1024, "KB": 1024, "KiB": 1024,
    "M": 1024**2, "MB": 1024**2, "MiB": 1024**2,
    "G": 1024**3, "GB": 1024**3, "GiB": 1024**3,
    "T": 1024**4, "TB": 1024**4, "TiB": 1024**4,
}


def preview_reference(sql: str) -> str:
    """Independent Python port of sqlparser.Preview + getStmtType
    (query.go:125, 276-289): strip leading comments/whitespace, first
    word, strip leading non-letters, lowercase, map 4 labels."""
    s = sql
    while True:
        s2 = s.lstrip()
        if s2.startswith("--"):
            nl = s2.find("\n")
            s2 = "" if nl < 0 else s2[nl + 1:]
        elif s2.startswith("/*"):
            end = s2.find("*/")
            s2 = "" if end < 0 else s2[end + 2:]
        if s2 == s:
            break
        s = s2
    first = s.split()[0] if s.split() else ""
    first = re.sub(r"^[^A-Za-z]+", "", first).lower()
    return first if first in ("select", "insert", "update", "delete") else "other"


byte_cases = st.tuples(
    st.floats(min_value=0, max_value=9999.99, allow_nan=False, allow_infinity=False),
    st.sampled_from(sorted(_UNITS)),
    st.sampled_from(["", " ", "  "]),
)

sql_cases = st.tuples(
    st.sampled_from(["", "-- c\n", "/* x */ ", "/* a */--b\n  ", "   "]),
    st.sampled_from(
        ["SELECT 1", "select *", "INSERT INTO t", "Update t set", "DELETE from t",
         "REPLACE INTO t", "(SELECT 1)", "OPTIMIZE t", "union all", "42", ""]
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(byte_cases, min_size=1, max_size=40))
def test_byte_roundtrip_property(spark, cases):
    rows = []
    for val, unit, sp in cases:
        v = round(val, 2)
        human = f"{v}{sp}{unit}"
        expect = math.floor(v * _UNITS[unit])
        rows.append((human, expect))
    df = spark.createDataFrame(rows, "human string, expect long")
    bad = df.filter(parse_bytes(F.col("human")) != F.col("expect")).collect()
    assert not bad, bad[:5]


@settings(max_examples=8, deadline=None)
@given(st.lists(sql_cases, min_size=1, max_size=40))
def test_stmt_classify_property(spark, cases):
    rows = [(prefix + sql, preview_reference(prefix + sql)) for prefix, sql in cases]
    df = spark.createDataFrame(rows, "sql string, expect string")
    bad = df.filter(classify_statement(F.col("sql")) != F.col("expect")).collect()
    assert not bad, bad[:5]
