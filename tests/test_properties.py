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


# --- log-line grammar round-trip (ROADMAP #7) -------------------------------

from datetime import datetime, timedelta

from prometheus_clickhouselog_exporter_spark.operators.parsing import parse_log_lines
from prometheus_clickhouselog_exporter_spark.sources import fixtures as FX

line_cases = st.tuples(
    st.integers(min_value=0, max_value=10**6 - 1),   # microsecond fraction
    st.integers(min_value=1, max_value=99999),        # pid
    st.text(alphabet="abcdef0123456789-", min_size=1, max_size=24),  # qid
    st.tuples(*[st.integers(0, 255)] * 4),            # host octets
    st.integers(min_value=1, max_value=65535),        # port
    st.sampled_from(["SELECT 1", "INSERT INTO t VALUES (1)", "SELECT a FROM b WHERE c = 'x:y){}'"]),
    st.integers(min_value=0, max_value=10**9),        # rows
    st.integers(min_value=1, max_value=9999),         # code
)


@settings(max_examples=8, deadline=None)
@given(st.lists(line_cases, min_size=1, max_size=25))
def test_log_grammar_roundtrip_property(spark, cases):
    base = datetime(2024, 6, 1, 8, 0, 0)
    rows = []
    for i, (us, pid, qid, host_t, port, sql, nrows, code) in enumerate(cases):
        ts = base + timedelta(seconds=i, microseconds=us)
        host = ".".join(map(str, host_t))
        qid = f"{qid}-{i}"  # unique per case
        rows.append((FX.initial_line(ts, pid, qid, host, port, sql),
                     "initial", ts, pid, qid, host, port, sql, None, None))
        rows.append((FX.stats_line(ts, pid, qid, nrows, "1.00 MiB", 1.0, 10, "1.00 KiB"),
                     "stats", ts, pid, qid, None, None, None, nrows, None))
        rows.append((FX.error_line(ts, pid, qid, code, "DB::Exception: boom"),
                     "error", ts, pid, qid, None, None, None, None, code))
        rows.append((FX.memory_line(ts, pid, qid, "2.00 MiB"),
                     "memory", ts, pid, qid, None, None, None, None, None))
    df = spark.createDataFrame(
        rows,
        "value string, e_kind string, e_ts timestamp, e_pid long, e_id string, "
        "e_host string, e_port long, e_query string, e_rows long, e_code long",
    )
    parsed = parse_log_lines(df)
    bad = parsed.filter(
        (F.col("event_kind") != F.col("e_kind"))
        | (F.col("ts") != F.col("e_ts"))
        | (F.col("pid") != F.col("e_pid"))
        | (F.col("id") != F.col("e_id"))
        | F.col("convert_error")
        | ((F.col("event_kind") == "initial")
           & ((F.col("host") != F.col("e_host")) | (F.col("port") != F.col("e_port"))
              | (F.col("query") != F.col("e_query"))))
        | ((F.col("event_kind") == "stats") & (F.col("rows_read") != F.col("e_rows")))
        | ((F.col("event_kind") == "error") & (F.col("error_code") != F.col("e_code")))
    ).collect()
    assert not bad, bad[:3]
    assert parsed.count() == len(rows)  # every generated line matched its shape
