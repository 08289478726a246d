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


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    )
)
def test_ewma_closed_form_matches_recurrence(cases):
    """The ewma_user_value closed form
    s_n = Σ_{i≥2} α(1−α)^{n−i} v_i + (1−α)^{n−1} v_1
    must equal the sequential recurrence s_i = α·v_i + (1−α)·s_{i−1} for
    any value sequence (pure-Python check — the algebra is what the Spark
    plan encodes, so a mismatch here is a wrong plan, not a flaky test)."""
    alpha = 0.2
    vals = list(cases)
    s = vals[0]
    for v in vals[1:]:
        s = alpha * v + (1 - alpha) * s
    n = len(vals)
    closed = vals[0] * (1 - alpha) ** (n - 1) + sum(
        alpha * vals[i] * (1 - alpha) ** (n - 1 - i) for i in range(1, n)
    )
    assert math.isclose(s, closed, rel_tol=1e-9, abs_tol=1e-9)


def test_gini_bounds_and_uniform_zero(spark):
    """Gini of a perfectly uniform key distribution is 0; the profile
    always lands in [0, 1)."""
    from prometheus_clickhouselog_exporter_spark.workloads.diagnostics import (
        keyskew_gini_customers,
    )

    row = keyskew_gini_customers(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    assert row["n_rows"] >= row["n_keys"] >= 1
    assert row["max_key_rows"] >= row["n_rows"] // row["n_keys"]

    import pandas as pd

    uniform = spark.createDataFrame(
        pd.DataFrame({"o_custkey": list(range(50)) * 4, "pad": 0})
    )
    uniform.createOrReplaceTempView("uniform_orders")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k = uniform.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    ranked = k.select(
        "n",
        F.row_number().over(Window.orderBy("n", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nk"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    g = ranked.agg(
        (
            2.0 * F.sum(F.col("i").cast("double") * F.col("n"))
            / (F.max("nk") * F.max("tot"))
            - (F.max("nk") + 1).cast("double") / F.max("nk")
        ).alias("gini")
    ).collect()[0]["gini"]
    assert abs(g) < 1e-12


def test_scalar_quantization_error_bound(spark):
    """Per-dimension min-max int8 reconstruction error is bounded by
    (step/2)² with step = range/255 — the audit query's MSE must respect
    the worst-case bound on every label."""
    from pyspark.sql import functions as F

    from prometheus_clickhouselog_exporter_spark.workloads.core import table
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata4 import (
        embedding_scalar_quantization,
    )

    sf = "/root/testdata/sf0.001"
    emb = table(spark, sf, "embeddings")
    dims = emb.select(F.posexplode("embedding").alias("dim", "vf")).select(
        "dim", F.col("vf").cast("double").alias("v")
    )
    worst = (
        dims.groupBy("dim")
        .agg(((F.max("v") - F.min("v")) / 255 / 2).alias("half_step"))
        .agg(F.max(F.col("half_step") * F.col("half_step")).alias("bound"))
        .collect()[0]["bound"]
    )
    for r in embedding_scalar_quantization(spark, sf).collect():
        assert r["mse_x1e9"] / 1e9 <= worst + 1e-12, r
