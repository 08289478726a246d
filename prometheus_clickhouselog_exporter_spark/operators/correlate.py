"""Batch lowering of the reference's stateful session correlation (ST1-ST5).

The reference keeps ``map[string]*chQuery`` keyed by query ID, inserted by
the initial line (query.go:91-130), mutated by stats/memory/error lines
(query.go:147-268), evicted on completion (main.go:125-129). The exact
arrival-order semantics live in the streaming path
(``streaming/session_state.py``); this module is the *batch* lowering over a
bounded log, with arrival order approximated by event time (ties broken by
raw line text) — correct whenever the log's timestamps are monotone per
query ID, which ClickHouse guarantees per query.

Semantics preserved exactly (SURVEY §2.1 completion notes):
- first *valid* initial line wins; later initial lines for the same ID count
  as ``duplicated_initial_query`` (dup check precedes cast checks —
  query.go:91-95 — so a malformed later duplicate still counts as duplicate,
  while a malformed initial BEFORE any valid one counts as ``convert`` and
  does not occupy the session);
- stats/memory/error lines with no session at-or-before them count as
  ``not_found_query`` and are not joined (query.go:190, 237, 270);
- cast failures count as ``convert`` (at most one per line, as in the
  reference's first-failure-returns) and skip the line;
- elapsed = memory-line dt − initial dt, NOT the stats line's own elapsed
  field (query.go:226);
- ``full_info`` set by the memory line iff stmt is not INSERT
  (query.go:231-233); error lines never close a session (query.go:253-268).

Known batch deviation (documented, fixed in streaming): after eviction the
reference would treat a RE-USED query ID as a fresh session; batch keeps
one session per ID over the whole input.

Scale shape: ONE shuffle. The session window partitions by ``id``, and the
final ``groupBy("id")`` reuses that hash partitioning, so Catalyst plans a
single exchange. Skewed IDs cannot occur (ClickHouse query IDs are unique);
AQE handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.bytesize import parse_bytes
from ..functions.stmt import classify_statement

_INSERT = "insert"


def enrich_parsed(parsed: DataFrame) -> DataFrame:
    """Stateless enrichment shared by batch and streaming: parsed byte
    quantities (C3) and statement classification (X1). Pure expressions —
    valid on both bounded and streaming DataFrames."""
    k = F.col("event_kind")
    return (
        parsed.withColumn("bytes_read", F.when(k == "stats", parse_bytes(F.col("bytes_raw"))))
        .withColumn("speed", F.when(k == "stats", parse_bytes(F.col("speed_raw"))))
        .withColumn("memory_bytes", F.when(k == "memory", parse_bytes(F.col("memory_raw"))))
        .withColumn("stmt_type", F.when(k == "initial", classify_statement(F.col("query"))))
    )


def annotate_events(parsed: DataFrame) -> DataFrame:
    """Add session context to every parsed event row (one shuffle, by id).

    Adds: ``bytes_read/speed/memory_bytes`` (parsed byte quantities),
    ``session_start_ts``/``session_stmt``/``session_exists``,
    ``is_session_line`` (the winning initial), ``found`` (enrich line has a
    session at-or-before it), ``stats_valid``/``memory_valid``/
    ``error_valid`` (all casts for that code path succeeded), and
    ``err_type`` — the A4 internal-error label for this line
    (duplicated_initial_query | convert | not_found_query | NULL).
    """
    k = F.col("event_kind")
    is_ini = k == "initial"
    df = enrich_parsed(parsed)

    valid_ini = is_ini & ~F.col("convert_error")
    # Arrival-order proxy: (ts, raw_line) lexicographic per id.
    order_key = F.struct(F.col("ts"), F.col("raw_line"))

    w = Window.partitionBy("id")
    session_key = F.min(F.when(valid_ini, order_key)).over(w)
    df = df.withColumn("_session_key", session_key)

    # Broadcast the winning initial's fields to every row of the id via a
    # frame-complete first(ignorenulls) over the same partitioning.
    w_full = (
        Window.partitionBy("id")
        .orderBy(F.when(valid_ini & (order_key == F.col("_session_key")), 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    session_line = valid_ini & (order_key == F.col("_session_key"))
    df = (
        df.withColumn("is_session_line", F.coalesce(session_line, F.lit(False)))
        .withColumn("session_start_ts", F.first(F.when(session_line, F.col("ts")), ignorenulls=True).over(w_full))
        .withColumn("session_stmt", F.first(F.when(session_line, F.col("stmt_type")), ignorenulls=True).over(w_full))
    )
    session_exists = F.col("session_start_ts").isNotNull()

    found = session_exists & (F.col("ts").isNull() | (F.col("ts") >= F.col("session_start_ts")))
    df = df.withColumn("found", F.coalesce(~is_ini & found, F.lit(False)))

    stats_valid = (
        (k == "stats")
        & F.col("found")
        & ~F.col("convert_error")
        & F.col("bytes_read").isNotNull()
        & F.col("speed").isNotNull()
    )
    memory_valid = (k == "memory") & F.col("found") & ~F.col("convert_error") & F.col("memory_bytes").isNotNull()
    error_valid = (k == "error") & F.col("found") & ~F.col("convert_error")
    df = (
        df.withColumn("stats_valid", stats_valid)
        .withColumn("memory_valid", memory_valid)
        .withColumn("error_valid", error_valid)
    )

    # A4 label per line (precedence mirrors each reference code path).
    dup = is_ini & session_exists & ~F.col("is_session_line") & (order_key > F.col("_session_key"))
    err_type = (
        F.when(dup, "duplicated_initial_query")
        .when(is_ini & F.col("convert_error"), "convert")
        .when(~is_ini & ~F.col("found"), "not_found_query")
        .when((k == "stats") & F.col("found") & ~F.col("stats_valid"), "convert")
        .when((k == "memory") & F.col("found") & ~F.col("memory_valid"), "convert")
        .when((k == "error") & F.col("found") & F.col("convert_error"), "convert")
    )
    return df.withColumn("err_type", err_type).drop("_session_key")


def correlate_batch(parsed: DataFrame) -> DataFrame:
    """Parsed events → one correlated session row per query id (the batch
    rendering of the reference's ``chQuery`` record, query.go:25-45).

    Repeated enrich lines follow last-write-wins by event time, matching the
    reference's in-place mutation under monotone arrival.
    """
    ev = annotate_events(parsed)

    ini_ord = F.when(F.col("is_session_line"), F.col("ts"))
    stats_ord = F.when(F.col("stats_valid"), F.col("ts"))
    mem_ord = F.when(F.col("memory_valid"), F.col("ts"))
    err_ord = F.when(F.col("error_valid"), F.col("ts"))

    def pick_first(col: Column, ord_: Column) -> Column:
        return F.min_by(col, ord_)

    def pick_last(col: Column, ord_: Column) -> Column:
        return F.max_by(col, ord_)

    out = (
        ev.groupBy("id")
        .agg(
            pick_first(F.col("host"), ini_ord).alias("host"),
            pick_first(F.col("port"), ini_ord).alias("port"),
            pick_first(F.col("pid"), ini_ord).alias("pid"),
            pick_first(F.col("query"), ini_ord).alias("query"),
            pick_first(F.col("stmt_type"), ini_ord).alias("stmt_type"),
            F.min(F.when(F.col("is_session_line"), F.col("ts"))).alias("start_time"),
            pick_last(F.col("rows_read"), stats_ord).alias("rows_read"),
            pick_last(F.col("bytes_read"), stats_ord).alias("bytes_read"),
            pick_last(F.col("rps"), stats_ord).alias("rps"),
            pick_last(F.col("speed"), stats_ord).alias("speed"),
            pick_last(F.col("memory_bytes"), mem_ord).alias("memory"),
            F.max(F.when(F.col("memory_valid"), F.col("ts"))).alias("end_time"),
            F.max(F.col("error_valid")).alias("error"),
            pick_last(F.col("error_code"), err_ord).alias("error_code"),
            pick_last(F.col("error_message"), err_ord).alias("error_message"),
        )
        .filter(F.col("start_time").isNotNull())
    )
    elapsed = (
        (F.unix_micros(F.col("end_time")) - F.unix_micros(F.col("start_time"))) / 1e6
    )
    return (
        out.withColumn("elapsed", F.when(F.col("end_time").isNotNull(), elapsed))
        .withColumn(
            "full_info",
            F.col("end_time").isNotNull() & (F.col("stmt_type") != _INSERT),
        )
    )


def error_counts(parsed: DataFrame) -> DataFrame:
    """A4: internal-error counter by type (metrics.go:8-14).

    ``tail_line`` (tail read errors, main.go:114) has no Spark analog — the
    file source either reads a line or fails the task — so it never appears.
    """
    return (
        annotate_events(parsed)
        .filter(F.col("err_type").isNotNull())
        .groupBy(F.col("err_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
