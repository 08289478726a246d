"""Relational breadth, round 6 batch 5: modern SQL-surface forms —
the SQL:2016 window frame EXCLUDE semantics (Spark's parser lacks the
clause, so its standard composition is certified against DuckDB's real
EXCLUDE), GROUP BY ALL / ORDER BY ALL sugar with LIMIT ... OFFSET
pagination, parameterized SQL (named markers through
``spark.sql(query, args=...)``), the Spark 4.0 GoogleSQL pipe dialect
(`|>`), and UTF8_LCASE collation grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import query, table


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    vname = f"_r30_{name}"
    table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@query(
    "window_frame_exclude",
    oracle="""
    WITH q AS (
      SELECT event_id, event_type, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_id,
           CAST(sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                        EXCLUDE CURRENT ROW) AS BIGINT) AS neighbor_sum,
           CAST(count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                        EXCLUDE CURRENT ROW) AS BIGINT) AS neighbor_n
    FROM q
    WHERE event_id % 50 = 0
    ORDER BY event_id
    """,
)
def window_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2016 window frame EXCLUDE CURRENT ROW semantics — the
    leave-one-out neighborhood baseline an anomaly screen compares each
    point against. Spark's parser does NOT accept the EXCLUDE clause
    (probed live: PARSE_SYNTAX_ERROR), so this entry certifies the
    standard COMPOSITION — full ±2-row frame sum minus the row's own
    value, count minus one — against DuckDB's REAL `EXCLUDE CURRENT
    ROW` implementation: a hash match proves the rewrite is exactly the
    missing surface, which is the recipe a user migrating EXCLUDE
    queries onto Spark needs — including the empty-frame corner: real
    EXCLUDE yields NULL (not 0) when the current row is its whole
    frame, so the composition guards the subtraction with the frame
    count. Integer-quantized values keep the sums exact; rows with NULL
    value are filtered before the window on both sides, so v is never
    NULL and the subtraction is safe.

    100 TB: identical cost to the plain frame — one hash partition by
    type + in-partition sort; the subtraction is free."""
    ev = _view(spark, sf_dir, "events")
    return spark.sql(f"""
      WITH q AS (
        SELECT event_id, event_type, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM {ev} WHERE value IS NOT NULL
      )
      SELECT event_id,
             -- empty-frame parity: real EXCLUDE yields NULL (not 0)
             -- when the current row is the whole frame
             CASE WHEN count(*) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) > 1
                  THEN sum(v) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) - v
             END AS neighbor_sum,
             count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) - 1
               AS neighbor_n
      FROM q
      WHERE event_id % 50 = 0
      ORDER BY event_id
    """)


@query(
    "sql_sugar_by_all_offset",
    oracle="""
    SELECT event_type, CAST(day(ts) AS BIGINT) AS dom,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE ts IS NOT NULL
    GROUP BY ALL
    ORDER BY ALL
    LIMIT 12 OFFSET 5
    """,
)
def sql_sugar_by_all_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL + LIMIT/OFFSET pagination in one
    statement — the modern analyst sugar both engines now parse
    identically (BY ALL binds every non-aggregate select item; ORDER BY
    ALL orders by every output column left-to-right, making the OFFSET
    page deterministic without naming columns twice).

    100 TB: OFFSET on a sorted result is a driver-side skip over the
    TakeOrdered result — fine for pagination-sized offsets, a
    deliberate anti-pattern for deep scans (keyset pagination is the
    scale path; this certifies the surface)."""
    ev = _view(spark, sf_dir, "events")
    return spark.sql(f"""
      SELECT event_type, CAST(day(ts) AS BIGINT) AS dom,
             CAST(count(*) AS BIGINT) AS n
      FROM {ev} WHERE ts IS NOT NULL
      GROUP BY ALL
      ORDER BY ALL
      LIMIT 12 OFFSET 5
    """)


@query(
    "sql_named_parameters",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS total
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value >= 50.0
    GROUP BY 1 ORDER BY 1
    """,
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named markers (``spark.sql(q, args={...})``,
    Spark 3.4+): the literals arrive as BOUND PARAMETERS, not string
    splices — the injection-safe entry point a production query service
    exposes. Catalyst folds the bound constants before optimization, so
    parameter markers cost nothing at plan time and the filter still
    pushes to the scan. The oracle inlines the same constants."""
    ev = _view(spark, sf_dir, "events")
    return spark.sql(
        f"""
        SELECT event_type,
               count(*) AS n,
               floor(sum(value) * 100 + 0.5) / 100 AS total
        FROM {ev}
        WHERE event_type IN (:t1, :t2) AND value >= :floor_val
        GROUP BY 1 ORDER BY 1
        """,
        args={"t1": "click", "t2": "purchase", "floor_val": 50.0},
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS total,
           floor(CAST(floor(sum(value) * 100 + 0.5) / 100 AS DOUBLE)
                 / count(*) * 1e4 + 0.5) / 1e4 AS per_event
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 4
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, the GoogleSQL `|>` operator chain):
    the same logical pipeline an analyst reads top-to-bottom — FROM →
    WHERE → AGGREGATE → EXTEND (computed column over the aggregate) →
    ORDER BY → LIMIT — parsed by Spark's pipe dialect and certified
    against the classic nested-SELECT oracle. Pipe stages compile to
    the identical Catalyst plan (the parser is sugar), so this is a
    pure surface certification: same rows, same values, same types.
    """
    ev = _view(spark, sf_dir, "events")
    return spark.sql(f"""
      FROM {ev}
      |> WHERE value IS NOT NULL
      |> AGGREGATE count(*) AS n,
                   floor(sum(value) * 100 + 0.5) / 100 AS total
         GROUP BY event_type
      |> EXTEND floor(CAST(total AS DOUBLE) / n * 1e4 + 0.5) / 1e4
           AS per_event
      |> SELECT event_type, n, total, per_event
      |> ORDER BY n DESC, event_type
      |> LIMIT 4
    """)


@query(
    "collation_case_insensitive",
    oracle="""
    WITH q AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS mk
      FROM events
    )
    SELECT lower(min(mk)) AS k, CAST(count(*) AS BIGINT) AS n
    FROM q GROUP BY lower(mk) ORDER BY k
    """,
)
def collation_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4.0): grouping under UTF8_LCASE —
    case-insensitive equality WITHOUT rewriting the data through
    lower() — over a synthesized mixed-case key (every even event_id
    upper-cased). The oracle mirrors the semantics with lower()
    grouping; both sides take min() under BINARY comparison so the
    representative value is deterministic ('CLICK' < 'click'). The
    production win collations buy at 100 TB: comparison semantics move
    into the COLUMN TYPE, so joins/groupBys/sorts stay case-insensitive
    with zero per-row rewrite cost and full pushdown."""
    ev = _view(spark, sf_dir, "events")
    return spark.sql(f"""
      WITH q AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                    ELSE event_type END AS mk
        FROM {ev}
      )
      SELECT lower(min(mk COLLATE UTF8_BINARY)) AS k, count(*) AS n
      FROM q GROUP BY mk COLLATE UTF8_LCASE ORDER BY k
    """)


@query(
    "sql_session_variables",
    oracle="""
    WITH thr AS (
      SELECT CAST(floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                              AS DOUBLE) / count(*)) AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_above
    FROM events, thr
    WHERE value IS NOT NULL
      AND CAST(floor(value * 100 + 0.5) AS BIGINT) > thr.t
    GROUP BY event_type ORDER BY event_type
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4: DECLARE VARIABLE / SET VAR): a
    threshold computed by one statement into a typed session variable,
    then referenced by name in a second — the multi-statement scripting
    shape (parameter tables, config-driven filters) SQL-only users
    previously needed temp views for. The threshold is the FLOOR of the
    integer-cents mean — exact in both engines, where a raw float avg
    would differ in the last ulp by reduction order and could flip a
    count on a knife-edge value. The variable materializes the
    scalar ONCE at SET time (not per reference), so the consuming query
    plans it as a folded literal; the oracle expresses the same
    two-phase semantics as a scalar CTE.

    100 TB: SET VAR runs the aggregate as its own job; the main query
    then gets a constant predicate — pushdown-friendly in a way a
    correlated scalar subquery only becomes after decorrelation."""
    ev = _view(spark, sf_dir, "events")
    # integer-cents mean floor: exact in both engines (the float-avg
    # form would hang the certified counts on an engine-fold-order ulp)
    spark.sql("DECLARE OR REPLACE VARIABLE _r30_thr BIGINT DEFAULT 0")
    spark.sql(
        f"SET VAR _r30_thr = (SELECT CAST(floor(CAST(sum(CAST(floor("
        f"value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT) "
        f"FROM {ev} WHERE value IS NOT NULL)"
    )
    return spark.sql(f"""
      SELECT event_type, count(*) AS n_above
      FROM {ev}
      WHERE value IS NOT NULL
        AND CAST(floor(value * 100 + 0.5) AS BIGINT) > _r30_thr
      GROUP BY event_type ORDER BY event_type
    """)


@query(
    "join_hints_battery",
    oracle="""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_custs,
             floor(sum(o.o_totalprice) * 100 + 0.5) / 100 AS total
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
    )
    SELECT s.strategy, a.n_orders, a.n_custs, a.total
    FROM agg a, (SELECT unnest(['broadcast', 'merge', 'shuffle_hash'])
                 AS strategy) s
    ORDER BY s.strategy
    """,
)
def join_hints_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join strategy hints, plan-asserted: the SAME customer⋈orders
    aggregate executed three times under /*+ BROADCAST */,
    /*+ SHUFFLE_HASH */ and /*+ MERGE */ — each run's physical plan is
    checked for the corresponding node (BroadcastHashJoin /
    ShuffledHashJoin / SortMergeJoin; a silently ignored hint fails
    loudly) — and all three must hash-identical against one oracle
    aggregate. This certifies both halves of the optimizer contract:
    hints CONTROL the physical strategy, and the strategy NEVER changes
    the answer.

    100 TB: the decision these hints override is the one that matters
    most at scale — broadcast beats shuffle while the dim fits, degrades
    catastrophically past it; shuffled-hash beats sort-merge when one
    side is much smaller than the other but too big to broadcast.

    plan_audit's rescan x3 flag here is SEMANTICALLY IRREDUCIBLE: the
    battery's purpose is three independent physical plans over the same
    scans — checkpointing the inputs would collapse the very strategies
    under test (a checkpointed side can't be broadcast-planned from the
    hint's perspective the same way)."""
    o = _view(spark, sf_dir, "orders")
    c = _view(spark, sf_dir, "customer")
    parts = []
    for hint, node in [
        ("BROADCAST(c)", "BroadcastHashJoin"),
        ("MERGE(c)", "SortMergeJoin"),
        ("SHUFFLE_HASH(c)", "ShuffledHashJoin"),
    ]:
        df = spark.sql(f"""
          SELECT /*+ {hint} */
                 count(*) AS n_orders,
                 count(DISTINCT o.o_custkey) AS n_custs,
                 floor(sum(o.o_totalprice) * 100 + 0.5) / 100 AS total
          FROM {o} o JOIN {c} c ON c.c_custkey = o.o_custkey
          WHERE c.c_mktsegment = 'BUILDING'
        """)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if node not in plan:
            raise AssertionError(
                f"join_hints_battery: hint {hint} did not produce {node}:\n"
                + plan[:1500]
            )
        strategy = hint.split("(")[0].lower()
        parts.append(
            df.select(
                F.lit(strategy).alias("strategy"), "n_orders", "n_custs", "total"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("strategy")
