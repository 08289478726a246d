"""Relational breadth, round 6 batch 4: the Spark 4 DataFrame-API
subquery surface — ``DataFrame.lateralJoin`` (correlated lateral join
without SQL text), ``DataFrame.transpose`` (rows↔columns pivot of a
bounded report), and ``DataFrame.scalar()``/``.exists()`` (scalar and
EXISTS subqueries as first-class DF expressions).

The SQL-text forms of all three semantics are already certified
(lateral_topk_customers_per_nation, pivot_status_by_priority, the
subquery battery); these entries certify the NEW Spark 4 DF-API
bindings produce identical results — the API a PySpark-native codebase
actually calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import fround, money, query, table


@query(
    "lateral_join_df_api",
    oracle="""
    SELECT n_name, c_custkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM (
      SELECT n.n_name, c.c_custkey, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_nationkey
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rk
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    )
    WHERE rk <= 2
    ORDER BY n_name, c_acctbal DESC, c_custkey
    """,
)
def lateral_join_df_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance per nation through
    ``DataFrame.lateralJoin`` — the correlated per-row subquery (LATERAL)
    expressed entirely in the DataFrame API via ``.outer()`` column
    references, no SQL text. Catalyst decorrelates the limit-2 subquery
    into the same WindowGroupLimit plan the SQL LATERAL form gets
    (lateral_topk_customers_per_nation is the SQL twin; this certifies
    the new API binding reaches the same rows).

    100 TB: decorrelation means NO per-outer-row re-execution — one
    shuffle by the correlation key with the group-limit pushed below
    it."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    top2 = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return (
        n.lateralJoin(top2)
        .select(
            "n_name",
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy("n_name", F.desc("c_acctbal"), "c_custkey")
    )


@query(
    "transpose_region_metrics",
    oracle="""
    WITH agg AS (
      SELECT r_name,
             CAST(count(*) AS DOUBLE) AS n_nations,
             CAST(sum(n_nationkey) AS DOUBLE) / count(*) AS avg_key
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    )
    SELECT 'avg_key' AS key,
           max(CASE WHEN r_name = 'AFRICA' THEN avg_key END) AS "AFRICA",
           max(CASE WHEN r_name = 'AMERICA' THEN avg_key END) AS "AMERICA",
           max(CASE WHEN r_name = 'ASIA' THEN avg_key END) AS "ASIA",
           max(CASE WHEN r_name = 'EUROPE' THEN avg_key END) AS "EUROPE",
           max(CASE WHEN r_name = 'MIDDLE EAST' THEN avg_key END)
             AS "MIDDLE EAST"
    FROM agg
    UNION ALL
    SELECT 'n_nations',
           max(CASE WHEN r_name = 'AFRICA' THEN n_nations END),
           max(CASE WHEN r_name = 'AMERICA' THEN n_nations END),
           max(CASE WHEN r_name = 'ASIA' THEN n_nations END),
           max(CASE WHEN r_name = 'EUROPE' THEN n_nations END),
           max(CASE WHEN r_name = 'MIDDLE EAST' THEN n_nations END)
    FROM agg
    ORDER BY key
    """,
)
def transpose_region_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A per-region metrics report flipped metrics-as-rows via
    ``DataFrame.transpose()`` (Spark 4): the first column becomes the
    new header row, remaining columns become rows keyed by the original
    column name — the report-orientation pivot analysts do by hand with
    N case-when aggregates (which is exactly how the oracle mirrors it).
    Only ever applied to BOUNDED aggregate outputs (here 5×3): transpose
    materializes the frame to derive column names, so corpus-scale
    inputs are out of contract by design."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    agg = (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_nations"),
            (F.sum("n_nationkey").cast("double") / F.count(F.lit(1))).alias(
                "avg_key"
            ),
        )
    )
    return agg.transpose().orderBy("key")


@query(
    "subquery_df_api_scalar_exists",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rich_active
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1 ORDER BY 1
    """,
)
def subquery_df_api_scalar_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + EXISTS subqueries as DataFrame-API expressions
    (``df.scalar()`` / ``df.exists()``, Spark 4): customers above the
    global average balance that have at least one order, counted per
    market segment. The SQL-text twins are certified in the subquery
    battery (relational2/relational7); this pins the API binding:
    ``.scalar()`` plans the same single-row broadcast, ``.exists()``
    the same left-semi join — no correlated re-execution at any
    scale."""
    # checkpoint-once: the scalar-average subquery and the main filter
    # both read customer; without the cut the scan runs 3x (plan audit)
    c = table(spark, sf_dir, "customer").localCheckpoint(eager=False)
    o = table(spark, sf_dir, "orders")
    avg_bal = c.select(F.avg(money(F.col("c_acctbal")).cast("double")))
    cond_exists = o.where(
        F.col("o_custkey") == F.col("c_custkey").outer()
    ).exists()
    return (
        c.where(
            (money(F.col("c_acctbal")).cast("double") > avg_bal.scalar())
            & cond_exists
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rich_active"))
        .orderBy("c_mktsegment")
    )


@query(
    "udf_arrow_native_surface",
    oracle="""
    SELECT event_id,
           floor((value * value + value * 3.0) * 1e6 + 0.5) / 1e6 AS poly,
           upper(event_type) AS type_upper
    FROM events
    WHERE value IS NOT NULL AND event_id % 25 = 0
    ORDER BY event_id
    """,
)
def udf_arrow_native_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4.1 Arrow-NATIVE UDF surface (``@F.arrow_udf``):
    kernels receive and return ``pyarrow.Array`` directly — one step
    below pandas UDFs (no Series materialization, zero-copy into
    pyarrow.compute's vectorized C++ kernels). Certified here with a
    numeric kernel (v² + 3v, element-wise IEEE ops the oracle mirrors
    literally — no reduction, so bit-identical cross-engine) and a
    string kernel (utf8_upper). Completes the UDF ladder: row Python →
    pandas_udf (Arrow transport, pandas compute) → arrow_udf (Arrow
    transport AND compute) → built-ins (JVM codegen).

    100 TB: still the slow path vs codegen expressions — but the
    cheapest possible Python escape hatch; scan-stage, no shuffle."""
    import pyarrow.compute as pc

    @F.arrow_udf("double")
    def poly(v):
        return pc.add(pc.multiply(v, v), pc.multiply(v, 3.0))

    @F.arrow_udf("string")
    def upper(s):
        return pc.utf8_upper(s)

    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("event_id") % 25 == 0)
    )
    return e.select(
        "event_id",
        fround(poly("value"), 6).alias("poly"),
        upper("event_type").alias("type_upper"),
    ).orderBy("event_id")
