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


@query(
    "map_in_arrow_surface",
    oracle="""
    SELECT event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           length(event_type) AS type_len
    FROM events
    WHERE value IS NOT NULL AND event_id % 40 = 0
    ORDER BY event_id
    """,
)
def map_in_arrow_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.mapInArrow`` — the whole-partition Arrow transform
    (iterator of pyarrow.RecordBatch in, iterator out): quantize values
    to integer cents and measure the type string, per batch, zero
    pandas materialization. The row-wise kernels are IEEE/integer ops
    the oracle mirrors literally. Distinct from @arrow_udf (column
    kernel): mapInArrow owns the whole batch — the shape for
    multi-column restructuring and schema-changing transforms.

    100 TB: scan-stage, no shuffle; batches stream through Python one
    Arrow buffer at a time — memory bounded by
    maxRecordsPerBatch, not partition size."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            vals = b.column("value")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("event_id"),
                    pc.cast(
                        pc.floor(pc.add(pc.multiply(vals, 100.0), 0.5)),
                        pa.int64(),
                    ),
                    pc.cast(
                        pc.utf8_length(b.column("event_type")), pa.int32()
                    ),
                ],
                names=["event_id", "cents", "type_len"],
            )

    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("event_id") % 40 == 0)
    )
    return (
        e.select("event_id", "value", "event_type")
        .mapInArrow(kernel, "event_id bigint, cents bigint, type_len int")
        .orderBy("event_id")
    )


@query(
    "apply_in_arrow_groups",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM events WHERE value IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def apply_in_arrow_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GroupedData.applyInArrow`` — grouped-map over pyarrow.Tables
    (the Arrow-native sibling of applyInPandas): per event type, an
    integer-cents aggregate computed inside the Python kernel with
    pyarrow.compute and returned as a one-row Table. Integer sums make
    the kernel's fold order irrelevant — the certified-exact discipline
    applied to the grouped-Arrow API.

    100 TB: one shuffle by the group key; each group streams into
    Python as Arrow buffers. For plain aggregates the JVM built-ins win
    (no Python hop) — the API exists for group-shaped logic
    expressions can't write (per-group model fits, custom folds); this
    certifies its plumbing with an expressible kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(tbl: "pa.Table") -> "pa.Table":
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(tbl.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": [tbl.column("event_type")[0].as_py()],
                "n": [tbl.num_rows],
                "total_cents": [pc.sum(cents).as_py()],
                "max_cents": [pc.max(cents).as_py()],
            },
            schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n", pa.int64()),
                    ("total_cents", pa.int64()),
                    ("max_cents", pa.int64()),
                ]
            ),
        )

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.select("event_type", "value")
        .groupBy("event_type")
        .applyInArrow(
            kernel,
            "event_type string, n bigint, total_cents bigint, max_cents bigint",
        )
        .orderBy("event_type")
    )
