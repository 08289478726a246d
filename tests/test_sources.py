"""Source/format coverage (SURVEY §2.2 scans): CSV / JSON / text round-trip
through the generic reader with explicit schemas, plus approx-aggregate
tolerance (the rows-only driver entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.sources.tables import read_any
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def test_csv_json_roundtrip(spark, tmp_path):
    src = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    src.write.mode("overwrite").option("header", True).csv(csv_dir)
    src.write.mode("overwrite").json(json_dir)

    schema = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    got_csv = read_any(spark, csv_dir, "csv", schema=schema, header=True)
    got_json = read_any(spark, json_dir, "json", schema=schema)

    want = src.orderBy("o_orderkey").collect()
    assert got_csv.orderBy("o_orderkey").collect() == want
    assert got_json.orderBy("o_orderkey").collect() == want


def test_orc_roundtrip(spark, tmp_path):
    src = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orc_dir = str(tmp_path / "orc")
    src.write.mode("overwrite").orc(orc_dir)
    got = read_any(spark, orc_dir, "orc")
    assert got.orderBy("o_orderkey").collect() == src.orderBy("o_orderkey").collect()
    # predicate pushdown reaches the ORC reader too
    filtered = read_any(spark, orc_dir, "orc").filter(F.col("o_orderkey") == 1)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]" in plan


def test_xml_roundtrip(spark, tmp_path):
    """XML via the Spark-4 built-in source (merged spark-xml): write with
    rowTag, read back with an explicit schema through the same generic
    reader every other format uses."""
    src = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    xml_dir = str(tmp_path / "xml")
    src.write.mode("overwrite").format("xml").option("rowTag", "order").save(xml_dir)
    schema = "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    got = read_any(spark, xml_dir, "xml", schema=schema, rowTag="order")
    assert got.orderBy("o_orderkey").collect() == src.orderBy("o_orderkey").collect()


def test_text_scan(spark, fixture_log):
    df = read_any(spark, fixture_log, "text")
    assert df.columns == ["value"]
    assert df.count() == 52


def test_approx_distinct_tolerance(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.relational2 import agg_approx_distinct

    rows = agg_approx_distinct(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["exact_customers"] > 0
        assert r["approx_customers_ok"] is True, r["o_orderstatus"]
        assert r["approx_median_ok"] is True, r["o_orderstatus"]


def test_small_file_compaction(spark, tmp_path):
    """50 tiny appended files compact into the planned file count with
    byte-identical data; plan derives from filesystem metadata only."""
    from prometheus_clickhouselog_exporter_spark.sources.compaction import (
        compact_parquet,
        dir_bytes,
        plan_file_count,
    )

    src_dir = str(tmp_path / "accreted")
    base = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    for i in range(10):  # simulate per-epoch appends
        base.filter(F.col("o_orderkey") % 10 == i).repartition(5).write.mode(
            "append"
        ).parquet(src_dir)
    n_files_before = sum(
        1 for f in __import__("os").listdir(src_dir) if f.endswith(".parquet")
    )
    assert n_files_before >= 50

    out_dir = str(tmp_path / "compacted")
    target = max(1, dir_bytes(src_dir) // 3)  # force ~3-4 output files
    n_out = compact_parquet(spark, src_dir, out_dir, target_file_bytes=target)
    assert n_out == plan_file_count(src_dir, target) <= 4
    n_files_after = sum(
        1 for f in __import__("os").listdir(out_dir) if f.endswith(".parquet")
    )
    assert n_files_after == n_out < n_files_before

    a = spark.read.parquet(src_dir).orderBy("o_orderkey").collect()
    b = spark.read.parquet(out_dir).orderBy("o_orderkey").collect()
    assert a == b


def test_sql_api_over_registered_views(spark):
    """The plain-SQL surface: register_views exposes every synthetic table
    and spark.sql answers match the DataFrame API bit-for-bit."""
    from prometheus_clickhouselog_exporter_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    got = spark.sql(
        """
        SELECT o.o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
        """
    ).collect()
    o, c = table(spark, SF_DIR, "orders"), table(spark, SF_DIR, "customer")
    want = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    assert got == want and len(got) > 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across accreted parquet batches: a later batch
    adds a column; mergeSchema unifies the footer schemas and earlier
    rows surface NULL for the new column — the additive-evolution
    contract an append-only 100 TB lake relies on (reads stay
    footer-metadata-driven; no data rewrite)."""
    p = str(tmp_path / "evolving")
    spark.range(0, 5).selectExpr("id", "id * 2 AS a").write.parquet(p)
    spark.range(5, 8).selectExpr(
        "id", "id * 2 AS a", "CAST(id AS STRING) AS b"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert len(rows) == 8
    assert rows[2] == (4, None)  # old batch: new column is NULL
    assert rows[6] == (12, "6")  # new batch carries it
    # and the evolved column still supports pushdown-style filtering
    assert merged.filter("b IS NOT NULL").count() == 3


def test_parquet_compression_codecs_roundtrip(spark, tmp_path):
    """zstd/snappy/gzip parquet round-trips: same rows back from each
    codec, and the files self-describe their codec (footer metadata) —
    codec choice is a write-side storage knob, invisible to readers.
    At 100 TB the codec picks the scan-CPU vs storage-size tradeoff;
    nothing in the operator library changes."""
    import pyarrow.parquet as pq
    import glob as _glob

    src = spark.range(0, 1000).selectExpr("id", "id * id AS sq", "CAST(id AS STRING) AS s")
    want = 1000
    for codec in ("zstd", "snappy", "gzip"):
        p = str(tmp_path / codec)
        src.write.option("compression", codec).parquet(p)
        back = spark.read.parquet(p)
        assert back.count() == want
        assert back.filter("sq = 81").selectExpr("s").first()[0] == "9"
        f = _glob.glob(p + "/*.parquet")[0]
        meta = pq.ParquetFile(f).metadata.row_group(0).column(0)
        assert meta.compression.lower() == codec


def test_global_sort_via_range_partitioning(spark, tmp_path):
    """The total-order-at-scale recipe: repartitionByRange +
    sortWithinPartitions + parquet write. No single-node global sort —
    each task sorts its own range — yet the FILES form a total order:
    per-file [min, max] ranges must not overlap, so a reader
    concatenating files in range order sees fully sorted data. (This is
    what ORDER BY-writes and Z-order writers do under the hood; the
    zorder manifest op documents the same property for Morton keys.)"""
    import pyarrow.parquet as pq
    import glob as _glob

    p = str(tmp_path / "sorted")
    df = spark.range(0, 20000).selectExpr("pmod(hash(id), 1000000) AS k", "id")
    df.repartitionByRange(8, "k").sortWithinPartitions("k").write.parquet(p)

    spans = []
    for f in _glob.glob(p + "/*.parquet"):
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert t == sorted(t), "rows inside a file must be sorted"
        if t:
            spans.append((t[0], t[-1]))
    spans.sort()
    assert len(spans) >= 4
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file ranges must not overlap"
