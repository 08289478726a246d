"""Unit tests for the round-3 pipeline operators: the pure-expression
Bloom filter's structural guarantees (zero false negatives, scan-side
rejection, bounded bitmap), substring-span coalescing on hand-built
corpora, and quota-cap determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)

M, K = 1 << 16, 3


def _strings(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("s")
    )


def test_bloom_no_false_negatives(spark):
    keys = _strings(spark, "key", 3000)
    bm = bloom_build(keys, F.col("s"), m_bits=M, k=K)
    assert len(bm) == M // 8
    survivors = keys.filter(bloom_might_contain(F.col("s"), bm, M, K))
    assert survivors.count() == 3000


def test_bloom_rejects_most_absent_keys(spark):
    keys = _strings(spark, "key", 2000)
    bm = bloom_build(keys, F.col("s"), m_bits=M, k=K)
    absent = _strings(spark, "other", 2000)
    fp = absent.filter(bloom_might_contain(F.col("s"), bm, M, K)).count()
    # n=2000, m=65536, k=3 → theoretical fpp ≈ 0.06%; allow 100× headroom.
    assert fp < 100


def test_bloom_probe_is_scan_side(spark):
    """The probe predicate must evaluate without any exchange — the whole
    point is that definitely-new rows never shuffle."""
    keys = _strings(spark, "key", 100)
    bm = bloom_build(keys, F.col("s"), m_bits=M, k=K)
    plan = (
        _strings(spark, "probe", 100)
        .filter(bloom_might_contain(F.col("s"), bm, M, K))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bloom_empty_build_rejects_everything(spark):
    empty = _strings(spark, "key", 10).filter(F.lit(False))
    bm = bloom_build(empty, F.col("s"), m_bits=M, k=K)
    assert bm == bytes(M // 8)
    assert _strings(spark, "key", 50).filter(
        bloom_might_contain(F.col("s"), bm, M, K)
    ).count() == 0


def test_packed_lookup_roundtrip(spark):
    """packed_lookup(values, idx) == values[idx] for every index, on a
    table crossing byte-boundary-significant values (0, 1, 2^31, 2^62)."""
    from prometheus_clickhouselog_exporter_spark.operators.lookup import packed_lookup

    vals = [0, 1, 255, 256, 2**31, 2**62, 7, 0, 123456789]
    df = spark.range(len(vals)).select(F.col("id").cast("int").alias("i"))
    got = {
        r["i"]: r["v"]
        for r in df.select("i", packed_lookup(vals, F.col("i")).alias("v")).collect()
    }
    assert got == {i: v for i, v in enumerate(vals)}


@pytest.fixture(scope="module")
def span_docs(spark):
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token shared span
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(20))),
        (2, " ".join(f"b{i}" for i in range(5)) + " " + shared),
        (3, " ".join(f"c{i}" for i in range(30))),  # unique doc
        (4, " ".join(f"d{i}" for i in range(6))),  # shorter than k
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_substring_spans_hand_corpus(spark, span_docs, tmp_path, monkeypatch):
    import prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops2 as po

    path = str(tmp_path / "documents.parquet")
    span_docs.write.mode("overwrite").parquet(path)
    out = {
        r["doc_id"]: r
        for r in po.dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    # Only docs 1 and 2 contain duplicated material.
    assert set(out) == {1, 2}
    for doc_id in (1, 2):
        r = out[doc_id]
        # A 12-token duplicated span ⇒ 12−8+1 = 5 duplicated 8-grams,
        # coalescing into ONE island covering exactly 12 tokens.
        assert r["n_dup_grams"] == 5
        assert r["n_spans"] == 1
        assert r["dup_tokens"] == 12
    # dup_ratio is fround(·, 6) ⇒ within 5e-7 of the true ratio.
    assert abs(out[1]["dup_ratio"] - 12 / 32) <= 5e-7
    assert abs(out[2]["dup_ratio"] - 12 / 17) <= 5e-7


def test_substring_spans_disjoint_islands(spark, tmp_path):
    import prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops2 as po

    spanA = " ".join(f"x{i}" for i in range(8))
    spanB = " ".join(f"y{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(10))
    rows = [
        (1, spanA + " " + gap + " " + spanB),
        (2, spanA + " " + " ".join(f"p{i}" for i in range(9))),
        (3, spanB + " " + " ".join(f"q{i}" for i in range(9))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in po.dedup_substring_spans(spark, str(tmp_path)).collect()}
    # Doc 1 carries BOTH duplicated spans, separated by a >k gap ⇒ 2 islands.
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 16


def test_source_quota_deterministic_under_partitioning(spark):
    import prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops2 as po

    a = po.sample_source_quota(spark, "/root/testdata/sf0.001").collect()
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert all(r["n_kept"] <= 10 for r in a)
    # Re-derive from a radically different partitioning — identical result.
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.md5(F.col("text")), F.col("doc_id"))
    )
    b = (
        base.repartition(17)
        .select("source", "doc_id", rk.alias("rk"))
        .filter(F.col("rk") <= 10)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_checksum"))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_substring_spans_plan_shape(spark):
    """One exchange per logical need and no more: round-robin fan-out,
    ONE hash exchange on the gram hash (count window), ONE on doc_id —
    under which Catalyst stacks the lag window, the running-sum window
    AND both aggregations — and a broadcast (never sort-merge) join for
    the per-doc token counts."""
    import re

    import prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops2 as po

    plan = (
        po.dedup_substring_spans(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    keys = [m.group(1) for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan)]
    assert sorted(keys) == ["doc_id", "gh"], keys
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_curation_end2end_plan_shape(spark):
    """The composed pipeline costs exactly the union of its stages'
    shuffles: text-window exchange (exact dedup), source-window exchange
    (quota, with WindowGroupLimit pushdown), lang agg exchange. The gate
    and the mixture sample are scan-stage predicates — no exchange of
    their own."""
    import re

    import prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops2 as po

    plan = (
        po.curation_manifest_end2end(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    keys = sorted(
        m.group(1) for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan)
    )
    assert keys == ["lang", "source", "text"], keys
    assert "WindowGroupLimit" in plan


def test_source_quota_plan_uses_window_group_limit(spark):
    import prometheus_clickhouselog_exporter_spark.workloads.pipeline_ops2 as po

    plan = (
        po.sample_source_quota(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
