"""Unit tests for the pipeline operators the oracle exercises only at
corpus level: connected-components corner graphs and the deterministic
sampler's structural guarantees (partition independence, nesting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from prometheus_clickhouselog_exporter_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs_sf001(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def test_cc_chain_merges_transitively(spark):
    # A-B, B-C, C-D: one component although A never pairs with D —
    # diameter 3 forces multiple propagation rounds.
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)])).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_multiple_components_and_reversed_edges(spark):
    labels = {
        r["id"]: r["comp"]
        for r in connected_components(
            _pairs(spark, [(5, 9), (9, 5), (7, 6), (10, 10), (12, 11)])
        ).collect()
    }
    assert labels == {5: 5, 9: 5, 6: 6, 7: 6, 10: 10, 11: 11, 12: 11}


def test_cc_long_chain_needs_iterations(spark):
    # 1-2-3-...-12 linear chain: min label must walk 11 hops.
    n = 12
    edges = [(i, i + 1) for i in range(1, n)]
    labels = connected_components(_pairs(spark, edges))
    assert labels.filter(F.col("comp") == 1).count() == n


def test_cc_star_matches_hash_to_min(spark):
    # chain + clique + singletons-pair mix; both algorithms must agree.
    edges = (
        [(i, i + 1) for i in range(1, 20)]           # 19-chain
        + [(100, 101), (101, 102), (100, 102)]        # triangle
        + [(200, 201)]
        + [(i, i + 1) for i in range(300, 364)]       # 64-chain
    )
    a = {
        (r["id"], r["comp"]) for r in connected_components(_pairs(spark, edges), max_iter=100).collect()
    }
    b = {(r["id"], r["comp"]) for r in connected_components_star(_pairs(spark, edges)).collect()}
    assert a == b
    assert (300, 300) in b and (363, 300) in b  # long chain fully collapsed


def test_cc_star_round_count_logarithmic(spark):
    # The 64-chain must converge in far fewer star rounds than its
    # diameter — exercised implicitly (max_iter=30 default < 63 hops).
    labels = connected_components_star(_pairs(spark, [(i, i + 1) for i in range(1, 65)]))
    assert labels.filter(F.col("comp") == 1).count() == 65  # nodes 1..65


def test_sample_partition_independent(spark, docs_sf001):
    # Same rows kept no matter how the input is partitioned — the property
    # df.sample() does NOT have.
    base = deterministic_sample(docs_sf001, "text", 0.3).select("doc_id")
    shuffled = deterministic_sample(docs_sf001.repartition(13), "text", 0.3).select("doc_id")
    assert sorted(r["doc_id"] for r in base.collect()) == sorted(
        r["doc_id"] for r in shuffled.collect()
    )


def test_sample_nested_fractions(spark, docs_sf001):
    # The 10% sample is a subset of the 30% sample (same key): scaling-law
    # subsample chains stay consistent.
    small = {r["doc_id"] for r in deterministic_sample(docs_sf001, "text", 0.1).select("doc_id").collect()}
    large = {r["doc_id"] for r in deterministic_sample(docs_sf001, "text", 0.3).select("doc_id").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_stratified_fractions_apply_per_stratum(spark, docs_sf001):
    kept = stratified_sample(
        docs_sf001, "text", "lang", {"en": 0.0}, default_fraction=1.0
    )
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in by_lang  # en fully dropped
    totals = {
        r["lang"]: r["n"]
        for r in docs_sf001.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in by_lang.items():
        assert n == totals[lang]  # everything else fully kept


def test_hash_bucket_matches_python_md5(spark):
    import hashlib

    df = spark.createDataFrame([("hello world",)], "k string")
    got = df.select(hash_bucket(F.col("k")).alias("b")).collect()[0]["b"]
    assert got == int(hashlib.md5(b"hello world").hexdigest()[:8], 16) % 10_000
