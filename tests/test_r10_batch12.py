"""Round 10 batch 12: AD hash-uniformity audit, rich club, lateral
column aliases, MinHash calibration — semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_hash_uniformity_passes(spark):
    r = QUERIES["audit_hash_uniformity_ad"](spark, SF_DIR).collect()[0]
    # md5 is a good hash: A^2 must sit far below the 1% critical value
    assert r.pass_1pct
    assert 0.0 < r.a2 < 3.857
    assert r.n > 0


def test_rich_club_monotone_density(spark):
    rows = QUERIES["graph_rich_club"](spark, SF_DIR).collect()
    assert [r.k for r in rows] == [2, 4, 8, 16]
    for r in rows:
        assert r.phi is None or 0.0 <= r.phi <= 1.0
    # node counts shrink as the threshold rises
    ns = [r.n_nodes for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_lateral_alias_chain_consistent(spark):
    rows = QUERIES["sql_lateral_column_alias"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # gross = net * (1 + tax-rate) >= net; tax = gross - net >= 0
        assert r.gross_dollars >= r.net_dollars - 1e-6
        assert abs((r.net_dollars + r.tax_dollars) - r.gross_dollars) < 0.02


def test_minhash_calibration_unbiased(spark):
    rows = QUERIES["dedup_minhash_calibration"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    tot = sum(r.n_pairs for r in rows)
    assert tot > 0
    # Broder unbiasedness: per-bin |bias| bounded by a few sketch
    # standard errors (sd <= 0.5/sqrt(32) ~ 0.088 per pair; bins with
    # many pairs shrink as 1/sqrt(n))
    for r in rows:
        se = 0.09 / max(r.n_pairs, 1) ** 0.5
        assert abs(r.bias) < max(5 * se, 0.03)
        # bin means sit inside the bin's exact-jaccard decile
        assert r.bin / 10.0 - 1e-9 <= r.avg_exact <= (r.bin + 1) / 10.0 + 1e-9
