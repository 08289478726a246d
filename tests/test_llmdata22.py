"""Round 8 batch 1: suffix-dedup form auto-dispatch
(operators/suffixes.suffix_lcp_auto + dedup_longest_substring_auto)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.operators.suffixes import (
    suffix_lcp_auto,
)
from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_auto_matches_manual_truncated_form(spark):
    """On the corpus (max doc 100 tokens <= 128) the dispatcher must pick
    'truncated' and reproduce dedup_longest_substring exactly, plus the
    form column."""
    manual = {
        tuple(r)
        for r in QUERIES["dedup_longest_substring"](spark, SF_DIR).collect()
    }
    auto_rows = QUERIES["dedup_longest_substring_auto"](spark, SF_DIR).collect()
    assert all(r.form == "truncated" for r in auto_rows)
    auto = {tuple(r)[:-1] for r in auto_rows}
    assert auto == manual and len(auto) > 0


def test_dispatcher_picks_doubling_past_cap(spark):
    """A single document past the cap must flip the dispatch to the
    prefix-doubling branch, and the LCPs must stay exact: two docs
    sharing a 150-token prefix (longer than the 128 cap the truncated
    form would silently sort under) must report lcp == 150."""
    shared = " ".join(f"w{i % 7}x{i}" for i in range(150))
    rows = [
        (1, shared + " tail-one ending-a"),
        (2, shared + " tail-two ending-b"),
        (3, "entirely unrelated words " + " ".join(f"u{i}" for i in range(40))),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    lcps, form = suffix_lcp_auto(docs, cap=128)
    assert form == "doubling"
    best = (
        lcps.filter(F.col("crossdoc"))
        .agg(F.max("lcp").alias("m"))
        .first()["m"]
    )
    assert best == 150


def test_dispatcher_picks_truncated_under_cap(spark):
    """Same corpus trimmed under the cap → truncated branch, same
    adjacency semantics (shared 50-token prefix reported exactly)."""
    shared = " ".join(f"w{i % 7}x{i}" for i in range(50))
    rows = [(1, shared + " tail-one"), (2, shared + " tail-two")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    lcps, form = suffix_lcp_auto(docs, cap=128)
    assert form == "truncated"
    best = (
        lcps.filter(F.col("crossdoc"))
        .agg(F.max("lcp").alias("m"))
        .first()["m"]
    )
    assert best == 50
