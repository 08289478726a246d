"""Hand-value and property tests for relational8 (SCD2 PIT lookup,
IGNORE NULLS battery) and llmdata6 (OOV, containment, minhash merge)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.llmdata6 import (
    dedup_containment_shingles,
    sketch_minhash_source_merge,
    text_vocab_oov_rate,
)
from prometheus_clickhouselog_exporter_spark.workloads.relational8 import (
    scd2_incremental_merge,
    scd2_pit_asof_lookup,
    window_ignore_nulls_battery,
)

SF_DIR = "/root/testdata/sf0.001"


def _order(k, cust, day, prio, status="O", price=100.0):
    return Row(
        o_orderkey=k,
        o_custkey=cust,
        o_orderdate=datetime.datetime(2024, 1, day),
        o_orderpriority=prio,
        o_orderstatus=status,
        o_totalprice=price,
    )


def test_pit_lookup_hand_values(spark, tmp_path):
    rows = [
        _order(1, 1, 1, "P1"),  # opens regime v1 (P1)
        _order(2, 1, 5, "P2"),  # opens regime v2 (P2); same-day start applies
        _order(3, 1, 7, "P2"),  # falls inside v2
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = {
        (r.priority, r.version): r.n_orders
        for r in scd2_pit_asof_lookup(spark, str(tmp_path)).collect()
    }
    assert out == {("P1", 1): 1, ("P2", 2): 2}


def test_scd2_incremental_boundary_cases(spark, tmp_path):
    """The two boundary traps: a delta order whose priority EQUALS the
    base regime must NOT open a version; a customer first seen in the
    delta numbers from version 1. Split date is 1996-01-01."""

    def o(k, cust, y, m, d, prio):
        return Row(
            o_orderkey=k,
            o_custkey=cust,
            o_orderdate=datetime.datetime(y, m, d),
            o_orderpriority=prio,
        )

    rows = [
        o(1, 1, 1995, 1, 1, "A"),  # base: v1 A
        o(2, 1, 1995, 6, 1, "B"),  # base: v2 B (current at split)
        o(3, 1, 1996, 2, 1, "B"),  # delta, same as regime: NO new version
        o(4, 1, 1996, 3, 1, "A"),  # delta: v3 A
        o(5, 2, 1996, 5, 1, "C"),  # delta-only customer: v1 C
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    out = {
        (r.o_custkey, r.version): (r.priority, r.is_current)
        for r in scd2_incremental_merge(spark, str(tmp_path)).collect()
    }
    assert out == {
        (1, 1): ("A", False),
        (1, 2): ("B", False),
        (1, 3): ("A", True),
        (2, 1): ("C", True),
    }


def test_ignore_nulls_hand_values(spark, tmp_path):
    rows = [
        _order(1, 1, 1, "P", status="O", price=10.0),
        _order(2, 1, 2, "P", status="F", price=20.0),
        _order(3, 1, 3, "P", status="F", price=30.0),
        _order(4, 1, 4, "P", status="O", price=40.0),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/orders.parquet")
    r = window_ignore_nulls_battery(spark, str(tmp_path)).collect()[0]
    # sparse series: NULL, 20, 30, NULL — ignore-nulls picks real values
    assert r.n_orders == 4
    assert r.first_f == 20.0 and r.last_f == 30.0 and r.second_f == 30.0
    assert r.last_prev_price == 30.0  # lag at the final row


def _doc(i, text, lang="en", source="s1"):
    return Row(doc_id=i, text=text, lang=lang, source=source, n_chars=len(text))


def test_containment_asymmetry(spark, tmp_path):
    docs = [
        _doc(1, "a b c d"),  # shingles {abc, bcd}: fully inside doc 2
        _doc(2, "a b c d e f"),  # 4 shingles: only half shared
        _doc(3, "x y z w"),  # disjoint
    ]
    spark.createDataFrame(docs).write.parquet(f"{tmp_path}/documents.parquet")
    out = {(r.id_a, r.id_b): r.containment for r in dedup_containment_shingles(
        spark, str(tmp_path)).collect()}
    assert out == {(1, 2): 1.0}  # 1 ⊂ 2 flagged; reverse (0.5) cut; 3 absent


def test_minhash_merge_is_elementwise_min(spark):
    rows = sketch_minhash_source_merge(spark, SF_DIR).collect()
    per_perm_mins: dict[int, int] = {}
    merged: dict[int, int] = {}
    for r in rows:
        if r.source == "__all__":
            merged[r.perm] = r.sig
        else:
            per_perm_mins[r.perm] = min(per_perm_mins.get(r.perm, 1 << 62), r.sig)
    assert merged == per_perm_mins


def test_oov_rate_bounds(spark):
    rows = text_vocab_oov_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.total_tokens > 0
        assert 0.0 <= r.oov_rate < 1.0
        assert abs(r.oov_rate - r.oov_tokens / r.total_tokens) < 1e-12
