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


def test_abc_classes_hand_values(spark, tmp_path):
    # revenues 80/15/5 → exactly one part per class at the 80/95 cuts
    rows = [
        Row(l_partkey=1, l_extendedprice=80.0),
        Row(l_partkey=2, l_extendedprice=15.0),
        Row(l_partkey=3, l_extendedprice=5.0),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/lineitem.parquet")
    from prometheus_clickhouselog_exporter_spark.workloads.relational8 import (
        abc_pareto_revenue_classes,
    )

    out = {r.abc: (r.n_parts, r.class_revenue) for r in abc_pareto_revenue_classes(
        spark, str(tmp_path)).collect()}
    assert out == {"A": (1, 80.0), "B": (1, 15.0), "C": (1, 5.0)}


def test_trigram_paths_hand_values(spark, tmp_path):
    def ev(eid, sec, user, etype):
        return Row(
            event_id=eid,
            ts=datetime.datetime(2024, 1, 1, 0, 0, sec),
            user_id=user,
            event_type=etype,
        )

    rows = [ev(1, 1, 1, "a"), ev(2, 2, 1, "b"), ev(3, 3, 1, "c"), ev(4, 4, 1, "b"),
            ev(5, 1, 2, "a"), ev(6, 2, 2, "b"), ev(7, 3, 2, "c")]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    from prometheus_clickhouselog_exporter_spark.workloads.relational8 import (
        events_trigram_paths,
    )

    out = {r.path: r.n for r in events_trigram_paths(spark, str(tmp_path)).collect()}
    assert out == {"a>b>c": 2, "b>c>b": 1}


def test_wav_resample_preserves_tone(spark):
    from prometheus_clickhouselog_exporter_spark.operators.multimodal import (
        decode_wav_features,
        resample_wav,
        synth_wav,
    )

    d = spark.range(5).withColumnRenamed("id", "doc_id")
    feats = decode_wav_features(resample_wav(synth_wav(d, "doc_id"), factor=4)).collect()
    for r in feats:
        assert r.sample_rate == 2000 and r.n_samples == 500
        assert r.dominant_freq_hz == 100.0 + (r.doc_id % 25) * 8.0


def test_power_iteration_improves_rayleigh_and_normalizes(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from prometheus_clickhouselog_exporter_spark.workloads.llmdata6 import (
        embedding_power_iteration_pc1,
    )

    rows = embedding_power_iteration_pc1(spark, SF_DIR).collect()
    v = np.array([r.pc1 for r in sorted(rows, key=lambda r: r.dim)])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    X = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    G = X.T @ X

    def rayleigh(u):
        return float(u @ G @ u) / float(u @ u)

    v0 = np.full(64, 0.125)
    evals = np.linalg.eigvalsh(G)
    # 3 iterations from uniform must beat the start and the average mode
    assert rayleigh(v) > rayleigh(v0)
    assert rayleigh(v) > float(np.mean(evals))
    # quantized arithmetic ⇒ bit-identical across runs
    rows2 = embedding_power_iteration_pc1(spark, SF_DIR).collect()
    assert [r.pc1 for r in rows] == [r.pc1 for r in rows2]


def test_kmeans_partitions_corpus_and_is_stable(spark):
    from prometheus_clickhouselog_exporter_spark.workloads.llmdata6 import (
        embedding_kmeans_lloyd,
    )

    rows = embedding_kmeans_lloyd(spark, SF_DIR).collect()
    assert len(rows) == 4  # no cluster died on this corpus
    assert sum(r.n_members for r in rows) == 500  # every vector assigned once
    rows2 = embedding_kmeans_lloyd(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]  # bit-stable


def test_covariance_matrix_properties(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from prometheus_clickhouselog_exporter_spark.workloads.llmdata6 import (
        embedding_covariance_matrix,
    )

    rows = embedding_covariance_matrix(spark, SF_DIR).collect()
    C = np.zeros((8, 8))
    for r in rows:
        C[r.dim_j, r.dim_k] = r.cov
    assert np.allclose(C, C.T, atol=1e-8)  # symmetric
    assert (np.diag(C) >= -1e-9).all()  # variances non-negative
    X = np.array(
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )[:, :8]
    ref = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(C, ref, atol=1e-6)  # quantization error bounded


def test_running_distinct_hand_values(spark, tmp_path):
    import datetime

    from prometheus_clickhouselog_exporter_spark.workloads.llmdata6 import (
        window_running_distinct_types,
    )

    def ev(eid, sec, etype):
        return Row(
            event_id=eid,
            ts=datetime.datetime(2024, 1, 1, 0, 0, sec),
            user_id=1,
            event_type=etype,
        )

    # types over time: a, a, b, c, b → distinct seen: 1,1,2,3,3
    rows = [ev(1, 1, "a"), ev(2, 2, "a"), ev(3, 3, "b"), ev(4, 4, "c"), ev(5, 5, "b")]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    r = window_running_distinct_types(spark, str(tmp_path)).collect()[0]
    assert (r.n_events, r.n_distinct_types, r.events_to_third_type) == (5, 3, 4)


def test_oov_rate_bounds(spark):
    rows = text_vocab_oov_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.total_tokens > 0
        assert 0.0 <= r.oov_rate < 1.0
        assert abs(r.oov_rate - r.oov_tokens / r.total_tokens) < 1e-12
