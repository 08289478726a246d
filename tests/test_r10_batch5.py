"""Round 10 batch 5: winnowing, centroid silhouette, radius search,
lift/gains, Cochran–Armitage, FD profiling, modularity,
quantile_over_time — semantic invariants beyond the hash gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def test_winnowing_guarantee_on_planted_duplicate(spark):
    """Any shared run of >= w+k-1 = 6 tokens must share a fingerprint:
    plant an exact duplicate pair and require it to surface."""
    import tempfile

    docs = table(spark, SF_DIR, "documents")
    clone = docs.where(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.unionByName(clone).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        pairs = {
            (r.doc_a, r.doc_b): r.shared_fp
            for r in QUERIES["dedup_winnowing_fingerprints"](spark, td).collect()
        }
    assert (0, 1_000_000) in pairs and (1, 1_000_001) in pairs
    # an exact duplicate shares its ENTIRE fingerprint set
    base = {
        (r.doc_a, r.doc_b): r.shared_fp
        for r in QUERIES["dedup_winnowing_fingerprints"](spark, SF_DIR).collect()
    }
    assert all(v >= 3 for v in base.values())


def test_silhouette_bounds_and_population(spark):
    rows = QUERIES["ml_silhouette_centroid"](spark, SF_DIR).collect()
    assert len(rows) == 4
    assert all(-1.0 <= r.mean_silhouette <= 1.0 for r in rows)
    n_emb = table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n for r in rows) == n_emb


def test_radius_search_agrees_with_topk_family(spark):
    rows = {r.query_id: r for r in QUERIES["similarity_radius_search"](spark, SF_DIR).collect()}
    assert rows and all(r.min_cosine >= 0.25 for r in rows.values())
    # brute-force recount for one query
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in table(spark, SF_DIR, "embeddings").collect()
    }
    qid = min(rows)
    q = emb[qid]
    n = sum(
        1
        for vid, v in emb.items()
        if vid != qid
        and v @ v > 0
        and q @ v / (math.sqrt(q @ q) * math.sqrt(v @ v)) >= 0.25
    )
    assert rows[qid].n_within == n


def test_lift_gains_shape(spark):
    rows = sorted(
        QUERIES["ml_lift_gains_deciles"](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # gains are cumulative -> nondecreasing, ending at 1
    g = [r.gains for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(g, g[1:])) and abs(g[-1] - 1.0) < 1e-6
    # final cumulative lift is exactly 1 (whole population)
    assert abs(rows[-1].lift - 1.0) < 1e-6
    # deciles are balanced by the ntile contract (sizes differ by <= 1)
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_cochran_armitage_sign_and_scale(spark):
    r = QUERIES["stats_cochran_armitage"](spark, SF_DIR).collect()[0]
    assert r.n_groups == 5 and 0 < r.successes < r.n
    # z and the exact numerator must agree in sign
    assert (r.z_trend > 0) == (r.t_num > 0) or r.t_num == 0
    # permuting scores to a constant kills the trend: recompute with all
    # groups merged -> numerator must be 0 by construction
    orders = table(spark, SF_DIR, "orders")
    n = orders.count()
    rr = orders.where(F.col("o_orderstatus") == "F").count()
    # with one group, N*sr - R*sn = N*s*R - R*s*N = 0
    assert n * 1 * rr - rr * 1 * n == 0


def test_fd_key_dependency_holds(spark):
    rows = {r.fd: r for r in QUERIES["dq_functional_dependency"](spark, SF_DIR).collect()}
    assert rows["o_orderkey->o_custkey"].holds
    assert rows["o_orderkey->o_custkey"].violating_rows == 0
    # at least one candidate must be violated for the branch to be live
    assert any(not r.holds for r in rows.values())
    for r in rows.values():
        assert r.violating_groups <= r.lhs_groups


def test_modularity_bounds_and_cc_consistency(spark):
    r = QUERIES["graph_modularity_score"](spark, SF_DIR).collect()[0]
    assert -0.5 <= r.modularity <= 1.0
    cc = QUERIES["graph_connected_components"](spark, SF_DIR).collect()
    # communities with edges <= all components (singletons carry no edges)
    assert 0 < r.n_communities <= len(cc)
    # a perfect-partition property: every edge is within its component,
    # so sum(e_in) == |E| and Q = 1 - sum((d_c/|E|)^2) > 0 here
    assert r.modularity > 0


def test_quantile_over_time_brackets_min_max(spark):
    rows = QUERIES["promql_quantile_over_time"](spark, SF_DIR).collect()
    assert rows
    base = (
        table(spark, SF_DIR, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("hour", F.col("ts").cast("timestamp"))
            .cast("string")
            .alias("hr"),
            (F.floor(F.col("value") * 100 + 0.5) / 100).alias("v"),
        )
        .groupBy("event_type", "hr")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    bounds = {(r.event_type, r.hr): r for r in base}
    for r in rows:
        b = bounds[(r.event_type, r.hr)]
        assert b.n == r.n
        assert b.lo - 1e-9 <= r.q50 <= r.q90 <= b.hi + 1e-9
