"""Round 9 batch 1: ICWS/consistent-weighted-sampling weighted-Jaccard
sketch — recall vs the exact pair join, threshold exactness, and the
estimator contract (output pairs are exact re-ranks, never estimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def _exact_pairs(spark, sf_dir, num=9, den=4):
    """All pairs with weighted Jaccard >= num-th cross-multiply (9*smin
    >= 4*(ta+tb) == J >= 0.8), via the full quadratic posting join —
    the ground truth the sketch's banding must recall."""
    tf = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    totals = tf.groupBy("doc_id").agg(F.sum("tf").alias("t"))
    a = tf.select(F.col("doc_id").alias("id_a"), "tok", F.col("tf").alias("tfa"))
    b = tf.select(F.col("doc_id").alias("id_b"), "tok", F.col("tf").alias("tfb"))
    return (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("tfa", "tfb")).alias("smin"))
        .join(totals.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta")), "id_a")
        .join(totals.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb")), "id_b")
        .where(F.col("smin") * num >= (F.col("ta") + F.col("tb")) * den)
        .select("id_a", "id_b")
    )


def test_icws_recall_vs_exact(spark):
    got = QUERIES["dedup_weighted_jaccard_icws"](spark, SF_DIR).select(
        "id_a", "id_b"
    )
    truth = _exact_pairs(spark, SF_DIR)
    n_truth = truth.count()
    assert n_truth > 0, "fixture must contain J>=0.8 pairs"
    recalled = truth.join(got, ["id_a", "id_b"]).count()
    assert recalled / n_truth >= 0.9, (recalled, n_truth)


def test_icws_precision_is_exact(spark):
    """Every emitted pair is an EXACT re-rank at J >= 0.8 — the sketch
    can only lose pairs (recall), never admit a sub-threshold one."""
    rows = QUERIES["dedup_weighted_jaccard_icws"](spark, SF_DIR).collect()
    truth = {(r.id_a, r.id_b) for r in _exact_pairs(spark, SF_DIR).collect()}
    for r in rows:
        assert r.weighted_jaccard >= 0.8 - 1e-12
        assert r.sum_min <= r.sum_max
        assert (r.id_a, r.id_b) in truth  # exact re-rank => zero false pos


def test_weighted_jaccard_icws_dispatch_arm(spark, monkeypatch):
    """r10: dedup_weighted_jaccard's third arm — docs > _ICWS_DOCS →
    ICWS candidates (band width 2, tuned for the J>=0.5 cut) + exact
    posting re-rank. Lowering the threshold onto the fixture must (a)
    name the arm in the dispatch column, (b) emit ONLY exact J>=0.5
    pairs (precision 1), and (c) recall >=0.95 of them."""
    from prometheus_clickhouselog_exporter_spark.workloads import relational10

    exact = QUERIES["dedup_weighted_jaccard"](spark, SF_DIR)
    assert exact.select("arm").distinct().collect()[0].arm == "dense"
    truth = {(r.id_a, r.id_b) for r in exact.collect()}
    assert truth, "fixture must contain J>=0.5 pairs"

    monkeypatch.setattr(relational10, "_ICWS_DOCS", 10)
    got = QUERIES["dedup_weighted_jaccard"](spark, SF_DIR).collect()
    assert got and all(r.arm == "icws" for r in got)
    pairs = set()
    for r in got:
        assert r.weighted_jaccard >= 0.5 - 1e-12  # exact re-rank
        assert (r.id_a, r.id_b) in truth  # precision 1
        pairs.add((r.id_a, r.id_b))
    assert len(pairs) / len(truth) >= 0.95, (len(pairs), len(truth))
