"""Round 8 batch 7: bigram-LM perplexity, streaming PSI, compaction
bins, best-F1 threshold."""

from __future__ import annotations

import math

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_lm_perplexity_bounds_and_identity(spark):
    rows = QUERIES["text_lm_perplexity_heldout"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_transitions >= 1
        assert r.nll_q > 0  # every transition has p < 1 under add-1
        # perplexity == exp(mean micro-nat NLL), and can't exceed the
        # worst case 1/p where p >= 1/(c_prev+|V|) on this tiny vocab
        assert math.isclose(
            r.perplexity,
            math.exp(r.nll_q / (r.n_transitions * 1e6)),
            rel_tol=1e-3,
        )
        assert 1.0 < r.perplexity < 5000.0


def test_streaming_psi_matches_batch_twin(spark):
    """The streamed PSI must equal drift_psi_value_halves row-for-row
    (same buckets, same counts, same quantized terms)."""
    batch = {
        r.bucket: (r.n_ref, r.n_cur, r.psi_term)
        for r in QUERIES["drift_psi_value_halves"](spark, SF_DIR).collect()
    }
    stream = {
        r.bucket: (r.n_ref, r.n_cur, r.psi_term)
        for r in QUERIES["streaming_psi_fidelity"](spark, SF_DIR).collect()
    }
    assert stream == batch and batch


def test_compaction_bins_pack_to_target(spark):
    rows = QUERIES["layout_compaction_bins"](spark, SF_DIR).collect()
    assert rows
    target = 200_000
    for r in rows:
        assert r.smallest_file <= r.largest_file
        assert r.n_files >= 1
        # next-fit-decreasing: a bin overshoots the target by at most
        # one file (the one that crossed the boundary)
        assert r.total_bytes < target + r.largest_file
    # all files accounted for: totals match the raw day x type sizes
    from pyspark.sql import functions as F

    raw = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.to_date("ts"), "event_type")
        .count()
        .agg(F.sum(F.col("count") * 100))
        .collect()[0][0]
    )
    assert sum(r.total_bytes for r in rows) == raw


def test_best_f1_threshold_is_argmax(spark):
    """Recompute the F1 sweep driver-side from the raw events and check
    the chosen threshold attains the maximum."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    r = QUERIES["ml_best_f1_threshold"](spark, SF_DIR).collect()[0]
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("value", (F.col("event_type") == "error").alias("y"))
        .collect()
    )
    by_s = defaultdict(lambda: [0, 0])
    for e in ev:
        by_s[e.value][0 if e.y else 1] += 1
    p_total = sum(v[0] for v in by_s.values())
    tp = fp = 0
    best = (-1, None)
    for s in sorted(by_s, reverse=True):
        tp += by_s[s][0]
        fp += by_s[s][1]
        f1q = (2 * tp * 10**9) // (2 * tp + fp + (p_total - tp))
        if f1q > best[0]:
            best = (f1q, s, tp, fp)
    assert r.threshold == best[1]
    assert (r.tp, r.fp) == (best[2], best[3])
    assert math.isclose(r.f1, best[0] / 1e9, abs_tol=1e-9)
    assert 2 * r.tp / (2 * r.tp + r.fp + r.fn) >= 0.0
