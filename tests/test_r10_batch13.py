"""Round 10 batch 13: Dunn post-hoc, Hurst R/S, Ansari-Bradley, JS
divergence — semantic invariants beyond the hash gate."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_dunn_antisymmetry_and_count(spark):
    rows = QUERIES["stats_dunn_posthoc"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) language pairs
    for r in rows:
        assert r.lang_a < r.lang_b
        assert r.significant == (abs(r.z_dunn) > 2.807)


def test_hurst_random_walkish(spark):
    rows = QUERIES["timeseries_hurst_rs"](spark, SF_DIR).collect()
    assert [r.s for r in rows] == [8, 16, 32, 64]
    h = rows[0].h_est
    assert all(abs(r.h_est - h) < 1e-12 for r in rows)  # constant column
    # iid-ish daily revenue: R/S Hurst sits in the classical small-sample
    # band around 0.5 (Anis-Lloyd bias pushes it above)
    assert 0.3 < h < 0.95
    # mean ln(R/S) grows with block size
    ms = [r.mean_ln_rs for r in rows]
    assert all(a < b for a, b in zip(ms, ms[1:]))


def test_ansari_bradley_scale_shift_fixture(spark):
    r = QUERIES["stats_ansari_bradley"](spark, SF_DIR).collect()[0]
    assert r.n1 > 0 and r.n2 > 0 and r.ab_stat > 0
    # planted: same center, view 10x the spread of click -> clicks
    # (narrow) concentrate mid-ranks -> AB stat ABOVE its null mean
    rows = []
    for i in range(300):
        # click: tight around 50; view: wide around 50
        c_val = 50.0 + ((i * 7) % 11 - 5) * 0.3
        v_val = 50.0 + ((i * 13) % 21 - 10) * 3.0
        rows.append((2 * i, "2024-01-01 01:%02d:%02d" % (i // 60, i % 60),
                     1, "click", c_val, None))
        rows.append((2 * i + 1, "2024-01-01 02:%02d:%02d" % (i // 60, i % 60),
                     1, "view", v_val, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = QUERIES["stats_ansari_bradley"](spark, td).collect()[0]
    n = out.n1 + out.n2
    null_mean = out.n1 * (n + 2) / 4.0 if n % 2 == 0 else \
        out.n1 * (n + 1) ** 2 / (4.0 * n)
    assert out.ab_stat > null_mean
    assert out.z_ab > 3.0  # strongly significant scale difference


def test_js_divergence_bounds_and_symmetry_base(spark):
    rows = QUERIES["text_js_divergence"](spark, SF_DIR).collect()
    assert len(rows) == 190  # C(20,2) source pairs
    ln2 = math.log(2.0)
    for r in rows:
        assert -1e-9 <= r.js <= ln2 + 1e-9


def test_js_divergence_one_sided_mass_live(spark):
    """ADVICE r10 follow-up, resolved by FIXING the query: the former
    inner join on shared tokens dropped one-sided mass (p*ln2 terms for
    tokens absent from the other source), and the documented
    precondition (every source covers the global vocabulary) is
    genuinely violated at sf0.001 — three sources miss tokens. The
    query now densifies each source over the global vocabulary before
    the pair join. This test pins BOTH facts: (a) the fixture really
    exercises the one-sided branch (planted-signal doctrine — at least
    one source must miss at least one global token at sf0.001), and
    (b) the query's output equals an independently computed full JS
    (pure-Python, exact same 1e-12 term quantization) on every pair."""
    import collections

    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    sf_dir = SF_DIR
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    census = collections.Counter()
    for r in toks.groupBy("source", "tok").count().collect():
        census[(r.source, r.tok)] = r["count"]
    sources = sorted({s for s, _ in census})
    vocab = sorted({t for _, t in census})
    missing = [
        s for s in sources if any((s, t) not in census for t in vocab)
    ]
    assert missing, (
        "no source misses a global token at sf0.001 — the one-sided "
        "branch is no longer exercised; plant a fixture that trips it"
    )

    totals = collections.Counter()
    for (s, _), c in census.items():
        totals[s] += c
    expected = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            acc = 0
            for t in vocab:
                p = census.get((a, t), 0) / totals[a]
                q = census.get((b, t), 0) / totals[b]
                term = 0.0
                if p > 0:
                    term += p * math.log(2.0 * p / (p + q))
                if q > 0:
                    term += q * math.log(2.0 * q / (p + q))
                acc += int(math.floor(term / 2.0 * 1e12 + 0.5))
            expected[(a, b)] = math.floor(acc / 1e12 * 1e9 + 0.5) / 1e9

    rows = QUERIES["text_js_divergence"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    ln2 = math.log(2.0)
    for r in rows:
        assert -1e-9 <= r.js <= ln2 + 1e-9
        assert r.js == expected[(r.src_a, r.src_b)], (r.src_a, r.src_b)
