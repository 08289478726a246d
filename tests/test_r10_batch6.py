"""Round 10 batch 6: MATTR, CDC chunking, capture-recapture, Procrustes,
Jonckheere-Terpstra, Breusch-Pagan, IDENTIFIER clause — semantic
invariants beyond the hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES
from prometheus_clickhouselog_exporter_spark.workloads.core import table

SF_DIR = "/root/testdata/sf0.001"


def test_mattr_bounds_and_repetition_sensitivity(spark):
    rows = QUERIES["text_mattr_diversity"](spark, SF_DIR).collect()
    assert rows and all(1.0 / 15 <= r.avg_mattr <= 1.0 for r in rows)
    # a fully-repetitive fixture doc must score exactly 1/W while a
    # fully-distinct one scores exactly 1.0
    import tempfile

    data = [
        (1, " ".join(["x"] * 30), "en", "s", 30),
        (2, " ".join(f"t{i}" for i in range(30)), "de", "s", 30),
    ]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = {r.lang: r.avg_mattr for r in QUERIES["text_mattr_diversity"](spark, td).collect()}
    assert abs(out["en"] - 1.0 / 15) < 1e-9
    assert abs(out["de"] - 1.0) < 1e-9


def test_cdc_chunks_align_after_prefix_insertion(spark):
    """The CDC property fixed chunking lacks: inserting a prefix into a
    doc must leave the SHARED SUFFIX chunks content-identical."""
    import tempfile

    base = table(spark, SF_DIR, "documents").where(F.col("doc_id") < 5)
    shifted = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("zzz qqq vvv www "), F.col("text")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 16).alias("n_chars"),
    )
    with tempfile.TemporaryDirectory() as td:
        base.unionByName(shifted).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        r = QUERIES["dedup_cdc_chunking"](spark, td).collect()[0]
    # the pair shares content-defined chunks despite the offset shift
    assert r.cross_doc_chunks > 0 and r.dedupable_tokens > 0
    assert r.distinct_chunks <= r.total_chunks


def test_capture_recapture_estimate_sane(spark):
    r = QUERIES["dedup_capture_recapture_estimate"](spark, SF_DIR).collect()[0]
    assert r.n1 >= 0 and r.n2 >= 0 and r.m >= 0
    assert r.m <= min(r.n1, r.n2)
    # Chapman is >= max(n1, n2) - 1 when overlap exists (estimates the
    # union-or-more), and exactly (n1+1)(n2+1)/(m+1)-1
    assert r.chapman_estimate == (r.n1 + 1) * (r.n2 + 1) // (r.m + 1) - 1
    if r.m > 0:
        assert r.chapman_estimate >= max(r.n1, r.n2) - 1


def test_procrustes_certificate_and_numerics(spark):
    fn = QUERIES["embedding_procrustes_alignment"]
    r = fn(spark, SF_DIR).collect()[0]
    assert r.dim == 32 and r.improved and r.r_orthogonal
    num = fn.last_numerics
    assert num["orthogonality_err"] < 1e-9
    assert num["residual_rotated"] <= num["residual_identity"] + 1e-9
    assert num["residual_rotated"] >= 0


def test_jonckheere_matches_brute_force(spark):
    r = QUERIES["stats_jonckheere_terpstra"](spark, SF_DIR).collect()[0]
    docs = table(spark, SF_DIR, "documents").select("lang", "n_chars").collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for d in docs:
        groups[d.lang].append(d.n_chars)
    langs = sorted(groups)
    strict = ties = 0
    for a in range(len(langs)):
        for b in range(a + 1, len(langs)):
            for x in groups[langs[a]]:
                for y in groups[langs[b]]:
                    if x < y:
                        strict += 1
                    elif x == y:
                        ties += 1
    assert (r.strict, r.ties) == (strict, ties)
    assert abs(r.jt - (strict + 0.5 * ties)) < 1e-9
    assert r.n == sum(len(v) for v in groups.values())


def test_breusch_pagan_both_branches_live(spark):
    rows = {r.model: r for r in QUERIES["stats_breusch_pagan"](spark, SF_DIR).collect()}
    # planted multiplicative model: residual variance grows with x
    assert rows["scaled"].heteroskedastic and rows["scaled"].r_e2_x > 0
    # raw price~quantity carries no structure in this corpus: control
    assert not rows["raw"].heteroskedastic
    for r in rows.values():
        assert abs(r.lm_stat - r.n * r.r_e2_x**2) < r.n * 1e-4


def test_identifier_clause_matches_static_sql(spark):
    rows = QUERIES["sql_identifier_clause"](spark, SF_DIR).collect()
    static = (
        table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in static]
