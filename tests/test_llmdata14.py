"""Hand-value tests for the Gopher repetition/quality battery."""

from __future__ import annotations

from pyspark.sql import Row

from prometheus_clickhouselog_exporter_spark.workloads.llmdata14 import (
    text_gopher_ngram_filter,
    text_gopher_quality_rules,
)


def _write_docs(spark, tmp_path, texts):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="src0", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_top_bigram_fraction_hand_value(spark, tmp_path):
    # "a b" occurs 3 times (positions 0,2,4); len("a b") = 3; total chars = 11
    text = "a b a b a b"
    sf = _write_docs(spark, tmp_path, [text])
    r = text_gopher_ngram_filter(spark, sf).collect()[0]
    assert r.top2_frac == round(3 * 3 / 11, 4)
    assert not r.keep  # 9/11 > 0.20


def test_dup5_union_of_spans(spark, tmp_path):
    # "p q r s t" repeats at positions 0 and 5 -> two disjoint 9-char spans
    # in a 29-char doc; unique tail prevents other dup 5-grams.
    text = "p q r s t p q r s t u1 v2 w3"
    sf = _write_docs(spark, tmp_path, [text])
    r = text_gopher_ngram_filter(spark, sf).collect()[0]
    # duplicated 5-gram occurrences: "p q r s t" at 0 and 10 (char offsets),
    # each 9 chars; also "q r s t p", "r s t p q"... only those appearing
    # twice count — with this text only "p q r s t" repeats.
    assert r.dup5_frac == round(18 / len(text), 4)


def test_clean_doc_keeps(spark, tmp_path):
    # 50+ distinct-ish words incl. two stopwords, no repeated n-grams
    words = [f"tok{i}" for i in range(48)] + ["the", "and", "of"]
    text = " ".join(words)
    sf = _write_docs(spark, tmp_path, [text])
    ng = text_gopher_ngram_filter(spark, sf).collect()[0]
    q = text_gopher_quality_rules(spark, sf).collect()[0]
    assert ng.dup5_frac == 0.0 and ng.dup10_frac == 0.0
    assert ng.keep
    assert q.n_words == 51 and q.n_stop == 3
    assert q.keep


def test_quality_rules_reject_short_and_nonalpha(spark, tmp_path):
    texts = [
        "too short doc with the and of words here",  # < 50 words
        " ".join(["123"] * 60),  # no alpha, no stopwords
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {r.doc_id: r for r in text_gopher_quality_rules(spark, sf).collect()}
    assert not rows[0].keep
    assert not rows[1].keep
    assert rows[1].alpha_frac == 0.0


def test_oracle_matches_spark_on_repetitive_fixture(spark, tmp_path):
    """Dual-engine check on a corpus that actually HAS duplicated 5/10-grams
    (the driver corpus has none at any SF, so the hash gate alone never
    exercises the union-of-spans branch — this fixture does, in BOTH
    engines; it is the test that caught the oracle's 1-based-list
    char-offset bug)."""
    import duckdb

    from prometheus_clickhouselog_exporter_spark.workloads import ORACLE

    span10 = " ".join(f"d{i}" for i in range(10))
    texts = [
        "p q r s t p q r s t u1 v2 w3",  # disjoint dup 5-gram spans
        span10 + " mid " + span10,  # dup 10-gram
        "a b a b a b a b a b a b",  # overlapping everything
        "x1 y2 z3 unique words only here now",  # clean
    ]
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = [
        tuple(r)
        for r in text_gopher_ngram_filter(spark, str(tmp_path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = con.execute(ORACLE["text_gopher_ngram_filter"]).fetchall()
    assert got == want
    # and the branch is genuinely exercised: nonzero dup fractions exist
    assert any(r[4] > 0 for r in got)  # dup5_frac
    assert any(r[5] > 0 for r in got)  # dup10_frac
