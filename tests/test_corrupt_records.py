"""Malformed-record handling on JSON/CSV sources — the ingestion
contract for dirty data: PERMISSIVE captures the raw line in a corrupt
column (quarantine-table pattern), DROPMALFORMED silently filters,
FAILFAST aborts the read. The reference's analog is its convert-error
counting (C1, query.go) — same three policies a 100 TB ingest chooses
between, here at the SOURCE level before any parsing logic runs."""

from __future__ import annotations

import pytest


def _write_json(tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{broken json\n"
        '{"id": 3, "v": "c"}\n'
    )
    return str(p)


def test_json_permissive_quarantines_corrupt_line(spark, tmp_path):
    path = _write_json(tmp_path)
    df = (
        spark.read.schema("id long, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0]._corrupt_record.startswith("{broken")
    assert bad[0].id is None  # typed fields NULL on the quarantined row
    good_ids = sorted(r.id for r in rows if r._corrupt_record is None)
    assert good_ids == [1, 3]


def test_json_dropmalformed_filters(spark, tmp_path):
    path = _write_json(tmp_path)
    df = (
        spark.read.schema("id long, v string")
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_json_failfast_raises(spark, tmp_path):
    path = _write_json(tmp_path)
    df = spark.read.schema("id long, v string").option("mode", "FAILFAST").json(path)
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_csv_permissive_and_dropmalformed(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,v\n1,a\nnot_a_number,b\n3,c\n")
    permissive = (
        spark.read.schema("id long, v string, _corrupt_record string")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = permissive.collect()
    assert len(rows) == 3
    assert sum(r._corrupt_record is not None for r in rows) == 1
    dropped = (
        spark.read.schema("id long, v string")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]
