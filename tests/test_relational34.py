"""Round 7 batch 6: SQL UDFs, FK audit, forecast backtest, CEP guard."""

from __future__ import annotations

from prometheus_clickhouselog_exporter_spark.workloads import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_sql_udf_surface_reinvokable(spark):
    """The registry function must survive repeated invocation in one
    session (unique temp-function suffixes) and agree with itself."""
    a = [tuple(r) for r in QUERIES["sql_udf_surface"](spark, SF_DIR).collect()]
    b = [tuple(r) for r in QUERIES["sql_udf_surface"](spark, SF_DIR).collect()]
    assert a == b and len(a) == 3
    assert all(r[1] > 0 and r[2] > 0 for r in a)


def test_fk_audit_synthetic_schema_is_intact(spark):
    rows = QUERIES["dq_referential_integrity"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert all(r.intact and r.n_orphans == 0 for r in rows)
    assert all(r.n_child > 0 for r in rows)


def test_fk_audit_detects_planted_orphans(spark, tmp_path):
    """The detector itself must light up on a corpus WITH orphans —
    write a child table with dangling keys and re-point the audit."""
    import shutil

    from pyspark.sql import functions as F

    from prometheus_clickhouselog_exporter_spark.workloads.core import table

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("orders", "customer", "lineitem", "part", "supplier", "nation"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", sf / f"{t}.parquet")
    # corrupt: shift 10 order custkeys far out of the customer key range
    o = table(spark, SF_DIR, "orders")
    o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.col("o_custkey") + 10_000_000)
        .otherwise(F.col("o_custkey")),
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "orders.parquet"))
    rows = {
        r.rel: r
        for r in QUERIES["dq_referential_integrity"](spark, str(sf)).collect()
    }
    bad = rows["orders.custkey->customer"]
    assert not bad.intact and bad.n_orphans > 0
    # the planted orphan parents also orphan nothing else
    assert rows["customer.nationkey->nation"].intact


def test_forecast_backtest_sane(spark):
    rows = QUERIES["timeseries_forecast_backtest"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_train > 0 and r.n_test > 0
    assert r.mape >= 0


def test_absence_guard_subset_of_unguarded(spark):
    """Guarded conversions are a subset of purchases, and dropping the
    error guard can only ADD conversions (monotonicity probe via a
    manual recount on one user)."""
    rows = QUERIES["pattern_absence_guard"](spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r.n_guarded_conversions <= r.n_purchases for r in rows)
    assert any(r.n_guarded_conversions > 0 for r in rows)
    assert any(r.n_guarded_conversions < r.n_purchases for r in rows)
