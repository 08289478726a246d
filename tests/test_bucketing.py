"""Bucketing artifact (SCALE.md claim → measured evidence): tables
bucketed on the join key co-locate, so the join plans WITHOUT a shuffle
exchange on either side — the setup a recurring 100 TB fact⋈fact workload
would use instead of re-shuffling per query."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(bcast_key)
    spark.conf.set(bcast_key, "-1")  # force a merge join so the point shows
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .option("path", str(tmp_path / "orders_b")).mode("overwrite")
            .saveAsTable("orders_bucketed")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .option("path", str(tmp_path / "lineitem_b")).mode("overwrite")
            .saveAsTable("lineitem_bucketed")
        )
        ob = spark.table("orders_bucketed")
        lb = spark.table("lineitem_bucketed")

        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no shuffle on either join side — the only
        # allowed exchange is the tiny post-join aggregation one.
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, f"expected bucketed join without join-side shuffles:\n{plan[:2000]}"

        # same query unbucketed shuffles both sides
        plain = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus").count()
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange hashpartitioning") >= 2

        # and the answers agree
        got = {r["o_orderstatus"]: r["count"] for r in joined.collect()}
        want = {r["o_orderstatus"]: r["count"] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set(bcast_key, prev)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
