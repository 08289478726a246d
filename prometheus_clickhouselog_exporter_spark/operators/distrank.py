"""Distributed rank / prefix-sum primitives — the replacement for
no-partition ``row_number()``/``ntile()`` windows over open-domain
frames (vocabulary, documents, users), where one task would otherwise
sort the whole domain at 100 TB.

The shape is the multi-tier bucketed prefix sum of
``range_join_value_neighbors_distributed`` (workloads/relational2.py):
bucket the integer key, prefix-sum WITHIN buckets (partitioned window,
≤fanout rows per frame), prefix-sum bucket totals within super-buckets
(partitioned window again), and fold the ≤|key range|/fanout² super-
bucket totals on the driver behind a fail-loud cap. No no-partition
Window exists anywhere; the only collect is the tiny top tier.

Reference parity note: /root/reference (query.go:1-289) has no ranking
surface; this is engine infrastructure for the §2.3 operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FANOUT = 4096  # branching factor per prefix tier
_TOP_CAP = 4_000_000  # driver-fold guard: key range / fanout² rows


def exclusive_prefix(
    df: DataFrame,
    key: str,
    weight: str | None = None,
    ascending: bool = True,
    out: str = "pre",
) -> DataFrame:
    """Add ``out`` = Σ weight over rows whose ``key`` sorts STRICTLY
    before this row's (ascending or descending). Keys must be integral
    and UNIQUE (callers aggregate to unique keys first — that aggregate
    is also what bounds each window partition here to ≤fanout rows).

    With unique integer keys, ``pre + 1`` under weight=1 is exactly the
    no-partition ``row_number() OVER (ORDER BY key)`` — computed with
    every Window partitioned and the top tier a bounded driver fold.
    """
    spark = df.sparkSession
    w = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    base = df.withColumn("__w", w).withColumn(
        "__g", F.floor(F.col(key) / _FANOUT)
    )
    order = [F.col(key).asc() if ascending else F.col(key).desc()]
    w1 = (
        Window.partitionBy("__g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = base.withColumn(
        "__intra", F.coalesce(F.sum("__w").over(w1), F.lit(0)).cast("bigint")
    )
    gt = (
        base.groupBy("__g")
        .agg(F.sum("__w").alias("__gn"))
        .withColumn("__sg", F.floor(F.col("__g") / _FANOUT))
    )
    gorder = [F.col("__g").asc() if ascending else F.col("__g").desc()]
    w2 = (
        Window.partitionBy("__sg")
        .orderBy(*gorder)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gt = gt.withColumn(
        "__gpre", F.coalesce(F.sum("__gn").over(w2), F.lit(0)).cast("bigint")
    ).localCheckpoint(eager=False)
    top_df = gt.groupBy("__sg").agg(F.sum("__gn").alias("__sn")).localCheckpoint(
        eager=False
    )
    n_top = top_df.count()
    if n_top > _TOP_CAP:
        raise ValueError(
            f"exclusive_prefix: {n_top} occupied super-buckets exceeds the "
            f"{_TOP_CAP} driver-fold cap (key span > ~6.7e13); add a tier"
        )
    rows = sorted(
        ((r["__sg"], r["__sn"]) for r in top_df.collect()), reverse=not ascending
    )
    acc, folded = 0, []
    for sgv, sn in rows:  # exclusive prefix over super-bucket totals
        folded.append((int(sgv), int(acc)))
        acc += int(sn)
    tops = spark.createDataFrame(folded or [(0, 0)], "__sg bigint, __toppre bigint")
    gofs = gt.join(F.broadcast(tops), "__sg").select(
        "__g", (F.col("__gpre") + F.col("__toppre")).alias("__gofs")
    )
    return (
        base.join(F.broadcast(gofs), "__g")
        .withColumn(out, (F.col("__intra") + F.col("__gofs")).cast("bigint"))
        .drop("__w", "__g", "__intra", "__gofs")
    )


def ntile_from_rank(rank: Column, n: Column, buckets: int) -> Column:
    """ANSI ``ntile(buckets)`` from an explicit 1-based rank and total
    count — the first ``n % buckets`` tiles take ``n DIV buckets + 1``
    rows, the rest ``n DIV buckets`` (identical algorithm in Spark's
    NTile and DuckDB's ntile, so rank arithmetic reproduces the window
    bit-for-bit without the single-partition sort)."""
    rem = n % buckets
    q = ((n - rem) / buckets).cast("bigint")  # exact: numerator divisible
    cut = rem * (q + 1)
    return (
        F.when(rank <= cut, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((rank - 1 - cut) / q) + 1)
        .cast("int")
    )
