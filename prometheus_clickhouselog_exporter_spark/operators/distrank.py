"""Distributed rank / prefix-sum primitives — the replacement for
no-partition ``row_number()``/``ntile()`` windows over open-domain
frames (vocabulary, documents, users), where one task would otherwise
sort the whole domain at 100 TB.

The shape is the multi-tier bucketed prefix sum of
``range_join_value_neighbors_distributed`` (workloads/relational2.py):
bucket the integer key, prefix-sum WITHIN buckets (partitioned window,
≤fanout rows per frame), prefix-sum bucket totals within super-buckets
(partitioned window again), and resolve the super-bucket totals either
by a tiny driver fold (small domains) or by RECURSING into this same
primitive (large domains) — so the tier count is data-driven and the
contract genuinely covers unbounded key spans with no fail-loud cap.
Recursion terminates because each tier divides the key span by the
fanout (4096 = 2^12), so depth ≤ ceil(63/12) = 6 for any bigint domain.

Eager-work note (audited by tools/plan_audit.py `build-jobs`): this
primitive runs 1–2 bounded Spark jobs at DataFrame-construction time
(`top_df.count()` + either the ≤cap driver fold or the `gt.count()`
broadcast-size probe). Callers therefore get a materialized plan, not a
lazy builder; the jobs are bounded by construction (tier totals only,
never base rows).

Numeric exactness: buckets are computed with arithmetic shift
(``shiftright(key, 12)``), which IS floor division by 4096 for signed
bigints — no double arithmetic anywhere, so keys are exact over the
full bigint range (the double-division ``floor(key/4096)`` form lost
precision past 2^53 and silently merged buckets).

Reference parity note: /root/reference (query.go:1-289) has no ranking
surface; this is engine infrastructure for the §2.3 operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FANOUT_BITS = 12  # branching factor per prefix tier = 2^12 = 4096
_FANOUT = 1 << _FANOUT_BITS
_DRIVER_FOLD_CAP = 100_000  # super-bucket count above which we recurse
_BROADCAST_CAP = 1_000_000  # per-bucket offset rows above which AQE picks


def _idiv(a: Column, b: Column | int) -> Column:
    """Exact integer floor-division for non-negative ``a`` (and any
    positive ``b``): subtract the positive remainder, then divide as
    decimal so no double rounding occurs up to 2^63."""
    bcol = F.lit(b) if isinstance(b, int) else b
    exact = (a - F.pmod(a, bcol)).cast("decimal(38,0)")
    return (exact / bcol.cast("decimal(38,0)")).cast("bigint")


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
    every Window partitioned; the top tier is either a bounded driver
    fold (≤100k super-buckets) or a recursive call adding another tier.
    """
    spark = df.sparkSession
    w = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    base = df.withColumn("__w", w).withColumn(
        "__g", F.shiftright(F.col(key).cast("bigint"), _FANOUT_BITS)
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
        .withColumn("__sg", F.shiftright(F.col("__g"), _FANOUT_BITS))
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
    if n_top <= _DRIVER_FOLD_CAP:
        rows = sorted(
            ((r["__sg"], r["__sn"]) for r in top_df.collect()),
            reverse=not ascending,
        )
        acc, folded = 0, []
        for sgv, sn in rows:  # exclusive prefix over super-bucket totals
            folded.append((int(sgv), int(acc)))
            acc += int(sn)
        tops = spark.createDataFrame(
            folded or [(0, 0)], "__sg bigint, __toppre bigint"
        )
    else:
        # Data-driven extra tier: the super-bucket totals are themselves
        # a unique-integer-keyed frame, so recurse. Each level divides
        # the key span by 4096; depth is ≤6 for any bigint domain.
        tops = exclusive_prefix(
            top_df, "__sg", weight="__sn", ascending=ascending, out="__toppre"
        ).select("__sg", "__toppre")
    # Per-bucket offsets: broadcast only while small; past the cap let
    # AQE choose (a sparse key domain makes |gofs| approach |rows|, so a
    # forced broadcast there would ship the whole frame to every task).
    gofs = gt.join(
        F.broadcast(tops) if n_top <= _DRIVER_FOLD_CAP else tops, "__sg"
    ).select("__g", (F.col("__gpre") + F.col("__toppre")).alias("__gofs"))
    n_g = gt.count()  # cheap: gt is checkpointed by the n_top action
    if n_g <= _BROADCAST_CAP:
        gofs = F.broadcast(gofs)
    return (
        base.join(gofs, "__g")
        .withColumn(out, (F.col("__intra") + F.col("__gofs")).cast("bigint"))
        .drop("__w", "__g", "__intra", "__gofs")
    )


def ntile_from_rank(rank: Column, n: Column, buckets: int) -> Column:
    """ANSI ``ntile(buckets)`` from an explicit 1-based rank and total
    count — the first ``n % buckets`` tiles take ``n DIV buckets + 1``
    rows, the rest ``n DIV buckets`` (identical algorithm in Spark's
    NTile and DuckDB's ntile, so rank arithmetic reproduces the window
    bit-for-bit without the single-partition sort). All divisions are
    exact-integer (no double rounding past 2^53); a rank outside
    ``[1, n]`` raises at execution time instead of yielding NULL tiles.
    """
    rem = n % buckets
    q = _idiv(n - rem, buckets)  # exact: numerator divisible by buckets
    cut = rem * (q + 1)
    tile = (
        F.when(rank <= cut, _idiv(rank - 1, q + 1) + 1)
        .otherwise(rem + _idiv(rank - 1 - cut, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
    ok = F.assert_true(
        (rank >= 1) & (rank <= n), F.lit("ntile_from_rank: rank outside [1, n]")
    )
    return F.when(ok.isNull(), tile)
