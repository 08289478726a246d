"""Relational battery, round 8 batch 3: HITS hubs & authorities.

Completes the link-analysis family (PageRank, label propagation, SSSP,
k-core, clustering coefficient, link prediction) with the second
classic eigenvector-style ranking — Kleinberg's HITS — on a genuinely
DIRECTED bipartite graph: customer → supplier edges from who-bought-
from-whom. Scores stay INTEGERS for the fixed two mutual-reinforcement
rounds (no per-iteration normalization — growth is bounded by degree
products, well inside int64 at fixture scale), so every engine-side sum
is reduction-order-free; normalization to [0,1] happens once at the
end (score/max, fround 6).

Reference parity note: /root/reference has no graph surface; §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_ORACLE = """
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
a1 AS (SELECT s, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY s),
h1 AS (
  SELECT e.c, CAST(sum(a1.a) AS BIGINT) AS h
  FROM e JOIN a1 ON a1.s = e.s GROUP BY e.c
),
a2 AS (
  SELECT e.s, CAST(sum(h1.h) AS BIGINT) AS a
  FROM e JOIN h1 ON h1.c = e.c GROUP BY e.s
),
h2 AS (
  SELECT e.c, CAST(sum(a2.a) AS BIGINT) AS h
  FROM e JOIN a2 ON a2.s = e.s GROUP BY e.c
),
amax AS (SELECT max(a) AS m FROM a2),
hmax AS (SELECT max(h) AS m FROM h2),
auth AS (
  SELECT 'authority' AS role, s AS node_id, a AS score,
         floor(a / CAST((SELECT m FROM amax) AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS score_norm,
         CAST(row_number() OVER (ORDER BY a DESC, s) AS BIGINT) AS rk
  FROM a2
),
hub AS (
  SELECT 'hub' AS role, c AS node_id, h AS score,
         floor(h / CAST((SELECT m FROM hmax) AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS score_norm,
         CAST(row_number() OVER (ORDER BY h DESC, c) AS BIGINT) AS rk
  FROM h2
)
SELECT * FROM (
  SELECT * FROM auth WHERE rk <= 20
  UNION ALL
  SELECT * FROM hub WHERE rk <= 20
) ORDER BY role, rk
"""


@query("graph_hits_hub_authority", oracle=_ORACLE)
def graph_hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) on the customer→supplier purchase graph, two
    full mutual-reinforcement rounds from h₀=1: authority(s) = Σ h(c)
    over in-edges, hub(c) = Σ a(s) over out-edges, alternating — all in
    integer arithmetic (round-1 authority is in-degree; growth per
    round is bounded by max-degree products, ≤ ~1e9 here), normalized
    once at the end. Top-20 per role with the raw integer score, the
    normalized score, and rank.

    100 TB: each half-round is one edge⋈score equi-join + one key
    aggregate — identical shuffle shape to the PageRank loop
    (diagnostics.py:300), with the edge list checkpointed once; fixed
    rounds keep the job graph static, integer scores make every
    aggregation order-free."""
    e = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)  # edge list feeds all four half-rounds
    )
    a1 = e.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    h1 = (
        e.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    a2 = (
        e.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h").cast("bigint").alias("a"))
        # supplier-cardinality rows feeding h2 + amax + the output —
        # checkpoint so the half-round chain runs once, not per consumer
        .localCheckpoint(eager=False)
    )
    h2 = (
        e.join(a2, "s")
        .groupBy("c")
        .agg(F.sum("a").cast("bigint").alias("h"))
        .localCheckpoint(eager=False)  # feeds hmax + the output
    )
    amax = a2.agg(F.max("a").alias("m"))
    hmax = h2.agg(F.max("h").alias("m"))
    auth = (
        a2.crossJoin(F.broadcast(amax))
        .select(
            F.lit("authority").alias("role"),
            F.col("s").alias("node_id"),
            F.col("a").alias("score"),
            fround(F.col("a") / F.col("m").cast("double"), 6).alias("score_norm"),
            F.row_number()
            .over(Window.orderBy(F.desc("a"), F.col("s")))
            .cast("bigint")
            .alias("rk"),
        )
        .filter(F.col("rk") <= 20)
    )
    hub = (
        h2.crossJoin(F.broadcast(hmax))
        .select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node_id"),
            F.col("h").alias("score"),
            fround(F.col("h") / F.col("m").cast("double"), 6).alias("score_norm"),
            F.row_number()
            .over(Window.orderBy(F.desc("h"), F.col("c")))
            .cast("bigint")
            .alias("rk"),
        )
        .filter(F.col("rk") <= 20)
    )
    return auth.unionByName(hub).orderBy("role", "rk")
