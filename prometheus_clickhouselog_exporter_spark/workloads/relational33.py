"""Round 7 batch 5a: temporal-graph reachability, quantile
normalization, Neyman-optimal stratified allocation.

Temporal reachability is the graph family's missing TIME-RESPECTING
member: static BFS/SSSP answer "is there a path"; contagion/influence
questions need paths whose edge times are strictly increasing and whose
hops depart only AFTER the walker arrived. Quantile normalization is
the dataset-mixing recipe (map every stratum's distribution onto the
pooled reference by rank) and Neyman allocation is the published
optimal budget split for stratified sampling (n_h ∝ N_h·σ_h) — both
rendered with exact integer rank/moment arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

@query(
    "graph_temporal_reachability",
    oracle="""
    WITH ev AS MATERIALIZED (
      SELECT user_id, ts, json_extract_string(props, '$.k') AS k
      FROM events WHERE props IS NOT NULL
    ),
    seeds AS MATERIALIZED (
      SELECT user_id, min(ts) AS arrival FROM events
      WHERE event_type = 'signup' AND user_id % 10 = 0
      GROUP BY user_id
    ),
    hop1 AS MATERIALIZED (
      SELECT b.user_id, min(b.ts) AS arrival
      FROM seeds f
      JOIN ev a ON a.user_id = f.user_id AND a.ts >= f.arrival
      JOIN ev b ON b.k = a.k
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
               AND b.user_id <> a.user_id
      GROUP BY b.user_id
    ),
    hop2 AS (
      SELECT b.user_id, min(b.ts) AS arrival
      FROM hop1 f
      JOIN ev a ON a.user_id = f.user_id AND a.ts >= f.arrival
      JOIN ev b ON b.k = a.k
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
               AND b.user_id <> a.user_id
      GROUP BY b.user_id
    ),
    lvl AS (
      SELECT user_id, 0 AS hops, arrival FROM seeds
      UNION ALL SELECT user_id, 1, arrival FROM hop1
      UNION ALL SELECT user_id, 2, arrival FROM hop2
    )
    SELECT user_id,
           CAST(min(hops) AS BIGINT) AS min_hops,
           min_by(arrival, hops) AS first_arrival
    FROM lvl GROUP BY user_id ORDER BY user_id
    """,
)
def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-respecting reachability (contagion/influence semantics) over
    the interaction graph implied by events: users touching the SAME
    props-key within one hour form a directed temporal edge (earlier →
    later). From seed users (user_id % 10 = 0, anchored at their first
    signup), a user is reached at hop h+1 only through an edge whose
    source event departs AT OR AFTER the walker's arrival time — the
    property static BFS cannot express and the reason temporal graphs
    are their own literature. Two unrolled hops; per user the MINIMUM
    hop count and the arrival time at that hop.

    100 TB: the edge join keys on (interaction key, HOUR BUCKET) — the
    interval-join discipline: a bare equi-join on k alone pairs every
    same-key event (quadratic in events-per-key; measured 12.2s at
    sf0.1 before the fix, 100M pair tests), while bucketing by the
    1-hour reach means each source event meets only its own and the
    next bucket's events (one in-row 2-element explode on the source
    side), so pair count tracks per-(k, hour) density² — time-local by
    construction. The exact window predicate filters inside the
    bucket-joined pairs. Frontier size stays user-bounded; each
    frontier is checkpointed (the iterative-graph doctrine)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select(
            "user_id",
            "ts",
            F.get_json_object("props", "$.k").alias("k"),
            F.floor(
                F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600
            ).alias("hb"),  # NTZ → timestamp first (UTC session, value-safe)
        )
        .localCheckpoint(eager=False)  # both join roles in every hop
    )
    seeds = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "signup") & (F.col("user_id") % 10 == 0))
        .groupBy("user_id")
        .agg(F.min("ts").alias("arrival"))
        .localCheckpoint(eager=False)
    )
    a = ev.select(
        F.col("user_id").alias("_au"),
        F.col("ts").alias("_ats"),
        "k",
        F.explode(F.array(F.col("hb"), F.col("hb") + 1)).alias("_jb"),
    )
    b = ev.select(
        F.col("user_id").alias("_bu"),
        F.col("ts").alias("_bts"),
        F.col("k").alias("_bk"),
        F.col("hb").alias("_bhb"),
    )

    def hop(frontier: DataFrame) -> DataFrame:
        return (
            frontier.join(
                a,
                (F.col("_au") == F.col("user_id")) & (F.col("_ats") >= F.col("arrival")),
            )
            .join(
                b,
                (F.col("_bk") == F.col("k"))
                & (F.col("_bhb") == F.col("_jb"))
                & (F.col("_bts") > F.col("_ats"))
                & (F.col("_bts") <= F.col("_ats") + F.expr("INTERVAL 1 HOUR"))
                & (F.col("_bu") != F.col("_au")),
            )
            .groupBy(F.col("_bu").alias("user_id"))
            .agg(F.min("_bts").alias("arrival"))
            .localCheckpoint(eager=False)
        )

    hop1 = hop(seeds)
    hop2 = hop(hop1)
    lvl = (
        seeds.select("user_id", F.lit(0).alias("hops"), "arrival")
        .unionByName(hop1.select("user_id", F.lit(1).alias("hops"), "arrival"))
        .unionByName(hop2.select("user_id", F.lit(2).alias("hops"), "arrival"))
    )
    return (
        lvl.groupBy("user_id")
        .agg(
            F.min("hops").cast("bigint").alias("min_hops"),
            F.min_by("arrival", "hops").alias("first_arrival"),
        )
        .orderBy("user_id")
    )


@query(
    "quantile_normalize_doclen",
    oracle="""
    WITH pooled AS MATERIALIZED (
      SELECT n_chars AS v,
             row_number() OVER (ORDER BY n_chars, doc_id) AS prank,
             count(*) OVER () AS nn
      FROM documents
    ),
    per_src AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    mapped AS (
      SELECT doc_id, source, n_chars,
             CAST(ceil(CAST(r AS DOUBLE) * (SELECT max(nn) FROM pooled)
                       / ns) AS BIGINT) AS target_rank
      FROM per_src
    )
    SELECT m.doc_id, m.source, m.n_chars,
           CAST(p.v AS BIGINT) AS normalized_chars
    FROM mapped m JOIN pooled p ON p.prank = m.target_rank
    ORDER BY m.doc_id
    """,
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across strata (the microarray-literature
    recipe, used in dataset mixing to remove per-source length bias):
    every document's length maps to the POOLED distribution's value at
    the same relative rank — rank r of n_s within source s → pooled
    order statistic at ceil(r·N/n_s). Pure integer rank arithmetic
    (ties broken by doc_id), so the mapping is exact and
    engine-invariant; after normalization every source has an identical
    length distribution by construction (pinned in tests).

    100 TB: the pooled order statistic is looked up WITHOUT a global
    per-row rank window (the unbounded-global-window invariant): value
    counts groupBy n_chars (value-cardinality), an exclusive prefix over
    that small series gives each value's pooled rank span
    (offset, offset+cnt], each span explodes into the fixed-width rank
    BUCKETS it covers (Σ spans = N ⇒ ≤ N/W + |values| bucket rows), and
    target ranks equi-join on their bucket — every shuffle is keyed, the
    only unpartitioned window runs on the value-cardinality count
    series. Per-source ranks are source-partitioned windows."""
    d = table(spark, sf_dir, "documents").localCheckpoint(eager=False)
    nn = d.agg(F.count(F.lit(1)).alias("nn"))
    w_bucket = 256
    # value-cardinality count series → exclusive pooled-rank offsets
    # single consumer — no checkpoint, so the audit SEES the aggregate
    # bounding the global window below (value-cardinality input)
    cnts = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    spans = cnts.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("offset"),
    )
    # each value's rank span (offset, offset+cnt] → the rank buckets it covers
    buckets = spans.select(
        "v",
        "cnt",
        "offset",
        F.explode(
            F.sequence(
                F.floor(F.col("offset") / w_bucket),
                F.floor((F.col("offset") + F.col("cnt") - 1) / w_bucket),
            )
        ).alias("rb"),
    )
    per_src = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("source").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("ns"),
    )
    mapped = per_src.crossJoin(F.broadcast(nn)).select(
        "doc_id",
        "source",
        "n_chars",
        F.ceil(F.col("r").cast("double") * F.col("nn") / F.col("ns"))
        .cast("bigint")
        .alias("t"),
    ).withColumn("rb", F.floor((F.col("t") - 1) / w_bucket))
    return (
        mapped.join(buckets, "rb")
        .filter(
            (F.col("t") > F.col("offset"))
            & (F.col("t") <= F.col("offset") + F.col("cnt"))
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("v").cast("bigint").alias("normalized_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH m AS (
      SELECT source, CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(n_chars) AS BIGINT) AS s,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents GROUP BY source
    ),
    sd AS (
      SELECT source, nh,
             sqrt(CAST(ss AS DOUBLE) / nh
                  - (CAST(s AS DOUBLE) / nh) * (CAST(s AS DOUBLE) / nh))
               AS sigma
      FROM m
    ),
    tot AS (SELECT sum(nh * sigma) AS z, sum(nh) AS n FROM sd)
    SELECT sd.source, sd.nh,
           floor(sd.sigma * 1e6 + 0.5) / 1e6 AS sigma,
           CAST(floor(100.0 * sd.nh * sd.sigma / t.z + 0.5) AS BIGINT)
             AS n_neyman,
           CAST(floor(100.0 * sd.nh / t.n + 0.5) AS BIGINT)
             AS n_proportional
    FROM sd, tot t ORDER BY sd.source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified allocation (the published
    minimum-variance budget split): for a fixed sample budget n = 100,
    stratum h receives n·N_h·σ_h / Σ N_j·σ_j — more where the stratum
    is BIG or internALLY VARIED — versus the proportional allocation
    n·N_h/N a naive sampler uses. σ_h comes from exact BIGINT raw
    moments (Σx, Σx², n per stratum), so the only float ops are the
    final divide/sqrt on identical operands in both engines. The
    selection step (hash-rank top-n_h per stratum) is the registry's
    existing sample_stratified machinery; this operator is the
    allocation MATH, reported per stratum.

    100 TB: one map-side-combined aggregate; the allocation arithmetic
    runs on |strata| rows."""
    d = table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("nh")
    sigma = F.sqrt(F.col("ss").cast("double") / F.col("nh") - mean * mean)
    sd = m.select("source", "nh", sigma.alias("sigma"))
    tot = sd.agg(
        F.sum(F.col("nh") * F.col("sigma")).alias("z"),
        F.sum("nh").alias("n"),
    )
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "nh",
            fround(F.col("sigma"), 6).alias("sigma"),
            F.floor(100.0 * F.col("nh") * F.col("sigma") / F.col("z") + F.lit(0.5))
            .cast("bigint")
            .alias("n_neyman"),
            F.floor(100.0 * F.col("nh") / F.col("n") + F.lit(0.5))
            .cast("bigint")
            .alias("n_proportional"),
        )
        .orderBy("source")
    )
