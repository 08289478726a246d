"""Round 10 batch: grid-bucketed DBSCAN, Hilbert-curve layout manifest,
multi-source closeness centrality, and the ClickHouse sumMap/minMap/
maxMap combinator family — DuckDB-oracle-checked, integer-exact.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has no spatial/graph/layout surface; §2.3 north-star
territory. Methods are public: Ester et al. 1996 (DBSCAN), Hilbert 1891
/ the standard xy2d bit algorithm, Bavelas 1950 (closeness centrality),
ClickHouse -Map combinator docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, md5_long, query, table

# --- grid DBSCAN -------------------------------------------------------------

_G = 50  # grid side
_DENS_X = 18  # core iff nbr_events * G^2 >= _DENS_X * total (2x avg 3x3 density)
_ROUNDS = 16  # neighbor-min + pointer-jump rounds (see docstring)


def _dbscan_sql() -> str:
    rounds = []
    prev = "l0"
    for k in range(1, _ROUNDS + 1):
        rounds.append(f"""
    r{k}a AS MATERIALIZED (
      SELECT lab.pid,
             least(lab.l, coalesce(m.nl, lab.l)) AS l
      FROM {prev} lab LEFT JOIN (
        SELECT a.dst AS pid, min(lb.l) AS nl
        FROM adjc a JOIN {prev} lb ON a.src = lb.pid GROUP BY a.dst
      ) m USING (pid)
    ),
    r{k} AS MATERIALIZED (
      SELECT a.pid, b.l FROM r{k}a a JOIN r{k}a b ON a.l = b.pid
    )""")
        prev = f"r{k}"
    rounds_sql = ",".join(rounds)
    return f"""
    WITH pts AS (
      SELECT CAST(('0x' || substr(md5('p|' || event_id), 1, 12)) AS UBIGINT)
               AS h
      FROM events
    ),
    placed AS (
      SELECT CASE WHEN h % 10 < 7 THEN
               (CASE (h // 10) % 3 WHEN 0 THEN 10 WHEN 1 THEN 25
                     ELSE 40 END) + CAST((h // 100) % 7 AS BIGINT) - 3
             ELSE CAST((h // 100) % {_G} AS BIGINT) END AS x,
             CASE WHEN h % 10 < 7 THEN
               (CASE (h // 10) % 3 WHEN 0 THEN 10 WHEN 1 THEN 35
                     ELSE 15 END) + CAST((h // 1000) % 7 AS BIGINT) - 3
             ELSE CAST((h // 10000) % {_G} AS BIGINT) END AS y
      FROM pts
    ),
    cells AS MATERIALIZED (
      SELECT x, y, CAST(count(*) AS BIGINT) AS n_events
      FROM placed GROUP BY 1, 2
    ),
    offs AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx),
                                 (SELECT unnest([-1, 0, 1]) AS dy)),
    nbr AS (
      SELECT c.x + o.dx AS nx, c.y + o.dy AS ny,
             CAST(sum(c.n_events) AS BIGINT) AS nbr_events
      FROM cells c CROSS JOIN offs o GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM cells),
    dens AS MATERIALIZED (
      SELECT c.x, c.y, c.x * {_G} + c.y AS pid, c.n_events, n.nbr_events,
             n.nbr_events * {_G} * {_G} >= {_DENS_X} * t.total AS is_core
      FROM cells c JOIN nbr n ON c.x = n.nx AND c.y = n.ny CROSS JOIN tot t
    ),
    corec AS MATERIALIZED (SELECT * FROM dens WHERE is_core),
    adjc AS MATERIALIZED (
      SELECT a.pid AS src, b.pid AS dst
      FROM corec a CROSS JOIN offs o
      JOIN corec b ON a.x + o.dx = b.x AND a.y + o.dy = b.y
    ),
    l0 AS MATERIALIZED (SELECT pid, pid AS l FROM corec),
    {rounds_sql},
    viol AS (
      SELECT CAST(count(*) AS BIGINT) AS n_viol
      FROM adjc a
      JOIN {prev} s ON a.src = s.pid
      JOIN {prev} t ON a.dst = t.pid
      WHERE s.l <> t.l
    ),
    core_stats AS (
      SELECT f.l AS cluster_id,
             CAST(count(*) AS BIGINT) AS n_core_cells,
             CAST(sum(c.n_events) AS BIGINT) AS core_events
      FROM {prev} f JOIN corec c USING (pid) GROUP BY f.l
    ),
    border AS (
      SELECT d.pid, min(f.l) AS cl, any_value(d.n_events) AS n_events
      FROM dens d CROSS JOIN offs o
      JOIN corec b ON d.x + o.dx = b.x AND d.y + o.dy = b.y
      JOIN {prev} f ON b.pid = f.pid
      WHERE NOT d.is_core
      GROUP BY d.pid
    ),
    border_stats AS (
      SELECT cl AS cluster_id, CAST(count(*) AS BIGINT) AS n_border_cells,
             CAST(sum(n_events) AS BIGINT) AS border_events
      FROM border GROUP BY cl
    )
    SELECT c.cluster_id, c.n_core_cells,
           CAST(coalesce(b.n_border_cells, 0) AS BIGINT) AS n_border_cells,
           CAST(c.core_events + coalesce(b.border_events, 0) AS BIGINT)
             AS n_events,
           (SELECT n_viol = 0 FROM viol) AS converged
    FROM core_stats c LEFT JOIN border_stats b USING (cluster_id)
    ORDER BY cluster_id
    """


@query("spatial_dbscan_grid", oracle=_dbscan_sql())
def spatial_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed DBSCAN (Ester et al. 1996) over a planted point
    cloud: the corpus' raw (user, value) attributes are UNIFORM on the
    grid (measured — no density signal survives sf0.01), so per the
    fixture-signal rule the mixture is planted IN-PLAN from the event-id
    hash (3 dense 7x7 blobs at 11x average density + 30% uniform noise,
    identical arithmetic on both engines) — DBSCAN then has real
    structure to recover at EVERY scale factor. A cell is CORE when its
    Chebyshev-1 neighborhood's EVENT density is ≥ 2x the grid average
    (nbr·G² ≥ 18·total — an exact integer comparison, and RELATIVE, so
    the cluster structure is scale-invariant where an absolute minPts
    would saturate at 10x the data); clusters are connected components of
    core-core adjacency; occupied non-core cells adjacent to a core
    join its cluster as BORDER (min-label tie-break); the rest is
    noise. Components resolve by 16 rounds of neighbor-min + pointer
    jumping — min-label flows 1 hop per round plus a shortcut through
    each vertex's best-known pid, which cascades along the pid gradient;
    the grid diameter is ≤ 98 and a `converged` certificate (zero
    label-discordant core edges) rides the value hash on BOTH engines,
    so an unconverged run is VISIBLE, not silent.

    100 TB: density is ONE cell census + a 9-offset contribution
    re-aggregation (points never pair); component rounds operate on the
    ≤ G² core-cell frame — grid-bounded, not corpus-bounded; each round
    is two keyed joins + a localCheckpoint to cut lineage. The oracle
    unrolls the identical 16 rounds as materialized CTEs."""
    e = table(spark, sf_dir, "events")
    h = md5_long(F.concat(F.lit("p|"), F.col("event_id").cast("string")))
    bx = (
        F.when(F.expr("h div 10") % 3 == 0, 10)
        .when(F.expr("h div 10") % 3 == 1, 25)
        .otherwise(40)
    )
    by = (
        F.when(F.expr("h div 10") % 3 == 0, 10)
        .when(F.expr("h div 10") % 3 == 1, 35)
        .otherwise(15)
    )
    placed = e.select(h.alias("h")).select(
        F.when(
            F.col("h") % 10 < 7, bx + F.expr("(h div 100) % 7") - 3
        )
        .otherwise(F.expr(f"(h div 100) % {_G}"))
        .cast("long")
        .alias("x"),
        F.when(
            F.col("h") % 10 < 7, by + F.expr("(h div 1000) % 7") - 3
        )
        .otherwise(F.expr(f"(h div 10000) % {_G}"))
        .cast("long")
        .alias("y"),
    )
    cells = placed.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    ).localCheckpoint(
        eager=False
    )  # consumers: 9-offset contribution, density join, total
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    contrib = cells.select("x", "y", "n_events", offs).select(
        (F.col("x") + F.col("o.dx")).alias("nx"),
        (F.col("y") + F.col("o.dy")).alias("ny"),
        "n_events",
    )
    nbr = contrib.groupBy("nx", "ny").agg(
        F.sum("n_events").cast("bigint").alias("nbr_events")
    )
    tot = cells.agg(F.sum("n_events").cast("bigint").alias("total"))
    dens = (
        cells.join(nbr, (F.col("x") == F.col("nx")) & (F.col("y") == F.col("ny")))
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            (F.col("x") * _G + F.col("y")).alias("pid"),
            "n_events",
            "nbr_events",
            (
                F.col("nbr_events") * _G * _G >= F.lit(_DENS_X) * F.col("total")
            ).alias("is_core"),
        )
        .localCheckpoint(eager=False)  # consumers: core set + border pass
    )
    # r13 optimization pass (guide §1.2 step 1 — fix the distributed
    # algorithm): everything past `dens` operates on a GRID-bounded frame
    # (≤ G² = 2500 rows at ANY corpus scale — the census already collapsed
    # the events), yet the 16-round min-label loop spent ~50 tiny
    # shuffle/checkpoint stages on it: measured 0.4 s for scan+census vs
    # 11.8 s for the full query at sf0.1 — >95% pure scheduling overhead.
    # The loop's converged fixpoint is computable exactly in one bounded
    # driver fold (the repo's bounded-collect discipline: ≤ G² rows of
    # plan metadata, never corpus data — same bound the old loop's
    # broadcast sides relied on). EQUIVALENCE: min-label propagation only
    # ever lowers labels, every label is a pid within the component, and
    # the component-min cell can never lower its own — so a CONVERGED run
    # (zero discordant core edges, which is what the old `n_viol == 0`
    # certificate asserted and the oracle's unrolled 16 rounds reproduce)
    # has every core label equal to its component's min pid. The driver
    # fold (below) replays the oracle's own 16 rounds exactly, so the
    # labeling AND the converged certificate agree with the oracle in
    # every regime; hash-verified vs the oracle's 16-round replay at
    # sf0.001/0.01/0.1. The 16-round budget with pointer jumping
    # converges on the 50×50 grid (diameter ≤ 98, shortcut cascade ≫
    # log₂ 98 rounds).
    rows = dens.collect()  # ≤ G² cells, SF-invariant by construction
    occ = {(r["x"], r["y"]): r for r in rows}
    core_pids = {r["pid"]: r for r in rows if r["is_core"]}
    # r14 (ADVICE r13 #1): the fold now replays the oracle's EXACT
    # 16-round loop (neighbor-min then one pointer jump per round) over
    # the ≤ G² core cells instead of computing the union-find fixpoint
    # and hard-coding converged=True. On a converged run the two agree
    # (the r13 equivalence argument); on a hypothetically unconverged
    # data distribution the replay reproduces the oracle's partial
    # labels AND its converged=False instead of silently diverging.
    # Cost: O(_ROUNDS · 9 · G²) driver dict ops — same boundedness story
    # as the collect above (plan metadata, never corpus data).
    nbrs: dict[int, list[int]] = {}
    for r in core_pids.values():
        nbrs[r["pid"]] = [
            occ[(r["x"] + dx, r["y"] + dy)]["pid"]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (r["x"] + dx, r["y"] + dy) in occ
            and occ[(r["x"] + dx, r["y"] + dy)]["is_core"]
        ]
    labels = {p: p for p in core_pids}
    for _ in range(_ROUNDS):
        la = {
            p: min(labels[p], min(labels[q] for q in ns))
            for p, ns in nbrs.items()
        }
        labels = {p: la[la[p]] for p in core_pids}
    converged = all(
        labels[p] == labels[q] for p, ns in nbrs.items() for q in ns
    )
    core_stats: dict[int, list[int]] = {}
    for r in core_pids.values():
        cs = core_stats.setdefault(labels[r["pid"]], [0, 0])
        cs[0] += 1
        cs[1] += r["n_events"]
    border_stats: dict[int, list[int]] = {}
    for r in rows:
        if r["is_core"]:
            continue
        labs = [
            labels[occ[(r["x"] + dx, r["y"] + dy)]["pid"]]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (r["x"] + dx, r["y"] + dy) in occ
            and occ[(r["x"] + dx, r["y"] + dy)]["is_core"]
        ]
        if labs:
            bs = border_stats.setdefault(min(labs), [0, 0])
            bs[0] += 1
            bs[1] += r["n_events"]
    out = [
        (
            int(lid),
            int(cs[0]),
            int(border_stats.get(lid, (0, 0))[0]),
            int(cs[1] + border_stats.get(lid, (0, 0))[1]),
            converged,
        )
        for lid, cs in sorted(core_stats.items())
    ]
    return spark.createDataFrame(
        out,
        "cluster_id bigint, n_core_cells bigint, n_border_cells bigint,"
        " n_events bigint, converged boolean",
    ).orderBy("cluster_id")


# --- Hilbert-curve layout manifest -------------------------------------------


def _hilbert_sql2() -> str:
    # carry the ORIGINAL coordinates through the stages (x0, y0) so the
    # manifest can report per-tile min/max of the query columns
    stages = [
        """
    h0 AS (
      SELECT user_id % 256 AS x,
             least(CAST(floor(value * 10) AS BIGINT), 255) AS y,
             user_id % 256 AS x0,
             least(CAST(floor(value * 10) AS BIGINT), 255) AS y0,
             CAST(0 AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL
    )"""
    ]
    prev = "h0"
    for i, s in enumerate((128, 64, 32, 16, 8, 4, 2, 1), start=1):
        stages.append(f"""
    h{i} AS (
      SELECT
        CASE WHEN (y & {s}) > 0 THEN x
             WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END AS x,
        CASE WHEN (y & {s}) > 0 THEN y
             WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END AS y,
        x0, y0,
        d + {s} * {s} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                            (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS d
      FROM {prev}
    )""")
        prev = f"h{i}"
    return f"""
    WITH {",".join(stages)}
    SELECT CAST(d >> 12 AS BIGINT) AS tile,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(d) AS BIGINT) AS h_min, CAST(max(d) AS BIGINT) AS h_max,
           CAST(min(x0) AS BIGINT) AS x_min, CAST(max(x0) AS BIGINT) AS x_max,
           CAST(min(y0) AS BIGINT) AS y_min, CAST(max(y0) AS BIGINT) AS y_max
    FROM {prev} GROUP BY 1 ORDER BY tile
    """


@query("layout_hilbert_manifest", oracle=_hilbert_sql2())
def layout_hilbert_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout manifest — the locality-preserving
    alternative to layout_zorder_manifest over the SAME two query
    columns (user bucket × value bucket): the standard xy2d bit
    algorithm (quadrant digit + rotate/reflect per level, 8 levels =
    16-bit index) unrolled as EIGHT SEQUENTIAL PROJECTIONS, so the
    expression tree stays linear (a nested single-expression form would
    grow 3^8 nodes). Per-tile (d >> 12) footer stats of both dimensions
    are the skip-index quality signal; Hilbert's guarantee vs Morton is
    no long diagonal jumps, i.e. tighter per-tile x/y spans at the same
    tile count.

    100 TB: zero joins — the whole index is scan-stage integer bit
    math inside whole-stage codegen (8 chained projections fuse into
    one stage); the manifest is an O(tiles) aggregate. The production
    write is repartitionByRange(hval) + sortWithinPartitions, exactly
    as the zorder twin documents."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (F.col("user_id") % 256).cast("long")
    y = F.least(F.floor(F.col("value") * 10), F.lit(255)).cast("long")
    df = e.select(
        x.alias("x"), y.alias("y"), x.alias("x0"), y.alias("y0"),
        F.lit(0).cast("long").alias("d"),
    )
    for s in (128, 64, 32, 16, 8, 4, 2, 1):
        rx = F.when(F.col("x").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(F.col("y").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        df = df.select(
            F.when(ry == 1, F.col("x"))
            .otherwise(
                F.when(rx == 1, F.lit(s - 1) - F.col("y")).otherwise(F.col("y"))
            )
            .alias("x"),
            F.when(ry == 1, F.col("y"))
            .otherwise(
                F.when(rx == 1, F.lit(s - 1) - F.col("x")).otherwise(F.col("x"))
            )
            .alias("y"),
            "x0",
            "y0",
            (F.col("d") + F.lit(s * s) * (rx * 3).bitwiseXOR(ry)).alias("d"),
        )
    return (
        df.groupBy(F.shiftright("d", 12).cast("long").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("d").cast("bigint").alias("h_min"),
            F.max("d").cast("bigint").alias("h_max"),
            F.min("x0").cast("bigint").alias("x_min"),
            F.max("x0").cast("bigint").alias("x_max"),
            F.min("y0").cast("bigint").alias("y_min"),
            F.max("y0").cast("bigint").alias("y_max"),
        )
        .orderBy("tile")
    )


# --- multi-source closeness centrality ---------------------------------------

_CLOSE_ORACLE = """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree
            FROM e0 GROUP BY src),
    seeds AS MATERIALIZED (
      SELECT src AS seed, degree FROM deg ORDER BY degree DESC, src LIMIT 8
    ),
    f1 AS MATERIALIZED (
      SELECT DISTINCT s.seed, e.dst AS node
      FROM seeds s JOIN e0 e ON e.src = s.seed
    ),
    f2 AS MATERIALIZED (
      SELECT DISTINCT f.seed, e.dst AS node
      FROM f1 f JOIN e0 e ON e.src = f.node
      WHERE e.dst <> f.seed
        AND NOT EXISTS (SELECT 1 FROM f1 p
                        WHERE p.seed = f.seed AND p.node = e.dst)
    ),
    f3 AS MATERIALIZED (
      SELECT DISTINCT f.seed, e.dst AS node
      FROM f2 f JOIN e0 e ON e.src = f.node
      WHERE e.dst <> f.seed
        AND NOT EXISTS (SELECT 1 FROM f1 p
                        WHERE p.seed = f.seed AND p.node = e.dst)
        AND NOT EXISTS (SELECT 1 FROM f2 p
                        WHERE p.seed = f.seed AND p.node = e.dst)
    ),
    counts AS (
      SELECT s.seed, s.degree,
             (SELECT count(*) FROM f1 WHERE f1.seed = s.seed) AS n1,
             (SELECT count(*) FROM f2 WHERE f2.seed = s.seed) AS n2,
             (SELECT count(*) FROM f3 WHERE f3.seed = s.seed) AS n3
      FROM seeds s
    )
    SELECT seed, degree,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(n3 AS BIGINT) AS n3,
           CAST(6 * n1 + 3 * n2 + 2 * n3 AS BIGINT) AS harmonic6,
           CASE WHEN n1 + 2 * n2 + 3 * n3 > 0 THEN
             floor(CAST(n1 + n2 + n3 AS DOUBLE)
                   / (n1 + 2 * n2 + 3 * n3) * 1e6 + 0.5) / 1e6
           END AS closeness3
    FROM counts ORDER BY seed
    """


@query("graph_closeness_centrality", oracle=_CLOSE_ORACLE)
def graph_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness centrality (Bavelas 1950) of the 8 highest-degree
    parts in the co-purchase graph, truncated at radius 3 (the k-hop
    closeness every billion-node system computes instead of full BFS):
    multi-source BFS carried as a per-NODE 8-bit seed mask (one bit per
    seed), so each round is one edges⋈mask join + one bit_or hash
    aggregate on dst — the map-side partial OR collapses the candidate
    fan-out (Σ_seeds |frontier edges|, ~13M rows at sf0.1) into
    |V|-bounded partials before the shuffle, where the r11 per-
    (seed,node) formulation shuffled the whole fan-out through a
    distinct plus 1-2 anti-joins per round (r13 constant-factor pass,
    VERDICT r12 #2: 7.8 s → ~2.6 s warm). Visited-set subtraction is
    mask arithmetic (& ~m1 & ~m2 & ~selfbit), not a join; harmonic
    closeness kept EXACT as 6·Σ1/d = 6n₁+3n₂+2n₃ (lcm trick — no float
    sum), plus the classic (reached−1)/Σd at radius 3.

    100 TB: edges are order-local pairs (never a global cross join);
    the mask frame is |V|-bounded (≤ one row per node, 1 long of state
    per node regardless of seed count up to 64) and broadcast to the
    adjacency scan; the bit_or aggregate partitions by dst. Seed choice
    is TakeOrderedAndProject over the degree census; the row_number that
    assigns bits windows over exactly 8 post-limit rows.

    r13 optimization pass (guide §2.3/§2.4): the graph state is ONE
    adjacency-list frame — pairs grouped to (src, collect_set(dst)) in a
    single exchange. collect_set subsumes the edge-list distinct (one
    exchange of the raw pair stream saved), degree = size(ns) makes the
    census exchange-free, and each BFS round joins + explodes the
    |V|-row checkpointed adjacency instead of re-probing a 2.4M-row edge
    list (7.5 s → 3.7 s same-session A/B, rows identical). Adjacency
    cells are co-occurrence-bounded (orders-per-part × cart size ≈
    constant in SF), the same bound the edge form relied on."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    adj = (
        pairs.groupBy("src")
        .agg(F.collect_set("dst").alias("ns"))
        .localCheckpoint(eager=False)  # consumed by census + 3 rounds
    )
    deg = adj.select(
        F.col("src").alias("node"), F.size("ns").cast("bigint").alias("degree")
    )
    seeds = (
        deg.orderBy(F.col("degree").desc(), "node")
        .limit(8)
        .select(F.col("node").alias("seed"), "degree")
        .withColumn(
            "bit",
            F.row_number().over(
                Window.orderBy(F.col("degree").desc(), F.col("seed"))
            )
            - 1,
        )
        .localCheckpoint(eager=False)  # 8 rows; reused by 3 rounds + output
    )
    seedbits = seeds.select(
        F.col("seed").alias("node"),
        F.expr("shiftleft(1L, bit)").cast("long").alias("selfbit"),
    )

    def spread(m: DataFrame) -> DataFrame:
        """One BFS round: OR every frontier node's seed mask onto its
        out-neighbors. bit_or is commutative/idempotent, so the hash
        aggregate's map-side partial does the dedup the old distinct
        paid a full shuffle for."""
        return (
            adj.join(F.broadcast(m), F.col("src") == F.col("node"))
            .select(F.explode("ns").alias("dst"), "mask")
            .groupBy("dst")
            .agg(F.bit_or("mask").alias("raw"))
            .select(F.col("dst").alias("node"), "raw")
        )

    m1 = (
        adj.join(
            F.broadcast(seeds.select("seed", "bit")),
            F.col("src") == F.col("seed"),
        )
        .select(
            F.explode("ns").alias("node"),
            F.expr("shiftleft(1L, bit)").cast("long").alias("b"),
        )
        .groupBy("node")
        .agg(F.bit_or("b").alias("mask"))
        .localCheckpoint(eager=False)
    )
    zero = F.lit(0).cast("long")
    ex1 = m1.select("node", F.col("mask").alias("v1"))
    m2 = (
        spread(m1)
        .join(ex1, "node", "left")
        .join(F.broadcast(seedbits), "node", "left")
        .select(
            "node",
            F.col("raw")
            .bitwiseAND(F.bitwise_not(F.coalesce(F.col("v1"), zero)))
            .bitwiseAND(F.bitwise_not(F.coalesce(F.col("selfbit"), zero)))
            .alias("mask"),
        )
        .filter(F.col("mask") != 0)
        .localCheckpoint(eager=False)
    )
    ex2 = m2.select("node", F.col("mask").alias("v2"))
    m3 = (
        spread(m2)
        .join(ex1, "node", "left")
        .join(ex2, "node", "left")
        .join(F.broadcast(seedbits), "node", "left")
        .select(
            "node",
            F.col("raw")
            .bitwiseAND(F.bitwise_not(F.coalesce(F.col("v1"), zero)))
            .bitwiseAND(F.bitwise_not(F.coalesce(F.col("v2"), zero)))
            .bitwiseAND(F.bitwise_not(F.coalesce(F.col("selfbit"), zero)))
            .alias("mask"),
        )
        .filter(F.col("mask") != 0)
    )

    def level_counts(m: DataFrame, name: str) -> DataFrame:
        return (
            m.select(
                F.explode(
                    F.expr("filter(sequence(0, 7), j -> bit_get(mask, j) = 1)")
                ).alias("bit")
            )
            .groupBy("bit")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    counts = (
        seeds.join(level_counts(m1, "n1"), "bit", "left")
        .join(level_counts(m2, "n2"), "bit", "left")
        .join(level_counts(m3, "n3"), "bit", "left")
        .select(
            "seed",
            "degree",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
                for c in ("n1", "n2", "n3")
            ],
        )
    )
    denom = F.col("n1") + 2 * F.col("n2") + 3 * F.col("n3")
    return counts.select(
        "seed",
        "degree",
        "n1",
        "n2",
        "n3",
        (6 * F.col("n1") + 3 * F.col("n2") + 2 * F.col("n3"))
        .cast("bigint")
        .alias("harmonic6"),
        F.when(
            denom > 0,
            fround(
                (F.col("n1") + F.col("n2") + F.col("n3")).cast("double") / denom,
                6,
            ),
        ).alias("closeness3"),
    ).orderBy("seed")


# --- ClickHouse sumMap / minMap / maxMap combinators --------------------------

_SUMMAP_ORACLE = """
    WITH per_user AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id, event_type,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, user_id, event_type
    )
    SELECT day, event_type AS key,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(count(*) AS BIGINT) AS n_maps
    FROM per_user GROUP BY day, key ORDER BY day, key
    """


@query("clickhouse_summap_battery", oracle=_SUMMAP_ORACLE)
def clickhouse_summap_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse -Map combinator family (sumMap/minMap/maxMap): each
    (day, user) row carries a genuine MAP<event_type, cents> built with
    map_from_entries over its sorted per-type sums, and the combinator
    merges those maps KEY-WISE across rows — sum, min, max per key —
    exactly the documented sumMap((k,v)) semantics. Emitted long-form
    (day, key, ...) so the value hash is dtype-stable; n_maps counts
    the input maps containing each key (ClickHouse's implicit
    denominator for avgMap-style consumers).

    100 TB: two keyed aggregations (day,user,type) → (day,type); the
    map materialization between them is row-local (map_from_entries +
    explode round-trips inside the stage, no extra shuffle) — it
    exists to exercise Spark's real MapType path, not as a detour."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = e.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"),
        "user_id",
        "event_type",
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    maps = per.groupBy("day", "user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cents")))
        ).alias("m")
    )
    kv = maps.select("day", F.explode("m").alias("key", "cents"))
    return (
        kv.groupBy("day", "key")
        .agg(
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_maps"),
        )
        .orderBy("day", "key")
    )
