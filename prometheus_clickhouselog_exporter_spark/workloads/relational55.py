"""Round 10 batch: Anderson–Darling uniformity audit of the engine's
portable hash family, rich-club coefficient, and the Spark 4 lateral
column alias surface — DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these; §2.3 north-star territory. Methods
are public: Anderson & Darling 1954 (A² for a fully-specified null),
Zhou & Mondragón 2004 (rich club), Spark lateral column alias docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, copurchase_edges, fround, md5_long, query, table

# --- Anderson–Darling uniformity audit of the md5 hash family ------------------

_AD_ORACLE = f"""
    WITH u AS (
      SELECT ({MD5_SQL.format(x="('ad|' || event_id)")} % 1000000 + 0.5)
               / 1e6 AS uv
      FROM events
    ),
    census AS (
      SELECT uv, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY uv
    ),
    cum AS (
      SELECT uv, c,
             CAST(coalesce(sum(c) OVER (ORDER BY uv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS b,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM census
    ),
    terms AS (
      SELECT n,
             CAST(floor((ln(uv) * (2 * b * c + c * c)
                         + ln(1.0 - uv) * (2 * c * (n - b) - c * c))
                        * 1e3 + 0.5) AS BIGINT) AS tq
      FROM cum
    )
    SELECT max(n) AS n,
           floor((-CAST(max(n) AS DOUBLE)
                  - CAST(sum(tq) AS DOUBLE) / 1e3 / max(n)) * 1e6 + 0.5)
             / 1e6 AS a2,
           (-CAST(max(n) AS DOUBLE)
            - CAST(sum(tq) AS DOUBLE) / 1e3 / max(n)) < 3.857 AS pass_1pct
    FROM terms
    """


@query("audit_hash_uniformity_ad", oracle=_AD_ORACLE)
def audit_hash_uniformity_ad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson–Darling A² test of UNIFORMITY for the repo's portable
    48-bit md5 hash family (the one every sampler/bucketer rides):
    uᵢ = (h mod 10⁶ + ½)/10⁶ should be U(0,1), and A² = −n −
    (1/n)Σ(2i−1)[ln u₍ᵢ₎ + ln(1−u₍ₙ₊₁₋ᵢ₎)] weights the tails where a
    biased hash would betray itself. The order statistics fold onto the
    VALUE CENSUS: a run of c equal values starting after b predecessors
    contributes (2bc+c²)·ln(u) and (2c(n−b)−c²)·ln(1−u) — closed-form
    arithmetic series, so no per-row rank is ever materialized. The
    pass certificate uses the asymptotic 1% critical value 3.857
    (fully-specified null; Anderson & Darling 1954).

    100 TB: hash → 10⁶-bucket census (map-side combined), one
    cumulative window over value cardinality behind the aggregate, one
    quantized-integer reduction. This is the operator that AUDITS the
    hash assumption every Bernoulli/systematic sampler in the registry
    depends on."""
    e = table(spark, sf_dir, "events")
    u = e.select(
        (
            (
                md5_long(F.concat(F.lit("ad|"), F.col("event_id").cast("string")))
                % 1000000
            ).cast("double")
            + 0.5
        ).alias("raw")
    ).select((F.col("raw") / 1e6).alias("uv"))
    census = u.groupBy("uv").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wlt = Window.orderBy("uv").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("uv").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = census.select(
        "uv",
        "c",
        F.coalesce(F.sum("c").over(wlt), F.lit(0)).cast("bigint").alias("b"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    term = (
        F.log("uv") * (2 * F.col("b") * F.col("c") + F.col("c") * F.col("c"))
        + F.log(F.lit(1.0) - F.col("uv"))
        * (2 * F.col("c") * (F.col("n") - F.col("b")) - F.col("c") * F.col("c"))
    )
    terms = cum.select(
        "n", F.floor(term * 1e3 + F.lit(0.5)).cast("bigint").alias("tq")
    )
    a2 = (
        -F.max("n").cast("double")
        - F.sum("tq").cast("double") / 1e3 / F.max("n")
    )
    return terms.agg(
        F.max("n").alias("n"),
        fround(a2, 6).alias("a2"),
        (a2 < 3.857).alias("pass_1pct"),
    )


# --- rich-club coefficient -------------------------------------------------------

_RICH_ORACLE = """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM e0 GROUP BY src),
    ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
    rich AS (
      SELECT k.k, d.node
      FROM ks k JOIN deg d ON d.degree > k.k
    ),
    nodes AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_nodes FROM rich GROUP BY k
    ),
    edges AS (
      SELECT r1.k, CAST(count(*) AS BIGINT) AS n_directed
      FROM e0 e
      JOIN rich r1 ON r1.node = e.src
      JOIN rich r2 ON r2.node = e.dst AND r2.k = r1.k
      GROUP BY r1.k
    )
    SELECT n.k, n.n_nodes,
           CAST(coalesce(e.n_directed, 0) // 2 AS BIGINT) AS n_edges,
           CASE WHEN n.n_nodes >= 2 THEN
             floor(CAST(coalesce(e.n_directed, 0) AS DOUBLE)
                   / (CAST(n.n_nodes AS DOUBLE) * (n.n_nodes - 1))
                   * 1e9 + 0.5) / 1e9
           END AS phi
    FROM nodes n LEFT JOIN edges e USING (k)
    ORDER BY k
    """


@query("graph_rich_club", oracle=_RICH_ORACLE)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient (Zhou & Mondragón 2004) of the co-purchase
    graph at a degree ladder k ∈ {2,4,8,16}: φ(k) = E_{>k} /
    (N_{>k}(N_{>k}−1)/2) normalized — do high-degree parts
    preferentially co-occur with each other? The directed edge set is
    symmetric, so φ uses the directed count over N(N−1) directly
    (identical value, no halving mismatch).

    100 TB (r13 constant-factor pass, VERDICT r12 #2, 4.8 s → ~2.5 s):
    the ladder is 4 NESTED thresholds, so each node carries a 4-bit
    "rich level" mask (bit j ⇔ degree > k_j) — the |V|-bounded mask
    frame broadcasts onto the edge scan at BOTH endpoints and φ's
    numerators come from one conditional-sum aggregate over
    bit-AND-ed masks, where the r10 formulation shuffled the edge
    list by src and then the 4× ladder fan-out by dst. At cluster
    scale with a non-broadcastable V the mask joins stay keyed —
    still 2 exchanges of the edge list instead of 1+4×."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # one-exchange edge build (r13 optimization pass — core.copurchase_edges)
    edges = copurchase_edges(li).localCheckpoint(
        eager=False
    )  # consumers: degree census + probe
    _KS = (2, 4, 8, 16)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    mask = deg.select(
        "node",
        sum(
            (F.col("degree") > k).cast("long") * F.lit(1 << j)
            for j, k in enumerate(_KS)
        ).alias("m"),
    ).localCheckpoint(eager=False)  # |V|-bounded; node census + 2 probes
    node_row = mask.agg(
        *[
            F.sum(F.expr(f"bit_get(m, {j})")).cast("bigint").alias(f"n{j}")
            for j in range(len(_KS))
        ]
    )
    ms = mask.select(F.col("node").alias("src"), F.col("m").alias("m_s"))
    md = mask.select(F.col("node").alias("dst"), F.col("m").alias("m_d"))
    edge_row = (
        edges.join(F.broadcast(ms), "src")
        .join(F.broadcast(md), "dst")
        .select(F.col("m_s").bitwiseAND(F.col("m_d")).alias("c"))
        .agg(
            *[
                F.sum(F.expr(f"bit_get(c, {j})")).cast("bigint").alias(f"e{j}")
                for j in range(len(_KS))
            ]
        )
    )
    ladder = edge_row.crossJoin(F.broadcast(node_row)).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("k"),
                        F.col(f"n{j}").alias("n_nodes"),
                        F.col(f"e{j}").alias("n_directed"),
                    )
                    for j, k in enumerate(_KS)
                ]
            )
        ).alias("s")
    ).select("s.k", "s.n_nodes", "s.n_directed")
    nd = F.col("n_nodes").cast("double")
    return (
        ladder.filter(F.col("n_nodes") > 0)  # oracle omits empty rungs
        .select(
            "k",
            "n_nodes",
            F.expr("n_directed div 2").cast("bigint").alias("n_edges"),
            F.when(
                F.col("n_nodes") >= 2,
                fround(
                    F.col("n_directed").cast("double")
                    / (nd * (F.col("n_nodes") - 1)),
                    9,
                ),
            ).alias("phi"),
        )
        .orderBy("k")
    )


# --- Spark lateral column alias surface --------------------------------------------

_LCA_ORACLE = """
    WITH l AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c
      FROM lineitem
    ),
    rows_ AS (
      SELECT l_returnflag,
             price_c * (100 - disc_c) AS net_e4,
             price_c * (100 - disc_c) * (100 + tax_c) AS gross_e6,
             price_c * (100 - disc_c) * (100 + tax_c)
               - price_c * (100 - disc_c) * 100 AS taxamt_e6
      FROM l
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           floor(CAST(sum(net_e4) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
             AS net_dollars,
           floor(CAST(sum(gross_e6) AS DOUBLE) / 1e8 * 1e4 + 0.5) / 1e4
             AS gross_dollars,
           floor(CAST(sum(taxamt_e6) AS DOUBLE) / 1e8 * 1e4 + 0.5) / 1e4
             AS tax_dollars
    FROM rows_ GROUP BY l_returnflag ORDER BY l_returnflag
    """


@query("sql_lateral_column_alias", oracle=_LCA_ORACLE)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.4+ LATERAL COLUMN ALIAS surface: a SELECT whose later
    expressions reference EARLIER aliases in the same list (net → gross
    → tax amount), each stage building on the previous without a
    subquery — executed through spark.sql on a temp view so the real
    resolution path (not a DataFrame-API rewrite) is what's certified.
    The oracle expands the aliases manually (DuckDB also supports alias
    reuse, but the expansion keeps the oracle assumption-free). All
    money stays integer: net at 1e-4 cents-scale, gross/tax at 1e-6 —
    DECIMAL(38) sums cast once to dollars.

    100 TB: scan-stage arithmetic + one 3-group aggregate; the surface
    matters (pipeline-style SQL without nested subqueries), not the
    plan."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lca_lineitem")
    return spark.sql(
        """
        WITH l AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
                 CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c
          FROM lca_lineitem
        ),
        rows_ AS (
          SELECT l_returnflag,
                 price_c * (100 - disc_c) AS net_e4,
                 net_e4 * (100 + tax_c) AS gross_e6,
                 gross_e6 - net_e4 * 100 AS taxamt_e6
          FROM l
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               floor(CAST(sum(CAST(net_e4 AS DECIMAL(38,0))) AS DOUBLE)
                     / 1e6 * 1e4 + 0.5) / 1e4 AS net_dollars,
               floor(CAST(sum(CAST(gross_e6 AS DECIMAL(38,0))) AS DOUBLE)
                     / 1e8 * 1e4 + 0.5) / 1e4 AS gross_dollars,
               floor(CAST(sum(CAST(taxamt_e6 AS DECIMAL(38,0))) AS DOUBLE)
                     / 1e8 * 1e4 + 0.5) / 1e4 AS tax_dollars
        FROM rows_ GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )
