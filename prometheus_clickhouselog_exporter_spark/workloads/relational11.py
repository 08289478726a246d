"""Relational battery, round 3 batch 10: Spark-4 engine surface
(recursive CTE, bitmap exact-distinct, listagg, collations, Python
UDTF) plus warehouse closed forms (clamped running balance, exact
moment skew/kurtosis, Benford digit audit, V-shape pattern scan,
hierarchy shares, time-weighted averages).

Two themes. First, engine *surface* the reference's users would expect
from any complete SQL engine and that Spark 4 actually ships: WITH
RECURSIVE (hierarchy closure), bitmap_construct_agg/bitmap_or_agg (the
mergeable EXACT-distinct path — the exact counterpart of the HLL
sketch row), listagg WITHIN GROUP, UTF8_LCASE collations, and a Python
UDTF joined LATERAL. Second, closed-form analytics that are usually
written as iterative loops but have one-pass window/aggregate forms —
the clamp-at-zero running balance (level_k = prefix_k − min(0,
min_{j≤k} prefix_j)) and distribution shape (skewness/kurtosis) from
quantized-exact raw moments.

Float discipline throughout per workloads/core.py: money in DECIMAL,
per-term quantization to BIGINT for any cross-row double sum, fround()
for final ratios, and shared Python-generated literals for
transcendental constants (Benford expectations) so neither engine's
libm is on the hash path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table


# --------------------------------------------------------------------------
# Engine surface
# --------------------------------------------------------------------------


@query(
    "recursive_cte_subtree_rollup",
    oracle="""
    WITH RECURSIVE up AS (
      SELECT c_custkey AS node, c_custkey AS anc,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal, 0 AS depth
      FROM customer
      UNION ALL
      SELECT node, anc // 10, bal, depth + 1 FROM up WHERE anc >= 10
    )
    SELECT CAST(anc AS BIGINT) AS root,
           CAST(count(*) AS BIGINT) AS n_desc,
           CAST(max(depth) AS INT) AS max_depth,
           CAST(sum(bal) AS DOUBLE) AS sum_bal
    FROM up WHERE anc < 10
    GROUP BY anc ORDER BY root
    """,
)
def recursive_cte_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE transitive closure: every customer walks its
    synthetic org chain (parent(k) = k div 10, roots are keys < 10) up
    to the root, then the roots aggregate their whole subtree — count,
    depth, exact DECIMAL balance total. Each chain terminates in
    exactly one row with anc < 10, so the rollup sees each customer
    once. This is the engine-surface row for Spark 4's recursive-CTE
    support (UnionLoop execution); DuckDB runs the identical recursion.

    Scale: recursion depth is log10(max key) ≈ 7 regardless of row
    count, and each iteration is a scan-stage projection + filter —
    no join against the full input inside the loop (the chain carries
    its own state). The final rollup is one ordinary hash aggregate
    keyed by ≤10 roots.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE up AS (
          SELECT c_custkey AS node, c_custkey AS anc,
                 CAST(c_acctbal AS DECIMAL(18,2)) AS bal, 0 AS depth
          FROM rcte_customer
          UNION ALL
          SELECT node, anc DIV 10, bal, depth + 1 FROM up WHERE anc >= 10
        )
        SELECT CAST(anc AS BIGINT) AS root,
               CAST(count(*) AS BIGINT) AS n_desc,
               CAST(max(depth) AS INT) AS max_depth,
               CAST(sum(bal) AS DOUBLE) AS sum_bal
        FROM up WHERE anc < 10
        GROUP BY anc ORDER BY root
        """
    )


@query(
    "agg_bitmap_distinct_exact",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    ORDER BY event_type
    """,
)
def agg_bitmap_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps — the exact
    counterpart of sketch_hll_distinct_users. Stage 1 builds one
    packed bitmap per (event_type, 32k-bucket) with
    bitmap_construct_agg(bitmap_bit_position(id)) — a map-side-
    combinable aggregate whose partials are fixed-size binaries, not
    exploded id lists (unlike count(DISTINCT) which Spark rewrites to
    an expand + two shuffles of raw ids). Stage 2 sums bitmap_count
    per type, and the '__all__' lane ORs the per-type bitmaps —
    proving the sketch-style mergeability with zero error.

    Scale: the shuffle carries |types|·|occupied buckets| bitmap rows
    (≤4 KB each), bounded by the id-space/32768 — independent of row
    count. Merging partitions/sources/days is bitmap OR on results.
    Oracle: plain COUNT(DISTINCT) — exactness IS the contract.
    """
    ev = table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("b")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    per_bucket = per_bucket.localCheckpoint(eager=False)  # bitmap rows; 2 consumers
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users")
    )
    merged = (
        per_bucket.groupBy("b")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .select(F.expr("bitmap_count(bm)").alias("c"))
        .agg(F.sum("c").alias("distinct_users"))
        .select(F.lit("__all__").alias("event_type"), "distinct_users")
    )
    return per_type.unionByName(merged).orderBy("event_type")


@query(
    "agg_listagg_ordered",
    oracle="""
    WITH seg AS (
      SELECT DISTINCT n.n_name, c.c_mktsegment
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_segments,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
    FROM seg GROUP BY n_name ORDER BY n_name
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg(...) WITHIN GROUP (ORDER BY ...) — the SQL:2023 ordered
    string aggregation Spark 4 ships natively (DuckDB spells it
    string_agg ORDER BY). Deterministic BY CONSTRUCTION via the
    mandatory order clause — the unordered collect_list form would
    hash-diverge run to run. Input is the distinct (nation, segment)
    pairs so the aggregation is over a bounded set.

    Scale: distinct-first shrinks the shuffle to ≤|nations|·|segments|
    rows before any string concatenation; the agg itself sorts within
    ≤5-element groups.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    seg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_mktsegment")
        .distinct()
    )
    return (
        seg.groupBy("n_name")
        .agg(
            F.count("*").alias("n_segments"),
            F.expr(
                "listagg(c_mktsegment, '|') WITHIN GROUP (ORDER BY c_mktsegment)"
            ).alias("segments"),
        )
        .orderBy("n_name")
    )


@query(
    "collation_lcase_aggregation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END
               AS t_mixed,
             p_retailprice
      FROM part
    )
    SELECT lower(t_mixed) AS ptype_ci,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT t_mixed) AS BIGINT) AS n_case_variants,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM mixed GROUP BY lower(t_mixed)
    ORDER BY ptype_ci
    """,
)
def collation_lcase_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4 COLLATIONS: the group
    key is `t_mixed COLLATE UTF8_LCASE`, so the hash aggregate itself
    compares case-insensitively — no normalizing projection feeding
    it. (A deterministically mixed-case column is synthesized first:
    even part keys lower-case their type — p_type ships upper-case.) The emitted key is
    min(lower(t_mixed)) — identical for every member of a collated
    group — because the group REPRESENTATIVE under a collation is
    first-seen nondeterministic and must not reach the hash. The
    oracle is the classic lower()-key rewrite, proving the collated
    aggregate equals it.

    Scale: identical plan shape to any hash aggregate; collation only
    swaps the key's equality/hash functions.
    """
    p = table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.lower("p_type"))
        .otherwise(F.col("p_type"))
        .alias("t_mixed"),
        "p_retailprice",
    )
    return (
        mixed.groupBy(F.collate(F.col("t_mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.min(F.lower("t_mixed")).alias("ptype_ci"),
            F.count("*").alias("n_rows"),
            F.countDistinct("t_mixed").alias("n_case_variants"),
            F.sum(money(F.col("p_retailprice"))).cast("double").alias("sum_price"),
        )
        .select("ptype_ci", "n_rows", "n_case_variants", "sum_price")
        .orderBy("ptype_ci")
    )


@query(
    "udtf_lateral_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS ord FROM toks
    ),
    bg AS (
      SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt FROM tok
    )
    SELECT w || ' ' || nxt AS bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg WHERE nxt IS NOT NULL AND w <> '' AND nxt <> ''
    GROUP BY 1
    ORDER BY n DESC, bigram LIMIT 20
    """,
)
def udtf_lateral_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: a user-defined generator
    expanding each document into its word bigrams, invoked through a
    LATERAL join, then a plain top-20 aggregate. UDTFs are the
    engine's extension point for row→rows logic that HOFs can't
    express (stateful generators, external parsers); this one is
    deliberately simple so DuckDB can rebuild it with string_split +
    range. Tie-broken (count DESC, bigram) for a total order.

    Scale note (r13): the UDTF runs ARROW-OPTIMIZED (Spark 4
    ``useArrow=True`` — the plan shows ArrowEvalPythonUDTF, not the
    row-at-a-time BatchEvalPython this row carried as the registry's
    one deliberate row-python plan through r12), so rows cross to
    Python in Arrow batches; still Python-side work, which is why the
    native equivalent for this particular expansion is the
    explode(word_shingles(...)) recipe used by every dedup operator;
    tests/test_relational11.py asserts the two agree.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string", useArrow=True)
    class BigramsUDTF:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for a, b in zip(toks, toks[1:]):
                if a and b:
                    yield (a + " " + b,)

    spark.udtf.register("rel11_bigrams", BigramsUDTF)
    table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("text")
    ).createOrReplaceTempView("rel11_docs")
    return spark.sql(
        """
        SELECT g.bigram, CAST(count(*) AS BIGINT) AS n
        FROM rel11_docs d, LATERAL rel11_bigrams(d.text) g
        GROUP BY g.bigram
        ORDER BY n DESC, g.bigram LIMIT 20
        """
    )


# --------------------------------------------------------------------------
# Warehouse closed forms
# --------------------------------------------------------------------------


@query(
    "inventory_clamped_balance",
    oracle="""
    WITH mv AS (
      SELECT l_partkey,
             CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END
               * CAST(floor(l_quantity) AS BIGINT) AS delta,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem WHERE l_partkey < 200
    ),
    pfx0 AS (
      SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
             sum(delta) OVER (PARTITION BY l_partkey
                              ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS prefix
      FROM mv
    ),
    pfx AS (
      SELECT l_partkey, prefix,
             min(prefix) OVER (PARTITION BY l_partkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS minpfx
      FROM pfx0
    ),
    lvl AS (
      SELECT l_partkey, prefix - least(0, minpfx) AS level
      FROM pfx
    )
    SELECT l_partkey AS partkey,
           CAST(count(*) AS BIGINT) AS n_moves,
           CAST(max(level) AS BIGINT) AS max_level,
           CAST(sum(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stockouts
    FROM lvl GROUP BY l_partkey ORDER BY partkey
    """,
)
def inventory_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamp-at-zero running inventory balance WITHOUT iteration: for
    level_k = max(0, level_{k-1} + delta_k) the closed form is
    level_k = prefix_k − min(0, min_{j≤k} prefix_j) — two stacked
    running windows over the signed movement stream (returns are
    outflow). Per part: movement count, peak level, stock-out count
    (rows pinned at zero). Ordering key (shipdate, orderkey,
    linenumber) is a total order, so every window value is
    deterministic; quantities are integral so all arithmetic is exact
    BIGINT.

    Scale: one shuffle on partkey; both windows and the final
    aggregate share that partitioning (single sort, no extra
    exchange). The closed form is what makes this a one-pass operator
    at 100 TB — the naive recurrence is inherently sequential.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    delta = (
        F.when(F.col("l_returnflag") == "R", F.lit(-1)).otherwise(F.lit(1))
        * F.floor("l_quantity").cast("bigint")
    ).alias("delta")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    pfx = li.select("l_partkey", delta, "l_shipdate", "l_orderkey", "l_linenumber")
    pfx = pfx.withColumn("prefix", F.sum("delta").over(w)).withColumn(
        "minpfx", F.min("prefix").over(w)
    )
    lvl = pfx.select(
        "l_partkey",
        (F.col("prefix") - F.least(F.lit(0), F.col("minpfx"))).alias("level"),
    )
    return (
        lvl.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count("*").alias("n_moves"),
            F.max("level").alias("max_level"),
            F.sum(F.when(F.col("level") == 0, 1).otherwise(0)).alias("n_stockouts"),
        )
        .orderBy("partkey")
    )


@query(
    "stats_skew_kurtosis_moments",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS t1,
             CAST(floor(c_acctbal * c_acctbal * 100) AS BIGINT) AS t2,
             CAST(floor(c_acctbal * c_acctbal * c_acctbal * 100) AS BIGINT) AS t3,
             CAST(floor(c_acctbal * c_acctbal * c_acctbal * c_acctbal * 100)
                  AS BIGINT) AS t4
      FROM customer
    ),
    s AS (
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(t1 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS s1,
             CAST(sum(CAST(t2 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS s2,
             CAST(sum(CAST(t3 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS s3,
             CAST(sum(CAST(t4 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS s4
      FROM q GROUP BY c_mktsegment
    ),
    m AS (
      SELECT c_mktsegment, n,
             (s1 / n) AS m1, (s2 / n) AS r2, (s3 / n) AS r3, (s4 / n) AS r4
      FROM s
    ),
    c AS (
      SELECT c_mktsegment, n, m1,
             (r2 - (m1 * m1)) AS m2,
             (r3 - (3 * m1 * r2)) + (2 * (m1 * m1 * m1)) AS m3,
             ((r4 - (4 * m1 * r3)) + (6 * ((m1 * m1) * r2)))
               - (3 * ((m1 * m1) * (m1 * m1))) AS m4
      FROM m
    )
    SELECT c_mktsegment AS segment, n,
           floor((m1) * 1e6 + 0.5) / 1e6 AS mean_bal,
           floor((m3 / (sqrt(m2) * m2)) * 1e6 + 0.5) / 1e6 AS skewness,
           floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) / 1e6 AS excess_kurtosis
    FROM c ORDER BY segment
    """,
)
def stats_skew_kurtosis_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shape per segment — skewness and excess kurtosis —
    from quantized-exact raw moments, the same discipline as
    stats_corr_moments: each power term floors to BIGINT cents, sums
    ride DECIMAL(38,0) (x⁴·100 ≈ 1e18 per term needs the wide
    accumulator), and every double expression downstream is written
    with identical association in both engines, so the final fround
    is over bit-identical inputs. Spark's native skewness()/kurtosis()
    would hash-diverge on reduction order — this is the portable form.

    Scale: one partial+final hash aggregate; five numeric columns of
    state per group. The moment sums are mergeable across partitions,
    days, or sources by plain addition — the streaming/incremental
    property for free.
    """
    c = table(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    q = c.select(
        "c_mktsegment",
        F.floor(x * 100).cast("bigint").alias("t1"),
        F.floor(x * x * 100).cast("bigint").alias("t2"),
        F.floor(x * x * x * 100).cast("bigint").alias("t3"),
        F.floor(x * x * x * x * 100).cast("bigint").alias("t4"),
    )
    s = q.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("t1").cast("decimal(38,0)")).cast("double") / 100).alias("s1"),
        (F.sum(F.col("t2").cast("decimal(38,0)")).cast("double") / 100).alias("s2"),
        (F.sum(F.col("t3").cast("decimal(38,0)")).cast("double") / 100).alias("s3"),
        (F.sum(F.col("t4").cast("decimal(38,0)")).cast("double") / 100).alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(k) for k in ("n", "s1", "s2", "s3", "s4"))
    m = s.select(
        "c_mktsegment",
        "n",
        (s1 / n).alias("m1"),
        (s2 / n).alias("r2"),
        (s3 / n).alias("r3"),
        (s4 / n).alias("r4"),
    )
    m1, r2, r3, r4 = (F.col(k) for k in ("m1", "r2", "r3", "r4"))
    cen = m.select(
        "c_mktsegment",
        "n",
        m1.alias("m1"),
        (r2 - (m1 * m1)).alias("m2"),
        ((r3 - (F.lit(3) * m1 * r2)) + (F.lit(2) * (m1 * m1 * m1))).alias("m3"),
        (
            ((r4 - (F.lit(4) * m1 * r3)) + (F.lit(6) * ((m1 * m1) * r2)))
            - (F.lit(3) * ((m1 * m1) * (m1 * m1)))
        ).alias("m4"),
    )
    m2, m3, m4 = (F.col(k) for k in ("m2", "m3", "m4"))
    return cen.select(
        F.col("c_mktsegment").alias("segment"),
        "n",
        fround(F.col("m1"), 6).alias("mean_bal"),
        fround(m3 / (F.sqrt(m2) * m2), 6).alias("skewness"),
        fround(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    ).orderBy("segment")


def _benford_case_sql() -> str:
    """CASE expression mapping digit→Benford expectation, generated as
    shared Python literals so neither engine's log10 is on the hash
    path."""
    arms = " ".join(
        f"WHEN {d} THEN CAST({math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"CASE d {arms} END"


@query(
    "dq_benford_first_digit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    counts AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM counts)
    SELECT d AS digit, n,
           floor((CAST(n AS DOUBLE) / tot.total) * 1e6 + 0.5) / 1e6 AS share,
           floor(({_benford_case_sql()}) * 1e6 + 0.5) / 1e6 AS benford_expect,
           floor((((CAST(n AS DOUBLE) - (tot.total * ({_benford_case_sql()})))
                   * (CAST(n AS DOUBLE) - (tot.total * ({_benford_case_sql()}))))
                  / (tot.total * ({_benford_case_sql()}))) * 1e6 + 0.5) / 1e6
             AS chi2_term
    FROM counts, tot ORDER BY digit
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data screen, as a data-quality operator: observed digit
    share vs the Benford expectation log10(1+1/d), plus the χ² term
    per digit. The first digit is taken from the STRING of the exact
    integer cents (floor(x·100)) — never via log10/pow on data, whose
    libm rounding differs per engine; the nine Benford constants are
    Python-generated literals shared by BOTH plans, so no
    transcendental is evaluated by either engine on the hash path.

    Scale: scan-stage digit extraction, 9-group aggregate, broadcast
    total. The χ² sum is a 9-row reduce on the driver of a consumer's
    choosing; per-digit terms keep the operator composable (per-source
    grouping is one extra key).
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("n")).localCheckpoint(
        eager=False
    )  # 9 rows; feeds total + output
    tot = counts.agg(F.sum("n").cast("double").alias("total"))
    benford = F.element_at(
        F.array(*[F.lit(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]),
        F.col("d"),
    )
    nn = F.col("n").cast("double")
    exp_n = F.col("total") * benford
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            "n",
            fround(nn / F.col("total"), 6).alias("share"),
            fround(benford, 6).alias("benford_expect"),
            fround(((nn - exp_n) * (nn - exp_n)) / exp_n, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "pattern_v_recovery",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    ctx AS (
      SELECT priority, day, rev,
             lag(rev) OVER w AS prev_rev, lead(rev) OVER w AS next_rev
      FROM daily WINDOW w AS (PARTITION BY priority ORDER BY day)
    )
    SELECT priority, CAST(day AS VARCHAR) AS day,
           CAST(rev AS DOUBLE) AS rev,
           CAST(prev_rev AS DOUBLE) AS prev_rev,
           CAST(next_rev AS DOUBLE) AS next_rev,
           CAST((prev_rev + next_rev) - (rev + rev) AS DOUBLE) AS v_depth
    FROM ctx
    WHERE prev_rev IS NOT NULL AND next_rev IS NOT NULL
      AND rev < prev_rev AND rev < next_rev
    ORDER BY v_depth DESC, priority, day LIMIT 25
    """,
)
def pattern_v_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern scan (the MATCH_RECOGNIZE use case) as a lag/lead
    closed form: find V-shaped days in the per-priority daily revenue
    series — strict local minima — ranked by recovery depth
    (prev+next − 2·rev). Revenue folds in exact DECIMAL so every
    comparison and the depth ranking are exact; (v_depth, priority,
    day) is a total order for the top-25 cut.

    Scale: daily pre-aggregation collapses the fact table to
    |priorities|·|days| rows before any window; lag/lead share one
    sort. General fixed-length patterns (W-shapes, head-and-
    shoulders) compose from more lags over the same single sort.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(money(F.col("o_totalprice"))).alias("rev"))
    w = Window.partitionBy("priority").orderBy("day")
    ctx = daily.select(
        "priority",
        "day",
        "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        F.lead("rev").over(w).alias("next_rev"),
    )
    return (
        ctx.filter(
            F.col("prev_rev").isNotNull()
            & F.col("next_rev").isNotNull()
            & (F.col("rev") < F.col("prev_rev"))
            & (F.col("rev") < F.col("next_rev"))
        )
        .select(
            "priority",
            F.col("day").cast("string").alias("day"),
            F.col("rev").cast("double").alias("rev"),
            F.col("prev_rev").cast("double").alias("prev_rev"),
            F.col("next_rev").cast("double").alias("next_rev"),
            ((F.col("prev_rev") + F.col("next_rev")) - (F.col("rev") + F.col("rev")))
            .cast("double")
            .alias("v_depth"),
        )
        .orderBy(F.desc("v_depth"), "priority", "day")
        .limit(25)
    )


@query(
    "share_of_parent_hierarchy",
    oracle="""
    WITH nat AS (
      SELECT r.r_name, n.n_name,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS nrev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    ),
    reg AS (
      SELECT r_name, n_name, nrev,
             sum(nrev) OVER (PARTITION BY r_name) AS rrev,
             sum(nrev) OVER () AS trev
      FROM nat
    )
    SELECT r_name, n_name, CAST(nrev AS DOUBLE) AS nation_rev,
           floor((CAST(nrev AS DOUBLE) / CAST(rrev AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS share_in_region,
           floor((CAST(rrev AS DOUBLE) / CAST(trev AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS region_share_total
    FROM reg ORDER BY r_name, n_name
    """,
)
def share_of_parent_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level share-of-parent: nation revenue as a share of its
    REGION, and the region as a share of the corpus — the hierarchy
    generalization of window_share_of_total. All sums are exact
    DECIMAL; only the two final ratios touch doubles (identical
    dividends/divisors both engines → identical quotients, frounded).

    Scale: ONE aggregation over the fact join (broadcast dims), then
    both parent totals come from windows over the ≤|nations| result —
    ratio-to-report at two levels without re-scanning facts.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(money(F.col("o_totalprice"))).alias("nrev"))
    )
    reg = nat.select(
        "r_name",
        "n_name",
        "nrev",
        F.sum("nrev").over(Window.partitionBy("r_name")).alias("rrev"),
        F.sum("nrev").over(Window.partitionBy()).alias("trev"),
    )
    return reg.select(
        "r_name",
        "n_name",
        F.col("nrev").cast("double").alias("nation_rev"),
        fround(F.col("nrev").cast("double") / F.col("rrev").cast("double"), 6).alias(
            "share_in_region"
        ),
        fround(F.col("rrev").cast("double") / F.col("trev").cast("double"), 6).alias(
            "region_share_total"
        ),
    ).orderBy("r_name", "n_name")


@query(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER w AS next_us
      FROM events WHERE user_id < 300
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
      SELECT user_id,
             (next_us - us) AS dt_us,
             CAST(floor(value * (CAST((next_us - us) AS DOUBLE) / 1000000) * 1e6)
                  AS BIGINT) AS wq
      FROM seq WHERE next_us IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_us) // 1000000 AS BIGINT) AS total_sec,
           floor(((CAST(sum(wq) AS DOUBLE) / 1e6)
                  / (CAST(sum(dt_us) AS DOUBLE) / 1e6))
                 * 1e6 + 0.5) / 1e6 AS twa_value
    FROM seg GROUP BY user_id ORDER BY user_id
    """,
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a piecewise-constant signal: each
    event's value holds until the user's next event, so the mean is
    Σ(value·Δt)/ΣΔt — the correct aggregate for balances, gauge
    metrics, and any sampled-on-change series (plain avg() over-weights
    busy periods). Δt is exact integer microseconds; the value·Δt
    products quantize per-term to BIGINT before summing, so the
    cross-row reduction is order-free and the final ratio frounds over
    identical inputs. The last event of each user has no successor and
    is excluded on both sides.

    Scale: one shuffle on user_id; the lead() window and the final
    per-user aggregate share the partitioning. Works unchanged as a
    session-window variant by keying on (user, session).
    """
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id", "value", us.alias("us"), F.lead(us).over(w).alias("next_us")
    )
    dt_us = F.col("next_us") - F.col("us")
    seg = seq.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        dt_us.alias("dt_us"),
        F.floor(F.col("value") * (dt_us.cast("double") / 1000000) * 1e6)
        .cast("bigint")
        .alias("wq"),
    )
    agg = seg.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").alias("sum_us"),
        F.sum("wq").alias("sum_wq"),
    )
    return agg.select(
        "user_id",
        "n_intervals",
        F.expr("sum_us DIV 1000000").alias("total_sec"),
        fround(
            (F.col("sum_wq").cast("double") / 1e6)
            / (F.col("sum_us").cast("double") / 1e6),
            6,
        ).alias("twa_value"),
    ).orderBy("user_id")
