"""Relational battery, round 3 batch 12: closed-form 2-D Mahalanobis
outliers, funnel conversion-lag quantiles, power-of-two histograms,
cross-correlation lag search, GROUP BY ALL surface, and
provenance-ranked exact dedup.

The Mahalanobis row upgrades embedding_outlier_zdist's diagonal screen
to the FULL covariance for the 2-feature case, where the matrix
inverse has a closed form ((σyy, −σxy; −σxy, σxx)/det) that both
engines can evaluate from quantized-exact moments — no driver-side
solve, no libm. The lag finder and conversion-lag quantiles are the
two time-series questions every growth/ops team asks next after the
funnel counts. The log2 histogram derives its buckets from the BINARY
STRING LENGTH of exact integer cents — floor(log2(x))+1 without
touching log(). GROUP BY ALL / ORDER BY ALL is modern SQL surface
both engines now share verbatim.

Float discipline per workloads/core.py throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, money, query, table

from .core import MD5_SQL as _MD5_SQL, md5_long as _md5_long


@query(
    "stats_mahalanobis_2d",
    oracle="""
    WITH feat AS (
      SELECT c.c_custkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS x,
             CAST(coalesce(o.n, 0) AS BIGINT) AS y
      FROM customer c
      LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
        ON c.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM feat
    ),
    cov AS (
      SELECT n, (sx / n) AS mx, (sy / n) AS my,
             ((sxx / n) - ((sx / n) * (sx / n))) AS cxx,
             ((syy / n) - ((sy / n) * (sy / n))) AS cyy,
             ((sxy / n) - ((sx / n) * (sy / n))) AS cxy
      FROM m
    ),
    scored AS (
      SELECT f.c_custkey, f.x, f.y,
             CAST(floor(((((CAST(f.x AS DOUBLE) - c.mx)
                           * (CAST(f.x AS DOUBLE) - c.mx)) * c.cyy
                          - ((2 * (CAST(f.x AS DOUBLE) - c.mx))
                             * (CAST(f.y AS DOUBLE) - c.my)) * c.cxy)
                         + (((CAST(f.y AS DOUBLE) - c.my)
                             * (CAST(f.y AS DOUBLE) - c.my)) * c.cxx))
                        / ((c.cxx * c.cyy) - (c.cxy * c.cxy)) * 1e6)
                  AS BIGINT) AS qd
      FROM feat f, cov c
    )
    SELECT c_custkey, CAST(x AS DOUBLE) / 100 AS acctbal,
           y AS n_orders, qd,
           CAST(qd AS DOUBLE) / 1e6 AS mahalanobis_sq
    FROM scored ORDER BY qd DESC, c_custkey LIMIT 20
    """,
)
def stats_mahalanobis_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-covariance Mahalanobis outliers for the 2-feature case
    (account balance × order count): the 2×2 inverse is closed-form —
    d² = (dx²·σyy − 2·dx·dy·σxy + dy²·σxx)/det — so unlike the general
    p×p case there is NO driver-side solve and the whole statistic is
    derivable from six quantized-exact moment sums, frozen to a BIGINT
    rank key. This catches the correlated outliers the diagonal
    z-screen (embedding_outlier_zdist) is blind to: a customer whose
    balance and order count are each unremarkable but jointly
    improbable.

    Scale: one fact-side count aggregate, one moment aggregate whose
    six partials merge by addition, then ONE corpus pass scoring
    against the broadcast 1-row covariance; top-20 is TakeOrdered.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    feat = (
        c.join(counts, c.c_custkey == counts.o_custkey, "left")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=False)  # feeds the moment pass + the scoring pass
    )
    dec = lambda col: F.sum(col.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(k) for k in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    cov = m.select(
        (sx / n).alias("mx"),
        (sy / n).alias("my"),
        ((sxx / n) - ((sx / n) * (sx / n))).alias("cxx"),
        ((syy / n) - ((sy / n) * (sy / n))).alias("cyy"),
        ((sxy / n) - ((sx / n) * (sy / n))).alias("cxy"),
    )
    dx = F.col("x").cast("double") - F.col("mx")
    dy = F.col("y").cast("double") - F.col("my")
    qd = F.floor(
        (
            ((dx * dx) * F.col("cyy") - ((F.lit(2) * dx) * dy) * F.col("cxy"))
            + ((dy * dy) * F.col("cxx"))
        )
        / ((F.col("cxx") * F.col("cyy")) - (F.col("cxy") * F.col("cxy")))
        * 1e6
    ).cast("bigint")
    return (
        feat.crossJoin(F.broadcast(cov))
        .select(
            "c_custkey",
            (F.col("x").cast("double") / 100).alias("acctbal"),
            F.col("y").alias("n_orders"),
            qd.alias("qd"),
            (qd.cast("double") / 1e6).alias("mahalanobis_sq"),
        )
        .orderBy(F.desc("qd"), "c_custkey")
        .limit(20)
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH v0 AS (
      SELECT user_id, min(epoch_us(ts)) AS vus
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT v.user_id, v.vus, min(e.us) AS pus
      FROM v0 v
      LEFT JOIN (SELECT user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'purchase') e
        ON e.user_id = v.user_id AND e.us >= v.vus
      GROUP BY v.user_id, v.vus
    ),
    lags AS (
      SELECT (pus - vus) // 1000000 AS lag_sec FROM conv WHERE pus IS NOT NULL
    ),
    ranked AS (
      SELECT lag_sec, row_number() OVER (ORDER BY lag_sec) AS rn,
             count(*) OVER () AS n
      FROM lags
    )
    SELECT CAST((SELECT count(*) FROM v0) AS BIGINT) AS n_viewers,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN lag_sec END) AS BIGINT) AS p50_sec,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN lag_sec END) AS BIGINT) AS p90_sec,
           CAST(max(lag_sec) AS BIGINT) AS max_sec
    FROM ranked
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-LAG distribution — the question after the funnel
    counts: how long from first view to first purchase? Exact discrete
    quantiles (p50/p90) by rank arithmetic over integer seconds — the
    float-free threshold path quantile_disc_doclen established — so
    the statistic hashes identically everywhere. Non-converting
    viewers are excluded from lag stats but counted in n_viewers.

    Scale: two filtered per-user min-aggregates (one shuffle each,
    map-side combinable), a user-cardinality join. The quantiles are
    VALUE-GROUPED rank arithmetic (r9, replacing a no-partition
    row_number over the user-cardinality lag set the open-domain
    linter flagged): fold lags to per-second counts — bounded by the
    lag DOMAIN (seconds from view to purchase), not by users — take a
    cumulative count over that bounded frame, and the rank-k order
    statistic is the smallest lag whose cumulative count reaches k.
    Identical to the row_number form for any tie pattern, so the
    oracle keeps its window shape and the hash proves the rewrite.
    """
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    v0 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("vus"))
        .localCheckpoint(eager=False)  # users-sized; feeds the join + n_viewers
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("us")
    )
    conv = (
        v0.join(p, (p.user_id == v0.user_id) & (F.col("us") >= F.col("vus")), "left")
        .groupBy(v0.user_id, "vus")
        .agg(F.min("us").alias("pus"))
    )
    lags = conv.filter(F.col("pus").isNotNull()).select(
        F.expr("(pus - vus) DIV 1000000").alias("lag_sec")
    )
    # value-grouped cumulative counts: the frame under the no-partition
    # window is lag-DOMAIN-cardinality (distinct integer seconds), not
    # user-cardinality — bounded by the retention horizon
    lc = lags.groupBy("lag_sec").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("lag_sec").rowsBetween(Window.unboundedPreceding, 0)
    ranked = lc.select(
        "lag_sec",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    n_viewers = v0.agg(F.count(F.lit(1)).alias("nv"))
    # aggregate the (possibly EMPTY) lag set alone — sum() makes it one
    # row with 0/NULLs — then attach the always-1-row viewer count, so an
    # all-non-converting corpus still reports the true n_viewers.
    # rank-k order statistic = min lag whose cumulative count reaches k.
    stats = ranked.agg(
        F.coalesce(F.max("n"), F.lit(0)).cast("bigint").alias("n_converted"),
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("lag_sec")
            )
        )
        .cast("bigint")
        .alias("p50_sec"),
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.9) * F.col("n")), F.col("lag_sec")
            )
        )
        .cast("bigint")
        .alias("p90_sec"),
        F.max("lag_sec").cast("bigint").alias("max_sec"),
    )
    return F.broadcast(n_viewers).crossJoin(stats).select(
        F.col("nv").cast("bigint").alias("n_viewers"),
        "n_converted",
        "p50_sec",
        "p90_sec",
        "max_sec",
    )


@query(
    "hist_log2_order_value",
    oracle="""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders WHERE o_totalprice > 0
    ),
    b AS (
      SELECT CAST(length(bin(c)) AS INT) AS bucket, c, p FROM cents
    ),
    agg AS (
      SELECT bucket, count(*) AS n, sum(p) AS sp FROM b GROUP BY bucket
    )
    SELECT bucket,
           CAST((CAST(1 AS BIGINT) << (bucket - 1)) AS BIGINT) AS lo_cents,
           CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS hi_cents,
           CAST(n AS BIGINT) AS n,
           CAST(sp AS DOUBLE) AS sum_value,
           floor((CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS share
    FROM agg ORDER BY bucket
    """,
)
def hist_log2_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (log-scale) histogram of order values — the bucket
    scheme latency and money distributions actually need (equi-width
    buckets waste 90% of bins on the tail). The bucket index is
    floor(log2(cents))+1 computed WITHOUT log2: it is the LENGTH OF
    THE BINARY STRING of the exact integer cents — pure integer
    arithmetic, immune to libm's log2 rounding at exact powers of two
    (where floor(log2(2^k)) can land on k−1 in one engine and k in the
    other). Bucket bounds come from integer shifts, not pow().

    Scale: scan-stage bucket expression, ≤64-group aggregate with
    map-side combine, broadcast total. Mergeable across
    partitions/sources by addition — same contract as
    hist_equiwidth_events.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    b = o.select(
        F.length(F.bin(F.floor(F.col("o_totalprice") * 100).cast("bigint")))
        .cast("int")
        .alias("bucket"),
        money(F.col("o_totalprice")).alias("p"),
    )
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("p").cast("double").alias("sum_value"))
        .withColumn(
            "t", F.sum("n").over(Window.partitionBy()).cast("double")
        )  # total from the <=64-row aggregate, not a second fact scan
        .select(
            "bucket",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), bucket - 1) AS BIGINT)").alias(
                "lo_cents"
            ),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), bucket) - 1 AS BIGINT)"
            ).alias("hi_cents"),
            F.col("n").cast("bigint").alias("n"),
            "sum_value",
            fround(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
        )
        .orderBy("bucket")
    )


@query(
    "timeseries_xcorr_lag",
    oracle="""
    WITH a AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    b AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    lags AS (SELECT CAST(r.l - 7 AS INT) AS lag FROM range(15) r(l)),
    scored AS (
      SELECT lag,
             count(*) AS n_days,
             sum(a.c * b.c) AS score
      FROM lags, a JOIN b ON b.d = a.d + CAST(lag AS INT)
      GROUP BY lag
    ),
    ranked AS (
      SELECT lag, n_days, score,
             row_number() OVER (ORDER BY score DESC, lag) AS rk
      FROM scored
    )
    SELECT lag, CAST(n_days AS BIGINT) AS n_days, CAST(score AS BIGINT) AS score,
           (rk = 1) AS is_best
    FROM ranked ORDER BY lag
    """,
)
def timeseries_xcorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation lag search between two event series (views →
    purchases): for each lag in ±7 days, the raw co-occurrence score
    Σ a(d)·b(d+lag) over overlapping days — all exact BIGINT, so the
    argmax (is_best, ties to the smallest lag) is bit-stable. This is
    the 'does series A lead series B, and by how much' primitive
    behind marketing-lag and leading-indicator dashboards.

    Scale: both series pre-aggregate to day cardinality map-side; the
    15 lags broadcast; the shifted equi-join and per-lag fold touch
    |days|·|lags| bounded rows — the fact table is scanned exactly
    twice (two filters), never per-lag.
    """
    ev = table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    lags = spark.range(15).select((F.col("id") - 7).cast("int").alias("lag"))
    scored = (
        a.crossJoin(F.broadcast(lags))
        .select("lag", F.date_add(F.col("d"), F.col("lag")).alias("db"), "ca")
        .join(b, F.col("db") == b.d)
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.col("ca") * F.col("cb")).alias("score"),
        )
    )
    rk = F.row_number().over(Window.orderBy(F.desc("score"), "lag"))
    return (
        scored.withColumn("rk", rk)
        .select(
            "lag",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("score").cast("bigint").alias("score"),
            (F.col("rk") == 1).alias("is_best"),
        )
        .orderBy("lag")
    )


_GBA_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
FROM {t} GROUP BY ALL ORDER BY ALL
"""


@query("groupby_all_surface", oracle=_GBA_SQL.format(t="orders"))
def groupby_all_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the DuckDB-pioneered shorthand
    Spark 4 adopted: every non-aggregate select item becomes a group
    key, and ORDER BY ALL sorts by all output columns left-to-right
    (a total order here, so the hash is stable). The SAME SQL text
    runs on both engines — this query's oracle IS its implementation
    string, the strongest possible dialect-parity check.

    Scale: ordinary partial+final hash aggregate; the sugar desugars
    before planning.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("gba_orders")
    return spark.sql(_GBA_SQL.format(t="gba_orders"))


@query(
    "dedup_canonical_provenance",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             CAST({_MD5_SQL.format(x="array_to_string(string_split(lower(text), ' ')[1:5], ' ')")} AS BIGINT) AS th
      FROM documents
    ),
    g AS (
      SELECT th, count(*) AS n_dups, count(DISTINCT source) AS n_sources,
             min(doc_id) AS group_id
      FROM h GROUP BY th HAVING count(*) > 1
    ),
    pick AS (
      SELECT th, doc_id AS canonical_doc, source AS canonical_source,
             row_number() OVER (PARTITION BY th ORDER BY source, doc_id) AS rk
      FROM h
    )
    SELECT g.group_id, CAST(g.n_dups AS BIGINT) AS n_dups,
           CAST(g.n_sources AS BIGINT) AS n_sources,
           p.canonical_doc, p.canonical_source
    FROM g JOIN pick p ON g.th = p.th AND p.rk = 1
    ORDER BY g.group_id
    """,
)
def dedup_canonical_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups keyed by a CANONICALIZED identity — the first
    five tokens, the "same article, different trailing boilerplate"
    syndication key — with PROVENANCE-RANKED survivor selection:
    within each group the canonical copy is chosen by source priority
    (alphabetical policy rank here — swap in any broadcast rank
    table), tie-broken by doc_id. This is the curation policy question
    exact dedup leaves open (dedup_exact_documents keeps min-id
    unconditionally, and this corpus has no byte-identical twins at
    all — identity must be canonicalized to mean anything). Emits
    group size and how many distinct sources carried the duplicate —
    the cross-source syndication signal.

    Scale: the prefix key hashes to an 8-byte digest scan-stage; the
    group shuffle carries (digest, id, source), never text. Survivor
    pick is a WindowGroupLimit-shaped rank-1 per digest. md5-family
    digest so the oracle replays grouping AND selection exactly.
    """
    d = table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 1, 5))
    h = d.select(
        "doc_id", "source", _md5_long(prefix).alias("th")
    ).localCheckpoint(eager=False)  # digest rows; feeds group agg + survivor pick
    g = (
        h.groupBy("th")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("group_id"),
        )
        .filter(F.col("n_dups") > 1)
    )
    w = Window.partitionBy("th").orderBy("source", "doc_id")
    pick = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("th").alias("pth"),
            F.col("doc_id").alias("canonical_doc"),
            F.col("source").alias("canonical_source"),
        )
    )
    return (
        g.join(pick, g.th == F.col("pth"))
        .select(
            "group_id",
            F.col("n_dups").cast("bigint").alias("n_dups"),
            F.col("n_sources").cast("bigint").alias("n_sources"),
            "canonical_doc",
            "canonical_source",
        )
        .orderBy("group_id")
    )
