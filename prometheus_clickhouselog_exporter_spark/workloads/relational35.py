"""Round 7 batch 8: Fellegi-Sunter probabilistic record linkage,
Poisson dispersion test, rolling median / MAD outlier screen.

Fellegi-Sunter is the published probabilistic model behind every
industrial record-linkage system (and the method Splink/dedupe
implement): per-field agreement weights ln(m/u) estimated from data,
summed per candidate pair, thresholded. The ER family here already has
blocking, fuzzy joins, and golden-record survivorship; this adds the
SCORING model those systems rank pairs with. The dispersion test is the
standard "is this arrival process Poisson?" screen a rate monitor runs
before alerting on counts; the rolling median/MAD screen is the robust
windowed outlier detector (median filters, the signal-processing
workhorse) rendered as in-row sorted-frame expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table

_FIELDS = ["brand", "type", "size", "price"]


def _dirty_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared planted-duplicate pair corpus for the Fellegi-Sunter
    pair (supervised scoring + the EM twin): every 10th part
    re-enters with a perturbed name/size/price; candidate pairs are
    block-bounded; label = same origin. Checkpointed — each consumer
    runs two passes (estimate, score)."""
    nm = (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_name",
            F.concat_ws(
                " ",
                F.split("p_name", " ").getItem(0),
                F.split("p_name", " ").getItem(1),
            ).alias("blk"),  # TWO-word block: one word is quadratically
            # too coarse at sf0.1 (measured 47s — 6.5M pairs); the name
            # perturbation appends at the END, so duplicates co-block
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        )
        .distinct()
        .localCheckpoint(eager=False)  # original + perturbed-duplicate branch
    )
    orig = nm.select(
        F.col("p_partkey").alias("origin"),
        (F.col("p_partkey") * 2).alias("rid"),
        "p_name",
        "blk",
        "p_brand",
        "p_type",
        "p_size",
        "p_retailprice",
    )
    dup = nm.filter(F.col("p_partkey") % 10 == 0).select(
        F.col("p_partkey").alias("origin"),
        (F.col("p_partkey") * 2 + 1).alias("rid"),
        F.concat(F.col("p_name"), F.lit("x")).alias("p_name"),
        "blk",
        "p_brand",
        "p_type",
        (F.col("p_size") + F.col("p_partkey") % 2).alias("p_size"),
        (F.col("p_retailprice") * 1.02).alias("p_retailprice"),
    )
    dirty = orig.unionByName(dup)
    a = dirty.select(*[F.col(c).alias(f"a_{c}") for c in dirty.columns])
    b = dirty.select(*[F.col(c).alias(f"b_{c}") for c in dirty.columns])
    return (
        a.join(b, (F.col("a_blk") == F.col("b_blk")) & (F.col("a_rid") < F.col("b_rid")))
        .select(
            (F.col("a_origin") == F.col("b_origin")).alias("label"),
            (F.col("a_p_brand") == F.col("b_p_brand")).alias("ag_brand"),
            (F.col("a_p_type") == F.col("b_p_type")).alias("ag_type"),
            (F.col("a_p_size") == F.col("b_p_size")).alias("ag_size"),
            (
                F.abs(F.col("a_p_retailprice") - F.col("b_p_retailprice"))
                <= 0.1 * F.greatest("a_p_retailprice", "b_p_retailprice")
            ).alias("ag_price"),
        )
        .localCheckpoint(eager=False)  # each consumer runs 2 passes
    )


@query(
    "er_fellegi_sunter_scoring",
    oracle="""
    WITH nm AS (
      SELECT DISTINCT p_partkey, p_name,
             string_split(p_name, ' ')[1] || ' ' || string_split(p_name, ' ')[2]
               AS blk,
             p_brand, p_type, p_size, p_retailprice
      FROM part
    ),
    dirty AS (
      SELECT p_partkey AS origin, p_partkey * 2 AS rid, p_name, blk,
             p_brand, p_type, p_size, p_retailprice
      FROM nm
      UNION ALL
      SELECT p_partkey, p_partkey * 2 + 1, p_name || 'x', blk,
             p_brand, p_type, p_size + p_partkey % 2,
             p_retailprice * 1.02
      FROM nm WHERE p_partkey % 10 = 0
    ),
    pairs AS MATERIALIZED (
      SELECT (a.origin = b.origin) AS label,
             (a.p_brand = b.p_brand) AS ag_brand,
             (a.p_type = b.p_type) AS ag_type,
             (a.p_size = b.p_size) AS ag_size,
             (abs(a.p_retailprice - b.p_retailprice)
              <= 0.1 * greatest(a.p_retailprice, b.p_retailprice)) AS ag_price
      FROM dirty a JOIN dirty b ON a.blk = b.blk AND a.rid < b.rid
    ),
    est AS MATERIALIZED (
      SELECT f.field,
             (CASE f.field WHEN 'brand' THEN count_if(ag_brand AND label)
                           WHEN 'type' THEN count_if(ag_type AND label)
                           WHEN 'size' THEN count_if(ag_size AND label)
                           ELSE count_if(ag_price AND label) END + 0.5)
               / (count_if(label) + 1.0) AS m,
             (CASE f.field WHEN 'brand' THEN count_if(ag_brand AND NOT label)
                           WHEN 'type' THEN count_if(ag_type AND NOT label)
                           WHEN 'size' THEN count_if(ag_size AND NOT label)
                           ELSE count_if(ag_price AND NOT label) END + 0.5)
               / (count_if(NOT label) + 1.0) AS u
      FROM pairs, (VALUES ('brand'), ('type'), ('size'), ('price')) f(field)
      GROUP BY f.field
    ),
    wts AS (
      SELECT max(CASE WHEN field = 'brand' THEN ln(m / u) END) AS wb_a,
             max(CASE WHEN field = 'brand' THEN ln((1 - m) / (1 - u)) END) AS wb_d,
             max(CASE WHEN field = 'type' THEN ln(m / u) END) AS wt_a,
             max(CASE WHEN field = 'type' THEN ln((1 - m) / (1 - u)) END) AS wt_d,
             max(CASE WHEN field = 'size' THEN ln(m / u) END) AS ws_a,
             max(CASE WHEN field = 'size' THEN ln((1 - m) / (1 - u)) END) AS ws_d,
             max(CASE WHEN field = 'price' THEN ln(m / u) END) AS wp_a,
             max(CASE WHEN field = 'price' THEN ln((1 - m) / (1 - u)) END) AS wp_d
      FROM est
    ),
    scored AS (
      SELECT label,
             (CASE WHEN ag_brand THEN w.wb_a ELSE w.wb_d END
              + CASE WHEN ag_type THEN w.wt_a ELSE w.wt_d END
              + CASE WHEN ag_size THEN w.ws_a ELSE w.ws_d END
              + CASE WHEN ag_price THEN w.wp_a ELSE w.wp_d END) > 0
               AS predicted
      FROM pairs, wts w
    ),
    conf AS (
      SELECT CAST(count_if(predicted AND label) AS BIGINT) AS tp,
             CAST(count_if(predicted AND NOT label) AS BIGINT) AS fp,
             CAST(count_if(NOT predicted AND label) AS BIGINT) AS fn,
             CAST(count_if(NOT predicted AND NOT label) AS BIGINT) AS tn
      FROM scored
    )
    SELECT e.field,
           floor(e.m * 1e6 + 0.5) / 1e6 AS m,
           floor(e.u * 1e6 + 0.5) / 1e6 AS u,
           floor(ln(e.m / e.u) * 1e6 + 0.5) / 1e6 AS w_agree,
           floor(ln((1 - e.m) / (1 - e.u)) * 1e6 + 0.5) / 1e6 AS w_disagree,
           c.tp, c.fp, c.fn, c.tn
    FROM est e, conf c ORDER BY e.field
    """,
)
def er_fellegi_sunter_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over blocked part
    pairs: per-field m = P(agree | match) and u = P(agree | non-match)
    estimated from the candidate pairs (Laplace-smoothed; ground-truth
    match labels come from PLANTED perturbed duplicates — every 10th
    part re-enters with a tweaked name/size/price, the decontam
    discipline that keeps both label branches live and correlated with
    the fields, where the raw synthetic attributes carry no signal at
    all — m ≈ u on every field, measured), agreement /
    disagreement weights ln(m/u) and ln((1−m)/(1−u)), every pair scored
    by the weight SUM (fixed field order — a 4-term float sum evaluates
    identically in both engines), classified at score > 0, and the
    confusion matrix reported beside the per-field weights. This is the
    model Splink/dedupe ship; the EM-estimation variant replaces the
    labeled m/u estimate with iterated expected counts on the same plan.

    Plan note: the audit's multi-BNLJ flag is the whitelisted benign
    class — both nested-loop joins broadcast 1-ROW scalar frames (the
    m/u estimate and the confusion matrix) onto bounded frames.

    100 TB: pairs are block-bounded (never all-pairs); the weight table
    is |fields| rows broadcast back; two passes over the checkpointed
    pair frame (estimate, score) — the audit's price for the
    self-scored design."""
    pairs = _dirty_pairs(spark, sf_dir)
    agree = {
        "brand": F.col("ag_brand"),
        "type": F.col("ag_type"),
        "size": F.col("ag_size"),
        "price": F.col("ag_price"),
    }
    est = pairs.agg(
        *[
            (
                (F.count_if(agree[f] & F.col("label")) + 0.5)
                / (F.count_if(F.col("label")) + 1.0)
            ).alias(f"m_{f}")
            for f in _FIELDS
        ],
        *[
            (
                (F.count_if(agree[f] & ~F.col("label")) + 0.5)
                / (F.count_if(~F.col("label")) + 1.0)
            ).alias(f"u_{f}")
            for f in _FIELDS
        ],
    ).localCheckpoint(eager=False)  # weights feed scoring AND the report
    score = None
    for f in _FIELDS:
        term = F.when(agree[f], F.log(F.col(f"m_{f}") / F.col(f"u_{f}"))).otherwise(
            F.log((1 - F.col(f"m_{f}")) / (1 - F.col(f"u_{f}")))
        )
        score = term if score is None else score + term
    conf = (
        pairs.crossJoin(F.broadcast(est))
        .select("label", (score > 0).alias("predicted"))
        .agg(
            F.count_if(F.col("predicted") & F.col("label")).cast("bigint").alias("tp"),
            F.count_if(F.col("predicted") & ~F.col("label")).cast("bigint").alias("fp"),
            F.count_if(~F.col("predicted") & F.col("label")).cast("bigint").alias("fn"),
            F.count_if(~F.col("predicted") & ~F.col("label")).cast("bigint").alias("tn"),
        )
    )
    field_rows = est.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("field"),
                        fround(F.col(f"m_{f}"), 6).alias("m"),
                        fround(F.col(f"u_{f}"), 6).alias("u"),
                        fround(F.log(F.col(f"m_{f}") / F.col(f"u_{f}")), 6).alias(
                            "w_agree"
                        ),
                        fround(
                            F.log((1 - F.col(f"m_{f}")) / (1 - F.col(f"u_{f}"))), 6
                        ).alias("w_disagree"),
                    )
                    for f in _FIELDS
                ]
            )
        ).alias("e")
    ).select("e.*")
    return field_rows.crossJoin(F.broadcast(conf)).orderBy("field")


@query(
    "stats_poisson_dispersion",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS s,
             CAST(sum(k * k) AS BIGINT) AS ss
      FROM hourly GROUP BY 1
    )
    SELECT event_type, n AS n_hours, s AS n_events,
           floor((CAST(ss AS DOUBLE) / n
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                 / (CAST(s AS DOUBLE) / n) * 1e6 + 0.5) / 1e6
             AS dispersion_index,
           ((CAST(ss AS DOUBLE) / n
             - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
            / (CAST(s AS DOUBLE) / n)) > 1.0 AS overdispersed
    FROM m ORDER BY event_type
    """,
)
def stats_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion (variance-to-mean) index per event series over
    hourly arrival counts — the standard screen a rate monitor runs
    before trusting count-based alerts: D ≈ 1 for a Poisson process,
    D > 1 flags bursty (overdispersed) arrivals where naive thresholds
    misfire. Exact integer count moments; only the final divisions are
    float (identical operands both engines).

    100 TB: hours-cardinality pre-aggregate bounds everything; two
    map-side-combined groupBys, no window, no join."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("ss").cast("double") / F.col("n") - mean * mean
    d = var / mean
    return m.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("s").alias("n_events"),
        fround(d, 6).alias("dispersion_index"),
        (d > 1.0).alias("overdispersed"),
    ).orderBy("event_type")


@query(
    "window_rolling_median_robust",
    oracle="""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    fr AS (
      SELECT event_type, event_id, cents,
             list_sort(list(cents) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)) AS frame
      FROM c
    ),
    med AS (
      SELECT event_type, event_id, cents, frame,
             frame[(len(frame) + 1) // 2] AS med
      FROM fr
    ),
    mad AS (
      SELECT event_type, event_id, cents, med,
             list_sort(list_transform(frame, x -> abs(x - med)))
               [(len(frame) + 1) // 2] AS mad
      FROM med
    )
    SELECT event_type, event_id, cents,
           med AS rolling_med_cents, mad AS rolling_mad_cents,
           abs(cents - med) > 5 * mad AS is_outlier
    FROM mad ORDER BY event_type, event_id
    """,
)
def window_rolling_median_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN filter + rolling MAD outlier screen (the
    signal-processing workhorse robust detector: a point is anomalous
    when it sits > 5 MADs from the 15-row rolling median — immune to
    the outliers themselves, which inflate a rolling mean/stddev
    screen into missing them). The frame is collected IN-ROW (15-row
    bound), sorted, and indexed for the lower-middle order statistic;
    deviations re-sort the same in-row array — all integer cents, no
    float anywhere.

    100 TB: one shuffle on the series key; per-row cost is sorting a
    15-element array in-row (bounded by the frame constant, not the
    data). An exact DISTRIBUTED rolling median over huge frames would
    take the two-heap/indexable-skiplist form; for the bounded frames
    monitors actually use, the in-row sort IS the right plan."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 7)
    )
    fr = e.select(
        "event_type",
        "event_id",
        cents.alias("cents"),
        F.sort_array(F.collect_list(cents).over(w)).alias("frame"),
    )
    mid = (F.size("frame") + 1).cast("int")
    med = F.element_at("frame", (mid / 2).cast("int"))
    fr = fr.withColumn("med", med)
    mad = F.element_at(
        F.sort_array(
            F.transform("frame", lambda x: F.abs(x - F.col("med")))
        ),
        (mid / 2).cast("int"),
    )
    return fr.select(
        "event_type",
        "event_id",
        "cents",
        F.col("med").alias("rolling_med_cents"),
        mad.alias("rolling_mad_cents"),
        (F.abs(F.col("cents") - F.col("med")) > 5 * mad).alias("is_outlier"),
    ).orderBy("event_type", "event_id")


# Shared pair-corpus SQL (same construction the scoring oracle inlines)
_PAIRS_SQL = """
    WITH nm AS (
      SELECT DISTINCT p_partkey, p_name,
             string_split(p_name, ' ')[1] || ' ' || string_split(p_name, ' ')[2]
               AS blk,
             p_brand, p_type, p_size, p_retailprice
      FROM part
    ),
    dirty AS (
      SELECT p_partkey AS origin, p_partkey * 2 AS rid, p_name, blk,
             p_brand, p_type, p_size, p_retailprice
      FROM nm
      UNION ALL
      SELECT p_partkey, p_partkey * 2 + 1, p_name || 'x', blk,
             p_brand, p_type, p_size + p_partkey % 2,
             p_retailprice * 1.02
      FROM nm WHERE p_partkey % 10 = 0
    ),
    pairs AS MATERIALIZED (
      SELECT (a.origin = b.origin) AS label,
             (a.p_brand = b.p_brand) AS ag_brand,
             (a.p_type = b.p_type) AS ag_type,
             (a.p_size = b.p_size) AS ag_size,
             (abs(a.p_retailprice - b.p_retailprice)
              <= 0.1 * greatest(a.p_retailprice, b.p_retailprice)) AS ag_price
      FROM dirty a JOIN dirty b ON a.blk = b.blk AND a.rid < b.rid
    )
"""

_EM_E1 = """(0.1 * (CASE WHEN ag_brand THEN 0.9 ELSE 0.1 END)
                 * (CASE WHEN ag_type THEN 0.9 ELSE 0.1 END)
                 * (CASE WHEN ag_size THEN 0.9 ELSE 0.1 END)
                 * (CASE WHEN ag_price THEN 0.9 ELSE 0.1 END))
        / ((0.1 * (CASE WHEN ag_brand THEN 0.9 ELSE 0.1 END)
                 * (CASE WHEN ag_type THEN 0.9 ELSE 0.1 END)
                 * (CASE WHEN ag_size THEN 0.9 ELSE 0.1 END)
                 * (CASE WHEN ag_price THEN 0.9 ELSE 0.1 END))
           + (0.9 * (CASE WHEN ag_brand THEN u0.u_brand ELSE 1 - u0.u_brand END)
                  * (CASE WHEN ag_type THEN u0.u_type ELSE 1 - u0.u_type END)
                  * (CASE WHEN ag_size THEN u0.u_size ELSE 1 - u0.u_size END)
                  * (CASE WHEN ag_price THEN u0.u_price ELSE 1 - u0.u_price END)))"""


@query(
    "er_fellegi_sunter_em",
    oracle=_PAIRS_SQL
    + f""",
    u0 AS MATERIALIZED (
      SELECT CAST(count_if(ag_brand) AS DOUBLE) / count(*) AS u_brand,
             CAST(count_if(ag_type) AS DOUBLE) / count(*) AS u_type,
             CAST(count_if(ag_size) AS DOUBLE) / count(*) AS u_size,
             CAST(count_if(ag_price) AS DOUBLE) / count(*) AS u_price
      FROM pairs
    ),
    e1 AS MATERIALIZED (
      SELECT label, ag_brand, ag_type, ag_size, ag_price,
             {_EM_E1} AS w
      FROM pairs, u0
    ),
    m1 AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS np,
             sum(CAST(floor(w * 1e9 + 0.5) AS BIGINT)) / 1e9 AS sw,
             sum(CAST(floor((1 - w) * 1e9 + 0.5) AS BIGINT)) / 1e9 AS swc,
             sum(CASE WHEN ag_brand THEN CAST(floor(w * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS swb,
             sum(CASE WHEN ag_type  THEN CAST(floor(w * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS swt,
             sum(CASE WHEN ag_size  THEN CAST(floor(w * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS sws,
             sum(CASE WHEN ag_price THEN CAST(floor(w * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS swp,
             sum(CASE WHEN ag_brand THEN CAST(floor((1 - w) * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS scb,
             sum(CASE WHEN ag_type  THEN CAST(floor((1 - w) * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS sct,
             sum(CASE WHEN ag_size  THEN CAST(floor((1 - w) * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS scs,
             sum(CASE WHEN ag_price THEN CAST(floor((1 - w) * 1e9 + 0.5) AS BIGINT) ELSE 0 END) / 1e9 AS scp
      FROM e1
    ),
    p1 AS MATERIALIZED (
      SELECT sw / np AS lam,
             (swb + 0.5) / (sw + 1.0) AS m_brand,
             (swt + 0.5) / (sw + 1.0) AS m_type,
             (sws + 0.5) / (sw + 1.0) AS m_size,
             (swp + 0.5) / (sw + 1.0) AS m_price,
             (scb + 0.5) / (swc + 1.0) AS u_brand,
             (sct + 0.5) / (swc + 1.0) AS u_type,
             (scs + 0.5) / (swc + 1.0) AS u_size,
             (scp + 0.5) / (swc + 1.0) AS u_price
      FROM m1
    ),
    e2 AS MATERIALIZED (
      SELECT label,
             (p.lam * (CASE WHEN ag_brand THEN p.m_brand ELSE 1 - p.m_brand END)
                    * (CASE WHEN ag_type THEN p.m_type ELSE 1 - p.m_type END)
                    * (CASE WHEN ag_size THEN p.m_size ELSE 1 - p.m_size END)
                    * (CASE WHEN ag_price THEN p.m_price ELSE 1 - p.m_price END))
             / ((p.lam * (CASE WHEN ag_brand THEN p.m_brand ELSE 1 - p.m_brand END)
                       * (CASE WHEN ag_type THEN p.m_type ELSE 1 - p.m_type END)
                       * (CASE WHEN ag_size THEN p.m_size ELSE 1 - p.m_size END)
                       * (CASE WHEN ag_price THEN p.m_price ELSE 1 - p.m_price END))
                + ((1 - p.lam)
                       * (CASE WHEN ag_brand THEN p.u_brand ELSE 1 - p.u_brand END)
                       * (CASE WHEN ag_type THEN p.u_type ELSE 1 - p.u_type END)
                       * (CASE WHEN ag_size THEN p.u_size ELSE 1 - p.u_size END)
                       * (CASE WHEN ag_price THEN p.u_price ELSE 1 - p.u_price END)))
               AS w
      FROM pairs, p1 p
    ),
    conf AS (
      SELECT CAST(count_if(w > 0.5 AND label) AS BIGINT) AS tp,
             CAST(count_if(w > 0.5 AND NOT label) AS BIGINT) AS fp,
             CAST(count_if(w <= 0.5 AND label) AS BIGINT) AS fn,
             CAST(count_if(w <= 0.5 AND NOT label) AS BIGINT) AS tn
      FROM e2
    )
    SELECT f.field,
           floor(CASE f.field WHEN 'brand' THEN p.m_brand
                              WHEN 'type' THEN p.m_type
                              WHEN 'size' THEN p.m_size
                              ELSE p.m_price END * 1e6 + 0.5) / 1e6 AS m_em,
           floor(CASE f.field WHEN 'brand' THEN p.u_brand
                              WHEN 'type' THEN p.u_type
                              WHEN 'size' THEN p.u_size
                              ELSE p.u_price END * 1e6 + 0.5) / 1e6 AS u_em,
           floor(p.lam * 1e6 + 0.5) / 1e6 AS lambda_em,
           c.tp, c.fp, c.fn, c.tn
    FROM (VALUES ('brand'), ('price'), ('size'), ('type')) f(field), p1 p, conf c
    ORDER BY f.field
    """,
)
def er_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNSUPERVISED Fellegi-Sunter via two unrolled EM iterations — the
    estimation mode production linkers (Splink) actually run, since
    labeled pairs rarely exist: initialize m=0.9 and u = the observed
    overall agreement rate, E-step computes each pair's match posterior
    under the naive-Bayes likelihood, M-step re-estimates (λ, m, u)
    from QUANTIZED posterior sums (floor(w·1e9) BIGINT folds — the EM
    analog of the quantized-folds rule: no float reduction order on the
    hash path), then a second E-step classifies at posterior > 0.5.
    The planted labels are used ONLY for the confusion report — the
    estimation never sees them, and the test pins that EM still
    recovers the duplicates (recall ≥ 0.9).

    100 TB: each EM iteration is one pass over the block-bounded pair
    frame + a 1-row parameter aggregate broadcast back — iterations
    scale like any scan, parameters are O(fields)."""
    pairs = _dirty_pairs(spark, sf_dir)
    agree = {
        "brand": F.col("ag_brand"),
        "type": F.col("ag_type"),
        "size": F.col("ag_size"),
        "price": F.col("ag_price"),
    }
    u0 = pairs.agg(
        *[
            (F.count_if(agree[f]).cast("double") / F.count(F.lit(1))).alias(
                f"u_{f}"
            )
            for f in _FIELDS
        ]
    )

    def posterior(lam, m, u):
        num = F.lit(1.0) * lam
        den_u = F.lit(1.0) * (1.0 - lam) if isinstance(lam, float) else (1 - lam)
        for f in _FIELDS:
            num = num * F.when(agree[f], m[f]).otherwise(1 - m[f])
            den_u = den_u * F.when(agree[f], u[f]).otherwise(1 - u[f])
        return num / (num + den_u)

    qw = lambda c: F.floor(c * 1e9 + F.lit(0.5)).cast("long")  # noqa: E731

    m0 = {f: F.lit(0.9) for f in _FIELDS}
    u0cols = {f: F.col(f"u_{f}") for f in _FIELDS}
    e1 = pairs.crossJoin(F.broadcast(u0)).withColumn(
        "w", posterior(0.1, m0, u0cols)
    )
    m1 = e1.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        (F.sum(qw(F.col("w"))) / 1e9).alias("sw"),
        (F.sum(qw(1 - F.col("w"))) / 1e9).alias("swc"),
        *[
            (F.sum(F.when(agree[f], qw(F.col("w"))).otherwise(F.lit(0))) / 1e9).alias(
                f"sw_{f}"
            )
            for f in _FIELDS
        ],
        *[
            (
                F.sum(F.when(agree[f], qw(1 - F.col("w"))).otherwise(F.lit(0)))
                / 1e9
            ).alias(f"sc_{f}")
            for f in _FIELDS
        ],
    )
    p1 = m1.select(
        (F.col("sw") / F.col("np")).alias("lam"),
        *[
            ((F.col(f"sw_{f}") + 0.5) / (F.col("sw") + 1.0)).alias(f"m_{f}")
            for f in _FIELDS
        ],
        *[
            ((F.col(f"sc_{f}") + 0.5) / (F.col("swc") + 1.0)).alias(f"u_{f}")
            for f in _FIELDS
        ],
    ).localCheckpoint(eager=False)  # E-step 2 AND the report read it
    m1cols = {f: F.col(f"m_{f}") for f in _FIELDS}
    u1cols = {f: F.col(f"u_{f}") for f in _FIELDS}
    e2 = pairs.crossJoin(F.broadcast(p1)).withColumn(
        "w", posterior(F.col("lam"), m1cols, u1cols)
    )
    conf = e2.agg(
        F.count_if((F.col("w") > 0.5) & F.col("label")).cast("bigint").alias("tp"),
        F.count_if((F.col("w") > 0.5) & ~F.col("label")).cast("bigint").alias("fp"),
        F.count_if((F.col("w") <= 0.5) & F.col("label")).cast("bigint").alias("fn"),
        F.count_if((F.col("w") <= 0.5) & ~F.col("label")).cast("bigint").alias("tn"),
    )
    field_rows = p1.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("field"),
                        fround(F.col(f"m_{f}"), 6).alias("m_em"),
                        fround(F.col(f"u_{f}"), 6).alias("u_em"),
                        fround(F.col("lam"), 6).alias("lambda_em"),
                    )
                    for f in _FIELDS
                ]
            )
        ).alias("e")
    ).select("e.*")
    return field_rows.crossJoin(F.broadcast(conf)).orderBy("field")
