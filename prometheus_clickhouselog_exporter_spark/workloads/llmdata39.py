"""Round 13 batch 2: BPE apply pass, ClickHouse categorical-association
parity (cramersV / theilsU / contingency), deltaSum + moving sum,
Mantel–Haenszel stratified odds, MCC confusion battery, Self-BLEU-2.

Chains and gaps this batch closes: text_bpe_apply_encoding is the
ENCODE pass for text_bpe_train_merges' trained vocabulary (train →
apply, the pair a tokenizer pipeline actually ships);
clickhouse_categorical_association adds the three categorical
association aggregates ClickHouse ships (cramersV,
cramersVBiasCorrected, theilsU, contingency) that the parity family
lacked; clickhouse_delta_sum_moving adds deltaSum + groupArrayMovingSum
semantics; stats_mantel_haenszel is the stratified 2×2 common-odds
classic; ml_mcc_threshold completes the confusion-matrix battery
around the existing ROC/PR/F1 rows; text_self_bleu is the corpus
diversity metric generation papers report.

Ref cite: none — /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these surfaces; §2.3 territory. Methods
public: Sennrich et al. 2016 (BPE), Cramér 1946 / Bergsma 2013
(bias-corrected V), Theil 1970 (uncertainty coefficient), ClickHouse
docs (deltaSum, groupArrayMovingSum), Mantel & Haenszel 1959, Matthews
1975 (MCC), Zhu et al. 2018 (Self-BLEU).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table
from .llmdata37 import _BPE_MERGES, _BPE_VOCAB_SQL, _bpe_train

# --- BPE apply / encode pass -------------------------------------------------

_BPE_APPLY_ORACLE = f"""
    WITH {_BPE_VOCAB_SQL},
    enc AS MATERIALIZED (
      SELECT word, freq,
             CAST(len(string_split(trim(w, '|'), '||')) AS BIGINT) AS n_tok,
             CAST(length(word) AS BIGINT) AS n_chr
      FROM w{_BPE_MERGES}
    ),
    corpus AS (
      SELECT d.source, t.word AS word
      FROM documents d, unnest(string_split(lower(d.text), ' ')) AS t(word)
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(e.word) AS BIGINT) AS n_covered,
           CAST(coalesce(sum(e.n_tok), 0) AS BIGINT) AS encoded_tokens,
           CAST(coalesce(sum(e.n_chr), 0) AS BIGINT) AS covered_chars,
           CASE WHEN coalesce(sum(e.n_tok), 0) > 0 THEN
             floor(CAST(sum(e.n_chr) AS DOUBLE) / sum(e.n_tok) * 1e6 + 0.5)
               / 1e6
           END AS chars_per_token
    FROM corpus c LEFT JOIN enc e USING (word)
    GROUP BY c.source ORDER BY c.source
    """


@query("text_bpe_apply_encoding", oracle=_BPE_APPLY_ORACLE)
def text_bpe_apply_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE pass for the trained BPE vocabulary (the second half of
    the train→apply pair; text_bpe_train_merges is the first): after 8
    merges, every vocabulary word's token count is the length of its
    double-pipe encoding, and encoding the corpus is a word-keyed join
    — per source: occurrences, vocabulary coverage, total encoded
    tokens, and the realized chars-per-token compression (the number a
    tokenizer release quotes).

    Exactness: token counts are string-split lengths of the
    deterministic merge output; everything is integer until the final
    compression divide (fround 1e-6).

    100 TB: the trained vocabulary is Heaps-sublinear and broadcasts
    to the corpus scan — the encode pass is one scan-stage LEFT join +
    one per-source aggregate; no corpus-sized shuffle beyond the
    source rollup."""
    _merges, w = _bpe_train(spark, sf_dir)
    enc = w.select(
        "word",
        F.size(F.split(F.expr("trim(BOTH '|' FROM w)"), r"\|\|"))
        .cast("bigint")
        .alias("n_tok"),
        F.length("word").cast("bigint").alias("n_chr"),
    )
    corpus = table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    return (
        corpus.join(F.broadcast(enc), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.count("n_tok").cast("bigint").alias("n_covered"),
            F.coalesce(F.sum("n_tok"), F.lit(0))
            .cast("bigint")
            .alias("encoded_tokens"),
            F.coalesce(F.sum("n_chr"), F.lit(0))
            .cast("bigint")
            .alias("covered_chars"),
            F.when(
                F.coalesce(F.sum("n_tok"), F.lit(0)) > 0,
                fround(
                    F.sum("n_chr").cast("double") / F.sum("n_tok"), 6
                ),
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


# --- ClickHouse categorical association (cramersV / theilsU / contingency) ---

_ASSOC_ORACLE = """
    WITH cell AS MATERIALIZED (
      SELECT event_type AS x,
             least(9, greatest(0, CAST(floor(value) AS BIGINT))) AS y,
             CAST(count(*) AS BIGINT) AS nxy
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    rx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cell GROUP BY x),
    cy AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cell GROUP BY y),
    tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
                   CAST(count(DISTINCT x) AS BIGINT) AS r,
                   CAST(count(DISTINCT y) AS BIGINT) AS c
            FROM cell),
    chi AS (
      SELECT CAST(sum(q) AS BIGINT) AS chi2_q FROM (
        SELECT CAST(floor(
          (CAST(cell.nxy AS DOUBLE) * t.n - CAST(rx.nx AS DOUBLE) * cy.ny)
          * (CAST(cell.nxy AS DOUBLE) * t.n - CAST(rx.nx AS DOUBLE) * cy.ny)
          / (CAST(rx.nx AS DOUBLE) * cy.ny * t.n) * 1e9 + 0.5) AS BIGINT) AS q
        FROM cell JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN tot t
      )
    ),
    hx AS (
      SELECT CAST(sum(CAST(floor(
        -(CAST(nx AS DOUBLE) / t.n) * ln(CAST(nx AS DOUBLE) / t.n)
        * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS hx_q
      FROM rx CROSS JOIN tot t
    ),
    hxy AS (
      SELECT CAST(sum(CAST(floor(
        -(CAST(cell.nxy AS DOUBLE) / t.n)
        * ln(CAST(cell.nxy AS DOUBLE) / cy.ny) * 1e9 + 0.5) AS BIGINT))
        AS BIGINT) AS hxy_q
      FROM cell JOIN cy USING (y) CROSS JOIN tot t
    )
    SELECT t.n, t.r, t.c,
           floor(CAST(chi.chi2_q AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS chi2,
           floor(sqrt(CAST(chi.chi2_q AS DOUBLE) / 1e9
                      / (t.n * (least(t.r, t.c) - 1))) * 1e6 + 0.5) / 1e6
             AS cramers_v,
           floor(sqrt(
             greatest(0.0, CAST(chi.chi2_q AS DOUBLE) / 1e9 / t.n
                           - CAST((t.r - 1) * (t.c - 1) AS DOUBLE) / (t.n - 1))
             / (least(t.r - CAST((t.r - 1) * (t.r - 1) AS DOUBLE) / (t.n - 1),
                      t.c - CAST((t.c - 1) * (t.c - 1) AS DOUBLE) / (t.n - 1))
                - 1)) * 1e6 + 0.5) / 1e6 AS cramers_v_bc,
           floor((CAST(hx.hx_q AS DOUBLE) - hxy.hxy_q)
                 / CAST(hx.hx_q AS DOUBLE) * 1e6 + 0.5) / 1e6 AS theils_u,
           floor(sqrt(CAST(chi.chi2_q AS DOUBLE) / 1e9
                      / (CAST(chi.chi2_q AS DOUBLE) / 1e9 + t.n))
                 * 1e6 + 0.5) / 1e6 AS contingency_c
    FROM tot t CROSS JOIN chi CROSS JOIN hx CROSS JOIN hxy
    """


@query("clickhouse_categorical_association", oracle=_ASSOC_ORACLE)
def clickhouse_categorical_association(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse's categorical-association aggregate family on one
    contingency census (event_type × clamped integer value bucket):
    cramersV (Cramér 1946), cramersVBiasCorrected (Bergsma 2013:
    φ²_corr = max(0, χ²/n − (r−1)(c−1)/(n−1)) over corrected
    dimensions), theilsU — the asymmetric uncertainty coefficient
    U(X|Y) = (H(X) − H(X|Y))/H(X) — and contingency (Pearson's C =
    √(χ²/(χ²+n))). One census, one row out, four parity aggregates.

    Exactness: χ² folds per-cell quantized 1e-9 terms of exact integer
    census counts ((nxy·n − nx·ny)²/(nx·ny·n) — each cell is a single
    double expression, identical in both engines); entropies fold
    per-cell 1e-9-quantized nano-nats (the DoReMi/perplexity
    discipline); the four published statistics then divide/sqrt the
    two quantized sums and fround 1e-6.

    100 TB: one hash aggregate to the r×c census (map-side partial),
    then arithmetic on ≤ r·c rows with 1-row broadcasts — the census
    IS the sufficient statistic for all four aggregates.

    Ref cite: none — §2.3 ClickHouse parity (cramersV / theilsU /
    contingency docs)."""
    cell = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("x"),
            F.least(
                F.lit(9),
                F.greatest(F.lit(0), F.floor("value").cast("bigint")),
            ).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nxy"))
        .localCheckpoint(eager=False)  # margins + chi2 + entropies
    )
    rx = cell.groupBy("x").agg(F.sum("nxy").cast("bigint").alias("nx"))
    cy = cell.groupBy("y").agg(F.sum("nxy").cast("bigint").alias("ny"))
    tot = cell.agg(
        F.sum("nxy").cast("bigint").alias("n"),
        F.countDistinct("x").cast("bigint").alias("r"),
        F.countDistinct("y").cast("bigint").alias("c"),
    ).localCheckpoint(eager=False)  # 1 row, 3 consumers
    nd = F.col("n").cast("double")
    dev = F.col("nxy").cast("double") * F.col("n") - F.col("nx").cast(
        "double"
    ) * F.col("ny")
    chi = (
        cell.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                dev * dev
                / (F.col("nx").cast("double") * F.col("ny") * F.col("n"))
                * 1e9
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("q")
        )
        .agg(F.sum("q").cast("bigint").alias("chi2_q"))
    )
    px = F.col("nx").cast("double") / F.col("n")
    hx = (
        rx.crossJoin(F.broadcast(tot))
        .select(
            F.floor(-px * F.log(px) * 1e9 + F.lit(0.5))
            .cast("bigint")
            .alias("q")
        )
        .agg(F.sum("q").cast("bigint").alias("hx_q"))
    )
    pxy = F.col("nxy").cast("double") / F.col("n")
    pcy = F.col("nxy").cast("double") / F.col("ny")
    hxy = (
        cell.join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(-pxy * F.log(pcy) * 1e9 + F.lit(0.5))
            .cast("bigint")
            .alias("q")
        )
        .agg(F.sum("q").cast("bigint").alias("hxy_q"))
    )
    chi2d = F.col("chi2_q").cast("double") / 1e9
    rd, cd = F.col("r").cast("double"), F.col("c").cast("double")
    r_corr = rd - (rd - 1) * (rd - 1) / (nd - 1)
    c_corr = cd - (cd - 1) * (cd - 1) / (nd - 1)
    phi2_corr = F.greatest(
        F.lit(0.0), chi2d / nd - (rd - 1) * (cd - 1) / (nd - 1)
    )
    return (
        tot.crossJoin(F.broadcast(chi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hxy))
        .select(
            "n",
            "r",
            "c",
            fround(chi2d, 6).alias("chi2"),
            fround(
                F.sqrt(chi2d / (nd * (F.least(rd, cd) - 1))), 6
            ).alias("cramers_v"),
            fround(
                F.sqrt(phi2_corr / (F.least(r_corr, c_corr) - 1)), 6
            ).alias("cramers_v_bc"),
            fround(
                (F.col("hx_q").cast("double") - F.col("hxy_q"))
                / F.col("hx_q").cast("double"),
                6,
            ).alias("theils_u"),
            fround(F.sqrt(chi2d / (chi2d + nd)), 6).alias("contingency_c"),
        )
    )


# --- ClickHouse deltaSum + groupArrayMovingSum ------------------------------

_DELTA_ORACLE = """
    WITH pts AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v, ts, event_id
      FROM events WHERE value IS NOT NULL
    ),
    lagged AS (
      SELECT event_type, v,
             lag(v) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS pv,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_last,
             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS mov3
      FROM pts
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN pv IS NOT NULL AND v > pv
                    THEN v - pv ELSE 0 END) AS BIGINT) AS delta_sum_cents,
           CAST(sum(CASE WHEN pv IS NOT NULL AND v < pv
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_drops,
           CAST(max(CASE WHEN rn_last = 1 THEN mov3 END) AS BIGINT)
             AS last_moving3_cents
    FROM lagged GROUP BY event_type ORDER BY event_type
    """


@query("clickhouse_delta_sum_moving", oracle=_DELTA_ORACLE)
def clickhouse_delta_sum_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse deltaSum + groupArrayMovingSum parity on the per-type
    event series (integer cents, ordered by (ts, event_id) so ties are
    deterministic): deltaSum = Σ max(0, vₜ − vₜ₋₁) over consecutive
    rows (the first row of a series contributes nothing — documented
    contract), n_drops counts the ignored negative deltas, and
    last_moving3 is groupArrayMovingSum(3)'s final element (the
    trailing-3 window sum at the series end).

    100 TB: per-series windows partition by event_type — bounded,
    never global; one pass computes lag, the trailing sum, and the
    last-row marker on the same partitioning (single exchange).

    Ref cite: none — §2.3 ClickHouse parity (deltaSum /
    groupArrayMovingSum docs)."""
    pts = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
            "ts",
            "event_id",
        )
    )
    wfwd = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wbwd = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    lagged = pts.select(
        "event_type",
        "v",
        F.lag("v").over(wfwd).alias("pv"),
        F.row_number().over(wbwd).alias("rn_last"),
        F.sum("v")
        .over(wfwd.rowsBetween(-2, 0))
        .cast("bigint")
        .alias("mov3"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(
                F.when(
                    F.col("pv").isNotNull() & (F.col("v") > F.col("pv")),
                    F.col("v") - F.col("pv"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("delta_sum_cents"),
            F.sum(
                F.when(
                    F.col("pv").isNotNull() & (F.col("v") < F.col("pv")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_drops"),
            F.max(F.when(F.col("rn_last") == 1, F.col("mov3")))
            .cast("bigint")
            .alias("last_moving3_cents"),
        )
        .orderBy("event_type")
    )


# --- Mantel–Haenszel stratified 2x2 ------------------------------------------

_MH_ORACLE = """
    WITH base AS (
      SELECT o.o_orderpriority AS stratum,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cen AS (
      SELECT stratum, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM base GROUP BY 1, 2
    ),
    tot AS (SELECT stratum, CAST(sum(cnt) AS BIGINT) AS n FROM cen
            GROUP BY stratum),
    cut AS (
      SELECT stratum, CAST(min(cents) AS BIGINT) AS p50 FROM (
        SELECT c.stratum, c.cents, t.n,
               CAST(sum(c.cnt) OVER (PARTITION BY c.stratum ORDER BY c.cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM cen c JOIN tot t USING (stratum)
      ) WHERE 2 * cum >= n GROUP BY stratum
    ),
    cells AS MATERIALIZED (
      SELECT b.stratum,
             CAST(sum(CASE WHEN e = 1 AND cents > p50 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN e = 1 AND cents <= p50 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b_,
             CAST(sum(CASE WHEN e = 0 AND cents > p50 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_,
             CAST(sum(CASE WHEN e = 0 AND cents <= p50 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM base b JOIN cut USING (stratum)
      GROUP BY b.stratum
    ),
    terms AS (
      SELECT stratum, a, a + b_ + c_ + d AS n,
             CAST(floor(CAST(a AS DOUBLE) * d / (a + b_ + c_ + d)
                        * 1e9 + 0.5) AS BIGINT) AS ad_q,
             CAST(floor(CAST(b_ AS DOUBLE) * c_ / (a + b_ + c_ + d)
                        * 1e9 + 0.5) AS BIGINT) AS bc_q,
             CAST(floor(CAST(a + b_ AS DOUBLE) * (a + c_)
                        / (a + b_ + c_ + d) * 1e9 + 0.5) AS BIGINT) AS e_q,
             CAST(floor(CAST(a + b_ AS DOUBLE) * (c_ + d) * (a + c_)
                        * (b_ + d)
                        / (CAST(a + b_ + c_ + d AS DOUBLE)
                           * (a + b_ + c_ + d) * (a + b_ + c_ + d - 1))
                        * 1e9 + 0.5) AS BIGINT) AS v_q
      FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(a) AS BIGINT) AS sum_a,
           floor(CAST(sum(ad_q) AS DOUBLE) / sum(bc_q) * 1e6 + 0.5) / 1e6
             AS or_mh,
           floor((abs(CAST(sum(a) AS DOUBLE) - CAST(sum(e_q) AS DOUBLE) / 1e9)
                  - 0.5)
                 * (abs(CAST(sum(a) AS DOUBLE) - CAST(sum(e_q) AS DOUBLE) / 1e9)
                    - 0.5)
                 / (CAST(sum(v_q) AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
             AS chi2_cmh
    FROM terms
    """


@query("stats_mantel_haenszel", oracle=_MH_ORACLE)
def stats_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel common odds ratio + continuity-corrected CMH χ²
    (Mantel & Haenszel 1959) across the five order-priority strata:
    exposure = BUILDING market segment, outcome = order total above the
    stratum's DISCRETE median (2·cum ≥ n census cut — integer). OR_MH =
    Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ); χ²_CMH = (|Σaᵢ − ΣEᵢ| − ½)²/ΣVᵢ with the
    hypergeometric Eᵢ, Vᵢ — the stratified confounder-adjusted 2×2 test
    every epidemiology/AB-testing toolkit ships.

    Exactness: per-stratum rational terms (ad/n, bc/n, E, V) quantize
    at 1e-9 from exact integer cells before the 5-row sums; the two
    published statistics fround 1e-6.

    100 TB: one join (orders ⋈ customer — key-partitioned), one census
    per stratum for the median cut, one 2×2 aggregate per stratum —
    the strata frame is |strata|-bounded (5 rows) end to end."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("stratum"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("e"),
    )
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        "stratum", "e", "cents"
    ).localCheckpoint(eager=False)  # census + cells
    cen = base.groupBy("stratum", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = cen.groupBy("stratum").agg(F.sum("cnt").cast("bigint").alias("n"))
    wcum = (
        Window.partitionBy("stratum")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cut = (
        cen.join(tot, "stratum")
        .select(
            "stratum",
            "cents",
            "n",
            F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        )
        .filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("stratum")
        .agg(F.min("cents").cast("bigint").alias("p50"))
    )
    cells = (
        base.join(F.broadcast(cut), "stratum")
        .groupBy("stratum")
        .agg(
            F.sum(((F.col("e") == 1) & (F.col("cents") > F.col("p50"))).cast("int"))
            .cast("bigint")
            .alias("a"),
            F.sum(((F.col("e") == 1) & (F.col("cents") <= F.col("p50"))).cast("int"))
            .cast("bigint")
            .alias("b_"),
            F.sum(((F.col("e") == 0) & (F.col("cents") > F.col("p50"))).cast("int"))
            .cast("bigint")
            .alias("c_"),
            F.sum(((F.col("e") == 0) & (F.col("cents") <= F.col("p50"))).cast("int"))
            .cast("bigint")
            .alias("d"),
        )
    )
    n_s = (F.col("a") + F.col("b_") + F.col("c_") + F.col("d")).cast("double")
    q = lambda col: F.floor(col * 1e9 + F.lit(0.5)).cast("bigint")  # noqa: E731
    terms = cells.select(
        "a",
        q(F.col("a").cast("double") * F.col("d") / n_s).alias("ad_q"),
        q(F.col("b_").cast("double") * F.col("c_") / n_s).alias("bc_q"),
        q(
            (F.col("a") + F.col("b_")).cast("double")
            * (F.col("a") + F.col("c_"))
            / n_s
        ).alias("e_q"),
        q(
            (F.col("a") + F.col("b_")).cast("double")
            * (F.col("c_") + F.col("d"))
            * (F.col("a") + F.col("c_"))
            * (F.col("b_") + F.col("d"))
            / (n_s * n_s * (n_s - 1))
        ).alias("v_q"),
    )
    dev = F.abs(
        F.sum("a").cast("double") - F.sum("e_q").cast("double") / 1e9
    ) - F.lit(0.5)
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("sum_a"),
        fround(F.sum("ad_q").cast("double") / F.sum("bc_q"), 6).alias("or_mh"),
        fround(dev * dev / (F.sum("v_q").cast("double") / 1e9), 6).alias(
            "chi2_cmh"
        ),
    )


# --- MCC / confusion battery at a fixed threshold ----------------------------

_MCC_ORACLE = """
    WITH scored AS (
      SELECT value AS s, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    cen AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM scored GROUP BY s),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cen),
    cut AS (
      SELECT min(s) AS p75 FROM (
        SELECT c.s, t.n,
               CAST(sum(c.cnt) OVER (ORDER BY c.s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM cen c CROSS JOIN tot t
      ) WHERE 4 * cum >= 3 * n
    ),
    conf AS (
      SELECT CAST(sum(CASE WHEN s > p75 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s > p75 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s <= p75 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s <= p75 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM scored CROSS JOIN cut
    )
    SELECT tp, fp, fn, tn,
           floor((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                        * (tn + fp) * (tn + fn)) * 1e6 + 0.5) / 1e6 AS mcc,
           floor(2.0 * tp / (2.0 * tp + fp + fn) * 1e6 + 0.5) / 1e6 AS f1,
           floor((CAST(tp AS DOUBLE) / (tp + fn)
                  + CAST(tn AS DOUBLE) / (tn + fp)) / 2 * 1e6 + 0.5) / 1e6
             AS balanced_acc,
           floor((CAST(tp AS DOUBLE) / (tp + fn)
                  + CAST(tn AS DOUBLE) / (tn + fp) - 1) * 1e6 + 0.5) / 1e6
             AS youden_j
    FROM conf
    """


@query("ml_mcc_threshold", oracle=_MCC_ORACLE)
def ml_mcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix battery at the discrete p75 score cut (the same
    score/label construction as ml_roc_pr_summary / ml_best_f1_threshold
    — value as score, error events as positives): TP/FP/FN/TN plus
    Matthews correlation coefficient (Matthews 1975 — the balanced
    single-number summary robust to class skew, which plain accuracy
    and F1 are not), F1, balanced accuracy, and Youden's J. Completes
    the threshold-metric family around the existing ROC/PR/F1/ECE rows.

    Exactness: the cut is a census rank (4·cum ≥ 3·n, integer);
    confusion cells are integer counts; each statistic is one double
    expression of exact integers, fround 1e-6.

    100 TB: one score census (map-side partial), one bounded global
    window over CENSUS rows for the cut, one conditional-sum aggregate
    over the scan — no per-row state, no sort of the corpus."""
    scored = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("value").alias("s"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
        )
        .localCheckpoint(eager=False)  # census + confusion pass
    )
    cen = scored.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tot = cen.agg(F.sum("cnt").cast("bigint").alias("n"))
    wcum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    cut = (
        cen.crossJoin(F.broadcast(tot))
        .select(
            "s", "n", F.sum("cnt").over(wcum).cast("bigint").alias("cum")
        )
        .filter(4 * F.col("cum") >= 3 * F.col("n"))
        .agg(F.min("s").alias("p75"))
    )
    conf = (
        scored.crossJoin(F.broadcast(cut))
        .agg(
            F.sum(((F.col("s") > F.col("p75")) & (F.col("y") == 1)).cast("int"))
            .cast("bigint")
            .alias("tp"),
            F.sum(((F.col("s") > F.col("p75")) & (F.col("y") == 0)).cast("int"))
            .cast("bigint")
            .alias("fp"),
            F.sum(((F.col("s") <= F.col("p75")) & (F.col("y") == 1)).cast("int"))
            .cast("bigint")
            .alias("fn"),
            F.sum(((F.col("s") <= F.col("p75")) & (F.col("y") == 0)).cast("int"))
            .cast("bigint")
            .alias("tn"),
        )
    )
    tp, fp, fn, tn = (F.col(k).cast("double") for k in ("tp", "fp", "fn", "tn"))
    return conf.select(
        "tp",
        "fp",
        "fn",
        "tn",
        fround(
            (tp * F.col("tn") - fp * F.col("fn"))
            / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
            6,
        ).alias("mcc"),
        fround(2 * tp / (2 * tp + fp + fn), 6).alias("f1"),
        fround((tp / (tp + fn) + tn / (tn + fp)) / 2, 6).alias("balanced_acc"),
        fround(tp / (tp + fn) + tn / (tn + fp) - 1, 6).alias("youden_j"),
    )


# --- Self-BLEU-2 (corpus diversity) ------------------------------------------

_SELF_BLEU_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    grams AS (
      SELECT doc_id, source, t[u.i] || ' ' || t[u.i + 1] AS g
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    dg AS MATERIALIZED (
      SELECT doc_id, source, g, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2, 3
    ),
    cg AS (SELECT g, CAST(sum(c) AS BIGINT) AS cc FROM dg GROUP BY g),
    per_doc AS (
      SELECT dg.doc_id, dg.source,
             CAST(sum(least(dg.c, cg.cc - dg.c)) AS BIGINT) AS clipped,
             CAST(sum(dg.c) AS BIGINT) AS total
      FROM dg JOIN cg USING (g)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT source,
             CAST(floor(CAST(clipped AS DOUBLE) / total * 1e9 + 0.5)
                  AS BIGINT) AS p_q
      FROM per_doc
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(p_q) AS DOUBLE) / count(*) / 1e9 * 1e6 + 0.5) / 1e6
             AS self_bleu2
    FROM scored GROUP BY source ORDER BY source
    """


@query("text_self_bleu", oracle=_SELF_BLEU_ORACLE)
def text_self_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU (Zhu et al. 2018), the 2-gram precision slice (the
    chrF-slice convention, eval_chrf_pairs): each document's clipped
    bigram precision against the REST of the corpus as reference —
    clip(g) = min(c_d(g), C(g) − c_d(g)), so a gram the document holds
    the corpus' only copies of contributes zero. High Self-BLEU = low
    diversity (documents paraphrase each other); per-source means are
    the generation-diversity report a synthetic-data card publishes.

    Exactness: clips are integer (corpus-minus-self is exact
    subtraction of counts, no smoothing); per-doc precision quantizes
    at 1e-9 before the per-source mean (fround 1e-6).

    100 TB: the bigram census is vocabulary-bounded and joins back
    doc-keyed (the TF-IDF two-phase shape); no doc ever pairs with
    another doc — corpus-minus-self replaces the quadratic
    every-doc-vs-rest BLEU with one census join."""
    toks = (
        table(spark, sf_dir, "documents")
        .filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select("doc_id", "source", F.split(F.lower("text"), " ").alias("t"))
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
        "t",
    ).select(
        "doc_id",
        "source",
        F.concat_ws(
            " ", F.element_at("t", F.col("i")), F.element_at("t", F.col("i") + 1)
        ).alias("g"),
    )
    dg = grams.groupBy("doc_id", "source", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # census + per-doc fold
    cg = dg.groupBy("g").agg(F.sum("c").cast("bigint").alias("cc"))
    per_doc = (
        dg.join(cg, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.least(F.col("c"), F.col("cc") - F.col("c")))
            .cast("bigint")
            .alias("clipped"),
            F.sum("c").cast("bigint").alias("total"),
        )
    )
    return (
        per_doc.select(
            "source",
            F.floor(
                F.col("clipped").cast("double") / F.col("total") * 1e9
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("p_q"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            fround(F.sum("p_q").cast("double") / F.count(F.lit(1)) / 1e9, 6).alias(
                "self_bleu2"
            ),
        )
        .orderBy("source")
    )
