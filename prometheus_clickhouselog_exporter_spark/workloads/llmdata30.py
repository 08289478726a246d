"""Round 10 batch: pass@k estimation, ROUGE-2 pair recall, an exact
Gini decision stump, and class-balanced downsampling on the distributed
rank primitive — four LLM-data/eval operators, every one integer-moment
exact or quantized-per-row deterministic, DuckDB-oracle-checked.

Reference parity note: /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has none of these surfaces; §2.3 north-star territory.
Methods are public: the unbiased pass@k estimator (Chen et al. 2021,
"Evaluating Large Language Models Trained on Code", eq. 1), ROUGE-N
recall (Lin 2004), CART Gini impurity splits (Breiman et al. 1984), and
class-balanced sampling as used in every published curation pipeline.

Float discipline: per-row/per-group scores are quantized to integers
BEFORE any cross-row averaging, so the only cross-row reductions are
exact BIGINT sums — reduction order cannot flake the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.distrank import exclusive_prefix
from .core import fan_out, fround, md5_long, query, table, MD5_SQL

# --- pass@k ----------------------------------------------------------------
# Unbiased estimator (Chen et al. 2021): pass@k = 1 - C(n-c,k)/C(n,k)
#   = 1 - prod_{i=0}^{k-1} (n-c-i)/(n-i), defined 1 when n-c < k.
# The product is UNROLLED as the same left-to-right double expression on
# both engines (each factor an exact BIGINT ratio), then quantized per
# problem to floor(p*1e9+0.5) so the final mean is an exact integer sum.

_PASS_KS = (1, 5, 10)


def _passk_sql_prod(k: int) -> str:
    factors = [f"((n - c - {i}) * 1.0 / (n - {i}))" for i in range(k)]
    return "(" + " * ".join(factors) + ")"


def _passk_sql_case(k: int) -> str:
    return f"""CASE WHEN n - c < {k} THEN CAST(1000000000 AS BIGINT)
        ELSE CAST(floor((1.0 - {_passk_sql_prod(k)}) * 1e9 + 0.5) AS BIGINT) END"""


_PASSK_ORACLE = f"""
    WITH prob AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    q AS (
      SELECT k, CASE k {' '.join(f'WHEN {k} THEN {_passk_sql_case(k)}' for k in _PASS_KS)} END AS q9
      FROM prob CROSS JOIN (SELECT unnest([{', '.join(str(k) for k in _PASS_KS)}]) AS k)
      WHERE n >= 10
    )
    SELECT k, CAST(count(*) AS BIGINT) AS problems,
           floor((CAST(sum(q9) AS DOUBLE) / count(*) / 1e9) * 1e9 + 0.5) / 1e9
             AS pass_at_k
    FROM q GROUP BY k ORDER BY k
    """


@query("eval_pass_at_k", oracle=_PASSK_ORACLE)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021 eq. 1) over the events table:
    each user is a "problem", each event an attempt, a purchase a
    success. 1 - C(n-c,k)/C(n,k) is evaluated as the unrolled
    left-to-right product of k exact-BIGINT ratios (never a factorial,
    so no overflow at any n), quantized per problem to 1e-9 before the
    corpus mean — the only cross-row reduction is an exact integer sum.

    100 TB: one groupBy(user) for the (n, c) census, then a 3x
    per-problem map and one integer-sum aggregate per k. No windows, no
    joins; shuffle = the census exchange every per-user operator shares."""
    prob = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("event_type") == "purchase").cast("bigint").alias("c"),
        )
        .where(F.col("n") >= 10)
    )
    qcols = []
    for k in _PASS_KS:
        prod = F.lit(1.0)
        for i in range(k):
            prod = prod * (
                (F.col("n") - F.col("c") - F.lit(i)) * F.lit(1.0)
                / (F.col("n") - F.lit(i))
            )
        q9 = (
            F.when(F.col("n") - F.col("c") < k, F.lit(1_000_000_000).cast("bigint"))
            .otherwise(F.floor((F.lit(1.0) - prod) * 1e9 + F.lit(0.5)).cast("bigint"))
        )
        qcols.append(q9.alias(f"q{k}"))
    # all k in ONE pass over the census, then unpivot — no events rescan
    wide = prob.select(*qcols)
    stack = ", ".join(f"{k}, q{k}" for k in _PASS_KS)
    u = wide.select(
        F.expr(f"stack({len(_PASS_KS)}, {stack}) as (k, q9)")
    )
    return (
        u.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("problems"),
            fround(
                F.sum("q9").cast("double") / F.count(F.lit(1)) / 1e9, 9
            ).alias("pass_at_k"),
        )
        .orderBy("k")
    )


# --- ROUGE-2 recall over deterministic doc pairs ---------------------------

_ROUGE_ORACLE = """
    WITH tok AS (
      SELECT doc_id, lang, doc_id // 2 AS pair_id, doc_id % 2 AS side,
             string_split(text, ' ') AS ws
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT pair_id, side, lang,
             unnest([ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]) AS bigram
      FROM tok
    ),
    cnt AS (
      SELECT pair_id, side, any_value(lang) AS lang, bigram,
             CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY pair_id, side, bigram
    ),
    ref AS (SELECT * FROM cnt WHERE side = 0),
    hyp AS (SELECT pair_id, bigram, c AS ch FROM cnt WHERE side = 1),
    pairs AS (
      SELECT r.pair_id, any_value(r.lang) AS lang,
             CAST(sum(least(r.c, coalesce(h.ch, 0))) AS BIGINT) AS overlap,
             CAST(sum(r.c) AS BIGINT) AS denom
      FROM ref r LEFT JOIN hyp h USING (pair_id, bigram)
      WHERE r.pair_id IN (SELECT DISTINCT pair_id FROM hyp)
      GROUP BY r.pair_id
    ),
    q AS (SELECT lang, (overlap * 1000000000) // denom AS q9 FROM pairs)
    SELECT lang, CAST(count(*) AS BIGINT) AS pairs,
           floor((CAST(sum(q9) AS DOUBLE) / count(*) / 1e9) * 1e9 + 0.5) / 1e9
             AS avg_rouge2
    FROM q GROUP BY lang ORDER BY lang
    """


@query("eval_rouge2_pairs", oracle=_ROUGE_ORACLE)
def eval_rouge2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ROUGE-2 recall (Lin 2004) over deterministic doc pairs:
    doc 2i is the reference, doc 2i+1 the hypothesis; recall =
    sum(min(c_ref, c_hyp)) / sum(c_ref) over bigram multisets,
    left-joined so zero-overlap pairs still score 0. The per-pair score
    is an exact integer floor-division at 1e-9, so the per-lang mean is
    an exact integer sum on both engines.

    100 TB: bigram explosion fans out behind fan_out(); the multiset
    join is keyed (pair_id, bigram) — pair-local, never corpus-wide;
    per-pair partial aggregation happens map-side. The heavy shuffle
    carries (pair, bigram, count) triples, never document text."""
    tok = (
        fan_out(table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "lang",
            (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
            F.pmod("doc_id", F.lit(2)).alias("side"),
            F.split("text", " ").alias("ws"),
        )
        .where(F.size("ws") >= 2)
    )
    bg = tok.select(
        "pair_id",
        "side",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> ws[i-1] || ' ' || ws[i])")
        ).alias("bigram"),
    )
    cnt = bg.groupBy("pair_id", "side", "bigram").agg(
        F.any_value("lang").alias("lang"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    ).localCheckpoint(eager=False)  # three consumers: ref, hyp, hyp_pairs
    ref = cnt.where(F.col("side") == 0).drop("side")
    hyp = (
        cnt.where(F.col("side") == 1)
        .select("pair_id", "bigram", F.col("c").alias("ch"))
    )
    hyp_pairs = hyp.select("pair_id").distinct()
    pairs = (
        ref.join(hyp_pairs, "pair_id", "left_semi")
        .join(hyp, ["pair_id", "bigram"], "left")
        .groupBy("pair_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum(F.least(F.col("c"), F.coalesce(F.col("ch"), F.lit(0))))
            .cast("bigint")
            .alias("overlap"),
            F.sum("c").cast("bigint").alias("denom"),
        )
    )
    q = pairs.select(
        "lang", F.expr("(overlap * 1000000000) div denom").alias("q9")
    )
    return (
        q.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pairs"),
            fround(F.sum("q9").cast("double") / F.count(F.lit(1)) / 1e9, 9).alias(
                "avg_rouge2"
            ),
        )
        .orderBy("lang")
    )


# --- exact Gini decision stump ---------------------------------------------

_STUMP_ORACLE = """
    WITH raw AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
             CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k
      FROM lineitem
    ),
    long AS (
      SELECT 'qty' AS feature, qty AS v, y FROM raw
      UNION ALL SELECT 'disc', disc, y FROM raw
      UNION ALL SELECT 'price_k', price_k, y FROM raw
    ),
    pv AS (
      SELECT feature, v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS pos
      FROM long GROUP BY feature, v
    ),
    cum AS (
      SELECT feature, v,
             CAST(sum(cnt) OVER w AS BIGINT) AS nl,
             CAST(sum(pos) OVER w AS BIGINT) AS posl,
             CAST(sum(cnt) OVER (PARTITION BY feature) AS BIGINT) AS n,
             CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS pos
      FROM pv
      WINDOW w AS (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cand AS (
      SELECT feature, v, nl, posl, n - nl AS nr, pos - posl AS posr, n,
             (nl - (posl * posl + (nl - posl) * (nl - posl)) * 1.0 / nl)
           + ((n - nl) - ((pos - posl) * (pos - posl)
               + ((n - nl) - (pos - posl)) * ((n - nl) - (pos - posl))) * 1.0
              / (n - nl)) AS score
      FROM cum WHERE nl < n
    ),
    qs AS (
      SELECT *, CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS q FROM cand
    ),
    best AS (
      SELECT * FROM qs WHERE q = (SELECT min(q) FROM qs)
    ),
    pick AS (
      SELECT * FROM best
      WHERE feature || '|' || lpad(CAST(v AS VARCHAR), 12, '0')
          = (SELECT min(feature || '|' || lpad(CAST(v AS VARCHAR), 12, '0'))
             FROM best)
    )
    SELECT feature, v AS threshold,
           floor(score / n * 1e9 + 0.5) / 1e9 AS gini,
           floor((greatest(posl, nl - posl) + greatest(posr, nr - posr)) * 1.0
                 / n * 1e9 + 0.5) / 1e9 AS stump_accuracy
    FROM pick
    """


@query("ml_decision_stump", oracle=_STUMP_ORACLE)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CART decision stump (Breiman et al. 1984): the single
    (feature, threshold) split of lineitem minimizing weighted Gini
    impurity for the label l_returnflag = 'R', over three integerized
    features (quantity, discount cents, extendedprice in $1k bins).
    Candidate censuses and prefix sums are exact BIGINTs; the impurity
    is the same double expression both engines evaluate from identical
    integers; argmin quantizes at 1e-6 and tie-breaks lexicographically,
    so the winner is fully deterministic.

    100 TB: the per-(feature, value) census is one map-side-combinable
    groupBy of 3N rows into <=a few hundred cells; the prefix-sum
    windows run over per-feature partitions bounded by the value-domain
    size (<=~110 rows), never by corpus size; argmin is a 1-row scalar
    broadcast — the whitelisted scalar-parameterization pattern."""
    raw = table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("disc"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
    )
    long = (
        raw.select(F.lit("qty").alias("feature"), F.col("qty").alias("v"), "y")
        .unionAll(raw.select(F.lit("disc"), F.col("disc"), "y"))
        .unionAll(raw.select(F.lit("price_k"), F.col("price_k"), "y"))
    )
    pv = long.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wcum = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("feature")
    cum = pv.select(
        "feature",
        "v",
        F.sum("cnt").over(wcum).cast("bigint").alias("nl"),
        F.sum("pos").over(wcum).cast("bigint").alias("posl"),
        F.sum("cnt").over(wtot).cast("bigint").alias("n"),
        F.sum("pos").over(wtot).cast("bigint").alias("pos"),
    )
    negl = F.col("nl") - F.col("posl")
    nr = F.col("n") - F.col("nl")
    posr = F.col("pos") - F.col("posl")
    negr = nr - posr
    score = (
        F.col("nl")
        - (F.col("posl") * F.col("posl") + negl * negl) * F.lit(1.0) / F.col("nl")
    ) + (nr - (posr * posr + negr * negr) * F.lit(1.0) / nr)
    cand = (
        cum.where(F.col("nl") < F.col("n"))
        .withColumn("nr", nr)
        .withColumn("posr", posr)
        .withColumn("score", score)
        .withColumn("q", F.floor(F.col("score") * 1e6 + 0.5).cast("bigint"))
        .localCheckpoint(eager=False)  # reused by two scalar-min probes
    )
    min_q = cand.agg(F.min("q").alias("min_q"))
    best = cand.join(F.broadcast(min_q), cand["q"] == min_q["min_q"]).drop("min_q")
    pack = F.concat_ws(
        "|", F.col("feature"), F.lpad(F.col("v").cast("string"), 12, "0")
    )
    best = best.withColumn("pack", pack).localCheckpoint(eager=False)
    min_pack = best.agg(F.min("pack").alias("min_pack"))
    pick = best.join(
        F.broadcast(min_pack), best["pack"] == min_pack["min_pack"]
    )
    acc = (
        F.greatest(F.col("posl"), F.col("nl") - F.col("posl"))
        + F.greatest(F.col("posr"), F.col("nr") - F.col("posr"))
    ) * F.lit(1.0) / F.col("n")
    return pick.select(
        "feature",
        F.col("v").alias("threshold"),
        fround(F.col("score") / F.col("n") * 1e9, 0).cast("double").alias("_g"),
        fround(acc * 1e9, 0).cast("double").alias("_a"),
    ).select(
        "feature",
        "threshold",
        (F.col("_g") / 1e9).alias("gini"),
        (F.col("_a") / 1e9).alias("stump_accuracy"),
    )


# --- class-balanced downsampling on the distributed rank --------------------

_LANGS = ("de", "en", "es", "fr", "zh")
_H36 = 1 << 36
_BALANCED_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, lang,
             {MD5_SQL.format(x="CAST(doc_id AS VARCHAR)")} % {_H36} AS h36
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY h36, doc_id) AS rk
      FROM h
    ),
    nmin AS (SELECT min(cnt) AS n_min FROM
             (SELECT count(*) AS cnt FROM documents GROUP BY lang))
    SELECT lang, CAST(count(*) AS BIGINT) AS kept,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM r, nmin WHERE rk <= n_min
    GROUP BY lang ORDER BY lang
    """


@query("sample_class_balanced", oracle=_BALANCED_ORACLE)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: keep exactly n_min = min class size
    docs per language, chosen by hash rank (md5 of doc_id) so the draw
    is deterministic, uniform within class, and stable under reruns —
    the standard balancing step before mixture weighting in curation
    pipelines. The per-class rank rides operators/distrank
    (exclusive_prefix over the packed (lang, hash, doc_id) key), so NO
    window ever sees a corpus-sized partition; the oracle's
    row_number() per class certifies the rank arithmetic end-to-end.

    Key packing: lang_id(3b) . h36(36b) . doc_id(24b) = 63 bits, unique
    because doc_id is unique; assert_true fails loud if doc_id outgrows
    24 bits or an unknown language appears rather than silently
    mis-ranking.

    100 TB: exclusive_prefix is two (or, recursively, three) bounded
    prefix tiers — every window partition <=4096 rows; the class-offset
    fold is a 5x5 self-join; n_min is a 1-row broadcast scalar."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    lid = F.lit(None).cast("bigint")
    for i, lang in enumerate(_LANGS):
        lid = F.when(F.col("lang") == lang, F.lit(i).cast("bigint")).otherwise(lid)
    guard = F.assert_true(
        lid.isNotNull() & (F.col("doc_id") >= 0) & (F.col("doc_id") < (1 << 24)),
        F.lit("sample_class_balanced: unknown lang or doc_id >= 2^24"),
    )
    h36 = F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(_H36))
    keyed = docs.select(
        "doc_id",
        "lang",
        F.when(guard.isNull(), lid).alias("lid"),
        h36.alias("h36"),
    ).withColumn(
        "key",
        (F.col("lid") * F.lit(1 << 60))
        + (F.col("h36") * F.lit(1 << 24))
        + F.col("doc_id"),
    ).localCheckpoint(eager=False)  # consumers: exclusive_prefix tiers + cls
    ranked = exclusive_prefix(keyed, "key", out="pre")
    cls = keyed.groupBy("lid").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)  # 5-row frame, three consumers
    offs = (
        cls.alias("a")
        .join(cls.alias("b"), F.col("b.lid") < F.col("a.lid"), "left")
        .groupBy(F.col("a.lid").alias("lid"), F.col("a.cnt").alias("cnt"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).cast("bigint").alias("off"))
    )
    n_min = cls.agg(F.min("cnt").alias("n_min"))
    kept = (
        ranked.join(F.broadcast(offs), "lid")
        .withColumn("rk", F.col("pre") - F.col("off") + 1)
        .join(F.broadcast(n_min))
        .where(F.col("rk") <= F.col("n_min"))
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("kept"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("lang")
    )
