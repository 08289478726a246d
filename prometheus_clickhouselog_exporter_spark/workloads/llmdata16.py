"""LLM-data ops, round 6 batch 5: embedding-space EVALUATION operators
over the labeled embeddings table — contrastive hard-negative mining
(the training-pair construction step for retrieval/embedding models)
and leave-one-out kNN label recovery (the standard embedding-quality
probe) — plus a Benford first-digit audit over monetary columns (the
classic fabricated-data screen).

All three follow the certified-exact discipline: the cosine kernel is
the sequential-fold + round-6 + vec_id-tiebreak recipe
similarity_cosine_topk already hash-matches DuckDB with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, fan_out, fround, md5_long, query, table

# the certified cosine recipe (see similarity_cosine_topk)
_COS_SQL = """round(list_dot_product(q.qe, c.ce) /
              (sqrt(list_dot_product(q.qe, q.qe)) *
               sqrt(list_dot_product(c.ce, c.ce))), 6)"""


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _cos(a, b):
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6)


@query(
    "mine_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                      embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id AS neg_id, c.label AS neg_label,
             {_COS_SQL} AS cosine
      FROM q CROSS JOIN c
      WHERE c.label <> q.qlabel
    )
    SELECT query_id, neg_id, neg_label, cosine, rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neg_id) AS rk
          FROM scored)
    WHERE rk <= 3
    ORDER BY query_id, rk
    """,
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the top-3 most
    similar vectors with a DIFFERENT label — the pairs that actually
    move a contrastive/embedding loss (easy negatives teach nothing;
    hard negatives define the decision boundary). This is the
    batch-mining step of every retrieval-model training pipeline
    (sentence-transformers, DPR), expressed as a broadcast-anchor scan
    with the label-difference predicate pushed into the join.

    100 TB: anchors broadcast; the corpus scans once; per-anchor top-3
    via WindowGroupLimit below the shuffle. The full-corpus mining run
    (every vector an anchor) is the same plan blocked through the LSH
    bucketer (similarity.py) to keep the pair space near-linear."""
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = emb.select("vec_id", "label", as_double.alias("ce"))
    anchors = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        as_double.alias("qe"),
    )
    scored = corpus.join(
        F.broadcast(anchors), F.col("label") != F.col("qlabel")
    ).select(
        "query_id",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        _cos(F.col("qe"), F.col("ce")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neg_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("query_id", "rk")
    )


@query(
    "knn_label_recovery",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                      embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < 64),
    c AS (SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings),
    scored AS (
      SELECT q.query_id, q.qlabel, c.label AS nlabel,
             {_COS_SQL} AS cosine, c.vec_id
      FROM q CROSS JOIN c
      WHERE c.vec_id <> q.query_id
    ),
    top5 AS (
      SELECT query_id, qlabel, nlabel
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, vec_id) AS rk
            FROM scored)
      WHERE rk <= 5
    ),
    votes AS (
      SELECT query_id, qlabel, nlabel, count(*) AS v
      FROM top5 GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT query_id, qlabel, nlabel AS plabel
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY v DESC, nlabel) AS rk
            FROM votes)
      WHERE rk = 1
    )
    SELECT qlabel AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(count_if(plabel = qlabel) AS BIGINT) AS n_correct,
           floor(CAST(count_if(plabel = qlabel) AS DOUBLE) / count(*)
                 * 1e4 + 0.5) / 1e4 AS accuracy
    FROM pred GROUP BY 1 ORDER BY 1
    """,
)
def knn_label_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label recovery over the embedding space — the
    standard embedding-quality probe (do nearest neighbors share the
    anchor's label?): for each of 64 held-out anchors, exact top-5
    cosine neighbors (self excluded), majority vote with deterministic
    ties (count desc, label asc), per-label accuracy. A collapsing or
    random embedding shows up as accuracy at chance (~1/|labels|);
    curation pipelines gate embedding-model upgrades on exactly this
    number.

    100 TB: anchors are a bounded eval sample (broadcast); one corpus
    scan; two WindowGroupLimits on bounded groups. Full-corpus LOO at
    scale routes through the ANN ladder instead of the exact kernel."""
    emb = fan_out(table(spark, sf_dir, "embeddings"))
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = emb.select("vec_id", "label", as_double.alias("ce"))
    anchors = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        as_double.alias("qe"),
    )
    scored = corpus.join(
        F.broadcast(anchors), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "qlabel",
        F.col("label").alias("nlabel"),
        _cos(F.col("qe"), F.col("ce")).alias("cosine"),
        "vec_id",
    )
    wtop = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    top5 = (
        scored.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 5)
        .select("query_id", "qlabel", "nlabel")
    )
    votes = top5.groupBy("query_id", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("v"), "nlabel")
    pred = (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("query_id", "qlabel", F.col("nlabel").alias("plabel"))
    )
    acc = (
        F.count_if(F.col("plabel") == F.col("qlabel")).cast("double")
        / F.count(F.lit(1))
    )
    return (
        pred.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.count_if(F.col("plabel") == F.col("qlabel")).alias("n_correct"),
            fround(acc, 4).alias("accuracy"),
        )
        .orderBy("label")
    )


@query(
    "audit_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    cnt AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS t FROM cnt)
    SELECT digit, n,
           floor(CAST(n AS DOUBLE) / t * 1e6 + 0.5) / 1e6 AS observed,
           floor(log10(1.0 + 1.0 / digit) * 1e6 + 0.5) / 1e6 AS benford
    FROM cnt CROSS JOIN tot
    ORDER BY digit
    """,
)
def audit_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    forensic screen for fabricated or truncated numeric data (natural
    multiplicative processes put ~30.1% of first digits at 1; uniform
    generators put ~11.1%). Emits observed vs theoretical shares per
    digit; a curation pipeline alarms on the L1 gap. (This synthetic
    corpus is uniform-ish — the point is the audit's output contract,
    certified exactly.)

    100 TB: first digit extracts in the scan stage (integer floor →
    string head — no log/pow float hazard); one 9-group aggregate."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    cnt = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.agg(F.sum("n").alias("t"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            fround(F.col("n").cast("double") / F.col("t"), 6).alias("observed"),
            fround(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford"),
        )
        .orderBy("digit")
    )


_DSIR_B = 256  # hashed feature buckets
_DSIR_A = 1.0  # additive smoothing


@query(
    "sample_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, u.tok
      FROM documents, unnest(string_split(text, ' ')) AS u(tok)
      WHERE text IS NOT NULL
    ),
    b AS MATERIALIZED (
      SELECT doc_id, lang,
             CAST({MD5_SQL.format(x='tok')} % {_DSIR_B} AS BIGINT) AS bkt
      FROM toks
    ),
    tgt AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS ct FROM b
      WHERE lang = 'en' GROUP BY 1
    ),
    src AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cs FROM b GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b WHERE lang = 'en'),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
    lam AS MATERIALIZED (
      SELECT s.bkt,
             CAST(floor((ln((coalesce(t.ct, 0) + {_DSIR_A})
                            / (nt.n + {_DSIR_A} * {_DSIR_B}))
                         - ln((s.cs + {_DSIR_A})
                              / (ns.n + {_DSIR_A} * {_DSIR_B}))) * 1e9)
                  AS BIGINT) AS lq
      FROM src s CROSS JOIN nt CROSS JOIN ns
      LEFT JOIN tgt t ON t.bkt = s.bkt
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor(CAST(sum(l.lq) AS DOUBLE) / 1e9 * 1e4 + 0.5) / 1e4
             AS log_ratio,
           (sum(l.lq) > 0) AS prefer
    FROM b JOIN lam l ON l.bkt = b.bkt
    GROUP BY 1 ORDER BY 1
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling — the published method behind
    domain-targeted pre-training mixes): hash every token into 256
    feature buckets, fit smoothed bucket distributions for the TARGET
    domain (lang='en') and the raw corpus, and score each document by
    its summed log-likelihood ratio Σ log(p_target(b)/p_raw(b)) — the
    resampling weight that tilts selection toward target-like text.

    Cross-engine exactness: the per-bucket log-ratio λ_b is computed
    ONCE (256 rows), quantized to integer nano-units, and per-doc
    weights are INTEGER sums of λ quantities — no double-accumulation
    order anywhere (ln() runs per bucket, not per token). The hashed
    bucket table is the same engine-portable 48-bit md5 family every
    sampling operator here uses.

    100 TB: bucket stats are one 256-group aggregate; λ broadcasts;
    scoring is scan-stage join + integer sum — exactly how DSIR runs
    over a crawl in practice."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    b = (
        d.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .select(
            "doc_id",
            "lang",
            (md5_long(F.col("tok")) % _DSIR_B).cast("bigint").alias("bkt"),
        )
        .localCheckpoint(eager=False)  # feeds tgt/src stats AND doc scoring
    )
    tgt = b.filter(F.col("lang") == "en").groupBy("bkt").agg(
        F.count(F.lit(1)).alias("ct")
    )
    src = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cs"))
    nt = b.filter(F.col("lang") == "en").agg(F.count(F.lit(1)).alias("n_t"))
    ns = b.agg(F.count(F.lit(1)).alias("n_s"))
    lam = (
        src.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ns))
        .select(
            "bkt",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + _DSIR_A)
                        / (F.col("n_t") + _DSIR_A * _DSIR_B)
                    )
                    - F.log(
                        (F.col("cs") + _DSIR_A)
                        / (F.col("n_s") + _DSIR_A * _DSIR_B)
                    )
                )
                * 1e9
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    return (
        b.join(F.broadcast(lam), "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            fround(F.sum("lq").cast("double") / 1e9, 4).alias("log_ratio"),
            (F.sum("lq") > 0).alias("prefer"),
        )
        .orderBy("doc_id")
    )


@query(
    "curation_pipeline_funnel",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, text, md5(text) AS h,
             string_split(text, ' ') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    w AS (
      SELECT doc_id, source, h,
             len(tk) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT)
               AS sum_len,
             CAST(len(list_filter(tk, x -> x IN ('the','be','to','of','and',
                  'that','have','with'))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
             CAST(list_max(list_transform(list_distinct(tk),
                  d -> len(list_filter(tk, x -> x = d)))) AS BIGINT) AS top_c,
             length(text) AS n_chars
      FROM t
    ),
    flags AS (
      SELECT source, n_chars,
             (n_words BETWEEN 50 AND 100000
              AND CAST(sum_len AS DOUBLE) / n_words BETWEEN 3 AND 10
              AND n_stop >= 2) AS pass_lex,
             (CAST(n_distinct AS DOUBLE) / n_words >= 0.3
              AND CAST(top_c AS DOUBLE) / n_words <= 0.2) AS pass_rep,
             (row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1)
               AS pass_dedup
      FROM w
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count_if(pass_lex) AS BIGINT) AS n_lex,
           CAST(count_if(pass_lex AND pass_rep) AS BIGINT) AS n_rep,
           CAST(count_if(pass_lex AND pass_rep AND pass_dedup) AS BIGINT)
             AS n_final,
           CAST(sum(CASE WHEN pass_lex AND pass_rep AND pass_dedup
                         THEN n_chars END) AS BIGINT) AS surviving_chars
    FROM flags GROUP BY source ORDER BY source
    """,
)
def curation_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation CAPSTONE: one end-to-end survival funnel through the
    composed filter stages a pre-training pipeline actually chains —
    lexical gates (Gopher word-count/mean-length/stopword rules) →
    repetition gates (distinct-token and top-token ratios) → exact
    dedup (first-doc-wins on the content digest) — reported per source
    as monotone surviving counts plus final character volume. This is
    the management-facing number for every curation run ("how much of
    src3 survives, and which stage eats it"); each underlying stage is
    certified standalone elsewhere, the funnel certifies their
    COMPOSITION (flag interactions, stage ordering, survivor
    accounting) in one scan + one digest window.

    100 TB: one pass computes every lexical/repetition flag scan-stage;
    the only shuffle is the digest window for first-doc-wins (16-byte
    keys); the funnel aggregation is per-source."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tk = F.split("text", " ")
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    w = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.length("text").alias("n_chars"),
        F.size(tk).alias("n_words"),
        F.aggregate(tk, F.lit(0).cast("bigint"), lambda s, x: s + F.length(x)).alias(
            "sum_len"
        ),
        F.size(F.filter(tk, lambda x: x.isin(*stops))).cast("bigint").alias("n_stop"),
        F.size(F.array_distinct(tk)).cast("bigint").alias("n_distinct"),
        F.array_max(
            F.transform(
                F.array_distinct(tk),
                lambda dtok: F.size(F.filter(tk, lambda x: x == dtok)),
            )
        )
        .cast("bigint")
        .alias("top_c"),
    )
    pass_lex = (
        F.col("n_words").between(50, 100000)
        & (F.col("sum_len").cast("double") / F.col("n_words")).between(3, 10)
        & (F.col("n_stop") >= 2)
    )
    pass_rep = (
        F.col("n_distinct").cast("double") / F.col("n_words") >= 0.3
    ) & (F.col("top_c").cast("double") / F.col("n_words") <= 0.2)
    pass_dedup = (
        F.row_number().over(Window.partitionBy("h").orderBy("doc_id")) == 1
    )
    flags = w.select(
        "source",
        "n_chars",
        pass_lex.alias("pass_lex"),
        pass_rep.alias("pass_rep"),
        pass_dedup.alias("pass_dedup"),
    )
    survives = F.col("pass_lex") & F.col("pass_rep") & F.col("pass_dedup")
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("pass_lex")).alias("n_lex"),
            F.count_if(F.col("pass_lex") & F.col("pass_rep")).alias("n_rep"),
            F.count_if(survives).alias("n_final"),
            F.sum(F.when(survives, F.col("n_chars"))).cast("bigint").alias(
                "surviving_chars"
            ),
        )
        .orderBy("source")
    )


@query(
    "logpipe_concurrency_profile",
    oracle="""
    WITH iv AS (
      SELECT ts AS open_ts,
             ts + INTERVAL 1 SECOND * (event_id % 7) AS close_ts
      FROM events
      WHERE value IS NOT NULL AND value >= 0
        AND event_id % 3 <> 0 AND event_id % 7 <= 5
    ),
    deltas AS (
      SELECT open_ts AS t, 1 AS d FROM iv
      UNION ALL
      SELECT close_ts, -1 FROM iv
    ),
    sweep AS (
      SELECT t, sum(d) AS net FROM deltas GROUP BY t
    ),
    run AS (
      SELECT t, CAST(sum(net) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS inflight
      FROM sweep
    )
    SELECT CAST(max(inflight) AS BIGINT) AS peak_concurrency,
           CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_sessions,
           CAST((SELECT count(*) FROM sweep) AS BIGINT) AS n_change_points
    FROM run
    """,
)
def logpipe_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak in-flight query concurrency over the logpipe session
    intervals (the matched open→close pairs of the correlate family) —
    the classic sweep-line: +1 at every open, −1 at every close,
    collapse simultaneous deltas per instant, running-sum the net
    series, take the max. This is the capacity question the reference's
    operators never answer ("how many queries were EVER in flight at
    once?") but every ops review asks; close semantics use half-open
    intervals (a close at instant t frees the slot for an open at t).

    The running sum is a global window over CHANGE POINTS (distinct
    event instants — far below corpus cardinality after the per-instant
    collapse, and the collapse aggregate precedes the window, which is
    the plan_audit-recognized bounded shape). 100 TB: delta emission is
    scan-stage; the sweep is one aggregate + one ordered prefix sum
    over the collapsed timeline; a sharded variant splits the timeline
    by day and stitches boundary offsets (streaming/sequential.py's
    pattern). plan_audit's multi-BNLJ flag is the vetted bounded
    pattern: the final cross joins pair three 1-row aggregates."""
    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & (F.col("event_id") % 3 != 0)
        & (F.col("event_id") % 7 <= 5)
    )
    iv = e.select(
        F.col("ts").alias("open_ts"),
        (
            F.col("ts")
            + F.make_interval(secs=(F.col("event_id") % 7).cast("double"))
        ).alias("close_ts"),
    ).localCheckpoint(eager=False)  # both delta sides + session count
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(F.col("open_ts").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("close_ts").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e")
    ).select("e.*")
    sweep = deltas.groupBy("t").agg(F.sum("d").alias("net"))
    run = sweep.select(
        F.sum("net")
        .over(Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("inflight")
    )
    peak = run.agg(F.max("inflight").alias("peak_concurrency"))
    counts = iv.agg(F.count(F.lit(1)).alias("n_sessions")).crossJoin(
        sweep.agg(F.count(F.lit(1)).alias("n_change_points"))
    )
    return peak.crossJoin(F.broadcast(counts)).select(
        "peak_concurrency", "n_sessions", "n_change_points"
    )
