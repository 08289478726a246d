"""LLM-data battery, round 3 batch 11: weighted MinHash sketches,
cross-source leakage auditing, mutual-kNN graphs, the hashing trick,
and per-key CUSUM drift monitors.

Five training-data-pipeline staples. The weighted MinHash row closes
the ICWS/consistent-weighted-sampling item from the roadmap with the
integer-replication construction (token with weight w contributes
replicas (token,1..w)) — unlike true ICWS it needs no ln/exp, so the
whole sketch is engine-portable md5 arithmetic and the DuckDB oracle
rebuilds it bit-exact, INCLUDING the estimate-vs-exact comparison
columns. The leakage matrix is the corpus-pair generalization of
decontam_ngram_overlap (train/test hygiene BETWEEN sources, not
against one eval set). Mutual-kNN is the graph-construction primitive
under dedup clustering and curriculum neighborhoods. The hashing
trick is the fixed-width featurizer every streaming classifier uses.
Per-key CUSUM partitions the closed-form change-point statistic from
relational10 by event type.

Float discipline per workloads/core.py; every hash here is the
md5→12-hex→BIGINT family (operators/sampling.py recipe) precisely so
DuckDB can replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import MD5_SQL, fround, md5_long, query, table

_N_PERMS = 32
_W_CAP = 4
_N_BUCKETS = 1024
_KNN_SUBSET = 200
_KNN_K = 5


# Canonical home is workloads.core (md5_long / MD5_SQL); kept under the
# historical names for this module's oracles and older importers.
_md5_long = md5_long
_MD5_SQL = MD5_SQL


@query(
    "sketch_weighted_minhash",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    tf AS (
      SELECT source, w, least(count(*), {_W_CAP}) AS wt
      FROM tok WHERE w <> '' GROUP BY source, w
    ),
    repl AS (
      SELECT source, w, r.r AS r
      FROM tf, range(1, {_W_CAP} + 1) r(r) WHERE r.r <= wt
    ),
    sigs AS (
      SELECT source, p.perm AS perm,
             min(CAST({_MD5_SQL.format(x="w || '#' || CAST(r AS VARCHAR) || '#' || CAST(p.perm AS VARCHAR)")} AS BIGINT)) AS sig
      FROM repl, range({_N_PERMS}) p(perm)
      GROUP BY source, p.perm
    ),
    est AS (
      SELECT a.source AS source_a, b.source AS source_b,
             sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS n_agree
      FROM sigs a JOIN sigs b ON a.perm = b.perm AND a.source < b.source
      GROUP BY a.source, b.source
    ),
    tot AS (SELECT source, sum(wt) AS t FROM tf GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             sum(least(a.wt, b.wt)) AS smin
      FROM tf a JOIN tf b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT e.source_a AS source_a, e.source_b AS source_b,
           CAST(e.n_agree AS BIGINT) AS n_agree,
           floor((CAST(e.n_agree AS DOUBLE) / {_N_PERMS}) * 1e6 + 0.5) / 1e6
             AS est_weighted_jaccard,
           floor((CAST(coalesce(i.smin, 0) AS DOUBLE)
                  / CAST(ta.t + tb.t - coalesce(i.smin, 0) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6
             AS exact_weighted_jaccard
    FROM est e
    LEFT JOIN inter i ON e.source_a = i.source_a AND e.source_b = i.source_b
    JOIN tot ta ON ta.source = e.source_a
    JOIN tot tb ON tb.source = e.source_b
    ORDER BY e.source_a, e.source_b
    """,
)
def sketch_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted MinHash by integer replication — the mergeable sketch
    for WEIGHTED Jaccard (the ICWS use case, without ICWS's ln/exp
    which no oracle could replay): a token with capped term weight w
    contributes replicas (token,1..w), and min-hashing the replica set
    estimates Σmin(w)/Σmax(w). Per source-pair the query emits the
    32-perm estimate NEXT TO the exact weighted Jaccard computed from
    the same capped weights, so the sketch's accuracy is visible in
    the result itself (and both columns hash-match DuckDB).

    Scale: replica postings are ≤cap× the distinct-token postings and
    fold to (source, perm) minima map-side — the shuffle carries
    |sources|·|perms| partials, not postings. Signatures of unions
    merge by elementwise min (same contract as
    sketch_minhash_source_merge); the exact lane's inner join on token
    is the inverted-index shape with per-source totals joined at
    sketch size.
    """
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.least(F.count(F.lit(1)), F.lit(_W_CAP)).alias("wt"))
        .localCheckpoint(eager=False)  # vocabulary-sized; feeds sigs/tot/inter
    )
    repl = tf.select(
        "source",
        "w",
        F.explode(F.sequence(F.lit(1), F.col("wt").cast("int"))).alias("r"),
    )
    sigs = (
        repl.select(
            "source",
            "w",
            "r",
            F.explode(F.sequence(F.lit(0), F.lit(_N_PERMS - 1))).alias("perm"),
        )
        .select(
            "source",
            "perm",
            _md5_long(
                F.concat_ws("#", F.col("w"), F.col("r"), F.col("perm"))
            ).alias("h"),
        )
        .groupBy("source", "perm")
        .agg(F.min("h").alias("sig"))
        .localCheckpoint(eager=False)  # sketch-sized; self-joined a/b
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    est = (
        a.join(
            b,
            (F.col("a.perm") == F.col("b.perm"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.sum(
                F.when(F.col("a.sig") == F.col("b.sig"), 1).otherwise(0)
            ).alias("n_agree")
        )
    )
    tot = tf.groupBy("source").agg(F.sum("wt").alias("t"))
    ta, tb = tot.alias("ta"), tot.alias("tb")
    fa, fb = tf.alias("fa"), tf.alias("fb")
    inter = (
        fa.join(
            fb,
            (F.col("fa.w") == F.col("fb.w"))
            & (F.col("fa.source") < F.col("fb.source")),
        )
        .groupBy(
            F.col("fa.source").alias("source_a"),
            F.col("fb.source").alias("source_b"),
        )
        .agg(F.sum(F.least(F.col("fa.wt"), F.col("fb.wt"))).alias("smin"))
    )
    smin = F.coalesce(F.col("smin"), F.lit(0))
    return (
        est.join(inter, ["source_a", "source_b"], "left")
        .join(F.broadcast(ta), F.col("ta.source") == F.col("source_a"))
        .join(F.broadcast(tb), F.col("tb.source") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.col("n_agree").cast("bigint").alias("n_agree"),
            fround(F.col("n_agree").cast("double") / _N_PERMS, 6).alias(
                "est_weighted_jaccard"
            ),
            fround(
                smin.cast("double")
                / (F.col("ta.t") + F.col("tb.t") - smin).cast("double"),
                6,
            ).alias("exact_weighted_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@query(
    "crosssource_leakage_matrix",
    oracle=f"""
    WITH toks AS (
      SELECT source, string_split(lower(text), ' ') AS t FROM documents
      WHERE len(string_split(lower(text), ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT source,
             CAST({_MD5_SQL.format(x="g")} AS BIGINT) AS h
      FROM (
        SELECT source,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                 AS g
        FROM toks
      )
    ),
    sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT c.source_a, c.source_b, CAST(c.n_common AS BIGINT) AS n_common,
           CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
           floor((CAST(c.n_common AS DOUBLE) / CAST(za.n AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS containment_a_in_b,
           floor((CAST(c.n_common AS DOUBLE) / CAST(zb.n AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS containment_b_in_a,
           floor((CAST(c.n_common AS DOUBLE)
                  / CAST(za.n + zb.n - c.n_common AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS jaccard
    FROM common c
    JOIN sz za ON za.source = c.source_a
    JOIN sz zb ON zb.source = c.source_b
    ORDER BY source_a, source_b
    """,
)
def crosssource_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-pair contamination audit: for every pair of sources, the
    count of shared 3-word shingles and both directed containments
    (|A∩B|/|A| — "how much of A leaks into B") plus Jaccard. This is
    decontam_ngram_overlap generalized from one eval set to the full
    source×source matrix — the split-hygiene report run before
    train/valid assignment at corpus scale.

    Scale: ONE inverted-index join keyed by 8-byte shingle hashes
    (never shingle strings), distinct-first per source so each
    (source, shingle) posts once; the matrix aggregate is
    |sources|²-bounded. Per-source sizes join at matrix size. Worst
    bucket = a shingle present in every source = |sources| rows.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", F.split(F.lower("text"), " ").alias("t")).filter(
        F.size("t") >= 3
    )
    grams = toks.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i),
                    F.element_at("t", i + 1),
                    F.element_at("t", i + 2),
                ),
            )
        ).alias("g"),
    )
    sh = (
        grams.select("source", _md5_long(F.col("g")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)  # one shingling pass; feeds sz + both join sides
    )
    sz = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za, zb = sz.alias("za"), sz.alias("zb")
    nc = F.col("n_common").cast("double")
    return (
        common.join(F.broadcast(za), F.col("za.source") == F.col("source_a"))
        .join(F.broadcast(zb), F.col("zb.source") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("za.n").cast("bigint").alias("n_a"),
            F.col("zb.n").cast("bigint").alias("n_b"),
            fround(nc / F.col("za.n").cast("double"), 6).alias("containment_a_in_b"),
            fround(nc / F.col("zb.n").cast("double"), 6).alias("containment_b_in_a"),
            fround(
                nc / (F.col("za.n") + F.col("zb.n") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@query(
    "knn_mutual_graph",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < {_KNN_SUBSET}
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             CAST(floor((list_dot_product(a.e, b.e)
                         / (sqrt(list_dot_product(a.e, a.e))
                            * sqrt(list_dot_product(b.e, b.e)))) * 1e9)
                  AS BIGINT) AS qcos
      FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst, qcos,
             row_number() OVER (PARTITION BY src
                                ORDER BY qcos DESC, dst) AS rk
      FROM scored
    ),
    edges AS (SELECT src, dst, qcos, rk FROM knn WHERE rk <= {_KNN_K})
    SELECT e1.src AS id_a, e1.dst AS id_b, e1.qcos,
           CAST(e1.rk AS INT) AS rank_ab, CAST(e2.rk AS INT) AS rank_ba
    FROM edges e1 JOIN edges e2 ON e1.src = e2.dst AND e1.dst = e2.src
    WHERE e1.src < e1.dst
    ORDER BY id_a, id_b
    """,
)
def knn_mutual_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph over embeddings: an edge survives only when
    each endpoint ranks the other in its top-k by cosine — the
    standard symmetric graph under density-based dedup clustering,
    UMAP-style layouts, and curriculum neighborhoods (one-directional
    kNN edges connect clusters through hubs; mutuality prunes them).
    Cosine quantizes to BIGINT (floor·1e9) before ranking, and ties
    break on neighbor id, so ranks are total-ordered and the oracle
    replays them exactly.

    Scale: scoring here is the exact kernel on a bounded probe subset;
    at corpus scale the directed edge list comes from the ANN ladder
    (similarity_lsh/ivf/pq_topk) instead — the mutuality join is the
    same either way: self-join of the k·N directed edges on reversed
    ids, shuffling ids and ranks only, never vectors.
    """
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _KNN_SUBSET)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sub = emb.select("vec_id", as_double.alias("e"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, v: s + v
        )

    a = sub.select(F.col("vec_id").alias("src"), F.col("e").alias("ea"))
    b = sub.select(F.col("vec_id").alias("dst"), F.col("e").alias("eb"))
    scored = (
        a.join(F.broadcast(b), F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.floor(
                (
                    dot(F.col("ea"), F.col("eb"))
                    / (
                        F.sqrt(dot(F.col("ea"), F.col("ea")))
                        * F.sqrt(dot(F.col("eb"), F.col("eb")))
                    )
                )
                * 1e9
            )
            .cast("bigint")
            .alias("qcos"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("qcos"), "dst")
    edges = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
        .localCheckpoint(eager=False)  # k*N directed edges; scored ONCE, joined twice
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.dst")) & (F.col("e1.dst") == F.col("e2.src")),
        )
        .filter(F.col("e1.src") < F.col("e1.dst"))
        .select(
            F.col("e1.src").alias("id_a"),
            F.col("e1.dst").alias("id_b"),
            F.col("e1.qcos").alias("qcos"),
            F.col("e1.rk").cast("int").alias("rank_ab"),
            F.col("e2.rk").cast("int").alias("rank_ba"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "text_hashing_trick_features",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    hashed AS (
      SELECT w,
             CAST({_MD5_SQL.format(x="w")} % {_N_BUCKETS} AS BIGINT) AS bucket
      FROM tok WHERE w <> ''
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT w) AS BIGINT) AS n_tokens,
           min(w) AS min_token
    FROM hashed GROUP BY bucket
    ORDER BY n DESC, bucket LIMIT 50
    """,
)
def text_hashing_trick_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (HashingTF): unigrams map to a fixed 1024-
    bucket feature space by hash — the featurizer that needs NO
    vocabulary pass, no fit, and no driver state, which is what makes
    it the streaming/incremental choice at corpus scale. Reported per
    hot bucket: total count, distinct tokens sharing the bucket (the
    collision load the fixed width trades away), and the
    lexicographically first token as a witness. md5-family bucket
    hash so the oracle rebuilds the identical mapping.

    Scale: scan-stage explode + hash, one 1024-key aggregate with
    map-side combine; top-50 is TakeOrdered. The same expression
    vectorizes into array<int> per-doc features without a shuffle.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("w")).filter(
        F.col("w") != ""
    )
    hashed = tok.select(
        "w", F.pmod(_md5_long(F.col("w")), F.lit(_N_BUCKETS)).alias("bucket")
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("w").alias("n_tokens"),
            F.min("w").alias("min_token"),
        )
        .orderBy(F.desc("n"), "bucket")
        .limit(50)
    )


@query(
    "events_cusum_per_key",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    k AS (
      SELECT event_type,
             CAST(floor(CAST(sum(c) AS DOUBLE) / count(*)) AS BIGINT) + 1 AS kref
      FROM daily GROUP BY event_type
    ),
    pref AS (
      SELECT daily.event_type, d, c,
             sum(c - k.kref) OVER (PARTITION BY daily.event_type ORDER BY d
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS p
      FROM daily JOIN k ON daily.event_type = k.event_type
    ),
    cusum AS (
      SELECT event_type, d, p,
             p - least(0, min(p) OVER (PARTITION BY event_type
                                   ORDER BY d
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)) AS s
      FROM pref
    ),
    peak AS (
      SELECT event_type, max(s) AS max_cusum FROM cusum GROUP BY event_type
    )
    SELECT c.event_type AS event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN c.s > 15 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_days,
           CAST(p.max_cusum AS BIGINT) AS max_cusum,
           CAST(min(CASE WHEN c.s = p.max_cusum THEN c.d END) AS VARCHAR)
             AS peak_day
    FROM cusum c JOIN peak p ON c.event_type = p.event_type
    GROUP BY c.event_type, p.max_cusum
    ORDER BY c.event_type
    """,
)
def events_cusum_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key CUSUM: the closed-form change-point statistic of
    events_cusum_changepoint (S_t = P_t − min(0, min_{j≤t} P_j))
    partitioned by event type, each type against ITS OWN reference
    rate ⌊mean⌋+1 — the fleet-of-monitors shape: one pass, every
    series monitored independently, integer-exact. Emits per type the
    alarm-day count and the day the statistic peaked (earliest such
    day under ties).

    Scale: series are (type, day)-cardinality, so the partitioned
    windows ride one bounded exchange keyed by type; the per-type
    reference rates join back at |types| size. This is the roadmap's
    'per-key CUSUM' item — same windows, keyed.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # (type, day)-sized; feeds k + pref
    )
    k = daily.groupBy("event_type").agg(
        (
            F.floor(F.sum("c").cast("double") / F.count(F.lit(1))).cast("long") + 1
        ).alias("kref")
    )
    # ONE frame serves both running aggregates since the j<=t fix
    wp = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = daily.join(F.broadcast(k), "event_type").select(
        "event_type", "d", "c", F.sum(F.col("c") - F.col("kref")).over(wp).alias("p")
    )
    cusum = pref.select(
        "event_type",
        "d",
        (
            F.col("p")
            - F.least(F.lit(0).cast("long"), F.min("p").over(wp))
        ).alias("s"),
    ).localCheckpoint(eager=False)  # (type, day)-sized; feeds peak + final agg
    peak = cusum.groupBy("event_type").agg(F.max("s").alias("max_cusum"))
    return (
        cusum.join(F.broadcast(peak), "event_type")
        .groupBy("event_type", "max_cusum")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(F.col("s") > 15, 1).otherwise(0)).alias("n_alarm_days"),
            F.min(
                F.when(F.col("s") == F.col("max_cusum"), F.col("d"))
            )
            .cast("string")
            .alias("peak_day"),
        )
        .select(
            "event_type",
            "n_days",
            "n_alarm_days",
            F.col("max_cusum").cast("bigint").alias("max_cusum"),
            "peak_day",
        )
        .orderBy("event_type")
    )
