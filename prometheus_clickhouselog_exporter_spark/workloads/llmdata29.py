"""LLM-data ops, round 10: interpolated Kneser–Ney bigram LM
perplexity, Heaps'-law vocabulary-growth fit (a distrank consumer),
linear CKA between embedding subspaces, and deterministic systematic
PPS sampling — all integer/quantized-exact and DuckDB-oracle-checked.

Methods are public: Kneser & Ney 1995 (absolute discounting with
continuation counts; Chen & Goodman 1999 interpolated form), Heaps
1978 (V = K·N^β), Kornblith et al. 2019 (linear CKA), and Madow 1949
systematic probability-proportional-to-size sampling.

Reference parity note: /root/reference has no text/embedding surface
(query.go:1-289); §2.3 north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import fround, query, table


@query(
    "text_lm_kneser_ney",
    oracle="""
    WITH tok AS (
      SELECT doc_id, w[CAST(r.i AS BIGINT)] AS w, r.i AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(range(1, len(w) + 1)) AS r(i)
    ),
    big AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    tr AS (SELECT w1, w2 FROM big WHERE doc_id % 5 <> 0),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS fan
           FROM c12 GROUP BY w1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM c12 GROUP BY w2),
    ntot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM c12),
    te AS (
      SELECT b.w1, b.w2, coalesce(c12.c, 0) AS c,
             c1.c1, c1.fan, cont.nc, ntot.nt
      FROM big b
      JOIN c1 ON c1.w1 = b.w1
      JOIN cont ON cont.w2 = b.w2
      LEFT JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
      CROSS JOIN ntot
      WHERE b.doc_id % 5 = 0
    ),
    scored AS (
      SELECT CAST(floor(ln(CAST(greatest(4 * c - 3, 0) * nt
                                + 3 * fan * nc AS DOUBLE)
                           / (4 * c1 * nt)) * 1e6 + 0.5) AS BIGINT) AS l6
      FROM te
    ),
    oov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_oov
      FROM big b
      LEFT JOIN c1 ON c1.w1 = b.w1
      LEFT JOIN cont ON cont.w2 = b.w2
      WHERE b.doc_id % 5 = 0 AND (c1.w1 IS NULL OR cont.w2 IS NULL)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM scored) AS n_scored,
           (SELECT n_oov FROM oov) AS n_oov_skipped,
           (SELECT CAST(nt AS BIGINT) FROM ntot) AS n_train_bigrams,
           (SELECT floor(exp(-CAST(sum(l6) AS DOUBLE) / 1e6 / count(*))
                         * 1e6 + 0.5) / 1e6 FROM scored) AS perplexity
    """,
)
def text_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
    Chen & Goodman 1999 eq. 4.21) with absolute discount D = 3/4,
    trained on docs with doc_id%5≠0 and scored as held-out perplexity
    on the %5=0 split:

        P(w2|w1) = (max(c(w1w2)−D, 0) + D·N₁₊(w1·)·P_cont(w2)) / c(w1)
        P_cont(w2) = N₁₊(·w2) / N₁₊(··)

    The continuation counts are what distinguish KN from the add-k
    bigram LM already in the registry (`text_lm_bigram_*`): a word seen
    often but only after one context ("Francisco") gets a LOW unigram
    back-off. D = 3/4 keeps everything rational: multiplying through by
    4·N₁₊(··) makes each probability the exact integer ratio
    (max(4c−3,0)·Nt + 3·fan·Nc) / (4·c1·Nt); only its ln is quantized
    (1e-6 before the sum — the KM/perplexity fold discipline). Test
    bigrams whose context or continuation is unseen in training are
    counted and excluded (reported as n_oov_skipped — the standard
    closed-vocabulary evaluation caveat, documented not hidden).

    100 TB: three grouped aggregates over one tokenization
    (bigram/context/continuation counts — all map-side combinable) and
    bigram-keyed equi-joins for scoring; no windows over open domains
    (the positional bigram join is doc-keyed)."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
        )
        .localCheckpoint(eager=False)  # both sides of the bigram join
    )
    nxt = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    big = toks.join(nxt, ["doc_id", "pos"]).select(
        "doc_id", F.col("w").alias("w1"), "w2"
    ).localCheckpoint(eager=False)  # train counts + test scoring
    tr = big.filter(F.col("doc_id") % 5 != 0)
    c12 = tr.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # c1 + cont + ntot + the test lookup
    c1 = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("fan"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("nc"))
    ntot = c12.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    test = big.filter(F.col("doc_id") % 5 == 0)
    te = (
        test.join(c1, "w1", "left")
        .join(cont, "w2", "left")
        .join(c12, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(ntot))
    )
    seen = F.col("c1").isNotNull() & F.col("nc").isNotNull()
    num = (
        F.greatest(4 * F.coalesce(F.col("c"), F.lit(0)) - 3, F.lit(0))
        * F.col("nt")
        + 3 * F.col("fan") * F.col("nc")
    ).cast("double")
    den = (4 * F.col("c1") * F.col("nt")).cast("double")
    l6 = F.floor(F.log(num / den) * 1e6 + F.lit(0.5)).cast("bigint")
    return te.agg(
        F.count_if(seen).cast("bigint").alias("n_scored"),
        F.count_if(~seen).cast("bigint").alias("n_oov_skipped"),
        F.min("nt").cast("bigint").alias("n_train_bigrams"),
        fround(
            F.exp(
                -F.sum(F.when(seen, l6)).cast("double")
                / 1e6
                / F.count_if(seen)
            ),
            6,
        ).alias("perplexity"),
    )


@query(
    "text_heaps_law_fit",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks FROM tok GROUP BY doc_id
    ),
    firsts AS (
      SELECT min(doc_id) AS doc_id, CAST(1 AS BIGINT) AS one
      FROM tok GROUP BY w
    ),
    new_per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY doc_id
    ),
    growth AS (
      SELECT p.doc_id,
             sum(p.n_toks) OVER (ORDER BY p.doc_id) AS cum_toks,
             sum(coalesce(n.n_new, 0)) OVER (ORDER BY p.doc_id) AS cum_types
      FROM per_doc p LEFT JOIN new_per_doc n ON n.doc_id = p.doc_id
    ),
    pts AS (
      SELECT CAST(floor(ln(CAST(cum_toks AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS lx,
             CAST(floor(ln(CAST(cum_types AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS ly
      FROM growth
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lx) AS HUGEINT) AS sx, CAST(sum(ly) AS HUGEINT) AS sy,
             CAST(sum(lx * lx) AS HUGEINT) AS sxx,
             CAST(sum(lx * ly) AS HUGEINT) AS sxy
      FROM pts
    )
    SELECT n AS n_docs,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS beta,
           floor(exp((CAST(sy AS DOUBLE)
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(sx AS DOUBLE)) / n / 1e6) * 1e6 + 0.5) / 1e6
             AS k_coef
    FROM m
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) = K·N^β (Heaps 1978): vocabulary size as a
    power of corpus size, estimated by log-log OLS over the corpus's
    OWN growth curve — docs processed in doc_id order, each doc one
    (cum_tokens, cum_types) point, a token's first occurrence credited
    to its min-doc_id. β far from ~0.4-0.6 on web text flags a corpus
    whose vocabulary growth is pathological (boilerplate flooding or
    token-soup spam) — the corpus-level twin of the per-doc Gopher
    rules.

    The cumulative curves ride `operators/distrank.exclusive_prefix`
    (doc_id is an OPEN domain — a no-partition running sum would
    serialize the corpus; the two-tier bucketed prefix sum keeps every
    window partitioned). Logs are quantized to 1e-6 integers BEFORE the
    OLS moments, which then overflow int64 and ride decimal(38,0)/
    HUGEINT — slope arithmetic is exact on both engines.

    100 TB: one tokenization scan → three grouped aggregates (per-doc
    counts, first-occurrence census, per-doc novelty) → two distributed
    prefix sums → a 1-row moment aggregate."""
    from ..operators.distrank import exclusive_prefix

    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks")
    )
    new_per_doc = (
        tok.groupBy("w")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    base = per_doc.join(new_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
    )
    g = exclusive_prefix(base, "doc_id", weight="n_toks", out="pre_toks")
    g = exclusive_prefix(g, "doc_id", weight="n_new", out="pre_new")
    pts = g.select(
        F.floor(
            F.log((F.col("pre_toks") + F.col("n_toks")).cast("double")) * 1e6
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lx"),
        F.floor(
            F.log((F.col("pre_new") + F.col("n_new")).cast("double")) * 1e6
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ly"),
    )
    d38 = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("lx").cast(d38).alias("sx"),
        F.sum("ly").cast(d38).alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast(d38).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast(d38).alias("sxy"),
    )
    beta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    kc = F.exp(
        (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / 1e6
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_docs"),
        fround(beta, 6).alias("beta"),
        fround(kc, 6).alias("k_coef"),
    )


@query(
    "embedding_cka_similarity",
    oracle="""
    WITH q AS (
      SELECT vec_id, r.i - 1 AS i,
             CAST(floor(e[CAST(r.i AS BIGINT)] * 1e6 + 0.5) AS BIGINT) AS q6
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           UNNEST(range(1, len(e) + 1)) AS r(i)
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    mu AS (
      SELECT i, CAST(floor(CAST(sum(q6) AS DOUBLE) / count(*) + 0.5)
                     AS BIGINT) AS m6
      FROM q GROUP BY i
    ),
    cent AS (
      SELECT q.vec_id, q.i, q.q6 - mu.m6 AS c FROM q JOIN mu USING (i)
    ),
    s AS (
      SELECT a.i AS i, b.i AS j, CAST(sum(a.c * b.c) AS HUGEINT) AS s
      FROM cent a JOIN cent b USING (vec_id)
      GROUP BY 1, 2
    ),
    c6 AS (
      SELECT i, j,
             CAST(floor(CAST(s AS DOUBLE) / (n.n * 1e6) + 0.5) AS BIGINT)
               AS c6
      FROM s, n
    ),
    fro AS (
      SELECT CAST(sum(CASE WHEN i < 32 AND j < 32 THEN c6 * c6 END)
                  AS BIGINT) AS fxx,
             CAST(sum(CASE WHEN i >= 32 AND j >= 32 THEN c6 * c6 END)
                  AS BIGINT) AS fyy,
             CAST(sum(CASE WHEN i < 32 AND j >= 32 THEN c6 * c6 END)
                  AS BIGINT) AS fxy
      FROM c6
    )
    SELECT (SELECT n FROM n) AS n_vectors, fxx, fyy, fxy,
           floor(CAST(fxy AS DOUBLE)
                 / sqrt(CAST(fxx AS DOUBLE) * CAST(fyy AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS cka_linear
    FROM fro
    """,
)
def embedding_cka_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment, Kornblith et al. 2019
    eq. 5: ||Y^T X||²_F / (||X^T X||_F · ||Y^T Y||_F)) between the first
    and second 32 dimensions of the embedding table — the
    representation-similarity measure used to compare layers/models;
    here it audits whether the two halves of an embedding carry
    redundant structure (CKA→1 means the back half adds nothing, the
    dimensionality twin of `embedding_dead_dims`).

    Exactness: components quantized to 1e-6 integers, per-dim means
    quantized the same way, so every centered cross-moment S_ij is an
    EXACT int64/HUGEINT sum; covariances are re-quantized to 1e-6
    before the Frobenius sums, making those pure int64 sums too — the
    only doubles are the final sqrt/ratio (the d²-bounded moment
    discipline of ZCA/whitening, llmdata16).

    100 TB: one posexplode scan (n·d rows), a vec_id-keyed self-join
    producing n·d² fan-out that reduces map-side into the d²-row moment
    frame — d² = 4096 rows regardless of corpus size; everything after
    is driver-scale."""
    d_half = 32
    base = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "i", "e"
        ),
    )
    q = base.select(
        "vec_id",
        "i",
        F.floor(F.col("e") * 1e6 + F.lit(0.5)).cast("bigint").alias("q6"),
    ).localCheckpoint(eager=False)  # means + both pair sides
    n = q.select("vec_id").distinct().count()  # 1-row dispatch statistic
    mu = q.groupBy("i").agg(
        F.floor(F.sum("q6").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("m6")
    )
    cent = q.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("q6") - F.col("m6")).alias("c")
    ).localCheckpoint(eager=False)
    a = cent.select("vec_id", F.col("i").alias("ia"), F.col("c").alias("ca"))
    b = cent.select("vec_id", F.col("i").alias("jb"), F.col("c").alias("cb"))
    s = (
        a.join(b, "vec_id")
        .groupBy("ia", "jb")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("s"))
    )
    c6 = s.select(
        "ia",
        "jb",
        F.floor(F.col("s").cast("double") / (n * 1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("c6"),
    )
    fro = c6.agg(
        F.sum(
            F.when(
                (F.col("ia") < d_half) & (F.col("jb") < d_half),
                F.col("c6") * F.col("c6"),
            )
        )
        .cast("bigint")
        .alias("fxx"),
        F.sum(
            F.when(
                (F.col("ia") >= d_half) & (F.col("jb") >= d_half),
                F.col("c6") * F.col("c6"),
            )
        )
        .cast("bigint")
        .alias("fyy"),
        F.sum(
            F.when(
                (F.col("ia") < d_half) & (F.col("jb") >= d_half),
                F.col("c6") * F.col("c6"),
            )
        )
        .cast("bigint")
        .alias("fxy"),
    )
    return fro.select(
        F.lit(n).cast("bigint").alias("n_vectors"),
        "fxx",
        "fyy",
        "fxy",
        fround(
            F.col("fxy").cast("double")
            / F.sqrt(F.col("fxx").cast("double") * F.col("fyy").cast("double")),
            6,
        ).alias("cka_linear"),
    )


@query(
    "sample_pps_systematic",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_toks,
             CAST(coalesce(sum(n_toks) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS pre
      FROM w
    ),
    tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS wt FROM w),
    hits AS (
      SELECT doc_id, n_toks, pre, wt,
             least(50, greatest(0, CAST(ceil(
               (100.0 * (pre + n_toks) - wt) / (2.0 * wt)) AS BIGINT)))
             - least(50, greatest(0, CAST(ceil(
               (100.0 * pre - wt) / (2.0 * wt)) AS BIGINT))) AS n_hits
      FROM cum, tot
    )
    SELECT doc_id, n_toks, n_hits,
           floor(least(1.0, 50.0 * n_toks / wt) * 1e6 + 0.5) / 1e6
             AS incl_prob
    FROM hits WHERE n_hits >= 1 ORDER BY doc_id
    """,
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow
    1949): draw k=50 documents with inclusion probability ∝ token
    count, by walking a fixed grid of k points (2m+1)·W/(2k) — the
    midpoint-offset systematic design, fully deterministic, no RNG —
    through the cumulative-weight line. A document is selected once per
    grid point inside its interval [pre, pre+w); documents heavier than
    one stride select multiple times (n_hits > 1), exactly as the
    design prescribes. π_i = min(1, k·wᵢ/W) ships for Horvitz-Thompson
    reweighting downstream.

    Exactness: the grid test is the integer comparison
    (2m+1)·W < 2k·c folded into two exact ceil divisions (operands
    < 2^53, so the doubles are exact); the cumulative line is the
    distributed prefix sum (`operators/distrank.exclusive_prefix` —
    doc_id is an open domain, no global window).

    100 TB: one per-doc aggregate, one distributed prefix sum, one
    1-row total broadcast — the one-pass weighted-sampling shape of
    `sample_reservoir_weighted`, but with the systematic design's
    strictly-proportional inclusion counts."""
    from ..operators.distrank import exclusive_prefix

    k2 = 100  # 2k, k = 50
    w = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    )
    cum = exclusive_prefix(w, "doc_id", weight="n_toks", out="pre")
    tot = w.agg(F.sum("n_toks").cast("bigint").alias("wt"))

    def f(c):
        raw = F.ceil((k2 * c.cast("double") - F.col("wt")) / (2.0 * F.col("wt")))
        return F.least(F.lit(50).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw.cast("bigint")))

    hits = cum.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_toks",
        (f(F.col("pre") + F.col("n_toks")) - f(F.col("pre"))).alias("n_hits"),
        fround(
            F.least(F.lit(1.0), 50.0 * F.col("n_toks") / F.col("wt")), 6
        ).alias("incl_prob"),
    )
    return hits.where(F.col("n_hits") >= 1).select(
        "doc_id", "n_toks", "n_hits", "incl_prob"
    ).orderBy("doc_id")
