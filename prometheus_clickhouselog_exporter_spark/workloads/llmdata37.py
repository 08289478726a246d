"""Round 13 batch 1: iterative BPE merge induction and the DoReMi
mixture-curriculum manifest (VERDICT r12, Next round #6b/#6c).

text_bpe_train_merges unrolls the real BPE training loop — count
adjacent token pairs over the vocabulary, merge the argmax pair in
every word, re-pair — for 8 merges, where text_bpe_merge_candidates
(pipeline_ops4) is the single-round kernel. The merge step is
expressed as ONE string replace per round over a double-pipe token
encoding, chosen because leftmost non-overlapping substring
replacement on "|x||y|" → "|xy|" is EXACTLY BPE's leftmost-first
non-overlapping merge (the double separator makes overlapping matches
impossible, so both engines' sequential replace scans agree with the
textbook algorithm — single separators would skip every other merge in
a run).

sample_mixture_curriculum turns sample_doremi_weights' per-source
shares (llmdata28 — its oracle SQL is REUSED verbatim as a CTE, zero
duplication) into an epoch-ordered training manifest by stride
scheduling (WFQ virtual time): the k-th document of source s lands at
virtual position (k+½)/w_s, so sources interleave ∝ weight from the
very first batch instead of concatenating in blocks. Output is the
position-decile × source census that certifies the interleave.

Ref cite: none — /root/reference (main.go:1-145, query.go:1-289,
metrics.go:1-75) has no tokenizer or sampling surface; §2.3 territory.
Methods are public: Sennrich et al. 2016 (BPE), Xie et al. 2023
(DoReMi), Waldspurger & Weihl 1995 (stride scheduling).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import ORACLE, query, table

_BPE_MERGES = 8
_VT_SCALE = 10**12


def _bpe_round_sql(r: int) -> str:
    """pairs → argmax merge → replace, one unrolled round. Every CTE is
    MATERIALIZED: w{r} is consumed by the next round's pair scan AND
    the replace, and b{r} by the output union — inlining would replay
    the whole chain per consumer."""
    return f"""
    p{r} AS (
      SELECT s.w, s.freq, s.t[u.i] AS x, s.t[u.i + 1] AS y
      FROM (SELECT w, freq, string_split(trim(w, '|'), '||') AS t
            FROM w{r - 1}) s,
           unnest(range(1, len(s.t))) AS u(i)
    ),
    b{r} AS MATERIALIZED (
      SELECT x, y, CAST(sum(freq) AS BIGINT) AS pair_total,
             CAST(count(DISTINCT w) AS BIGINT) AS n_words
      FROM p{r} GROUP BY x, y
      ORDER BY pair_total DESC, x, y LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT v.word,
             replace(v.w, '|' || b.x || '||' || b.y || '|',
                     '|' || b.x || b.y || '|') AS w,
             v.freq
      FROM w{r - 1} v CROSS JOIN b{r} b
    )"""


_BPE_VOCAB_SQL = f"""
    vocab AS (
      SELECT t.word AS word, CAST(count(*) AS BIGINT) AS freq
      FROM documents, unnest(string_split(lower(text), ' ')) AS t(word)
      WHERE regexp_matches(t.word, '^[a-z]{{2,16}}$')
      GROUP BY t.word
    ),
    w0 AS MATERIALIZED (
      SELECT word, regexp_replace(word, '(.)', '|\\1|', 'g') AS w, freq
      FROM vocab
    ),
    {",".join(_bpe_round_sql(r) for r in range(1, _BPE_MERGES + 1))}"""

_BPE_ORACLE = f"""
    WITH {_BPE_VOCAB_SQL}
    {" UNION ALL ".join(
        f"SELECT {r} AS round, x AS tok_x, y AS tok_y, x || y AS merged, "
        f"pair_total, n_words FROM b{r}"
        for r in range(1, _BPE_MERGES + 1)
    )}
    ORDER BY round
    """


@query("text_bpe_train_merges", oracle=_BPE_ORACLE)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016), 8 merges unrolled:
    per round, count adjacent token pairs across the vocabulary
    (weighted by word frequency, one count per position so an
    intra-word repeat counts each occurrence), pick the (total DESC,
    x, y) argmax, and merge it in every word. Words are carried as
    double-pipe token encodings ("|a||b||c|"), where one leftmost
    non-overlapping replace of "|x||y|" with "|xy|" IS the textbook
    leftmost-first merge: the doubled separator means a match consumes
    nothing the next candidate needs, so a run [a,a,a,a] merges to
    [aa,aa] in one pass on BOTH engines ("|" cannot occur in tokens —
    the vocabulary admits ^[a-z]{2,16}$ only). Output: the 8-row merge
    table (round, pair, merged token, supporting mass) — the artifact
    a tokenizer release ships.

    Exactness: pair totals are integer sums; the argmax is ordered by
    (total DESC, x, y) — ties break on the group key. The replace is
    string-deterministic; no float exists anywhere.

    100 TB: DISTINCT-FIRST (the er_blocked_name_match lesson) — the
    corpus-sized shuffle happens once in the vocabulary aggregate;
    all 8 rounds then run over vocabulary rows (Heaps-law sublinear),
    each round = one bounded pair aggregate + a 1-row broadcast into a
    scan-stage replace. Each round's vocab is lineage-cut: the argmax
    subtree and the replace both read w_r, so an uncut plan doubles
    per round (the dbscan lesson, SCALE.md r13)."""
    merges, _w = _bpe_train(spark, sf_dir)
    return reduce(lambda a, b: a.unionByName(b), merges).orderBy("round")


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """The shared 8-round training loop: returns the per-round 1-row
    merge frames and the FINAL vocabulary (word, w, freq) with ``w``
    the double-pipe token encoding after all merges — consumed by
    text_bpe_train_merges (merge table) and text_bpe_apply_encoding
    (the encode pass)."""
    vocab = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]{2,16}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w = vocab.select(
        "word", F.regexp_replace("word", "(.)", r"|$1|").alias("w"), "freq"
    ).localCheckpoint(eager=False)
    merges: list[DataFrame] = []
    for r in range(1, _BPE_MERGES + 1):
        toks = F.split(F.expr("trim(BOTH '|' FROM w)"), r"\|\|")
        pairs = (
            w.select("w", "freq", toks.alias("t"))
            .filter(F.size("t") >= 2)  # sequence(1, 0) descends, never empty
            .select(
                "w",
                "freq",
                F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
                "t",
            )
            .select(
                "w",
                "freq",
                F.element_at("t", F.col("i")).alias("x"),
                F.element_at("t", F.col("i") + 1).alias("y"),
            )
        )
        best = (
            pairs.groupBy("x", "y")
            .agg(
                F.sum("freq").cast("bigint").alias("pair_total"),
                F.countDistinct("w").cast("bigint").alias("n_words"),
            )
            .orderBy(F.col("pair_total").desc(), "x", "y")
            .limit(1)
            .localCheckpoint(eager=False)  # consumed by output + replace
        )
        merges.append(
            best.select(
                F.lit(r).cast("int").alias("round"),
                F.col("x").alias("tok_x"),
                F.col("y").alias("tok_y"),
                F.concat("x", "y").alias("merged"),
                "pair_total",
                "n_words",
            )
        )
        w = (
            w.crossJoin(F.broadcast(best.select("x", "y")))
            .select(
                "word",
                F.replace(
                    F.col("w"),
                    F.concat(F.lit("|"), "x", F.lit("||"), "y", F.lit("|")),
                    F.concat(F.lit("|"), "x", "y", F.lit("|")),
                ).alias("w"),
                "freq",
            )
            .localCheckpoint(eager=False)  # argmax + replace both read w
        )
    return merges, w


_CURRICULUM_ORACLE = f"""
    WITH weights AS ({{doremi}}),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
               - 1 AS k,
             greatest(w.new_share_q, 1) AS w_q
      FROM documents d JOIN weights w ON w.source = d.source
    ),
    manifest AS MATERIALIZED (
      SELECT source, doc_id,
             (2 * k + 1) * {_VT_SCALE} // (2 * w_q) AS vt_q
      FROM ranked
    ),
    mx AS (SELECT max(vt_q) AS m FROM manifest)
    SELECT CAST(least(9, manifest.vt_q * 10 // (mx.m + 1)) AS INT) AS decile,
           manifest.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(manifest.vt_q) AS BIGINT) AS first_vt_q
    FROM manifest CROSS JOIN mx
    GROUP BY 1, 2 ORDER BY decile, source
    """


def _curriculum_oracle() -> str:
    # sample_doremi_weights' oracle (llmdata28) reused verbatim — the
    # weights ARE its output, so the SQL is shared, not re-derived
    return _CURRICULUM_ORACLE.format(doremi=ORACLE["sample_doremi_weights"])


@query("sample_mixture_curriculum", oracle=_curriculum_oracle())
def sample_mixture_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-ordered training manifest from DoReMi domain weights
    (VERDICT r12 #6c): stride scheduling (Waldspurger & Weihl 1995 —
    WFQ virtual time) places the k-th document of source s at
    vt = (k+½)/w_s, so reading the manifest in vt order interleaves
    sources proportionally to their DoReMi share from the FIRST batch —
    a curriculum, not per-epoch concatenated blocks. Weights come from
    sample_doremi_weights (llmdata28) called directly; its oracle SQL
    is embedded as the weights CTE so both engines share one
    definition. Output is the position-decile × source census plus
    each cell's first virtual position — the proportional-interleave
    certificate (every decile holds each source ≈ w_s·|decile|).

    Exactness: vt_q = (2k+1)·1e12 // (2·w_q) is pure integer (w_q =
    DoReMi's micro-share, floored at 1); deciles divide by the 1-row
    broadcast max. Overflow bound: (2k+1)·1e12 exceeds int64 past
    k ≈ 4.6e6 docs per source — drop _VT_SCALE to 1e9 beyond that.

    100 TB: per-source rank is a bounded (per-source) window; the
    manifest never sorts globally — production writes it with
    repartitionByRange(vt_q) + sortWithinPartitions, and the census
    here is one hash aggregate over (decile, source)."""
    from .llmdata28 import sample_doremi_weights

    weights = sample_doremi_weights(spark, sf_dir).select(
        "source", F.greatest(F.col("new_share_q"), F.lit(1)).alias("w_q")
    )
    d = table(spark, sf_dir, "documents").select("source", "doc_id")
    ranked = d.join(F.broadcast(weights), "source").select(
        "source",
        "doc_id",
        (
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            )
            - 1
        ).alias("k"),
        "w_q",
    )
    manifest = ranked.select(
        "source",
        "doc_id",
        F.expr(f"(2 * k + 1) * {_VT_SCALE} div (2 * w_q)").alias("vt_q"),
    ).localCheckpoint(eager=False)  # consumers: max + census
    mx = manifest.agg(F.max("vt_q").alias("m"))
    return (
        manifest.crossJoin(F.broadcast(mx))
        .select(
            F.least(F.lit(9), F.expr("vt_q * 10 div (m + 1)"))
            .cast("int")
            .alias("decile"),
            "source",
            "vt_q",
        )
        .groupBy("decile", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("vt_q").cast("bigint").alias("first_vt_q"),
        )
        .orderBy("decile", "source")
    )
