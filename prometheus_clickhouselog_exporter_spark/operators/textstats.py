"""Text analysis operators (SURVEY §2.3): language ID, quality scoring,
token counting, document fingerprinting — all pure column expressions
(codegen'd, oracle-expressible in ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword lists per language for the n-gram/stopword-hit heuristic.
# Order matters for deterministic argmax ties: first list wins.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (the LLM-pipeline staple)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored proxy: word-piece count ≈ words + extra pieces for
    long words (every 4 chars beyond the first 4 starts a new piece) —
    deterministic and cheap, for budgeting rather than exact tokenizer
    parity."""
    t = tokens(text)
    return F.aggregate(
        t,
        F.lit(0),
        lambda acc, w: acc + 1 + F.floor((F.greatest(F.length(w) - 1, F.lit(0))) / 4).cast("int"),
    )


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda w: F.array_contains(arr, w)))


def language_id(text: Column) -> Column:
    """Argmax of per-language stopword hit counts; 'und' (undetermined)
    when nothing matches. Deterministic tie-break by dict order."""
    result = F.lit("und")
    best = F.lit(0)
    # fold right-to-left so earlier languages win ties (>= replaces later)
    for lang in reversed(list(LANG_STOPWORDS)):
        hits = stopword_hits(text, LANG_STOPWORDS[lang])
        result = F.when(hits >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(result)
        best = F.greatest(best, hits)
    return result


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band, mean word length
    band, low symbol/digit ratio, stopword presence — the standard cheap
    pre-filters a training-data pipeline applies before expensive models."""
    n_chars = F.length(text)
    n_toks = token_count(text)
    mean_word = n_chars / F.greatest(n_toks, F.lit(1))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    symbols = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    symbol_ratio = symbols / F.greatest(n_chars, F.lit(1))
    len_ok = F.when((n_toks >= 5) & (n_toks <= 100000), 0.25).otherwise(0.0)
    word_ok = F.when((mean_word >= 2.0) & (mean_word <= 12.0), 0.25).otherwise(0.0)
    digit_ok = F.when(digit_ratio <= 0.3, 0.25).otherwise(0.0)
    symbol_ok = F.when(symbol_ratio <= 0.2, 0.25).otherwise(0.0)
    return len_ok + word_ok + digit_ok + symbol_ok


def top_token_count(toks: Column) -> Column:
    """Highest single-token occurrence count within the document —
    pure-expression form, shuffle-free.

    CAUTION (measured): higher-order functions evaluate their lambdas
    INTERPRETED, element by element — this nested transform/filter is
    O(distinct × tokens) interpreted evals per row and was ~40× slower
    than the explode → (doc, token) count → max aggregation twin on a
    5k-doc corpus (7.6s vs 0.2s). Use the aggregation path
    (``text_repetition_filter`` in workloads/pipeline_ops.py) in any hot
    path; this form exists for single-row/streaming-state contexts where
    a shuffle is unavailable. Pass an ATTRIBUTE, not a deep expression:
    no CSE across HOF lambda boundaries."""
    return F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda x: x == d)),
        )
    )


def fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over tokens (mod 1e9+7).

    Token value = 7·len + ascii(first char) — intentionally simple so the
    identical formula runs in any ANSI SQL engine for oracle checking.
    """
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(
            acc * 31 + F.length(w) * 7 + F.ascii(F.substring(w, 1, 1)),
            F.lit(1_000_000_007),
        ),
    )
