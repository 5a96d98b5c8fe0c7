"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All pure ``pyspark.sql.functions`` expressions — whole-stage-codegen'd JVM
execution, no UDFs, trivially scalable: each is a narrow per-row map over the
``text`` column, so it pipelines with the Parquet scan (no shuffle at all
until an aggregation is stacked on top).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function-word marker sets for the n-gram/heuristic language ID. Tiny on
# purpose: broadcastable as literals straight into the plan.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans"],
    "es": ["el", "la", "y", "los", "es", "un", "una", "que", "en", "por"],
}

PUNCT_CLASS = "[.,;:!?]"


def normalized(col: str | Column) -> Column:
    """Lowercase + collapsed whitespace — the canonical text form every
    dedup/fingerprint operator keys on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of the normalized text."""
    return F.split(normalized(col), " ")


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation chunks via the
    classic GPT-2-style pre-tokenizer regex shape (letters runs, digit runs,
    single punctuation), all JVM-side regexp_count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def mean_token_length(col: str | Column) -> Column:
    toks = tokens(col)
    return F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    toks = tokens(col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(sw))
    )
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PUNCT_CLASS)) / F.greatest(F.length(c), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    punctuation sanity + mean word length band — the standard cheap pre-filter
    stack of web-scale corpus cleaning pipelines."""
    ntok = token_count(col).cast("double")
    length_component = F.least(ntok / F.lit(100.0), F.lit(1.0))
    stop_component = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    mean_len = mean_token_length(col)
    len_band = F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        length_component * 0.25
        + stop_component * 0.25
        + punct_component * 0.25
        + len_band * 0.25
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    toks = tokens(col)
    denom = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers))) / denom
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: argmax of marker-word ratios; ``und`` when no
    marker matches. Deterministic ties resolve in LANG_MARKERS order."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    # Fold left so the FIRST language in LANG_MARKERS wins ties.
    for lang in reversed(list(scores)):
        score = scores[lang]
        best_lang = F.when(score >= F.greatest(best_score, F.lit(1e-12)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, score)
    return best_lang


def doc_fingerprint(col: str | Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def char_shingles(col: str | Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text (array<string>)."""
    t = normalized(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: F.substr(t, i, F.lit(k)),
        )
    )


def word_ngrams(col: str | Column, n: int = 3) -> Column:
    """Space-joined word n-grams of the normalized text (array<string>).

    Guarded against short documents: Spark's ``sequence(a, b)`` DESCENDS when
    ``b < a``, so the window count is clamped to zero explicitly — a doc with
    fewer than ``n`` tokens yields an empty array, not reversed garbage.
    """
    toks = tokens(col)
    windows = F.size(toks) - (n - 1)
    return F.when(windows < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(windows, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def winnow_fingerprint(col: str | Column, k: int = 8) -> Column:
    """Rolling-hash-style fingerprint: lexicographic min of md5 over all
    character k-shingles (one-window winnowing). Deterministic and
    SQL-reproducible."""
    t = normalized(col)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: F.md5(F.substr(t, i, F.lit(k))),
    )
    return F.array_min(hashes)
