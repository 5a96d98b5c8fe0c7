"""Deterministic, engine-portable sampling for training-data pipelines.

``rand()``-based sampling is neither reproducible across runs nor auditable;
pipelines at 100 TB want *content-addressed* sampling: a pure function of the
row key decides membership, so re-runs, backfills, and downstream joins all
agree on the sample. The device here is the md5-hex prefix of the key — a
uniform 256-bucket hash that every SQL engine computes identically (which is
also what makes it DuckDB-oracle-checkable, unlike Spark's xxhash64).

Bucket membership compares the two-hex-char prefix *lexicographically*
against a threshold: fixed-width lowercase hex orders exactly like its
numeric value, and string compare is portable to engines without a
base-16 conversion function.

All expressions are JVM-side built-ins — the sample predicate pipelines with
the Parquet scan (no shuffle, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUCKETS = 256  # two hex chars of md5


def _threshold_hex(fraction: float) -> str:
    n = max(0, min(BUCKETS, int(round(fraction * BUCKETS))))
    if n == BUCKETS:
        # 'g' sorts after every hex digit, so `prefix < 'g'` keeps all rows;
        # format(256) would be '100', which two-char prefixes compare WRONG
        # against lexicographically ('ff' > '100').
        return "g"
    return format(n, "02x")


def bucket_prefix(key: str | Column) -> Column:
    """Two-hex-char md5 prefix of the key — the 256-bucket assignment."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, 2)


def hash_sample(key: str | Column, fraction: float) -> Column:
    """Boolean predicate keeping ~``fraction`` of rows, keyed on ``key``
    (rounded to 1/256ths)."""
    return bucket_prefix(key) < F.lit(_threshold_hex(fraction))


def stratified_hash_sample(
    key: str | Column, stratum: str | Column, rates: dict[str, float],
    default_rate: float = 0.0,
) -> Column:
    """Per-stratum deterministic sampling predicate.

    ``rates`` maps stratum value -> keep fraction. The thresholds fold into
    a CASE expression — fully codegen'd, no join, no shuffle.
    """
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    threshold = F.lit(_threshold_hex(default_rate))
    for value, rate in rates.items():
        threshold = F.when(
            s == value, F.lit(_threshold_hex(rate))
        ).otherwise(threshold)
    return bucket_prefix(key) < threshold


def mixture_rates(
    counts: dict[str, int],
    weights: dict[str, float],
    budget_fraction: float,
) -> dict[str, float]:
    """Per-stratum keep rates that steer the sample toward a target MIXTURE.

    Training-data pipelines rarely want a uniform sample — they want "this
    much web, this much code, this much reference text". Given observed
    per-stratum ``counts``, target ``weights`` (summing to 1), and an overall
    ``budget_fraction`` of the corpus, the rate for stratum *s* is
    ``min(1, w_s * budget * total / n_s)`` — over-represented strata are
    down-sampled, under-represented ones keep everything (a rate cannot
    exceed 1; the mixture is then as close to the target as the data allows).

    Rates are quantized to the 256-bucket grid with ``floor(r*256 + 0.5)``
    (explicit half-up — NOT Python's banker's ``round``) so a SQL oracle can
    reproduce the quantization exactly with ``floor(r * 256 + 0.5)``.

    A stratum present in ``counts`` but absent from ``weights`` gets rate 0
    (dropped from the sample) — that is the intended contract for "not in the
    mixture", but a misspelled weight key would silently erase a stratum, so
    it warns.
    """
    import math
    import warnings

    missing = sorted(set(counts) - set(weights))
    if missing:
        warnings.warn(
            "mixture_rates: strata present in data but absent from weights "
            f"get rate 0.0 and are dropped from the sample: {missing}",
            stacklevel=2,
        )
    total = float(sum(counts.values()))
    return {
        s: math.floor(
            min(1.0, weights.get(s, 0.0) * budget_fraction * total / n)
            * 256
            + 0.5
        )
        / 256.0
        for s, n in counts.items()
    }


def mixture_sample(
    df: "DataFrame",
    key: str,
    stratum: str,
    weights: dict[str, float],
    budget_fraction: float,
) -> "DataFrame":
    """Deterministic dataset-mixture sampling: keep a content-addressed
    subset of ``df`` whose per-``stratum`` composition approaches ``weights``
    at ``budget_fraction`` of the corpus.

    One tiny counts aggregation (|strata| rows, collected), then the keep
    predicate is the same zero-shuffle codegen'd CASE as
    :func:`stratified_hash_sample` — the scan + filter pipeline is identical
    at 500 rows and 500 billion."""
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rates = mixture_rates(counts, weights, budget_fraction)
    return df.filter(stratified_hash_sample(key, stratum, rates))


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# ---------------------------------------------------------------------------
#
# DSIR selects raw-corpus documents whose hashed-n-gram feature distribution
# looks like a small TARGET domain: importance = target vs source likelihood
# under bucketed n-gram counts. The form here keeps the entire decision in
# INTEGER arithmetic so it is bit-exact in any engine: instead of
# log((t_b+1)/(T+B)) - log((s_b+1)/(S+B)) per bucket, the per-bucket weight
# is the cross-multiplied numerator
#
#     w_b = (t_b + 1)·(S + B)  -  (s_b + 1)·(T + B)
#
# whose SIGN equals the log-ratio's sign bucket-by-bucket (same Laplace
# smoothing), and a document's score is the exact integer sum of its gram
# weights — no float summation order, no libm divergence, a DuckDB oracle
# replays it with HUGEINT algebra. Spark side uses decimal(38,0): the
# per-bucket factors are kept in decimal(18,0) so products stay inside the
# 38-digit cap at any corpus size; at ~1e18 gram occurrences (far past
# 100 TB of text) the factors would need rescaling, documented here.


def _gram_bucket32(gram: Column, n_buckets: int) -> Column:
    """md5-derived 32-bit bucket id — the engine-portable hash family every
    dedup operator in this package keys on (dedup.py _hash32)."""
    h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def _doc_gram_buckets(
    docs: "DataFrame", id_col: str, text_col: str, *, ngram: int,
    n_buckets: int,
) -> "DataFrame":
    """``(id, bucket)`` — one row per word-``ngram`` occurrence."""
    from lapis_silo_spark.functions.text import word_ngram_rows

    return word_ngram_rows(
        docs, [("id", F.col(id_col))], text_col, ngram
    ).select("id", _gram_bucket32(F.col("gram"), n_buckets))


def dsir_importance_weights(
    docs: "DataFrame",
    text_col: str,
    target: Column,
    *,
    ngram: int = 2,
    n_buckets: int = 1024,
) -> "DataFrame":
    """Per-bucket integer importance weights ``(bucket, w)`` from one pass
    over the corpus: hashed word-n-gram occurrence counts split into target
    (rows where ``target`` is true) vs source (the rest), totals via one
    unpartitioned window over the ``n_buckets``-row count table (B is a
    fixed constant — a single-task window over 1024 rows at any corpus
    size), then the cross-multiplied smoothed weight. O(corpus) scan,
    O(n_buckets) state; nothing is collected."""
    from pyspark.sql.window import Window

    from lapis_silo_spark.functions.text import word_ngram_rows

    is_target = F.when(target, F.lit(1)).otherwise(F.lit(0))
    grams = word_ngram_rows(
        docs, [("_t", is_target)], text_col, ngram
    ).select("_t", _gram_bucket32(F.col("gram"), n_buckets))
    counts = grams.groupBy("bucket").agg(
        F.sum("_t").cast("bigint").alias("t_b"),
        F.sum(F.lit(1) - F.col("_t")).cast("bigint").alias("s_b"),
    )
    w = Window.partitionBy()
    dec = "decimal(18,0)"
    b = F.lit(n_buckets)
    totals = counts.select(
        "bucket",
        "t_b",
        "s_b",
        F.sum("t_b").over(w).alias("tt"),
        F.sum("s_b").over(w).alias("ss"),
    )
    return totals.select(
        "bucket",
        (
            (F.col("t_b") + F.lit(1)).cast(dec)
            * (F.col("ss") + b).cast(dec)
            - (F.col("s_b") + F.lit(1)).cast(dec)
            * (F.col("tt") + b).cast(dec)
        ).alias("w"),
    )


def dsir_scores(
    docs: "DataFrame",
    id_col: str,
    text_col: str,
    weights: "DataFrame",
    *,
    ngram: int = 2,
    n_buckets: int = 1024,
) -> "DataFrame":
    """Per-document integer importance score ``(id, score)``: the exact sum
    of bucket weights over the document's gram occurrences. The weight table
    is ``n_buckets`` rows — broadcast; the only shuffle is the per-document
    sum of ``(id, decimal)``. Documents with no grams (under ``ngram``
    tokens) score 0. Buckets absent from ``weights`` contribute nothing —
    that can only happen when scoring a corpus other than the one the
    weights were fit on (fit covers every bucket it has seen); fit on the
    union if cross-corpus scoring needs full coverage."""
    grams = _doc_gram_buckets(
        docs, id_col, text_col, ngram=ngram, n_buckets=n_buckets
    )
    scored = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(F.sum("w").alias("score"))
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("score"), F.lit(0).cast("decimal(38,0)")).alias(
            "score"
        ),
    )


def dsir_keep(score: Column) -> Column:
    """DSIR keep rule: positive importance (document looks more target-like
    than source-like under the smoothed bucket model)."""
    return score > 0
