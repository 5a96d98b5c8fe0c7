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
