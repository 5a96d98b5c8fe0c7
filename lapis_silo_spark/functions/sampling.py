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
