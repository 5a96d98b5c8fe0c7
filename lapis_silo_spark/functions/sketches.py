"""Deterministic mergeable sketches: K-Minimum-Values distinct counting
and an engine-portable Bloom filter.

At 100 TB, exact ``count(distinct x)`` per group is a full shuffle of every
distinct value; sketches trade a bounded error for constant per-group
state. Spark ships HyperLogLog (``approx_count_distinct``), but its binary
sketch is engine-specific — unverifiable against an independent oracle.
KMV (Bar-Yossef et al.) with an md5-derived hash is just as mergeable and
every engine computes it identically: keep the k smallest normalized hashes
of the distinct elements; if fewer than k exist the count is exact, else
estimate (k-1) / h_k where h_k is the k-th smallest.

Scale shape: one distinct aggregation keyed on (group, element) — map-side
combined — then a per-group top-k window over k rows/group. State per
group is k doubles, the merge of two sketches is "union, keep k smallest"
(standard KMV mergeability), and the estimator is reproducible bit-for-bit
in any SQL engine — which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: 2^32 — the md5-prefix hash space; dividing by it lands in [0, 1).
_HASH_SPACE = 4294967296.0

#: Flush threshold for the count-min Arrow build's per-task value Counter
#: (guide §5): 1M distinct values ≈ tens of MB of Python dict state —
#: comfortably bounded per worker — after which partial slot rows are
#: emitted and the Counter clears. Purely a memory bound: the downstream
#: (h, slot) SUM makes any flush schedule value-identical (forced-overflow
#: test pins it).
CM_COUNTER_FLUSH_ENTRIES = 1_000_000


def kmv_hash(col: str | Column) -> Column:
    """Normalized deterministic hash in [0, 1): first 8 md5 hex chars."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
    return h.cast("double") / F.lit(_HASH_SPACE)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str | Column,
    k: int = 16,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    ``(group, n_kept, est_distinct)`` — exact when a group has < k distinct
    values, else ``(k-1)/h_k`` rounded to 4 decimals.

    Skew shape: the k-smallest-hash cut runs as a SALTED two-level top-k —
    first within ``(grp, salt)`` (a web-scale-hot group's rows spread over
    ``salt_buckets`` tasks), then over the ≤ ``salt_buckets × k`` survivors
    per group. Any hash in a group's global top-k is in its salt bucket's
    top-k, so the result is identical to the single-window form the
    unsalted shape would compute (see docs/WINDOW_AUDIT.md).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    # NULL values must not reach the window: a NULL hash sorts FIRST in
    # Spark's ascending window (consuming a kept slot, ignored by max) but
    # LAST in DuckDB — filtering mirrors the oracle's `WHERE val IS NOT NULL`
    # and matches count(distinct)'s own NULL-exclusion semantics.
    hashed = (
        df.select(F.col(group_col).alias("grp"), value.alias("val"))
        .filter(F.col("val").isNotNull())
        .distinct()
        .select(
            "grp",
            kmv_hash(F.col("val")).alias("h"),
            F.pmod(F.xxhash64(F.col("val").cast("string")), F.lit(salt_buckets)).alias(
                "_salt"
            ),
        )
    )
    w_salted = Window.partitionBy("grp", "_salt").orderBy(F.col("h").asc())
    pre = hashed.withColumn("rn", F.row_number().over(w_salted)).filter(
        F.col("rn") <= k
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    kept = pre.withColumn("rn2", F.row_number().over(w)).filter(
        F.col("rn2") <= k
    )
    return (
        kept.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("_hk"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_kept",
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
                .otherwise(F.lit(float(k - 1)) / F.col("_hk")),
                4,
            ).alias("est_distinct"),
        )
    )


#: bits used per 64-bit word — the sign bit stays clear so every mask and
#: every OR-accumulated word remains a positive BIGINT in both engines
BLOOM_BITS_PER_WORD = 63


def _bloom_position(value: Column, i: int, n_bits: int) -> Column:
    """The ``i``-th md5-derived bit position of a value in [0, n_bits)."""
    h = F.conv(
        F.substring(F.md5(F.concat(value, F.lit(f":{i}"))), 1, 8), 16, 10
    ).cast("long")
    return h % F.lit(n_bits)


def bloom_build(
    df: DataFrame,
    value_col: str | Column,
    n_words: int = 32,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a deterministic Bloom filter over the distinct values of a
    column: ``(word, bits)`` — at most ``n_words`` rows of one positive
    BIGINT each (``n_words × 63`` bits total).

    Spark ships a Bloom filter (``bloom_filter_agg``) but its binary sketch
    is engine-specific; this one is pure integer algebra on md5-derived
    positions, so an external SQL engine rebuilds the IDENTICAL filter —
    false positives included — which is what makes the probe results
    value-oracle-able (same argument as KMV vs HyperLogLog above).

    Scale shape: one distinct pass, ``n_hashes`` positions per value, one
    ``bit_or`` aggregation whose output is bounded by ``n_words`` ROWS no
    matter how many values went in — the mergeable constant-size state that
    lets a membership probe avoid shipping the member set itself (blooms
    from corpus shards merge by OR-ing words).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    n_bits = n_words * BLOOM_BITS_PER_WORD
    vals = df.select(value.alias("val")).filter(
        F.col("val").isNotNull()
    ).distinct()
    positions = vals.select(
        F.explode(
            F.array(*[_bloom_position(F.col("val"), i, n_bits)
                      for i in range(n_hashes)])
        ).alias("pos")
    )
    return (
        positions.select(
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    id_col: str | Column,
    value_col: str | Column,
    bloom: DataFrame,
    n_words: int = 32,
    n_hashes: int = 4,
) -> DataFrame:
    """Probe every ``(id, value)`` row against a :func:`bloom_build` filter:
    ``(id, val, maybe_member)`` — true iff ALL ``n_hashes`` bits are set
    (no false negatives; false-positive rate set by the build parameters).

    The filter joins in as a BROADCAST of ≤ ``n_words`` rows — membership
    testing against an arbitrarily large build set costs one map-side join
    per probe row, never a shuffle against the member set. That is the
    bloom's scale contract vs :mod:`decontam`'s exact broadcast of the gram
    table itself: the sketch stays KBs when the eval set outgrows a
    broadcast.
    """
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    n_bits = n_words * BLOOM_BITS_PER_WORD
    probes = df.select(idc.alias("id"), value.alias("val")).select(
        "id", "val",
        F.explode(
            F.array(*[_bloom_position(F.col("val"), i, n_bits)
                      for i in range(n_hashes)])
        ).alias("pos"),
    ).select(
        "id", "val",
        (F.col("pos") / BLOOM_BITS_PER_WORD).cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
        ).alias("mask"),
    )
    checked = probes.join(F.broadcast(bloom), on="word", how="left").select(
        "id", "val",
        F.coalesce(
            F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"),
            F.lit(False),
        ).alias("_hit"),
    )
    return checked.groupBy("id", "val").agg(
        F.min("_hit").alias("maybe_member")
    )


def hash_topk_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Deterministic per-group sample: the ``k`` rows whose md5 key hashes
    rank smallest within each group — the content-addressed replacement for
    per-group reservoir sampling (re-runs, backfills, and engines all agree
    on the winners). Ties broken by the key itself.

    Skew shape: salted two-level top-k — first within ``(group, salt)`` so
    a web-scale-hot group spreads over ``salt_buckets`` tasks, then over
    the ≤ ``salt_buckets × k`` survivors per group. Any row in a group's
    global top-k ranks ≤ k inside its salt bucket, so the output is
    identical to a single group-wide window (see docs/WINDOW_AUDIT.md)."""
    order = [kmv_hash(key_col).asc(), F.col(key_col).asc()]
    salt = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(salt_buckets))
    w_salted = Window.partitionBy(group_col, "_salt").orderBy(*order)
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_salted))
        .filter(F.col("_rn") <= k)
        .withColumn("_rn2", F.row_number().over(w))
        .filter(F.col("_rn2") <= k)
        .drop("_salt", "_rn", "_rn2")
    )


# -- count-min ---------------------------------------------------------------

def _cm_slot(value: Column, i: int, n_width: int) -> Column:
    """The ``i``-th md5-derived count-min slot of a value in [0, n_width)."""
    h = F.conv(
        F.substring(F.md5(F.concat(value, F.lit(f":{i}"))), 1, 8), 16, 10
    ).cast("long")
    return h % F.lit(n_width)


def count_min_build(
    df: DataFrame,
    value_col: str | Column,
    n_width: int = 1024,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a deterministic count-min sketch over a column's OCCURRENCES
    (not distinct values): ``(h, slot, cnt)`` — at most
    ``n_hashes × n_width`` rows.

    The frequency twin of :func:`bloom_build`: Cormode–Muthukrishnan
    count-min with md5-derived slots, pure integer algebra an external SQL
    engine rebuilds IDENTICALLY (collisions included), so estimates are
    value-oracle-able. Estimates via :func:`count_min_estimate` only ever
    OVERcount (min over ``n_hashes`` counters, each inflated by collisions
    alone).

    Scale shape: one pass, ``n_hashes`` slot rows per occurrence, one
    count aggregation that combines MAP-SIDE into ≤ ``n_hashes × n_width``
    groups — constant-size mergeable state (sketches from corpus shards
    merge by ADDING counts per (h, slot)) that answers any later frequency
    probe without a term-keyed shuffle of the corpus.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = df.select(value.alias("val")).filter(F.col("val").isNotNull())

    if isinstance(rows.schema["val"].dataType, T.StringType):
        # Arrow build path (round 11, guide §4): the expression form pays
        # n_hashes × (md5 + hex-substring + conv) JVM allocations PER
        # OCCURRENCE plus an n_hashes-way row explode (measured: the
        # dominant 18 s-CPU stage of the count-min bench row). One
        # mapInPandas pass counts occurrences per partition-DISTINCT value
        # (Zipfian streams collapse hard) and md5-slots each distinct value
        # once; only the partial (h, slot, cnt) rows — ≤ n_hashes ×
        # partition-distinct values — reach the exchange, so the shuffle
        # shape is unchanged (map-side-combined slot rows, never a
        # value-keyed shuffle). Slot algebra is bit-identical to _cm_slot:
        # first 8 md5 hex chars = first 4 digest bytes big-endian, % width
        # (test-pinned).
        import pandas as pd

        nh, nw = n_hashes, n_width
        flush_at = CM_COUNTER_FLUSH_ENTRIES

        def emit(counts):
            import hashlib

            hs, slots, cnts = [], [], []
            for v, c in counts.items():
                enc = v.encode("utf-8")
                for i in range(nh):
                    slot = (
                        int.from_bytes(
                            hashlib.md5(enc + b":%d" % i).digest()[:4], "big"
                        )
                        % nw
                    )
                    hs.append(i)
                    slots.append(slot)
                    cnts.append(c)
            return pd.DataFrame(
                {
                    "h": pd.Series(hs, dtype="int32"),
                    "slot": pd.Series(slots, dtype="int64"),
                    "cnt": pd.Series(cnts, dtype="int64"),
                }
            )

        def gen(it):
            from collections import Counter

            counts: Counter = Counter()
            for pdf in it:
                counts.update(pdf["val"])
                if len(counts) >= flush_at:
                    # Bounded per-task state (round 12, guide §5): a
                    # high-cardinality column would otherwise grow the
                    # Counter with one entry per DISTINCT value per
                    # partition until the Python worker OOMs — where the
                    # old expression pipeline would have spilled. Flushing
                    # partial (h, slot, cnt) rows is correct by
                    # construction: the downstream aggregation SUMS
                    # partials per (h, slot), so any interleaving of
                    # flushes adds up to the same sketch.
                    yield emit(counts)
                    counts.clear()
            yield emit(counts)

        partial = rows.mapInPandas(gen, "h int, slot long, cnt long")
        return partial.groupBy("h", "slot").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )

    positions = rows.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("h"),
                    _cm_slot(F.col("val"), i, n_width).alias("slot"),
                )
                for i in range(n_hashes)
            ])
        ).alias("p")
    ).select(F.col("p.h").alias("h"), F.col("p.slot").alias("slot"))
    return positions.groupBy("h", "slot").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def count_min_estimate(
    df: DataFrame,
    value_col: str | Column,
    sketch: DataFrame,
    n_width: int = 1024,
    n_hashes: int = 4,
) -> DataFrame:
    """Estimate the corpus frequency of every distinct value in ``df``
    against a :func:`count_min_build` sketch: ``(val, est_count)`` with
    ``est_count >= true count`` always (count-min never undercounts).

    The sketch joins in as a BROADCAST of ≤ ``n_hashes × n_width`` rows —
    probing costs one map-side join per (value, hash) pair, never a
    shuffle against the corpus that built the sketch.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    probes = (
        df.select(value.alias("val"))
        .filter(F.col("val").isNotNull())
        .distinct()
        .select(
            "val",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("h"),
                        _cm_slot(F.col("val"), i, n_width).alias("slot"),
                    )
                    for i in range(n_hashes)
                ])
            ).alias("p"),
        )
        .select("val", F.col("p.h").alias("h"), F.col("p.slot").alias("slot"))
    )
    return (
        probes.join(F.broadcast(sketch), on=["h", "slot"], how="left")
        .groupBy("val")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
