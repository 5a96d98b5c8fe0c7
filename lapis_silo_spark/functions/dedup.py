"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB:
- every hash is md5-derived (deterministic, engine-portable — also what makes
  the DuckDB oracle gate possible);
- exact dedup is a single hash-groupBy (one shuffle on the digest);
- n-gram Jaccard runs as an inverted-index similarity join (explode shingles →
  self-join on shingle → count) with an optional hot-shingle frequency cap —
  the standard way to keep the candidate blow-up bounded on skewed corpora;
- MinHash+LSH replaces the all-pairs join with band-bucket joins: candidates
  only where a band collides, then exact-Jaccard verification. Shuffle volume
  scales with #bands × #docs, not #docs²;
- SimHash gives a 64-bit signature whose Hamming distance approximates cosine
  similarity of the token multiset — banded by 16-bit chunks for candidate
  generation;
- embedding near-dup does exact cosine on LSH-bucketed candidates.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lapis_silo_spark.cache import scoped_persist
from lapis_silo_spark.functions.text import char_shingles, normalized, tokens
from lapis_silo_spark.session import local_relation

# Prime > 2^32 for the universal-hash family; shingle hashes are 32-bit so
# a*x+b stays far below 2^63 (no overflow for n_perms <= ~2^20).
MINHASH_PRIME = 4294967311
MINHASH_B_MULT = 2654435761  # Knuth multiplicative constant

#: Default hot-bucket occupancy cap for the COMPOSED near-dup entry points
#: (minhash_dedup_clusters, incremental_minhash_dedup and the streaming
#: loop). A band bucket holds near-identical documents, so its natural
#: occupancy is the duplicate-group size; 1024 ≈ 64× a generous expected
#: group size of 16 — far above anything a benign corpus produces (the
#: capped-vs-uncapped equivalence is test-pinned), while bounding the
#: adversarial boilerplate blow-up at O(n_bands · rows · 1024) candidates
#: (the uncapped form went 469.6 s at 20k near-twins; see
#: tests/test_minhash_skew.py and BENCH_NOTES "Adversarial near-twin band
#: skew"). Recall contract: a true near-dup pair is lost only if EVERY
#: band it shares is hot (minhash_lsh_pairs docstring). Pass
#: ``max_band_freq=None`` to restore exact LSH semantics; the raw pair
#: operators (minhash_lsh_pairs, banded_rows) keep ``None`` as their
#: default because their oracle replays are exact.
DEFAULT_MAX_BAND_FREQ = 1024


def hash32(col: Column) -> Column:
    """Deterministic 32-bit integer hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _spread(df: DataFrame, *cols: Column) -> DataFrame:
    """Project to the named columns and rebalance across the cluster.

    Heavy per-row work (shingle hashing, signature aggregation) must not
    inherit a narrow input's partitioning — a single-file Parquet table scans
    as ONE partition, serializing everything downstream. Repartitioning the
    *projected* two columns (id, text) keeps the shuffle payload minimal.

    The partition count is SCALE-ADAPTIVE (round 11, guide §2): derived
    from the input's file bytes (``session.rebalance_width``) and capped
    at ``defaultParallelism`` — a bench-sized corpus gets a handful of
    partitions instead of 32 tiny Python tasks whose fixed Arrow/worker
    overhead dwarfs the work, while anything cluster-sized saturates the
    cores exactly as before.
    """
    from lapis_silo_spark.session import rebalance_width

    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    out = df.select(*cols)
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and len(files) < max(2, n // 2):
        return out.repartition(rebalance_width(files, n))
    if not files:
        # Non-file-backed input (e.g. a persisted projection): a small
        # single-file scan CACHES as one partition, and every heavy stage
        # built on it — signature mapInPandas, Lloyd iterations — then
        # runs as a 1-task straggler (measured: the eager sig count inside
        # pipeline_curation_near_dup spent 2.2 s on one task; round 11,
        # guide §2.4). The RDD partition count is known without running a
        # job; spread only when it is clearly narrower than the cluster.
        try:
            parts = df.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001 — partitioning unknowable, keep
            return out
        if parts < max(2, n // 2):
            return out.repartition(n)
    return out


# -- exact -------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, canonical_id, digest): canonical = min id per normalized-text
    digest. Pure hash-groupBy — one shuffle keyed on the digest."""
    digests = df.select(
        F.col(id_col).alias("id"), F.md5(normalized(text_col)).alias("digest")
    )
    canon = digests.groupBy("digest").agg(F.min("id").alias("canonical_id"))
    return digests.join(canon, on="digest", how="inner").select(
        "id", "canonical_id", "digest"
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per distinct normalized text."""
    groups = exact_dedup_groups(df, id_col, text_col)
    keep = groups.filter(F.col("id") == F.col("canonical_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Repeated word-``n``-gram passages across documents: every n-gram that
    occurs in at least ``min_docs`` distinct documents, with its document and
    occurrence counts — the passage-level twin of document-level dedup (the
    "duplicated training data" signal of exact-substring dedup pipelines;
    the reference engine has no text surface at all, SURVEY §2.5).

    Returns ``(gram, n_docs, n_occurrences)``.

    Scale shape: two-stage aggregation. Stage 1 groups by ``(gram, doc)`` —
    map-side combine collapses within-document repeats before the shuffle, so
    shuffle volume is bounded by distinct (gram, doc) pairs, never total gram
    occurrences. Stage 2 re-keys by ``gram`` alone; its input is already one
    row per (gram, doc). The explode stays in the same select as the
    n-gram-building expression so the Generate remains inside whole-stage
    codegen (see BENCH_NOTES on ``text_gram_novelty``).
    """
    from lapis_silo_spark.functions.text import word_ngram_rows

    grams = word_ngram_rows(df, [("id", F.col(id_col))], text_col, n)
    per_doc = grams.groupBy("gram", "id").agg(F.count(F.lit(1)).alias("occ"))
    return (
        per_doc.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    base_digests: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Exact dedup of an INCOMING batch against an existing corpus — the
    append-mode shape every production pipeline runs (the full-corpus
    variant above is the backfill shape). ``base_digests`` is a one-column
    ``(digest)`` table of the corpus' normalized-text md5s — exactly what
    :func:`exact_dedup_groups` output (or a stored digest side table)
    provides.

    Returns every new row with a verdict:
    ``(id, digest, status ∈ {kept, dup_of_base, dup_in_batch})`` —
    ``dup_of_base`` wins when both apply, ``kept`` is the batch-canonical
    (min id) of a digest unseen in the base.

    Scale shape: one digest-keyed aggregation over the (small) batch and one
    digest-keyed left join against the base digest table — the base's TEXT
    is never read, only its digest column, which is the point: the corpus
    contributes O(distinct digests) of state, not O(bytes).
    """
    digests = new_df.select(
        F.col(id_col).alias("id"), F.md5(normalized(text_col)).alias("digest")
    )
    canon = digests.groupBy("digest").agg(F.min("id").alias("_kid"))
    base = base_digests.select(F.col("digest")).distinct().withColumn(
        "_in_base", F.lit(True)
    )
    return (
        digests.join(canon, on="digest")
        .join(base, on="digest", how="left")
        .select(
            "id",
            "digest",
            F.when(F.col("_in_base"), F.lit("dup_of_base"))
            .when(F.col("id") != F.col("_kid"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


# -- n-gram Jaccard ----------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with shingle-set Jaccard >= threshold.

    Inverted-index similarity join; ``max_shingle_freq`` drops shingles hot
    enough to blow up the candidate space (precision unaffected for pairs that
    share at least one rare shingle — the standard prefix-filter compromise).
    """
    base = _spread(df, F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    # One shingling pass, persisted: the self-join references it twice and
    # sizes derives from it (shingles are distinct per doc), so normalization
    # + shingling never recompute. Storage memory is LRU-evictable.
    sh = base.select(
        "id", F.explode(char_shingles("_t", k)).alias("sh")
    ).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_freq is not None:
        hot = sh.groupBy("sh").count().filter(F.col("count") > max_shingle_freq)
        sh = sh.join(hot.select("sh"), on="sh", how="left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on=[F.col("a.sh") == F.col("b.sh"),
                      F.col("a.id") < F.col("b.id")])
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a")
                    .withColumnRenamed("sz", "sz_a"), on="id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sz", "sz_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- MinHash + LSH -----------------------------------------------------------

def minhash_signature(col: str | Column, n_perms: int = 16, k: int = 5) -> Column:
    """array<long> MinHash signature over character k-shingles, as a single
    column expression.

    Universal hash family h_i(x) = ((2i+1)·x + i·B) mod P over md5-derived
    32-bit shingle hashes — deterministic and SQL-reproducible.

    NOTE: expression-only path for small/embedded use. The engine's dedup
    operators use :func:`minhash_signatures` instead — Catalyst does not
    share the inner ``hashes`` subexpression across the ``n_perms`` outer
    lambda iterations, so this form recomputes every shingle md5 n_perms
    times.
    """
    hashes = F.transform(char_shingles(col, k), hash32)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perms - 1)),
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: (
                    ((i * 2 + 1) * h + (i * MINHASH_B_MULT) % MINHASH_PRIME)
                    % MINHASH_PRIME
                ),
            )
        ),
    )


def hash32_fast(col: Column) -> Column:
    """32-bit shingle hash via native xxhash64 — ~4× faster than the
    md5+conv path (no hex-string round-trip), for operators that don't need
    an external-SQL-reproducible hash."""
    return F.pmod(F.xxhash64(col), F.lit(2 ** 32))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perms: int = 16,
    k: int = 5,
    hash_fn=hash32,
) -> DataFrame:
    """(id, sig: array<long>) — the scale path for MinHash signatures.

    With the default ``hash_fn`` (:func:`hash32`, md5-derived and DuckDB
    oracle-able) signatures come from :func:`_minhash_signatures_arrow` —
    one Arrow-batched pass per partition, zero shuffle, bit-identical
    values. :func:`hash32_fast` routes through the same Arrow pass with a
    pure-Python XXH64 (bit-parity with Spark's ``xxhash64`` seed-42 string
    hash is test-pinned across lengths 0-100 and multibyte UTF-8). Any
    other ``hash_fn`` runs the expression pipeline: explode
    shingles → hash each shingle ONCE → ``n_perms`` min-aggregates (one per
    permutation) → pack into an array; each hash is computed exactly once,
    the mins combine map-side (partial aggregation), and the single shuffle
    is keyed on ``id``. Rows with NULL text produce no signature on either
    path.
    """
    if hash_fn is hash32:
        return _minhash_signatures_arrow(df, id_col, text_col, n_perms, k)
    if hash_fn is hash32_fast:
        return _minhash_signatures_arrow(
            df, id_col, text_col, n_perms, k, hasher="xx32"
        )
    exploded = (
        _spread(df, F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .select("id", F.explode(char_shingles("_t", k)).alias("sh"))
        .select("id", hash_fn(F.col("sh")).alias("h"))
    )
    aggs = [
        F.min(
            (
                F.lit(i * 2 + 1) * F.col("h")
                + F.lit((i * MINHASH_B_MULT) % MINHASH_PRIME)
            )
            % MINHASH_PRIME
        ).alias(f"_m{i}")
        for i in range(n_perms)
    ]
    return (
        exploded.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"_m{i}" for i in range(n_perms)]).alias("sig"))
    )


_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _xxh64_32(data: bytes, seed: int = 42) -> int:
    """Low 32 bits of Spark's ``xxhash64`` (XXH64, seed 42) over ``data``
    — the Python twin of :func:`hash32_fast` (``pmod(xxhash64(s), 2^32)``
    of a signed long equals the unsigned hash's low 32 bits since
    2^64 ≡ 0 mod 2^32). Bit-parity with the JVM is pinned in
    ``tests/test_functions.py`` across lengths (incl. the >= 32-byte
    accumulator loop) and multibyte UTF-8."""

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _M64
        v2 = (seed + _XXH_P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXH_P1) & _M64
        while i + 32 <= n:
            k1 = int.from_bytes(data[i:i + 8], "little")
            v1 = (rotl((v1 + k1 * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            k1 = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (rotl((v2 + k1 * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            k1 = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (rotl((v3 + k1 * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            k1 = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (rotl((v4 + k1 * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
            h = ((h * _XXH_P1) + _XXH_P4) & _M64
    else:
        h = (seed + _XXH_P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = int.from_bytes(data[i:i + 8], "little")
        k1 = (rotl((k1 * _XXH_P2) & _M64, 31) * _XXH_P1) & _M64
        h ^= k1
        h = ((rotl(h, 27) * _XXH_P1) + _XXH_P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XXH_P1) & _M64
        h = ((rotl(h, 23) * _XXH_P2) + _XXH_P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXH_P5) & _M64
        h = (rotl(h, 11) * _XXH_P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXH_P2) & _M64
    h ^= h >> 29
    h = (h * _XXH_P3) & _M64
    h ^= h >> 32
    return h & 0xFFFFFFFF


def _minhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str, n_perms: int, k: int,
    hasher: str = "md5",
) -> DataFrame:
    """Arrow-batched signature computation for the md5 (:func:`hash32`)
    family — bit-identical to the expression path, measured ~3× faster and
    ZERO-shuffle (round 11, guide §4).

    The expression pipeline pays three interpreted-evaluation costs Catalyst
    cannot codegen: ``char_shingles``'s higher-order ``transform`` builds a
    per-row string array element by element, ``array_distinct`` hashes it
    again, and the ``n_perms`` separate ``min()`` aggregate expressions
    re-evaluate a multiply-add-mod per row each — measured 4.98 s wall at
    sf0.1 against 1.7 s for this path (plans/r11, OPTIMIZATION_r11.md).
    Here one ``mapInPandas`` pass normalizes, shingles, md5-hashes and
    min-reduces per input partition: no explode, no groupBy shuffle (the
    per-doc shingle set never leaves the task), and the permutation sweep is
    one vectorized numpy broadcast.

    Value equivalence is exact and test-pinned (``tests/test_dedup.py``):
    ``trim`` drops only ASCII 0x20 (Spark's ``StringTrim``), ``\\s`` is the
    Java ASCII class ``[ \\t\\n\\x0b\\f\\r]``, a short-but-non-null text
    yields its single truncated shingle (the ``greatest(.., 1)`` guard), a
    NULL text yields no row, and the first 8 md5 hex chars equal the first
    4 digest bytes big-endian.
    """
    import pandas as pd
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    base = _spread(df, F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    prime, b_mult, n, kk = MINHASH_PRIME, MINHASH_B_MULT, n_perms, k
    use_md5 = hasher == "md5"

    def gen(it):
        import hashlib
        import re

        import numpy as np

        # Shingles repeat heavily across documents (natural text reuses
        # k-grams), so hash each DISTINCT shingle once per task: a memo
        # cuts the dominant per-row cost (hashlib.md5 ≈ 1 µs/shingle; the
        # pure-Python XXH64 is ~5-10×that) by the corpus' repetition
        # factor. Values are unchanged — the memo only caches a pure
        # function. Bounded: cleared at 1M entries (~100 MB worst case)
        # so a pathological task cannot grow without limit.
        memo: dict = {}
        if use_md5:
            def sh_hash(s):
                v = memo.get(s)
                if v is None:
                    if len(memo) >= 1_000_000:
                        memo.clear()
                    v = int.from_bytes(
                        hashlib.md5(s.encode("utf-8")).digest()[:4], "big"
                    )
                    memo[s] = v
                return v
        else:
            def sh_hash(s):
                v = memo.get(s)
                if v is None:
                    if len(memo) >= 1_000_000:
                        memo.clear()
                    v = _xxh64_32(s.encode("utf-8"))
                    memo[s] = v
                return v

        ws = re.compile(r"[\t\n\x0b\f\r ]+")
        a_mul = np.arange(n, dtype=np.uint64) * 2 + 1
        b_add = (np.arange(n, dtype=np.uint64) * b_mult) % prime
        for pdf in it:
            ids, sigs = [], []
            for i, txt in zip(pdf["id"], pdf["_t"]):
                if txt is None:
                    # Replicate the expression path exactly per family:
                    # char_shingles(null) -> [null]; md5(null) is null, so
                    # the md5 family emits (id, [null]*n) (inert downstream:
                    # concat_ws skips nulls in band hashes, zip_with scores
                    # them 0). xxhash64(null) is the SEED (42) — hash
                    # expressions skip null inputs — so the fast family
                    # emits the permutation mins of the single hash 42.
                    if use_md5:
                        ids.append(i)
                        sigs.append([None] * n)
                        continue
                    hs = np.array([42], dtype=np.uint64)
                    mins = (
                        (hs[None, :] * a_mul[:, None] + b_add[:, None])
                        % prime
                    ).min(axis=1)
                    ids.append(i)
                    sigs.append(mins.astype("int64"))
                    continue
                t = ws.sub(" ", txt.strip(" ")).lower()
                shingles = {
                    t[j: j + kk] for j in range(max(len(t) - (kk - 1), 1))
                }
                hs = np.fromiter(
                    (sh_hash(s) for s in shingles),
                    dtype=np.uint64,
                    count=len(shingles),
                )
                mins = (
                    (hs[None, :] * a_mul[:, None] + b_add[:, None]) % prime
                ).min(axis=1)
                ids.append(i)
                sigs.append(mins.astype("int64"))
            yield pd.DataFrame({"id": ids, "sig": sigs})

    return base.mapInPandas(gen, out_schema)


def _band_hash(rows_per_band: int) -> Column:
    """md5 bucket key over the ``band``-th slice of ``sig``."""
    return F.md5(
        F.concat_ws(
            ",",
            F.transform(
                F.slice(
                    F.col("sig"),
                    F.col("band") * rows_per_band + 1,
                    rows_per_band,
                ),
                lambda v: v.cast("string"),
            ),
        )
    ).alias("band_hash")


def banded_rows(
    sig: DataFrame,
    n_bands: int,
    rows_per_band: int,
    max_band_freq: int | None = None,
) -> DataFrame:
    """NARROW band rows ``(id, band, band_hash)`` from a ``(id, sig)``
    signature table, with the optional hot-bucket occupancy cap applied —
    the shared candidate-generation front half of every banded LSH join
    (self-join dedup AND cross-corpus decontamination), so the cap
    semantics cannot drift between call sites."""
    bands = sig.select(
        "id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).select("id", "band", _band_hash(rows_per_band))
    if max_band_freq is not None:
        hot = (
            bands.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_band_freq)
            .select("band", "band_hash")
        )
        bands = bands.join(hot, on=["band", "band_hash"], how="left_anti")
    return bands


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perms: int = 16,
    n_bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """(id, band, band_hash): md5 over each signature band — the LSH bucket key."""
    rows_per_band = n_perms // n_bands
    sig = minhash_signatures(df, id_col, text_col, n_perms, k)
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    banded = sig.select("id", "sig", band_idx)
    return banded.select("id", "band", _band_hash(rows_per_band))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_perms: int = 64,
    n_bands: int = 8,
    k: int = 5,
    exact_verify: bool = False,
    hash_fn=None,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs: band-collision candidates + Jaccard verification.

    Scale design: with r = n_perms/n_bands rows per band, a pair becomes a
    candidate with probability 1-(1-j^r)^b — the (r=8, b=8) default puts the
    S-curve threshold at (1/8)^(1/8) ≈ 0.77, i.e. tuned for true
    near-duplicates; corpora with a high baseline similarity (shared
    vocabulary) don't explode the candidate set the way small-r banding does.
    Verification uses the signature-estimated Jaccard (fraction of equal
    signature components — O(n_perms) per candidate, no shingle-set
    materialization); ``exact_verify=True`` recomputes true shingle Jaccard
    for the survivors only. Shuffle cost: n_bands × rows for the band join,
    never rows² — and the band join shuffles (id, band, band_hash) ONLY;
    signatures re-join by id after candidate dedup, so a hot bucket never
    amplifies the wide sig arrays through the exchange.

    ``max_band_freq`` bounds the one remaining quadratic exposure: a bucket
    with f members emits f·(f-1)/2 candidates, so a corpus slice of
    near-identical-but-not-identical docs (one char of drift defeats the
    exact-twin digest short-circuit upstream) can go quadratic in its
    bucket. Buckets with more than ``max_band_freq`` members are skipped
    for candidate generation, capping the join at
    O(n_bands · rows · max_band_freq) pairs. Recall contract: a true
    near-dup pair is lost ONLY if every band it collides in is hot — with
    b independent bands, pairs above the S-curve threshold collide in
    several bands and survive unless the hot slice saturates all of them
    (the same precision-preserving compromise as ``ngram_jaccard_pairs``'s
    ``max_shingle_freq``). Default ``None`` = exact LSH semantics.
    """
    rows_per_band = n_perms // n_bands
    # Default to xxhash-based signatures: LSH recall only depends on hash
    # uniformity, not on which family — the fast path saves the md5
    # hex-string round-trip. Pass ``hash_fn=hash32`` to make the full pair
    # output SQL-oracle-reproducible (the registered correctness query does).
    sig = minhash_signatures(df, id_col, text_col, n_perms, k,
                             hash_fn=hash_fn or hash32_fast)
    # LAZY persist (round 11, re-measured after the Arrow producer + memo
    # + width changes): an earlier eager count() fill guarded against
    # concurrent AQE stages racing the cold cache (then: up to 10
    # duplicate ~1.5 s signature computes per action). With the memoized
    # Arrow pass at byte-derived width the producer costs ~0.6 s once and
    # the worst-case race duplicates it at most a couple of times
    # concurrently — cheaper than the serialized count job, measured:
    # lsh_pairs 2.2 → 1.2 s, minhash_clusters 2.7 → 1.8 s,
    # curation_near_dup 4.7 → 3.0 s without the eager fill.
    sig = sig.persist()
    # The band self-join references this subplan on BOTH sides; without a
    # materialized cache Spark computes the whole shingle-hash aggregation
    # twice. Signatures are n_perms longs/doc — tiny next to the text they
    # summarize (the "store the sketch" half of any MinHash pipeline). The
    # cache lives exactly as long as the returned DataFrame: scoped_persist
    # (applied just before return) unpersists it when the caller drops the
    # result, so a long-lived server holds no net-new persisted RDDs between
    # queries.
    # NARROW band rows: band_hash is computed while sig is in scope, then
    # sig is dropped — the self-join below shuffles ~3 small columns per
    # row, and the 64-long signatures re-join by id only for the deduped
    # candidate pairs (the similarity.lsh_candidate_pairs lesson).
    bands = banded_rows(sig, n_bands, rows_per_band, max_band_freq)
    # NOTE(round 12, negative A/B): repartition(bands, "band", "band_hash")
    # to share ONE exchange between the self-join's sides (guide §2.4)
    # measured WORSE control-paired (lsh_pairs_fast 0.96→1.23 s, clusters
    # 1.94→2.18, near_dup 3.18→3.38 min-of-4; +2 jobs): the added exchange
    # + SMJ sorts cost more than the duplicated band-side compute they
    # remove — the band rows are narrow and the sig cache absorbs most of
    # the recompute.
    a = bands.alias("a")
    b = bands.alias("b")
    cand_ids = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    candidates = cand_ids.join(
        sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
        on="id_a",
    ).join(
        sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
        on="id_b",
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(n_perms))
    verified = (
        candidates.withColumn("jaccard", est)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    if not exact_verify:
        return scoped_persist(sig, verified)
    shingled = _spread(
        df, F.col(id_col).alias("id"), F.col(text_col).alias("_t")
    ).select("id", char_shingles("_t", k).alias("sh"))
    exact = (
        verified.drop("jaccard")
        .join(shingled.withColumnRenamed("id", "id_a")
              .withColumnRenamed("sh", "sh_a"), on="id_a")
        .join(shingled.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sh", "sh_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return scoped_persist(sig, exact)


# -- SimHash -----------------------------------------------------------------

def simhash64(col: str | Column) -> Column:
    """63-bit SimHash over whitespace tokens (bit 63 left clear so all
    arithmetic stays within signed int64 — no ANSI overflow).

    Bit j of the signature is 1 iff Σ_tokens (±1 by token-hash bit j) > 0.
    Token hash = two md5-derived halves packed into 63 bits. Pure expression
    algebra (shiftright / bitwise-and), no UDF.
    """
    toks = tokens(col)
    # 63-bit token hash: high 32 bits from md5(t), low 31 from md5(t+"#").
    tok_hashes = F.transform(
        toks,
        lambda t: (
            hash32(t) * F.lit(2 ** 31).cast("long")
            + (hash32(F.concat(t, F.lit("#"))) % F.lit(2 ** 31).cast("long"))
        ),
    )

    def bit_sum(j: int) -> Column:
        return F.aggregate(
            tok_hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for j in range(63):
        out = out + F.when(bit_sum(j) > 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig) — scale path for :func:`simhash64`: explode tokens, hash each
    ONCE, sum per-bit signs as 63 map-side-combinable aggregates."""
    tok = (
        _spread(df, F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .select("id", F.explode(tokens("_t")).alias("t"))
        .select(
            "id",
            (
                hash32(F.col("t")) * F.lit(2 ** 31).cast("long")
                + (
                    hash32(F.concat(F.col("t"), F.lit("#")))
                    % F.lit(2 ** 31).cast("long")
                )
            ).alias("h"),
        )
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"_b{j}")
        for j in range(63)
    ]
    grouped = tok.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(63):
        sig = sig + F.when(
            F.col(f"_b{j}") > 0, F.lit(2 ** j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return grouped.select("id", sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Candidate generation by 16-bit chunk equality (any pair within Hamming 3
    must agree on ≥1 of 4 chunks — pigeonhole), then exact popcount verify.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sig"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", F.col("ch.chunk").alias("chunk"),
             F.col("ch.chunk_val").alias("chunk_val"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.chunk_val") == F.col("b.chunk_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


# -- embedding cosine --------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


#: Hard ceiling on the exact all-pairs path. Above this the broadcast matrix
#: alone is >~1 GB and the O(n²) compare cannot finish; the LSH path must be
#: used instead. Override only for controlled verification runs.
EXACT_EMBEDDING_MAX_ROWS = 1_000_000


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    max_rows: int = EXACT_EMBEDDING_MAX_ROWS,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact all-pairs baseline; for the
    bucketed scale path see similarity.lsh_candidate_pairs).

    Shape: one side is collected and broadcast as a dense matrix — the same
    broadcast Spark's BroadcastNestedLoopJoin performs for this theta join
    (``a.id < b.id`` has no equi-key) — and the streamed side does one BLAS
    (batch × dim) · (dim × n) matmul per Arrow batch. The earlier
    pair-at-a-time formulation evaluated O(n²) interpreted higher-order-
    function dot products (HOF lambdas never enter whole-stage codegen) and
    was ~25× slower at sf0.1.

    Exact all-pairs is inherently O(n²) and this form exists as the
    small-scale verification oracle ONLY: it refuses to run above
    ``max_rows`` (the count is checked BEFORE anything is collected to the
    driver). When exact recall is required beyond that,
    :func:`embedding_near_dup_pairs_blocked` computes the identical result
    with no driver collect (hash-blocked block-pair matmuls, per-task
    memory independent of corpus size); when approximate recall suffices,
    :func:`lapis_silo_spark.functions.similarity.lsh_candidate_pairs`
    avoids the n² compare entirely.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_near_dup_pairs is the exact O(n²) verification "
            f"baseline and collects every vector to the driver; refusing "
            f"{n} rows (max_rows={max_rows}). Use "
            f"similarity.lsh_candidate_pairs for the scale path."
        )
    rows = (
        df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))
        .collect()
    )
    ids_list = [r["id"] for r in rows]
    try:
        all_ids = np.array(ids_list, dtype=np.int64)
    except (TypeError, ValueError, OverflowError):
        all_ids = np.array(ids_list, dtype=object)
    all_mat = np.array([r["vec"] for r in rows], dtype=np.float64)
    all_nrm = np.sqrt((all_mat * all_mat).sum(axis=1))
    bc = df.sparkSession.sparkContext.broadcast((all_ids, all_mat, all_nrm))

    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    stream = _spread(
        df,
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )

    def pair_batches(batches):
        b_ids, b_mat, b_nrm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = np.asarray(pdf["id"].to_numpy())
            a_mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
            a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ b_mat.T) / np.outer(a_nrm, b_nrm)
            # unrounded threshold test, then round — matches the SQL form
            # WHERE cos >= t ... SELECT round(cos, 6)
            keep = (b_ids[None, :] > a_ids[:, None]) & (cos >= threshold)
            ia, ib = np.nonzero(keep)
            if len(ia) == 0:
                continue
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ia],
                    "id_b": b_ids[ib],
                    "cos": np.round(cos[ia, ib], 6),
                }
            )

    return stream.mapInPandas(pair_batches, schema=out_schema)


def embedding_near_dup_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_rows: int = 8192,
    n_blocks: int | None = None,
    allow_quadratic: bool = False,
    max_rows: int = EXACT_EMBEDDING_MAX_ROWS,
) -> DataFrame:
    """All pairs with cosine >= threshold — the DISTRIBUTED exact form.

    Same contract as :func:`embedding_near_dup_pairs` (canonical
    ``id_a < id_b`` pairs, unrounded threshold test, cosine rounded to 6 dp)
    but nothing is ever collected to the driver: rows are hash-assigned to
    ``n_blocks`` blocks (``pmod(xxhash64(id), n_blocks)`` — uniform by
    construction, so block-pair tasks are balanced with no skew handling
    needed), a tiny broadcast map replicates each row into every block pair
    it participates in, and one ``applyInPandas`` task per ordered block
    pair ``(bi <= bj)`` runs a single BLAS (|A| × dim) · (dim × |B|) matmul.

    Cost model (the reason this is the cluster form of an inherently O(n²)
    computation):
    - shuffle volume: each row is replicated ``n_blocks`` times →
      O(n · n_blocks · dim) bytes, the classic blocked all-pairs trade of
      bandwidth for bounded task memory;
    - per-task memory: 2 blocks ≈ ``2 · block_rows · dim · 8`` bytes,
      independent of corpus size;
    - parallelism: n_blocks · (n_blocks + 1) / 2 independent tasks.

    Every unordered pair lands in exactly ONE block-pair task (the ordered
    pair of its members' block ids), so no dropDuplicates pass is needed.
    The diagonal task (bi == bj) keeps only the upper triangle by id.

    ``n_blocks`` defaults to the stricter of ``ceil(count / block_rows)``
    (the per-task memory bound) and a parallelism target of ~2× the
    cluster's cores worth of block-pair tasks, floored at ~128 rows per
    block (one count job; blocking never changes the output — every
    unordered pair is computed in exactly one task under any blocking).
    Pass ``n_blocks`` explicitly to skip the count, e.g. from a known
    corpus size.
    At true 100 TB scale prefer :func:`lapis_silo_spark.functions.
    similarity.lsh_candidate_pairs` — banded buckets avoid the n² compare
    entirely; this function is for when EXACT recall is required.

    The O(n²) contract is MACHINE-ENFORCED (round-9 VERDICT #5, mirroring
    ``max_band_freq``): above ``max_rows`` the call raises unless
    ``allow_quadratic=True`` is passed explicitly — a caller pointing this
    at a 100 TB corpus gets an error, not a quadratic job.
    """
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    spark = df.sparkSession
    id_type = df.schema[id_col].dataType
    id_integral = isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    n = df.count() if n_blocks is None else None
    if not allow_quadratic:
        # when the exact count is already needed, reuse it; otherwise a
        # LIMIT-probe stops scanning at max_rows+1 instead of paying a
        # second full count just for the guard
        probe = n if n is not None else df.limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"embedding_near_dup_pairs_blocked is exact all-pairs — "
                f"O(n²) compare by construction; refusing >{max_rows} rows "
                f"(max_rows={max_rows}). Pass allow_quadratic=True for a "
                f"controlled verification run, or use "
                f"similarity.lsh_candidate_pairs / embedding_dedup_clusters "
                f"for the scale path."
            )
    if n_blocks is None:
        # Two constraints, take the stricter (round 11, guide §2.4
        # stragglers): ceil(n / block_rows) bounds PER-TASK MEMORY, but on
        # a corpus smaller than one block it yields n_blocks = 1 — the
        # whole matmul serializes into a single applyInPandas task
        # (measured: one 2.9 s straggler task inside dedup_embedding_
        # clusters at sf0.1 while 31 cores idled). Blocking is
        # result-invariant (every unordered pair lands in exactly one
        # task either way), so also split for PARALLELISM: ~2× the
        # cluster's cores worth of grid tasks (nb(nb+1)/2 tasks), floored
        # so tiny inputs don't shatter into sub-128-row blocks where
        # per-task overhead dominates.
        par = df.sparkSession.sparkContext.defaultParallelism
        nb_mem = math.ceil(n / block_rows)
        nb_par = math.ceil(math.sqrt(4 * par))
        nb_floor = max(1, n // 128)
        n_blocks = max(nb_mem, min(nb_par, nb_floor), 1)

    base = _spread(
        df,
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn(
        "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    )

    # Replication map: block b → every ordered block pair it belongs to.
    # side 0 = the bi member, side 1 = the bj member; the diagonal pair is
    # emitted once (side 0) and handles its own upper triangle.
    # Built DISTRIBUTIVELY (spark.range + explode(sequence) — the upper
    # triangle as one generator row per bi), never as a driver-side
    # Python list: at the default n_blocks = ceil(n / 8192) a ~1e8-row
    # corpus would otherwise materialize ~75M tuples through
    # createDataFrame on the driver.
    tri = spark.range(n_blocks).select(
        F.col("id").cast("int").alias("bi"),
        F.explode(
            F.sequence(F.col("id").cast("int"), F.lit(n_blocks - 1))
        ).alias("bj"),
    )
    assign = tri.select(
        F.col("bi").alias("blk"), "bi", "bj", F.lit(0).alias("side")
    ).unionAll(
        tri.filter(F.col("bi") != F.col("bj")).select(
            F.col("bj").alias("blk"), "bi", "bj", F.lit(1).alias("side")
        )
    )

    replicated = base.join(F.broadcast(assign), on="blk").select(
        "bi", "bj", "side", "id", "vec"
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def block_pairs(key, pdf):
        bi, bj = key

        def unpack(sub):
            ids_list = list(sub["id"])
            if not ids_list:
                empty = np.empty((0, 0), dtype=np.float64)
                return np.array([], dtype=np.int64), empty, np.array([])
            # Branch on the id column's SPARK type, not try/except:
            # np.array([1.9], dtype=np.int64) does not raise — it silently
            # truncates to 1, which would emit wrong pair ids for
            # float-typed id columns.
            if id_integral:
                ids = np.array(ids_list, dtype=np.int64)
            else:
                ids = np.array(ids_list, dtype=object)
            mat = np.array(sub["vec"].tolist(), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            return ids, mat, nrm

        if bi == bj:
            a_ids, a_mat, a_nrm = unpack(pdf)
            b_ids, b_mat, b_nrm = a_ids, a_mat, a_nrm
        else:
            a_ids, a_mat, a_nrm = unpack(pdf[pdf["side"] == 0])
            b_ids, b_mat, b_nrm = unpack(pdf[pdf["side"] == 1])
        if len(a_ids) == 0 or len(b_ids) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = (a_mat @ b_mat.T) / np.outer(a_nrm, b_nrm)
        keep = (b_ids[None, :] > a_ids[:, None]) & (cos >= threshold)
        ia, ib = np.nonzero(keep)
        if bi != bj:
            # cross-block pairs where the bj member has the SMALLER id
            keep_r = (a_ids[:, None] > b_ids[None, :]) & (cos >= threshold)
            ra, rb = np.nonzero(keep_r)
        else:
            ra = rb = np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "id_a": np.concatenate([a_ids[ia], b_ids[rb]]),
                "id_b": np.concatenate([b_ids[ib], a_ids[ra]]),
                "cos": np.round(
                    np.concatenate([cos[ia, ib], cos[ra, rb]]), 6
                ),
            }
        )

    return replicated.groupBy("bi", "bj").applyInPandas(
        block_pairs, schema=out_schema
    )


def embedding_near_dup_pairs_pivot(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_pivots: int = 4,
    block_rows: int = 8192,
    max_sub_blocks: int = 64,
    seed: int = 7,
) -> DataFrame:
    """All pairs with cosine >= threshold — the exact form whose CANDIDATE
    SET shrinks with the threshold (the missing scale path for the exact
    embedding-pair family, round-9 VERDICT "what's wrong" #1: the blocked
    form bounds per-task memory but still evaluates every block pair).

    Pruning is metric, not probabilistic, so the result is EXACT (same
    contract as :func:`embedding_near_dup_pairs_blocked`: canonical
    ``id_a < id_b``, unrounded threshold test, cosine rounded to 6 dp —
    the DuckDB oracle is the plain cosine-join SQL, pivots never appear in
    the output): angular distance ``θ(a,b) = arccos(cos(a,b))`` is a
    metric on the unit sphere, so for any pivot ``p`` the triangle
    inequality gives ``|θ(a,p) − θ(b,p)| ≤ θ(a,b)``. A qualifying pair has
    ``θ(a,b) ≤ w = arccos(threshold)``; bucketing every row by
    ``floor(θ(row, p) / w)`` therefore confines its matches to the SAME or
    ADJACENT bucket — only consecutive-bucket tasks exist, O(#buckets)
    of them instead of the blocked form's O(n_blocks²). Additional pivots
    don't change the task graph; their bucket ids ride along and mask
    candidates inside each task (``|b_i(a) − b_i(b)| ≤ 1`` for every i),
    multiplicatively cutting the matmul's survivor set.

    Within each bucket pair, rows are further hash-split into
    ``ceil(max_bucket_rows / block_rows)`` sub-blocks (the blocked form's
    memory contract: per-task memory ~ 2·block_rows·dim doubles regardless
    of corpus size; replication ~ 3·n_sub per row).

    Regime contract: pruning power is ``w``-driven — at verification-grade
    thresholds (0.9+, w ≤ 26°) a pivot splits the sphere into many buckets
    and candidates collapse toward true pairs; at low thresholds
    (0.4 → w = 66°) buckets are hemisphere-sized and this degrades
    gracefully to the blocked form's cost. Zero-norm/null vectors have no
    angle and can never clear a positive threshold; they are excluded up
    front (output-identical to the blocked form's NaN-fails-threshold).
    Intended for ``0 < threshold < 1``: at ``threshold >= 1.0`` the bucket
    width collapses to zero, the angular-bucket count is no longer bounded
    by ``π/w`` (one bucket per DISTINCT angle — potentially the row count),
    and the call is rejected with guidance (round-10 ADVICE) — exact
    duplicates want :func:`embedding_near_dup_pairs_blocked` or a
    direction-keyed groupBy, not a degenerate pivot grid. The regime limit
    is MACHINE-ENFORCED (the family's guard contract): when the densest
    angular bucket needs more than ``max_sub_blocks`` hash sub-blocks,
    replication (~3·n_sub per row) and the task grid are degenerating
    toward all-pairs, and the call raises with guidance instead of
    submitting it.
    """
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if threshold >= 1.0:
        raise ValueError(
            f"embedding_near_dup_pairs_pivot: threshold={threshold} >= 1.0 "
            f"collapses the angular bucket width to zero (one bucket per "
            f"distinct angle — the O(pi/w) driver-side bucket list would "
            f"be unbounded). For exact duplicates use "
            f"embedding_near_dup_pairs_blocked at threshold just under 1, "
            f"or group by the normalized direction vector."
        )

    spark = df.sparkSession
    id_type = df.schema[id_col].dataType
    id_integral = isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    w = math.acos(max(-1.0, min(1.0, threshold)))

    base = _spread(
        df,
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).filter(
        F.col("vec").isNotNull()
        & (F.aggregate(F.transform(F.col("vec"), lambda x: x * x),
                       F.lit(0.0), lambda s, v: s + v) > 0)
    )

    # deterministic pivots; the FIRST drives the task graph, the rest mask
    dim = None
    probe = base.select(F.size("vec").alias("d")).first()
    if probe is None:
        return local_relation(
            spark, [],
            T.StructType([
                T.StructField("id_a", id_type),
                T.StructField("id_b", id_type),
                T.StructField("cos", T.DoubleType()),
            ]),
        )
    dim = probe["d"]
    rng = np.random.default_rng(seed)
    pivots = rng.standard_normal((n_pivots, dim))
    pivots /= np.sqrt((pivots * pivots).sum(axis=1, keepdims=True))
    bc_piv = spark.sparkContext.broadcast(pivots)

    @F.pandas_udf("array<int>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        piv = bc_piv.value
        mat = np.array(vecs.tolist(), dtype=np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        cos = np.clip((mat @ piv.T) / nrm, -1.0, 1.0)
        b = np.floor(np.arccos(cos) / w).astype(np.int32)
        return pd.Series(list(b))

    marked = base.withColumn("bk", bucket_ids("vec")).withColumn(
        "b1", F.element_at("bk", 1)
    )

    # size the hash sub-blocking from the LARGEST pivot-1 bucket (one small
    # aggregation job — the exact family's standing count-job contract)
    stats = (
        marked.groupBy("b1").count()
        .agg(F.max("count").alias("mx"), F.collect_set("b1").alias("bs"))
        .first()
    )
    n_sub = max(1, math.ceil((stats["mx"] or 0) / block_rows))
    buckets = sorted(stats["bs"] or [])
    bset = set(buckets)
    if n_sub > max_sub_blocks:
        raise ValueError(
            f"embedding_near_dup_pairs_pivot: the densest angular bucket "
            f"holds {stats['mx']} rows -> {n_sub} sub-blocks "
            f"(max_sub_blocks={max_sub_blocks}); at threshold={threshold} "
            f"(bucket width {math.degrees(w):.1f} deg) pivot pruning has "
            f"degenerated toward all-pairs. Raise the threshold, raise "
            f"max_sub_blocks for a controlled run, or use "
            f"embedding_near_dup_pairs_blocked / "
            f"similarity.lsh_candidate_pairs."
        )

    marked = marked.withColumn(
        "sub", F.pmod(F.xxhash64(F.col("id")), F.lit(n_sub)).cast("int")
    )

    # task table: same-bucket ordered sub-pairs + adjacent-bucket full
    # sub-grid. Only the O(π/w) bucket/adjacency lists are driver-side
    # (bounded by construction now threshold >= 1.0 is rejected); the
    # O(buckets · n_sub²) grid itself is built DISTRIBUTIVELY from
    # spark.range cross-joins — with the registered max_sub_blocks=4096
    # the grid can reach tens of millions of rows, which must never be a
    # driver-built Python list (round-10 ADVICE).
    adj_pairs = [(b, b + 1) for b in buckets if (b + 1) in bset]
    bdf = local_relation(spark, [(b,) for b in buckets], "tb int")
    adjdf = local_relation(spark, adj_pairs, "tb int, tb2 int")
    grid = spark.range(n_sub).select(
        F.col("id").cast("int").alias("si")
    ).crossJoin(
        spark.range(n_sub).select(F.col("id").cast("int").alias("sj"))
    )

    def task_rows(pref, b_col, sub_col, ti_col, tj_col, side):
        return pref.select(
            F.col(b_col).alias("b1"), F.col(sub_col).alias("sub"),
            F.col(ti_col).alias("ti"), F.col(tj_col).alias("tj"),
            "si", "sj", F.lit(side).alias("side"),
        )

    same = bdf.crossJoin(grid.filter(F.col("si") <= F.col("sj")))
    adjx = adjdf.crossJoin(grid)
    assign = (
        task_rows(same, "tb", "si", "tb", "tb", 0)
        .unionAll(task_rows(same.filter(F.col("si") != F.col("sj")),
                            "tb", "sj", "tb", "tb", 1))
        .unionAll(task_rows(adjx, "tb", "si", "tb", "tb2", 0))
        .unionAll(task_rows(adjx, "tb2", "sj", "tb", "tb2", 1))
    )

    # broadcast only when the grid is provably small (its exact row count
    # is computable from the stats job); a huge grid joins by shuffle,
    # where AQE's skew handling applies
    n_assign = (len(buckets) + 2 * len(adj_pairs)) * n_sub * n_sub
    if n_assign <= 2_000_000:
        assign = F.broadcast(assign)
    replicated = marked.join(
        assign, on=["b1", "sub"]
    ).select("ti", "tj", "si", "sj", "side", "id", "vec", "bk")

    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def bucket_pairs(key, pdf):
        ti, tj, si, sj = key
        diagonal = (ti == tj) and (si == sj)

        def unpack(sub):
            ids_list = list(sub["id"])
            if not ids_list:
                empty = np.empty((0, 0), dtype=np.float64)
                return (np.array([], dtype=np.int64), empty,
                        np.array([]), empty)
            if id_integral:
                ids = np.array(ids_list, dtype=np.int64)
            else:
                ids = np.array(ids_list, dtype=object)
            mat = np.array(sub["vec"].tolist(), dtype=np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            bks = np.array(sub["bk"].tolist(), dtype=np.int64)
            return ids, mat, nrm, bks

        if diagonal:
            a_ids, a_mat, a_nrm, a_bk = unpack(pdf)
            b_ids, b_mat, b_nrm, b_bk = a_ids, a_mat, a_nrm, a_bk
        else:
            a_ids, a_mat, a_nrm, a_bk = unpack(pdf[pdf["side"] == 0])
            b_ids, b_mat, b_nrm, b_bk = unpack(pdf[pdf["side"] == 1])
        if len(a_ids) == 0 or len(b_ids) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        # secondary-pivot mask: every pivot's buckets must be adjacent
        mask = np.ones((len(a_ids), len(b_ids)), dtype=bool)
        for p in range(1, a_bk.shape[1]):
            mask &= np.abs(a_bk[:, p][:, None] - b_bk[:, p][None, :]) <= 1
        cos = (a_mat @ b_mat.T) / np.outer(a_nrm, b_nrm)
        keep = mask & (b_ids[None, :] > a_ids[:, None]) & (cos >= threshold)
        ia, ib = np.nonzero(keep)
        if not diagonal:
            keep_r = (
                mask & (a_ids[:, None] > b_ids[None, :]) & (cos >= threshold)
            )
            ra, rb = np.nonzero(keep_r)
        else:
            ra = rb = np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "id_a": np.concatenate([a_ids[ia], b_ids[rb]]),
                "id_b": np.concatenate([b_ids[ib], a_ids[ra]]),
                "cos": np.round(
                    np.concatenate([cos[ia, ib], cos[ra, rb]]), 6
                ),
            }
        )

    return replicated.groupBy("ti", "tj", "si", "sj").applyInPandas(
        bucket_pairs, schema=out_schema
    )


def minhash_band_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perms: int = 64,
    n_bands: int = 8,
    k: int = 5,
    hash_fn=None,
) -> DataFrame:
    """The persisted per-corpus LSH state an append-mode pipeline stores:
    ``(id, band, band_hash, sig)`` — band hashes for candidate generation,
    the signature for estimated-Jaccard verification. n_bands rows of
    (2 longs + hash + n_perms-long array) per doc; the corpus TEXT is never
    needed again (the same O(state)-not-O(bytes) contract as
    :func:`incremental_exact_dedup`'s digest table)."""
    rows_per_band = n_perms // n_bands
    sig = minhash_signatures(df, id_col, text_col, n_perms, k,
                             hash_fn=hash_fn or hash32_fast)
    return sig.select(
        "id", "sig",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).select("id", "sig", "band", _band_hash(rows_per_band))


def incremental_minhash_dedup(
    new_df: DataFrame,
    base_state: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_perms: int = 64,
    n_bands: int = 8,
    k: int = 5,
    hash_fn=None,
    max_band_freq: int | None = DEFAULT_MAX_BAND_FREQ,
) -> DataFrame:
    """NEAR-duplicate dedup of an incoming batch against an existing corpus
    — the append-mode twin of :func:`incremental_exact_dedup` for the fuzzy
    case (``base_state`` = a stored :func:`minhash_band_state` table; the
    base text is never re-read).

    Returns EVERY new row with a verdict
    ``(id, status ∈ {kept, dup_of_base, dup_in_batch})`` — including rows
    whose text yields no shingles (NULL or shorter than ``k`` chars): they
    have no signature, can never collide, and report ``kept``.
    ``dup_of_base`` when a band collision with the base verifies at
    ``threshold`` (and it wins when both apply), ``dup_in_batch`` when a
    LOWER-id row of the same batch verifies (greedy one-pass semantics —
    direct similarity, not transitive closure; the backfill-shape
    :func:`minhash_dedup_clusters` is where full components belong).

    Scale shape: the new batch's bands join the base state on
    ``(band, band_hash)`` — shuffle bounded by n_bands × batch plus the
    colliding base rows, never base × batch, and the join carries ids
    only (signatures re-join after candidate dedup); the within-batch
    join is the standard banded self-join over the (small) batch.
    ``max_band_freq`` skips buckets whose combined base+batch occupancy
    exceeds the cap (see :func:`minhash_lsh_pairs` for the recall
    contract); it defaults to :data:`DEFAULT_MAX_BAND_FREQ` — the
    append-mode loop is a scale entry point — and ``None`` restores exact
    LSH semantics.
    """
    new_state = minhash_band_state(
        new_df, id_col, text_col, n_perms, n_bands, k, hash_fn
    )
    # NOTE(rounds 11-12): state caching here measured WORSE four separate
    # ways — lazy persist of both states (wash), two sequential eager
    # counts (+14 jobs, barriers serialize what the scheduler absorbs), a
    # single-job union-fill of both caches (jobs 21→36, stages 55→106,
    # wall 2-4×), and round 12's BASE-ONLY lazy persist (jobs 21→36,
    # stages 55→103, wall 2.30→2.42 s min-of-6): every variant makes the
    # cached state's size known, which stops it broadcasting into the band
    # joins, so each candidate join becomes exchange-bearing. The plan's
    # ReusedExchange nodes already share the id-keyed aggregation across
    # the band, occupancy, and verify branches; leave the states lazy
    # (guide §1: measure before caching). This row's ~2.3-3 s is the
    # double Arrow signature pass (base 80% + batch 20%) — its floor.
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(n_perms))

    hot = None
    if max_band_freq is not None:
        # Occupancy counts DISTINCT (id, band, band_hash) rows: the base
        # state legitimately holds duplicate rows between a compaction
        # crash and the next compaction (_band_state_paths tolerates
        # both the pre- and post-swap directory surviving), and raw row
        # counts would inflate bucket occupancy up to 2x — spuriously
        # skipping buckets near the cap and mis-reporting near-dups as
        # kept until compaction heals the state.
        occupancy = (
            new_state.select("id", "band", "band_hash")
            .unionAll(base_state.select("id", "band", "band_hash"))
            .dropDuplicates(["id", "band", "band_hash"])
            .groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        hot = occupancy.filter(F.col("_n") > max_band_freq).select(
            "band", "band_hash"
        )

    def verified_hits(a: DataFrame, b: DataFrame, id_order) -> DataFrame:
        a_b = a.select("id", "band", "band_hash")
        b_b = b.select("id", "band", "band_hash")
        if hot is not None:
            a_b = a_b.join(hot, on=["band", "band_hash"], how="left_anti")
            b_b = b_b.join(hot, on=["band", "band_hash"], how="left_anti")
        cand = (
            a_b.alias("a")
            .join(
                b_b.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    id_order,
                ],
            )
            .select(
                F.col("a.id").alias("nid"), F.col("b.id").alias("bid")
            )
            .distinct()
        )
        joined = cand.join(
            a.select(F.col("id").alias("nid"), F.col("sig").alias("sig_a"))
            .dropDuplicates(["nid"]),
            on="nid",
        ).join(
            b.select(F.col("id").alias("bid"), F.col("sig").alias("sig_b"))
            .dropDuplicates(["bid"]),
            on="bid",
        )
        return (
            joined.withColumn("_j", est)
            .filter(F.col("_j") >= F.lit(threshold))
            .select("nid")
            .distinct()
        )

    # base and batch ids are disjoint in the append contract; the guard
    # defends against an id landing in both (e.g. a re-delivered batch
    # whose bands were already committed) self-matching at est = 1.0
    base_hits = verified_hits(
        new_state, base_state, F.col("a.id") != F.col("b.id")
    ).withColumn("_base", F.lit(True))
    batch_hits = verified_hits(
        new_state, new_state, F.col("b.id") < F.col("a.id")
    ).withColumn("_batch", F.lit(True))

    # id universe from new_df, NOT new_state: rows with no shingles (NULL
    # text or len < k) produce no signature and would silently vanish
    ids = new_df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(base_hits.withColumnRenamed("nid", "id"), "id", "left")
        .join(batch_hits.withColumnRenamed("nid", "id"), "id", "left")
        .select(
            "id",
            F.when(F.col("_base"), F.lit("dup_of_base"))
            .when(F.col("_batch"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


# Raw pair-row ceiling under which connected components runs as a
# DRIVER-SIDE union-find instead of
# distributed min-label propagation. 5M (u, v) rows is ~100-300 MB of
# Python state — comfortably bounded, same driver-collect discipline as
# operators/phylo.py — while each propagation round costs ~0.8-1 s of
# fixed Spark job overhead (join + agg + localCheckpoint + convergence
# probe) that dwarfs the actual work whenever the edge list is this small.
# Near-dup edge lists are sparse by construction (pair stages emit only
# verified near-duplicates), so in practice even 100 TB corpora tend to
# land under this; the propagation loop remains the unbounded-scale path.
CC_DRIVER_EDGE_LIMIT = 5_000_000


def _driver_union_find(us, vs):
    """Union-find with path compression over collected edge endpoints;
    returns ``{node: min_id_of_component}``. Union-by-min keeps each
    root the component's minimum id, matching min-label propagation's
    fixpoint exactly (label = min id of the connected component)."""
    parent: dict = {}

    def find(x):
        path = []
        r = x
        while True:
            p = parent.get(r, r)
            if p == r:
                break
            path.append(r)
            r = p
        for n in path:
            parent[n] = r
        return r

    nodes = set()
    for u, v in zip(us, vs):
        # equi-join semantics: a null endpoint never matches, so null
        # edges contribute nothing in the propagation path either
        if u is None or v is None:
            continue
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if rv < ru:
            ru, rv = rv, ru
        parent[rv] = ru
    return {x: find(x) for x in nodes}


def _cc_label_map(
    pairs: DataFrame,
    pair_a: str,
    pair_b: str,
    driver_edge_limit: int | None = None,
) -> dict | None:
    """Bounded-probe connected components on the driver (round 11).

    One ``limit(N+1).toPandas()`` job doubles as the size probe and the
    edge fetch (same discipline as the former in-loop fast path): when the
    RAW pair list is at most ``driver_edge_limit`` rows (default
    :data:`CC_DRIVER_EDGE_LIMIT`), union-find runs driver-side and the
    NON-IDENTITY ``{node: component_min_id}`` entries return as a plain
    dict — identity entries are dropped because every consumer attaches
    labels with ``coalesce(map[node], node)``, which makes the untouched /
    self-labeled cases free (no ids-universe distinct, no anti-join, no
    union — the stages the old DataFrame-shaped fast path still paid).
    Returns ``None`` when the edge list exceeds the bound (caller falls
    back to :func:`_min_label_propagation` with the probe disabled).
    """
    limit = (
        CC_DRIVER_EDGE_LIMIT if driver_edge_limit is None else driver_edge_limit
    )
    if not limit:
        return None
    raw = pairs.select(F.col(pair_a).alias("u"), F.col(pair_b).alias("v"))
    # Drop null endpoints BEFORE the fetch (round-11 ADVICE): the equi-join
    # semantics of the distributed path never match them anyway, and a
    # single null in either column makes pandas coerce the whole int64
    # column to float64 — _driver_union_find's `is None` guard never fires
    # on NaN, and the float keys/labels would mismatch the LongType schema
    # handed to local_relation.
    raw = raw.filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    pdf = raw.limit(limit + 1).toPandas()
    if len(pdf) > limit:
        return None
    labels = _driver_union_find(pdf["u"].tolist(), pdf["v"].tolist())
    return {n: lbl for n, lbl in labels.items() if n != lbl}


def _apply_label_map(
    frame: DataFrame, rep_col: str, mapping: dict, out_col: str
) -> DataFrame:
    """Attach driver-computed component labels to ``frame``:
    ``out_col = coalesce(map[rep_col], rep_col)`` via a LEFT broadcast
    join against the non-identity entries (a pure-JVM ``local_relation``,
    so no Python worker in any downstream job). Bounded by the same
    :data:`CC_DRIVER_EDGE_LIMIT` contract as the probe — at most
    2×edges rows, the same volume the old fast path already shipped
    driver-side as a LocalRelation."""
    from pyspark.sql import types as T

    from lapis_silo_spark.session import local_relation

    dt = frame.schema[rep_col].dataType
    lm = local_relation(
        frame.sparkSession,
        sorted(mapping.items()),
        T.StructType(
            [T.StructField("_cc_node", dt), T.StructField("_cc_label", dt)]
        ),
    )
    joined = frame.join(
        F.broadcast(lm), frame[rep_col] == lm["_cc_node"], "left"
    )
    return joined.withColumn(
        out_col, F.coalesce(F.col("_cc_label"), F.col(rep_col))
    ).drop("_cc_node", "_cc_label")


def _min_label_propagation(
    ids: DataFrame,
    pairs: DataFrame,
    pair_a: str,
    pair_b: str,
    max_iterations: int,
    driver_edge_limit: int | None = None,
) -> DataFrame:
    """Connected components by min-label propagation over an ``(id)``
    universe and an edge list; returns ``(labels, guard)`` where labels is
    ``(id, label)`` (label = the component's minimum id) backed by a
    checkpoint whose storage the caller must tie to its result's lifetime
    (``cache.scoped_rdd_release``). Shared core of
    :func:`dedup_cluster_assignment` and :func:`minhash_dedup_clusters` —
    see the former's docstring for the convergence rationale.

    Two resource disciplines, both load-bearing (each was a measured bug):

    - **Lineage must truncate** (``checkpoint_tracked``): each round
      references the previous round TWICE (union + join), so without a
      checkpoint leaf the logical plan doubles per round — exponential
      analysis memory that OOMs an 8 GB driver around 20 rounds.
    - **Checkpoint storage must release deterministically**: PySpark never
      reclaims localCheckpoint RDDs, so superseded rounds unpersist as the
      loop advances and the final checkpoint is scoped to the result.

    Scale shape: propagation runs ONLY over nodes with at least one edge —
    a node with no near-duplicates keeps its own label by construction, so
    the per-round join/aggregate is O(nodes-in-pairs), not O(universe)
    (near-dups are sparse at corpus scale); the untouched remainder unions
    back in before the final checkpoint.

    Small-edge-set fast path: each propagation round pays ~0.8-1 s of fixed
    Spark job overhead (join + min-agg + localCheckpoint + convergence
    probe), so when a bounded ``limit(N+1)`` fetch shows the RAW pair list
    is at most ``driver_edge_limit`` rows (default
    :data:`CC_DRIVER_EDGE_LIMIT`; pass ``0`` to force the distributed
    loop), the pairs are collected and union-found on the driver — the
    same bounded-collect discipline as ``operators/phylo.py`` — and the
    labels return as a pure-JVM ``local_relation``. Identical fixpoint
    (label = component min id); the probe doubles as the fetch (one job),
    and the fast path skips the both-directions/distinct expansion
    entirely (union-find is undirected and duplicate-tolerant).
    """
    from lapis_silo_spark.cache import _CacheGuard, checkpoint_tracked

    raw = pairs.select(F.col(pair_a).alias("u"), F.col(pair_b).alias("v"))
    # Null-endpoint edges never match the propagation equi-joins and never
    # enter the union-find (see _cc_label_map's pandas-coercion rationale);
    # filtering them once here keeps BOTH paths value-identical and the
    # probe's pandas columns integer-typed.
    raw = raw.filter(F.col("u").isNotNull() & F.col("v").isNotNull())

    limit = CC_DRIVER_EDGE_LIMIT if driver_edge_limit is None else driver_edge_limit
    if limit:
        # probe + fetch straight off the pair pipeline — ONE job, no
        # checkpoint write (round 11: the former checkpoint-then-fetch
        # spent an extra eager job + an RDD materialization on the fast
        # path's only large input; the pair stages' own scoped sig/vec
        # caches materialize here and serve the rare fallback recompute)
        pdf = raw.limit(limit + 1).toPandas()
        if len(pdf) <= limit:
            from pyspark.sql import types as T

            from lapis_silo_spark.session import local_relation

            labels_map = _driver_union_find(
                pdf["u"].tolist(), pdf["v"].tolist()
            )
            dt = ids.schema["id"].dataType
            touched_labels = local_relation(
                ids.sparkSession,
                sorted(labels_map.items()),
                T.StructType(
                    [T.StructField("id", dt), T.StructField("label", dt)]
                ),
            )
            # anti-join against the labeled nodes themselves (NOT a
            # touched-set derived from raw edges): a node whose only
            # edges have a null partner has no label and must fall
            # through to the untouched self-label path
            untouched = ids.join(
                touched_labels.select("id"), "id", "left_anti"
            ).select("id", F.col("id").alias("label"))
            # LAZY persist, not an eager checkpoint: the fast-path lineage
            # is shallow (LocalRelation + one anti-join), so plan-size
            # truncation is moot — the cache just stops the caller's
            # multi-reference consumption (sizes agg + join) recomputing
            # the anti-join, without paying a separate materialization job
            final = touched_labels.union(untouched).persist()
            return final, _CacheGuard(final)

    # fallback (edge list above the driver bound, or probe disabled):
    # one checkpoint materializes the pair pipeline for every round —
    # recomputing it once here is the price of the probe-first fast path,
    # paid only when the edge list is genuinely propagation-sized
    raw_cp, raw_guard = checkpoint_tracked(raw)
    fwd = raw_cp
    rev = raw_cp.select(F.col("v").alias("u"), F.col("u").alias("v"))
    edges, edges_guard = checkpoint_tracked(fwd.union(rev).distinct())
    raw_guard.release()

    touched = edges.select(F.col("u").alias("id")).distinct()
    # the universe feeds the propagation seed AND the untouched anti-join;
    # its lineage can be expensive (digest agg + doc semi-join in the fused
    # cluster path) — cache it for the function's duration
    ids = ids.persist()
    labels, labels_guard = checkpoint_tracked(
        ids.join(touched, "id", "left_semi")
        .select("id", F.col("id").alias("label"))
    )
    # Convergence signal: labels only ever DECREASE under min-propagation,
    # so for numeric ids the label sum strictly drops on any change — one
    # cheap agg per round. For non-numeric ids (string doc ids are
    # first-class in the pair stages) F.sum over the label column is no
    # signal at all (null / ANSI cast error), so compare rounds exactly
    # with an any-row-changed probe over the two checkpoint leaves.
    from pyspark.sql import types as T

    id_is_numeric = isinstance(ids.schema["id"].dataType, T.NumericType)
    prev_sum = (
        labels.agg(F.sum("label")).first()[0] if id_is_numeric else None
    )
    for _ in range(max_iterations):
        prop = (
            edges.join(labels, on=[edges["u"] == labels["id"]])
            .select(F.col("v").alias("id"), "label")
        )
        new_labels, new_guard = checkpoint_tracked(
            labels.union(prop).groupBy("id").agg(F.min("label").alias("label"))
        )
        if id_is_numeric:
            new_sum = new_labels.agg(F.sum("label")).first()[0]
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            converged = (
                new_labels.withColumnRenamed("label", "_new")
                .join(labels, on="id")
                .where(F.col("_new") != F.col("label"))
                .limit(1)
                .count()
                == 0
            )
        labels_guard.release()
        labels, labels_guard = new_labels, new_guard
        if converged:
            break

    untouched = ids.join(touched, "id", "left_anti").select(
        "id", F.col("id").alias("label")
    )
    # checkpoint the UNION so the returned plan is one leaf — everything it
    # was built from (rounds, edges, the universe cache) can then release
    final, final_guard = checkpoint_tracked(labels.union(untouched))
    labels_guard.release()
    edges_guard.release()
    ids.unpersist()
    return final, final_guard


def dedup_cluster_assignment(
    universe: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iterations: int = 30,
) -> DataFrame:
    """Collapse near-duplicate PAIRS into CLUSTERS: every id in ``universe``
    gets ``cluster_id`` = the minimum id of its connected component (its own
    id when it has no near-duplicates), plus ``cluster_size`` and an
    ``is_canonical`` flag (true on the minimum member — the row a dedup
    pipeline keeps). This is the stage after pair generation that makes pair
    output actionable: transitive closure, so A~B plus B~C dedups A,B,C
    together even though (A,C) was never emitted.

    Algorithm: min-label propagation — labels start as ids; each round every
    node takes the min of its own and its neighbors' labels, until fixpoint.
    Rounds are bounded by the cluster diameter (near-dup components are
    shallow; the 30-round cap is generous), each round is one equi-join +
    one map-side-combinable min-aggregate, and the driver loop is the
    canonical Spark iterative shape (GraphX connectedComponents does the
    same propagation). Convergence detection exploits monotonicity for
    NUMERIC ids: labels only ever DECREASE, so the label sum is strictly
    decreasing until the fixpoint — one cheap global aggregate per round;
    string ids (where a sum is no signal) fall back to an exact
    any-row-changed probe between the round's two checkpoint leaves.
    Per-round checkpoints are explicitly released;
    the final one is scoped to the returned DataFrame's lifetime (see
    :func:`_min_label_propagation`).
    """
    from lapis_silo_spark.cache import scoped_persist, scoped_rdd_release

    ids = universe.select(F.col(id_col).alias("id")).distinct()

    # Driver fast path (round 11): attach labels as coalesce(map[id], id)
    # over a broadcast of the non-identity entries — no anti-join, no
    # union, no label-table checkpoint; the distinct ids frame is the only
    # distributed input and is persisted for its two consumers (sizes agg
    # + final join).
    mapping = _cc_label_map(pairs, pair_a, pair_b)
    if mapping is not None:
        lbl = _apply_label_map(ids, "id", mapping, "cluster_id")
        lbl = lbl.persist()
        sizes = lbl.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        out = lbl.join(sizes, on="cluster_id").select(
            F.col("id"),
            F.col("cluster_id"),
            F.col("cluster_size"),
            (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
        )
        return scoped_persist(lbl, out)

    labels, guard = _min_label_propagation(
        ids, pairs, pair_a, pair_b, max_iterations, driver_edge_limit=0
    )

    # cluster_size via groupBy + join, NOT a cluster-keyed window: a
    # mega-cluster (billions of twins of one boilerplate doc — the corpus
    # this operator exists for) would make the window a single task AQE
    # cannot split, while the join's one-row-per-cluster build side is
    # skew-splittable (round-7 verdict #3; same doctrine as substring dedup).
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return scoped_rdd_release(
        labels.join(sizes, on="label").select(
            F.col("id"),
            F.col("label").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("id") == F.col("label")).alias("is_canonical"),
        ),
        guard,
    )


def minhash_dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_perms: int = 64,
    n_bands: int = 8,
    k: int = 5,
    hash_fn=None,
    max_iterations: int = 30,
    max_band_freq: int | None = DEFAULT_MAX_BAND_FREQ,
) -> DataFrame:
    """End-to-end near-duplicate CLUSTERING with O(docs) output:
    ``(id, cluster_id, cluster_size, is_canonical)`` for every input row —
    the scale-safe form of near-dup removal. :func:`minhash_lsh_pairs`'s
    banded candidate generation is correct at scale, but *materializing* the
    pair list is quadratic on twin-heavy corpora (the round-3 100× sweep:
    ~25M verified pairs, wall dominated by pair output). Fusing pair
    generation into the cluster collapse bounds the result at one row per
    document no matter how duplicate-heavy the corpus is.

    Pipeline (three fused stages, one lazy plan per stage):

    1. **Exact-twin short-circuit** — group docs by md5(normalized text);
       only each digest group's minimum id (the *representative*) proceeds.
       On a corpus where every doc has E exact twins, LSH work drops by E×
       and the quadratic twin-pair explosion never happens: twins reach the
       output via their digest, not via pairs.
    2. **Banded LSH + verification over representatives only** — the
       standard ``minhash_lsh_pairs`` plan (band-bucket join, never rows²);
       its pair output here is bounded by near-dup relations between
       *distinct* texts, the irreducible edge set.
    3. **Min-label propagation** collapses representative pairs into
       connected components (transitive closure), then every doc joins back
       through its digest: ``cluster_id`` = min doc id of the component
       (each representative is already its digest group's min id, so the
       component's min representative IS the cluster's global min id).

    ``is_canonical`` marks the one row per cluster a dedup pipeline keeps.
    Shuffle inventory: one digest agg, the banded LSH join over reps, the
    propagation rounds (rep-sized), and digest/rep/cluster-keyed hash joins
    over the full corpus (cluster sizes come from an O(reps)-side aggregate,
    never a cluster-keyed window) — all linear in docs
    except the LSH join, which is banded, rep-bounded, and shuffles ids
    only. A slice of near-identical-but-NOT-identical docs (one char of
    drift) survives the digest and can still go quadratic inside its band
    buckets — ``max_band_freq`` caps that (8.6× wall at 20k near-twins,
    BENCH_NOTES "Adversarial near-twin band skew"; recall contract in
    :func:`minhash_lsh_pairs`). Since round 6 the cap DEFAULTS to
    :data:`DEFAULT_MAX_BAND_FREQ` — this is the entry point users run at
    scale; pass ``None`` for exact LSH semantics (identical on benign
    corpora, test-pinned).

    With ``hash_fn=hash32`` (md5 family) the full output is reproducible in
    external SQL — the registered driver query's DuckDB oracle replays
    digesting, signatures, banding, verification, AND the closure
    (recursive CTE) bit-for-bit.
    """
    from lapis_silo_spark.cache import scoped_persist, scoped_rdd_release

    # digests feeds the rep aggregation AND the final doc join — persist
    # the narrow (id, digest) projection so the md5 pass over the corpus
    # runs once (round 11; the cache fills during the pair stage's probe).
    digests = df.select(
        F.col(id_col).alias("id"), F.md5(normalized(text_col)).alias("digest")
    ).persist()
    # ONE digest-keyed aggregation produces both the representative (min
    # id) and the digest-group size — the former reps/digest_sizes twin
    # groupBys shared a key but ran as two exchanges (round 11, guide §2.4).
    g = digests.groupBy("digest").agg(
        F.min("id").alias("rep_id"), F.count(F.lit(1)).alias("_n")
    )
    rep_docs = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t")
    ).join(
        g.select(F.col("rep_id").alias("id")), on="id", how="left_semi"
    )
    pairs = minhash_lsh_pairs(
        rep_docs, "id", "_t", threshold=threshold, n_perms=n_perms,
        n_bands=n_bands, k=k, hash_fn=hash_fn, max_band_freq=max_band_freq,
    )

    guard = None
    mapping = _cc_label_map(pairs, "id_a", "id_b")
    if mapping is not None:
        # labels attach as coalesce(map[rep_id], rep_id) on the O(reps)
        # aggregate directly — no propagation seed, no comp join, no
        # untouched anti-join/union (round 11)
        gl = _apply_label_map(g, "rep_id", mapping, "cluster_id")
    else:
        labels, guard = _min_label_propagation(
            g.select(F.col("rep_id").alias("id")), pairs, "id_a", "id_b",
            max_iterations, driver_edge_limit=0,
        )
        gl = g.join(
            labels.select(
                F.col("id").alias("rep_id"), F.col("label").alias("cluster_id")
            ),
            on="rep_id",
        )
    # gl is read twice (sizes agg + doc join) — persist the O(reps) table
    gl = gl.persist()

    # cluster_size = Σ digest-group sizes over the component — computed on
    # the O(reps) side and joined back, never a cluster-keyed window over
    # the full corpus (a boilerplate mega-cluster would single-task it;
    # the join's one-row-per-cluster side is AQE skew-splittable).
    sizes = gl.groupBy("cluster_id").agg(F.sum("_n").alias("cluster_size"))
    out = (
        digests.join(gl.select("digest", "cluster_id"), on="digest")
        .join(sizes, on="cluster_id")
        .select(
            "id",
            "cluster_id",
            "cluster_size",
            (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
        )
    )
    out = scoped_persist(gl, scoped_persist(digests, out))
    if guard is not None:
        out = scoped_rdd_release(out, guard)
    return out


def embedding_dedup_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    method: str = "blocked",
    block_rows: int = 8192,
    n_blocks: int | None = None,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    max_iterations: int = 30,
    allow_quadratic: bool = False,
) -> DataFrame:
    """End-to-end embedding near-dup CLUSTERING with O(docs) output —
    the :func:`minhash_dedup_clusters` treatment for the embedding family
    (round-5 VERDICT #3): the sf1 sweep showed the two pair-emitters
    (``lsh_candidate_pairs``, ``embedding_near_dup_pairs_blocked``) scale
    superlinearly purely through pair OUTPUT volume (near-dup clusters make
    pair counts grow ~quadratically in cluster density); fusing pair
    generation into the component collapse bounds the result at one
    ``(id, cluster_id, cluster_size, is_canonical)`` row per document.

    Pipeline (three fused stages):

    1. **Identical-vector short-circuit** — group rows by the vector value
       itself (an equality key, so no float-digest tricks); only each
       group's minimum id proceeds. Exact-duplicate embeddings (re-crawled
       or re-encoded docs) never reach pair generation — the embedding
       analog of the minhash digest stage. Zero-norm vectors are excluded
       from grouping (cosine with them is NaN, so the pair stage would
       never merge them; grouping them would over-merge vs the pair
       semantics) and pass through as their own representatives.
    2. **Distributed pair generation over representatives only** —
       ``method="blocked"`` (:func:`embedding_near_dup_pairs_blocked`,
       exact, one BLAS matmul per block pair) or ``method="lsh"``
       (:func:`~lapis_silo_spark.functions.similarity.lsh_candidate_pairs`,
       the sublinear-candidates path). The pair list exists only inside
       this plan, never as output.
    3. **Min-label propagation** collapses representative pairs into
       connected components; every row joins back through its vector
       group. ``cluster_id`` = min id of the component (representatives
       are their group minima, so the component's min representative IS
       the cluster's global min id).

    Shuffle inventory: one vec-keyed agg + one vec-keyed join (vector-wide,
    same width the pair stage already shuffles), pair generation bounded
    by distinct vectors, rep-sized propagation rounds, and rep/cluster-keyed
    joins over the full corpus (cluster sizes from an O(reps)-side
    aggregate, never a cluster-keyed window) — all O(docs) except the pair
    stage, whose OUTPUT no longer leaves the plan.
    """
    from lapis_silo_spark.cache import scoped_rdd_release
    from lapis_silo_spark.functions.similarity import lsh_candidate_pairs

    base = _spread(
        df,
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    # coalesce: a null vector (or one containing a null element) aggregates
    # to a null sum — treat it like zero-norm so the row passes through as
    # its own singleton representative instead of silently vanishing from
    # both filter branches (the contract is one output row per input row).
    # NaN sums are degenerate too, and must be excluded EXPLICITLY: Spark
    # sorts NaN above every double, so `NaN > 0` is TRUE — without the
    # isnan() a NaN-element vector would enter the groupBy('vec')
    # short-circuit (Spark treats NaN = NaN as equal) and the LSH pair
    # stage, whose NaN cosine passes `>= threshold` and over-merges.
    sq = F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x)
    with_nz = base.withColumn(
        "_nz",
        F.coalesce((sq > F.lit(0.0)) & ~F.isnan(sq), F.lit(False)),
    )
    nz = with_nz.filter(F.col("_nz"))
    reps_nz = nz.groupBy("vec").agg(F.min("id").alias("rep_id"))
    rep_map = (
        nz.join(reps_nz, on="vec")
        .select("id", "rep_id")
        .unionAll(
            with_nz.filter(~F.col("_nz")).select(
                "id", F.col("id").alias("rep_id")
            )
        )
    )
    rep_ids = rep_map.select(F.col("rep_id").alias("id")).distinct()
    # pair generation sees NON-degenerate representatives only: a zero-norm
    # or null vector can never clear a cosine threshold, and the numpy pair
    # paths assume dense float arrays — degenerate ids still join the
    # propagation universe (rep_ids) and come out as singleton clusters
    rep_docs = base.join(
        reps_nz.select(F.col("rep_id").alias("id")), on="id", how="left_semi"
    )

    if method == "blocked":
        # the blocked path reads rep_docs twice — the n_blocks-sizing count
        # and the replicated pair stage — and its lineage is the vector-wide
        # groupBy + semi-join; persist so the dedup agg runs once (round 11;
        # O(distinct vectors) rows, same footprint the pair stage already
        # holds). Guard scoped to the result with rep_map's below.
        rep_docs = rep_docs.persist()
        pairs = embedding_near_dup_pairs_blocked(
            rep_docs, "id", "vec", threshold=threshold,
            block_rows=block_rows, n_blocks=n_blocks,
            allow_quadratic=allow_quadratic,
        )
    elif method == "lsh":
        pairs = lsh_candidate_pairs(
            rep_docs, "id", "vec", threshold=threshold,
            n_planes=n_planes, n_tables=n_tables, dim=dim,
        )
    else:
        raise ValueError(f"unknown method {method!r}; use 'blocked' or 'lsh'")

    guard = None
    mapping = _cc_label_map(pairs.select("id_a", "id_b"), "id_a", "id_b")
    if mapping is not None:
        # labels attach as coalesce(map[rep_id], rep_id) directly on the
        # narrow (id, rep_id) table — no rep_ids distinct seed, no comp
        # join, no untouched anti-join/union (round 11)
        rml = _apply_label_map(rep_map, "rep_id", mapping, "cluster_id")
    else:
        rep_ids = rep_map.select(F.col("rep_id").alias("id")).distinct()
        labels, guard = _min_label_propagation(
            rep_ids, pairs.select("id_a", "id_b"), "id_a", "id_b",
            max_iterations, driver_edge_limit=0,
        )
        rml = rep_map.join(
            labels.select(
                F.col("id").alias("rep_id"), F.col("label").alias("cluster_id")
            ),
            on="rep_id",
        )
    # rml is read twice (sizes agg + final join) and its lineage is the
    # vector-wide groupBy + join — persist the narrow labeled table so the
    # wide agg runs once
    rml = rml.persist()

    # cluster_size = one cluster-keyed COUNT over the labeled rows — the
    # partial (map-side) aggregation makes this skew-safe even for a
    # boilerplate mega-cluster (count is combinable), unlike a
    # cluster-keyed window, which would single-task it (round-7 doctrine).
    sizes = rml.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    out = rml.join(sizes, on="cluster_id")
    result = out.select(
        "id",
        "cluster_id",
        "cluster_size",
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    )
    if guard is not None:
        result = scoped_rdd_release(result, guard)
    result = scoped_persist(rml, result)
    if rep_docs.is_cached:
        result = scoped_persist(rep_docs, result)
    return result


# ---------------------------------------------------------------------------
# Substring-level (span) deduplication
# ---------------------------------------------------------------------------

def _gram_dup_occurrences(
    docs: DataFrame, id_col: str, text_col: str, k: int, skew_safe: bool = True
) -> DataFrame:
    """(id, pos, end): every word-``k``-gram occurrence that is NOT the
    corpus-wide canonical (lexicographically-min ``(id, pos)``) occurrence
    of its gram. Positions are 1-based; ``end = pos + k - 1``.

    The inverted-index shape: the occurrence table is O(total tokens) and
    shuffles NARROW — ``(id, pos, md5)`` only, never the text.

    Canonical selection has two equivalent physical forms, chosen by
    ``skew_safe``:

    - ``True`` (default, the 100 TB path): min-struct aggregate per gram +
      join back. The min combines MAP-SIDE, and the 1:N join is
      AQE-skew-splittable — a boilerplate gram occurring in millions of
      documents (the COMMON hot case in web corpora, not an adversarial
      one) spreads across split partitions. Costs a second compute of the
      gram table (the partial-agg exchange differs from the join exchange,
      so Catalyst cannot reuse it).
    - ``False``: one row_number window over the gram key — a single pass
      and ~1.6× faster at bench scale, but a hot gram's whole group must
      sort inside ONE task (windows are not skew-splittable), so reserve
      it for corpora known to be boilerplate-free.
    """
    occ = _gram_occurrences_arrow(docs, id_col, text_col, k)
    return _non_canonical_occurrences(occ, k, skew_safe)


def _gram_occurrences_expr(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Expression-path word-gram occurrence table ``(id, pos, gh)`` —
    retained as the semantics reference the Arrow producer is test-pinned
    against (``tests/test_substring_dedup.py``).

    NOT the default production path (round 11): Catalyst collapses the
    ``_t`` projection through the Generate, so ``split(lower(regexp_
    replace(trim(text))))`` re-evaluates PER EXPLODED ROW — O(len) text
    work × O(len) positions = O(len²) per document (the formatted plan
    shows the full split chain inside the post-Generate Filter AND
    Project). Measured 3.8-4.1 s noop wall at sf0.1 vs 0.5-0.7 s for the
    Arrow pass, identical output multiset.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.when(
                n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        toks.alias("_t"),
    ).select(
        "id",
        "pos",
        # 16-byte binary key (not the 32-char hex string): the gram key is
        # internal to this plan, and halving+ the shuffled key width measures
        # 1.7x faster on the span stage at sf0.1 with identical output
        F.unhex(
            F.md5(F.array_join(F.slice(F.col("_t"), F.col("pos"), k), " "))
        ).alias("gh"),
    )


def _gram_occurrences_arrow(
    docs: DataFrame, id_col: str, text_col: str, k: int,
    char_level: bool = False,
) -> DataFrame:
    """Arrow-batched gram-occurrence production ``(id, pos, gh)`` for the
    substring-span family — one zero-shuffle ``mapInPandas`` pass per input
    partition (guide §4), bit-identical to the expression path and ~5×
    faster (round 11).

    Word mode replicates ``tokens()`` exactly as the minhash Arrow pass
    does (ASCII-space-only ``trim``, Java ``\\s`` = ``[ \\t\\n\\x0b\\f\\r]``
    collapse, lowercase, single-space split — multibyte parity pinned by
    the sig-path tests); gram = ``md5(' '.join(tokens[p:p+k]))``, emitted
    for 1-based positions 1..n_tokens-k+1. Char mode hashes raw-text
    slices ``md5(text[p:p+k])`` (no normalization — same as the expression
    twin; Python slicing and Spark ``substr`` both count code points).
    NULL text and texts with fewer than ``k`` tokens/chars emit no rows,
    matching the expression path's ``when(n >= k, sequence(..))`` guard.
    """
    import pandas as pd
    from pyspark.sql import types as T

    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("pos", T.IntegerType()),
            T.StructField("gh", T.BinaryType()),
        ]
    )
    base = _spread(
        docs, F.col(id_col).alias("id"), F.col(text_col).alias("_txt")
    )
    kk, char_mode = k, char_level

    def gen(it):
        import hashlib
        import re

        ws = re.compile(r"[\t\n\x0b\f\r ]+")
        md5 = hashlib.md5
        for pdf in it:
            ids, poss, ghs = [], [], []
            for i, txt in zip(pdf["id"], pdf["_txt"]):
                if txt is None:
                    continue
                if char_mode:
                    m = len(txt) - (kk - 1)
                    enc = txt.encode("utf-8")
                    if len(enc) == len(txt):
                        # pure-ASCII fast path: byte offsets == char offsets
                        for p in range(m):
                            ids.append(i)
                            poss.append(p + 1)
                            ghs.append(md5(enc[p: p + kk]).digest())
                    else:
                        for p in range(m):
                            ids.append(i)
                            poss.append(p + 1)
                            ghs.append(
                                md5(txt[p: p + kk].encode("utf-8")).digest()
                            )
                else:
                    t = ws.sub(" ", txt.strip(" ")).lower()
                    tk = t.split(" ")
                    m = len(tk) - (kk - 1)
                    for p in range(m):
                        ids.append(i)
                        poss.append(p + 1)
                        ghs.append(
                            md5(" ".join(tk[p: p + kk]).encode("utf-8"))
                            .digest()
                        )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "pos": pd.Series(poss, dtype="int32"),
                    "gh": ghs,
                }
            )

    return base.mapInPandas(gen, out_schema)


def _non_canonical_occurrences(
    occ: DataFrame, k: int, skew_safe: bool,
    prefilter_hot_prefix: bool = False,
) -> DataFrame:
    """Shared back half of the span machinery: from ``(id, pos, gh)`` gram
    occurrences, every occurrence that is NOT its gram's corpus-wide
    canonical (lexicographically-min ``(id, pos)``) one, as
    ``(id, pos, end)``. See :func:`_gram_dup_occurrences` for the
    ``skew_safe`` physical-form tradeoff.

    INVARIANT (round-11 ADVICE): ``id`` and ``pos`` must be non-null —
    every in-tree producer guarantees it (Generate/mapInPandas emit rows
    only for real positions of non-null texts). The decimal packed-key
    branch and the struct-min branch diverge on nulls (a null id yields a
    null ``_k`` which ``min`` ignores and the ``_k != c`` filter drops,
    whereas ``struct(null, pos)`` participates in struct ordering), so a
    null-emitting producer must not be routed here without adding an
    explicit isNotNull filter to pin one behavior.

    ``prefilter_hot_prefix`` (round 12, char-gram path): on an O(chars)
    occurrence table nearly every gram is a singleton (sf0.1: 1.18M
    distinct of 1.24M occurrences, 55K duplicated), so the canonical
    aggregate's hash table — 16-byte binary keys + a decimal min — is
    sized by the corpus while its useful output is the tiny duplicated
    tail. A first count-only aggregate on a 60-bit gram-hash PREFIX (a
    plain long: narrower exchange rows, cheaper hash table) finds
    may-be-duplicated prefixes, and only occurrences of those reach the
    full-key aggregate. EXACT by construction: a gram with >= 2
    occurrences always has prefix count >= 2 (superset), and the full
    aggregate re-checks ``count >= 2`` on the true 16-byte key, so a
    prefix-collision singleton is dropped exactly as before (equivalence
    test-pinned; measured 2.44 -> 2.02 s noop at sf0.1 with identical
    output). The price is two extra occurrence-map passes (the count agg
    and the semi-join probe recompute the explode+md5 map) — the right
    trade where the map is a cheap codegen'd scan but the wide-state
    aggregate dominates, which is the char family's measured shape; the
    word form keeps the single aggregate."""
    if prefilter_hot_prefix and skew_safe:
        # 15 hex chars = 60 bits keeps conv() inside a signed long
        gh8 = F.conv(
            F.substring(F.hex(F.col("gh")), 1, 15), 16, 10
        ).cast("long")
        hot8 = (
            occ.select(gh8.alias("_g8"))
            .groupBy("_g8")
            .agg(F.count(F.lit(1)).alias("_n8"))
            .where(F.col("_n8") >= 2)
            .select("_g8")
        )
        # inner join == semi-join here (hot8 is a distinct-key aggregate);
        # broadcast-vs-shuffle is left to the planner so an adversarially
        # duplicate-heavy corpus degrades to a shuffled join, never an OOM
        occ = occ.withColumn("_g8", gh8).join(hot8, "_g8").drop("_g8")
    if skew_safe:
        # Keep only grams with >= 2 occurrences on the build side (round
        # 11): a singleton gram's one occurrence IS its canonical, so the
        # post-join filter dropped it anyway — filtering the aggregate
        # first is value-identical and shrinks the join's build/broadcast
        # side from O(distinct grams) to O(duplicated grams). The count
        # combines map-side with the same min partial.
        from pyspark.sql import types as T

        id_dt = occ.schema["id"].dataType
        integral = isinstance(
            id_dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        )
        if integral:
            # HASH-aggregable canonical pick (round 11, guide §2): MIN over
            # a STRUCT forces SortAggregate (struct ordering has no hash-agg
            # support — measured as the dominant stage of the char-span
            # rows); packing (id, pos) into ONE decimal(38,0) as
            # id * 2^32 + pos preserves lexicographic order exactly for any
            # signed 64-bit id (pos ∈ [1, 2^31) is always below the 2^32
            # stride) and min(decimal) hash-aggregates.
            key = (
                F.col("id").cast("decimal(20,0)")
                * F.lit(4294967296).cast("decimal(20,0)")
                + F.col("pos").cast("decimal(20,0)")
            ).cast("decimal(38,0)")
            keyed = occ.withColumn("_k", key)
            canon = (
                keyed.groupBy("gh")
                .agg(F.min("_k").alias("c"), F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") >= 2)
                .select("gh", "c")
            )
            dups = keyed.join(canon, "gh").where(F.col("_k") != F.col("c"))
        else:
            canon = (
                occ.groupBy("gh")
                .agg(
                    F.min(F.struct("id", "pos")).alias("c"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .where(F.col("_n") >= 2)
                .select("gh", "c")
            )
            dups = occ.join(canon, "gh").where(
                (F.col("id") != F.col("c.id"))
                | (F.col("pos") != F.col("c.pos"))
            )
    else:
        w = Window.partitionBy("gh").orderBy("id", "pos")
        dups = occ.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") > 1
        )
    return dups.select("id", "pos", (F.col("pos") + F.lit(k - 1)).alias("end"))


def _char_gram_dup_occurrences(
    docs: DataFrame, id_col: str, text_col: str, k: int,
    skew_safe: bool = True,
) -> DataFrame:
    """Character-level twin of :func:`_gram_dup_occurrences`: ``(id, pos,
    end)`` for every character-``k``-gram occurrence that is not its gram's
    canonical occurrence. Positions are 1-based CHARACTER offsets into the
    raw text (no tokenization/normalization — char-level dedup exists
    precisely to catch duplication word tokenization splits: code, CJK,
    concatenated boilerplate; Lee et al.'s suffix-array dedup operates on
    raw bytes the same way).

    Cost note vs the word form: the occurrence table is O(chars) rows (one
    per character), ~5× the word form's O(tokens) — the inherent price of
    character resolution; everything shuffled is still ``(id, pos,
    16-byte gh)``, never the text.
    """
    # Expression path, NOT the Arrow producer (round-11 A/B at sf1): char
    # occurrence volume is O(chars) — ~8x the word form — and at that
    # volume the Python-boundary serialization of the (id, pos, gh) table
    # dominates: full-query sf1 wall 16.7 s (expr, stable) vs 24-114 s
    # (Arrow, GC/memory-pressure swings). The expr path's per-row text
    # carry is a memcpy, not the word form's per-row split re-evaluation,
    # so the O(len^2) collapse that justified Arrow for word grams does
    # not bite here. At sf0.1 the two are within ~0.6 s of each other.
    occ = _char_gram_occurrences_expr(docs, id_col, text_col, k)
    return _non_canonical_occurrences(
        occ, k, skew_safe, prefilter_hot_prefix=True
    )


def _char_gram_occurrences_expr(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Expression-path char-gram occurrence table — the semantics reference
    for the Arrow producer (see :func:`_gram_occurrences_expr`: the carried
    ``_s`` text column is copied into every exploded row's UnsafeRow, an
    O(len²) bytes-materialized cost the Arrow pass avoids)."""
    t = F.col(text_col)
    n = F.length(t)
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.when(
                n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        t.alias("_s"),
    ).select(
        "id",
        "pos",
        F.unhex(F.md5(F.col("_s").substr(F.col("pos"), F.lit(k)))).alias("gh"),
    )


def _merged_spans(dups: DataFrame) -> DataFrame:
    """Merge overlapping/adjacent ``(id, pos, end)`` intervals into maximal
    spans ``(id, island, s, e)`` — the gaps-and-islands running-max window
    shared by the word- and char-level span paths."""
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dups.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w))
    return flagged.groupBy("id", "island").agg(
        F.min("pos").alias("s"), F.max("end").alias("e")
    )


def duplicate_spans(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8,
    skew_safe: bool = True,
) -> DataFrame:
    """Exact substring-level dedup statistics (Lee et al. 2022 semantics,
    re-expressed relationally): a token position is *duplicated* when it is
    covered by a word ``k``-gram whose exact text occurs elsewhere in the
    corpus at an earlier ``(id, pos)``; overlapping/adjacent duplicated
    windows merge into maximal spans. Returns per document
    ``(id, n_tokens, dup_tokens, n_spans, dup_fraction)`` — the signal a
    curation pipeline thresholds on before cutting the spans out
    (see :func:`remove_duplicate_spans`).

    Scale shape: one gram-keyed aggregation (canonical occurrence per
    distinct gram, map-side combinable min), one narrow join back, one
    per-doc window for the interval merge (gaps-and-islands — running max
    of span ends), and a per-doc count join. Shuffle volume is O(tokens)
    ids+ints; nothing quadratic, no text movement after the scan.
    """
    dups = _gram_dup_occurrences(docs, id_col, text_col, k, skew_safe)
    spans = _merged_spans(dups)
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
    )
    base = docs.select(
        F.col(id_col).alias("id"), F.size(tokens(text_col)).cast("long").alias("n_tokens")
    )
    return base.join(per_doc, "id", "left").select(
        "id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_fraction"),
    )


def remove_duplicate_spans(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8,
    skew_safe: bool = True,
) -> DataFrame:
    """Cut every duplicated span (as defined by :func:`duplicate_spans`) out
    of each document, keeping only the corpus-wide canonical occurrence of
    each repeated ``k``-gram. Returns ``(id, clean_tokens, clean_text)``.

    Scale shape: the covered-position table is O(duplicated tokens) ints;
    kept tokens re-assemble with a per-doc sort_array over collected
    ``(pos, token)`` structs — one shuffle keyed on the doc id, bounded by
    document length, no pairwise work.
    """
    dups = _gram_dup_occurrences(docs, id_col, text_col, k, skew_safe)
    covered = dups.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("end"))).alias("pos")
    ).dropDuplicates(["id", "pos"])
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos0", "tok"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tok.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("clean_tokens"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("clean_tokens", F.lit(0)).alias("clean_tokens"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def duplicate_char_spans(
    docs: DataFrame, id_col: str, text_col: str, k: int = 50,
    skew_safe: bool = True,
) -> DataFrame:
    """CHARACTER-level substring-dedup statistics (round-5 VERDICT #6):
    a character position is duplicated when covered by a char-``k``-gram
    whose exact text occurs elsewhere at an earlier ``(id, pos)``;
    overlapping/adjacent windows merge into maximal spans. ``k=50`` is
    Lee et al.'s suffix-array length threshold — any duplicated substring
    of ≥ k chars is covered by at least one duplicated k-gram, so merged
    spans ARE the ≥-k-char duplicated regions. Catches duplication word
    tokenization splits (code, CJK, concatenated boilerplate — the word
    form sees "x;}\\nfoo" as one token and misses the repeat inside).

    Returns ``(id, n_chars, dup_chars, n_spans, dup_fraction)``. Scale
    shape identical to :func:`duplicate_spans` with O(chars) occurrence
    rows instead of O(tokens); same ``skew_safe`` tradeoff.
    """
    dups = _char_gram_dup_occurrences(docs, id_col, text_col, k, skew_safe)
    spans = _merged_spans(dups)
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_chars"),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    return base.join(per_doc, "id", "left").select(
        "id",
        "n_chars",
        F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        # try_divide: empty documents have n_chars = 0 (the word form's
        # split('') yields one empty token, so only the char form can hit
        # a zero denominator under ANSI mode); define their fraction as 0
        F.coalesce(
            F.round(
                F.try_divide(F.coalesce("dup_chars", F.lit(0)), F.col("n_chars")),
                6,
            ),
            F.lit(0.0),
        ).alias("dup_fraction"),
    )


def remove_duplicate_char_spans(
    docs: DataFrame, id_col: str, text_col: str, k: int = 50,
    skew_safe: bool = True,
) -> DataFrame:
    """Cut every duplicated ≥-``k``-char span (per
    :func:`duplicate_char_spans`) out of each document, keeping the
    corpus-wide canonical occurrence. Returns
    ``(id, clean_chars, clean_text)``.

    Scale shape: unlike the word form (which re-assembles from kept
    tokens), the char form STITCHES — the merged spans per doc (a short
    sorted list) collect into one array and a single ``F.aggregate`` walks
    it, concatenating the text between spans. One doc-keyed shuffle of
    span structs; the text itself never shuffles (it rides the docs scan).
    """
    dups = _char_gram_dup_occurrences(docs, id_col, text_col, k, skew_safe)
    spans = _merged_spans(dups)
    per_doc = spans.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("sp")
    )
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_s")
    )
    joined = base.join(per_doc, "id", "left")
    empty = F.array().cast("array<struct<s:int,e:int>>")
    clean = F.aggregate(
        F.coalesce(F.col("sp"), empty),
        F.struct(F.lit(0).alias("prev"), F.lit("").alias("txt")),
        lambda a, sp: F.struct(
            sp["e"].alias("prev"),
            F.concat(
                a["txt"],
                F.col("_s").substr(
                    a["prev"] + F.lit(1), sp["s"] - a["prev"] - F.lit(1)
                ),
            ).alias("txt"),
        ),
        lambda a: F.concat(
            a["txt"],
            F.col("_s").substr(
                a["prev"] + F.lit(1), F.length("_s") - a["prev"]
            ),
        ),
    )
    # coalesce: null text stitches to null — normalize to the word twin's
    # ('' / 0) contract so the two forms stay interchangeable
    return joined.select(
        "id",
        F.coalesce(F.length(clean).cast("long"), F.lit(0)).alias(
            "clean_chars"
        ),
        F.coalesce(clean, F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Line-level corpus dedup (CCNet / RefinedWeb style)
# ---------------------------------------------------------------------------

def _line_array(
    docs: DataFrame,
    id_col: str,
    *,
    text_col: str | None,
    lines_col: str | None,
    line_sep: str,
    normalize: bool,
):
    """``(id, _arr)`` with the document's lines as an array — either a
    caller-provided ``array<string>`` column (pre-segmented corpora) or a
    literal split of ``text_col`` on ``line_sep``. ``normalize`` keys each
    line on its lowercased/whitespace-collapsed form for the dedup decision
    while the OUTPUT keeps the raw line text."""
    from lapis_silo_spark.functions.text import normalized

    if (lines_col is None) == (text_col is None):
        raise ValueError("exactly one of text_col / lines_col is required")
    if lines_col is not None:
        # null line arrays normalize to a single empty line — the same
        # contract null text gets below, so n_lines is never null/-1.
        # Null ELEMENTS normalize to '' as well: md5(null) would never
        # equi-join the stats table and array_join silently skips nulls,
        # so a null line would vanish from clean_text without being
        # counted in n_dropped — corrupting the yield accounting.
        arr = F.transform(
            F.coalesce(
                F.col(lines_col), F.array(F.lit("")).cast("array<string>")
            ),
            lambda x: F.coalesce(x, F.lit("")),
        )
    else:
        # split() takes a regex — \Q...\E-quote the separator so '\n' stays
        # the common case but '|' or '. ' callers aren't surprised;
        # null text normalizes to '' (one empty line), mirroring the
        # ('' / 0) contract of the substring-span operators
        arr = F.split(
            F.coalesce(F.col(text_col), F.lit("")),
            "\\Q" + line_sep + "\\E",
            -1,
        )
    out = docs.select(F.col(id_col).alias("id"), arr.alias("_arr"))
    key = (lambda c: normalized(c)) if normalize else (lambda c: c)
    return out, key


def _line_occurrences(lines: DataFrame, key) -> DataFrame:
    """Explode ``(id, _arr)`` to ``(id, pos, lh)`` — 1-based line position
    plus the 16-byte digest of the line's dedup key. Only (id, pos, 16-byte
    lh) is ever shuffled; line text stays with its document."""
    return lines.select(
        "id", F.posexplode("_arr").alias("p0", "_line")
    ).select(
        "id",
        (F.col("p0") + F.lit(1)).alias("pos"),
        F.unhex(F.md5(key(F.col("_line")))).alias("lh"),
    )


def duplicate_line_report(
    docs: DataFrame,
    id_col: str,
    *,
    text_col: str | None = None,
    lines_col: str | None = None,
    line_sep: str = "\n",
    min_docs: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """Corpus-wide duplicated-line report: every line (by dedup key) present
    in at least ``min_docs`` distinct documents, with document and occurrence
    counts — the boilerplate detector of CCNet/RefinedWeb-style line dedup
    (headers, footers, cookie banners are exactly the lines that repeat
    across many pages).

    Returns ``(line, n_docs, n_occurrences)``.

    Scale shape: same two-stage agg as :func:`duplicate_passages` — stage 1
    keys on ``(line_key, id)`` so map-side combine collapses within-document
    repeats before the shuffle; stage 2 re-keys on the line alone over one
    row per (line, doc). The reference engine has no text surface (SURVEY
    §2.5); this is LLM-pipeline surface.
    """
    lines, key = _line_array(
        docs, id_col, text_col=text_col, lines_col=lines_col,
        line_sep=line_sep, normalize=normalize,
    )
    occ = lines.select(
        "id", F.explode("_arr").alias("_line")
    ).select("id", key(F.col("_line")).alias("line"))
    per_doc = occ.groupBy("line", "id").agg(F.count(F.lit(1)).alias("occ"))
    return (
        per_doc.groupBy("line")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("occ").cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_lines(
    docs: DataFrame,
    id_col: str,
    *,
    text_col: str | None = None,
    lines_col: str | None = None,
    line_sep: str = "\n",
    min_count: int = 2,
    keep_first: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Line-level exact dedup across the corpus: every line whose dedup key
    occurs at least ``min_count`` times (corpus-wide, within- or across-doc)
    is dropped from every document except — when ``keep_first`` — its
    canonical (lexicographically-min ``(id, pos)``) occurrence. The CCNet /
    RefinedWeb line-dedup pass, as an engine operator.

    Returns ``(id, n_lines, n_dropped, clean_text)`` with ``clean_text`` the
    surviving lines re-joined by ``line_sep``.

    Scale shape: the shuffle is ``(id, pos, 16-byte digest)`` occurrence rows
    — O(lines), never text; the canonical pick is a map-side-combinable
    min-struct agg (the same skew-safe form as the substring-span machinery,
    so a line duplicated across millions of pages cannot single-task a
    window sort); the drop-list joins back per document as a short positions
    array and the text is filtered IN PLACE (``F.filter`` over the original
    split — the document body never shuffles).
    """
    lines, key = _line_array(
        docs, id_col, text_col=text_col, lines_col=lines_col,
        line_sep=line_sep, normalize=normalize,
    )
    occ = _line_occurrences(lines, key)
    stats = occ.groupBy("lh").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("id", "pos")).alias("c"),
    )
    drops = occ.join(stats, "lh").where(F.col("n_occ") >= min_count)
    if keep_first:
        drops = drops.where(
            (F.col("id") != F.col("c.id")) | (F.col("pos") != F.col("c.pos"))
        )
    per_doc = drops.groupBy("id").agg(
        F.collect_list("pos").alias("_drops")
    )
    joined = lines.join(per_doc, "id", "left")
    empty = F.array().cast("array<bigint>")
    dropset = F.coalesce(F.col("_drops").cast("array<bigint>"), empty)
    kept = F.filter(
        "_arr",
        lambda x, i: ~F.array_contains(dropset, (i + F.lit(1)).cast("bigint")),
    )
    return joined.select(
        "id",
        F.size("_arr").cast("bigint").alias("n_lines"),
        F.size(dropset).cast("bigint").alias("n_dropped"),
        F.array_join(kept, line_sep).alias("clean_text"),
    )
