"""Streaming ingest + windowed aggregation (Spark-first superset).

``stream_ingest_files`` tails a directory of NDJSON files with
``spark.readStream`` and lands every micro-batch as a NEW data version via
``foreachBatch`` — the streaming generalization of the reference's
batch-append lifecycle (each micro-batch is all-or-nothing, the ``latest``
pointer swap is atomic, failed batches leave the store untouched, and the
checkpoint makes delivery exactly-once across restarts).

``windowed_counts`` is the canonical watermarked tumbling-window count over
an event stream — the structured-streaming analog of the reference's
``groupBy({count := count()})`` for data that never stops arriving.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.functions.dedup import DEFAULT_MAX_BAND_FREQ
from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records
from lapis_silo_spark.storage import append_version, load_version
from lapis_silo_spark.session import local_relation


def stream_append(
    spark: SparkSession,
    root: str,
    config: TableConfig,
    batch_df: DataFrame,
    batch_id: int | None = None,
) -> str:
    """Land one (micro-)batch of raw records as a new data version. The
    ``batch_id`` is recorded in the version manifest so re-delivered batches
    can be detected (see ``stream_ingest_files``)."""
    db = load_version(spark, root)
    main, store = ingest_records(spark, batch_df, config)
    has_seqs = bool(config.nuc_sequences or config.aa_sequences)
    extra = {"stream_batch_id": batch_id} if batch_id is not None else None
    return append_version(
        db, root, config.name, main, store if has_seqs else None,
        extra_manifest=extra,
    )


def stream_ingest_files(
    spark: SparkSession,
    input_dir: str,
    config: TableConfig,
    root: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    on_version: Callable[[str], None] | None = None,
) -> StreamingQuery:
    """Continuously ingest NDJSON files appearing under ``input_dir``.

    Each micro-batch flows through the SAME ingest path as batch append
    (sequence diffing, side tables, duplicate-PK validation) and commits a
    new version directory. foreachBatch is at-least-once, so commits are
    made IDEMPOTENT: the batch id is written into the version manifest
    (atomically with the pointer swap), and a re-delivered batch whose id
    already appears in the latest manifest is skipped — together with the
    streaming checkpoint this yields exactly-once version commits across
    crash/restart.
    """
    from lapis_silo_spark.storage import read_manifest

    stream = spark.readStream.schema(config.spark_schema()).json(input_dir)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            if read_manifest(root).get("stream_batch_id") == batch_id:
                return  # re-delivered after a crash past the commit point
        except FileNotFoundError:
            pass
        version = stream_append(spark, root, config, batch_df, batch_id)
        if on_version is not None:
            on_version(version)

    writer = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts; works on static AND streaming
    DataFrames (the declarative plan is identical — Spark picks the
    incremental execution when the source is a stream).

    Late rows beyond ``watermark`` are dropped; state for closed windows is
    evicted, so the aggregation runs unbounded streams in bounded memory.
    """
    grouped = events.withWatermark(time_col, watermark).groupBy(
        F.window(F.col(time_col), window).alias("win"),
        *(keys or []),
    )
    return grouped.agg(F.count(F.lit(1)).alias("count")).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *(keys or []),
        "count",
    )


def _band_state_paths(bands_root: str) -> list[str]:
    """Current band-state parquet dirs: the manifest's compacted dir (if
    any) plus every ``batch=<id>`` dir. Folded-but-not-yet-cleaned batch
    dirs may appear alongside the compact that contains them — duplicate
    state rows are harmless (candidate generation is distinct-deduped), so
    every crash point of the compaction protocol reads consistently."""
    import json
    import os

    paths = []
    manifest = os.path.join(bands_root, "MANIFEST.json")
    if os.path.isfile(manifest):
        with open(manifest) as fh:
            compact = json.load(fh)["compact"]
        paths.append(os.path.join(bands_root, compact))
    if os.path.isdir(bands_root):
        paths.extend(
            os.path.join(bands_root, d)
            for d in sorted(os.listdir(bands_root))
            if d.startswith("batch=")
        )
    return paths


def _compact_band_state(spark: SparkSession, bands_root: str,
                        batch_id: int) -> None:
    """Fold the compacted dir + all batch dirs into one new compacted dir.

    Crash-safe by manifest pointer swap (the ``stream_ingest_files``
    manifest device): (1) write ``compact_v<id>`` containing the full
    deduplicated union, (2) atomically replace ``MANIFEST.json`` to point
    at it, (3) best-effort delete of the folded batch dirs and superseded
    compact dirs. A crash before (2) leaves the old state authoritative; a
    crash before (3) leaves duplicate rows, which the reader tolerates.
    """
    import json
    import os
    import shutil

    paths = _band_state_paths(bands_root)
    if not paths:
        return
    new_name = f"compact_v{batch_id}"
    folded = [p for p in paths if os.path.basename(p) != new_name]
    state = spark.read.parquet(*folded).dropDuplicates(
        ["id", "band", "band_hash"]
    )
    state.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(bands_root, new_name)
    )
    manifest = os.path.join(bands_root, "MANIFEST.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"compact": new_name,
                   "folded": [os.path.basename(p) for p in folded]}, fh)
    os.replace(tmp, manifest)  # the atomic commit point
    for p in folded:
        shutil.rmtree(p, ignore_errors=True)


def near_dup_classify_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    batch_id: int = 0,
    threshold: float = 0.8,
    n_perms: int = 64,
    n_bands: int = 8,
    k: int = 5,
    hash_fn=None,
    max_band_freq: int | None = DEFAULT_MAX_BAND_FREQ,
    compact_every: int = 16,
) -> DataFrame:
    """The production append-mode NEAR-dup loop, one micro-batch at a time
    (pair with ``foreachBatch``): classify the batch against the persisted
    band state (``functions.dedup.incremental_minhash_dedup``), then append
    the KEPT documents' bands+signatures to the state so later batches
    dedup against them. Returns the batch's ``(id, status)`` verdicts.

    State layout: ``<state_dir>/bands/`` holds one Parquet dir per recent
    batch (``batch=<id>``, written with overwrite so an at-least-once
    re-delivery of the same ``batch_id`` is IDEMPOTENT) plus a compacted
    dir tracked by ``MANIFEST.json``. Every ``compact_every`` batches the
    loop folds all state into a fresh compacted dir (manifest pointer
    swap, crash-safe — see :func:`_compact_band_state`), so the state
    file count is BOUNDED over an unbounded stream instead of growing one
    dir per micro-batch. Only kept (distinct-content-canonical) docs
    contribute, so state size grows with distinct content, not stream
    volume. The cross-batch alternative
    (``stateful.streaming_minhash_pairs``) emits pairs from in-operator
    state; this helper is the per-document *status* form, which needs the
    union of a doc's band buckets and therefore lives in foreachBatch
    rather than a single keyed stateful operator.
    """
    import os

    from lapis_silo_spark.functions.dedup import (
        incremental_minhash_dedup,
        minhash_band_state,
    )

    bands_root = os.path.join(state_dir, "bands")
    # explicit first-batch detection: an empty/missing state dir means cold
    # start; a genuine read error on existing state must PROPAGATE, not
    # silently classify the batch against an empty base (round-5 ADVICE)
    state_paths = _band_state_paths(bands_root)
    if state_paths:
        base_state = spark.read.parquet(*state_paths)
    else:
        base_state = minhash_band_state(
            batch_df.limit(0), id_col, text_col, n_perms, n_bands, k, hash_fn
        )
    lazy = incremental_minhash_dedup(
        batch_df, base_state, id_col, text_col,
        threshold=threshold, n_perms=n_perms, n_bands=n_bands, k=k,
        hash_fn=hash_fn, max_band_freq=max_band_freq,
    )
    # MATERIALIZE the verdicts before touching the state dir: the lazy plan
    # reads bands_root, and appending this batch's bands first would make a
    # re-execution see the batch as part of its own base. A micro-batch is
    # bounded by definition, so pinning it as a local DataFrame is the
    # simple correct device.
    statuses = local_relation(spark, lazy.collect(), lazy.schema)
    kept = statuses.filter(F.col("status") == "kept").select("id")
    kept_docs = batch_df.join(
        kept.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    minhash_band_state(
        kept_docs, id_col, text_col, n_perms, n_bands, k, hash_fn
    ).write.mode("overwrite").parquet(
        os.path.join(bands_root, f"batch={batch_id}")
    )
    n_batch_dirs = sum(
        1 for d in os.listdir(bands_root) if d.startswith("batch=")
    )
    if compact_every and n_batch_dirs >= compact_every:
        _compact_band_state(spark, bands_root, batch_id)
    return statuses


def query_latest(spark: SparkSession, root: str, saneql: str) -> DataFrame:
    """Convenience: run a SaneQL query against the current latest version
    (what a serving layer does between version swaps)."""
    from lapis_silo_spark.saneql import execute_query

    return execute_query(load_version(spark, root), saneql)


__all__ = [
    "stream_append",
    "stream_ingest_files",
    "windowed_counts",
    "near_dup_classify_batch",
    "query_latest",
    "Database",
]
