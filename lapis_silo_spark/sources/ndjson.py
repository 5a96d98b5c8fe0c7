"""NDJSON sequence-data ingest → main table + normalized side tables.

Reference pipeline: ``rhydb append`` reads NDJSON lines (simdjson), diffs each
aligned sequence against the reference genome, and feeds bitmap index builders
(``/root/reference/src/silo/append/``, ``storage/column/sequence_column.h:71-77,176-230``,
payload shape ``documentation/input_format.md:195-236``).

Spark-native ingest: ``spark.read.json`` with an explicit schema (never
inferSchema — the reference's schema is declared up front too), then one
``mapInPandas`` pass per batch that explodes each row's sequence payloads into
the four normalized side tables. The diffing UDF is the genuinely imperative
part (per-character comparison), exactly the case where the guide says Pandas
UDFs are warranted; everything downstream is declarative DataFrame work.

Scale design:
- one input pass produces all four side tables via a single exploded
  "events" frame tagged by kind, split afterwards (avoids re-reading 100 TB
  four times);
- side tables are written sorted by (seq_name, pos) within partitions so
  Parquet row-group stats prune position predicates (the Spark analog of the
  reference's per-chunk coverage ranges, ``horizontal_coverage_index.h:33-35``);
- the main table keeps the primary key; joins against side tables bucket on
  ``pk``.

Payload semantics (input_format.md):
- ``sequence``: aligned symbols; leading/trailing missing runs ⇒ uncovered,
  interior missing symbols (N for nucleotides / X for amino acids) ⇒
  ``seq_missing`` rows; other differences vs the reference ⇒ ``seq_mutations``.
- ``offset``: shifts the sequence within the reference (0-based).
- ``insertions``: ``["pos:SYMBOLS", ...]``, position 0 = before first symbol.
- a NULL sequence object ⇒ no coverage row at all (the row never matches any
  symbol test — ``symbol_in_set.cpp:104-126``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lapis_silo_spark.alphabets import AA_MISSING, NUC_MISSING
from lapis_silo_spark.catalog import SequenceStore
from lapis_silo_spark.jvm import ensure_zstd_udfs
from lapis_silo_spark.session import local_relation


@dataclass
class TableConfig:
    """Declared table schema (``database_config.yaml`` equivalent —
    ``src/silo/config/database_config.h``; schemas are fixed, never inferred)."""

    name: str = "default"
    primary_key: str = "primary_key"
    # metadata column name -> Spark type string ("string", "int", "double",
    # "date", "boolean")
    metadata: dict[str, str] = field(default_factory=dict)
    # aligned nucleotide sequence column names -> reference string
    nuc_sequences: dict[str, str] = field(default_factory=dict)
    # aligned amino-acid sequence column names -> reference string
    aa_sequences: dict[str, str] = field(default_factory=dict)

    def spark_schema(self) -> T.StructType:
        seq_struct = T.StructType(
            [
                T.StructField("sequence", T.StringType()),
                T.StructField("sequenceCompressed", T.StringType()),
                T.StructField("insertions", T.ArrayType(T.StringType())),
                T.StructField("offset", T.IntegerType()),
            ]
        )
        fields = [T.StructField(self.primary_key, T.StringType(), False)]
        type_map = {
            "string": T.StringType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "double": T.DoubleType(),
            "float": T.DoubleType(),  # SILO FLOAT is a 64-bit double
            "date": T.DateType(),
            "boolean": T.BooleanType(),
        }
        for col, typ in self.metadata.items():
            fields.append(T.StructField(col, type_map[typ]))
        for seq in list(self.nuc_sequences) + list(self.aa_sequences):
            fields.append(T.StructField(seq, seq_struct))
        # raw unaligned companions are separate top-level input fields
        # (``documentation/input_format.md:230-236``), null when absent
        for seq in self.nuc_sequences:
            fields.append(T.StructField(f"unaligned_{seq}", T.StringType()))
        return T.StructType(fields)


_SIDE_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.StringType()),
        T.StructField("seq_name", T.StringType()),
        T.StructField("kind", T.StringType()),  # mutation|coverage|missing|insertion
        T.StructField("pos", T.IntegerType()),  # mutation/missing/insertion pos
        T.StructField("pos2", T.IntegerType()),  # coverage end (half-open)
        T.StructField("symbol", T.StringType()),  # mutation symbol / inserted str
    ]
)


def _diff_one(
    pk: str,
    seq_name: str,
    sequence: str | None,
    insertions: list | None,
    offset: int | None,
    reference: str,
    missing_sym: str,
    ref_bytes: "np.ndarray | None" = None,
) -> Iterator[tuple]:
    """Explode one aligned sequence into side-table event tuples.

    Mirrors the reference's builder logic (``sequence_column.h:176-230``):
    leading/trailing missing runs shrink coverage; interior missing symbols →
    ``missing`` rows; any other symbol differing from the reference → a
    ``mutation`` row. Positions are 1-based absolute (after ``offset``).

    The per-position comparison is vectorized (byte arrays, ``np.nonzero``
    over inequality masks) — this is the ingest hot loop; a per-character
    Python loop over full genomes would dominate 100 TB ingest cost.
    """
    ins_list = [] if insertions is None else list(insertions)
    if sequence is None and not ins_list:
        return
    off = int(offset) if offset is not None else 0
    if sequence is not None:
        seq = sequence.upper()
        n = len(seq)
        sbytes = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        miss_b = ord(missing_sym)
        not_missing = sbytes != miss_b
        covered_idx = np.nonzero(not_missing)[0]
        if covered_idx.size == 0:
            # entirely missing: coverage row with empty range — the row HAS a
            # sequence (matches missing searches) but covers nothing
            yield (pk, seq_name, "coverage", off + 1, off + 1, None)
        else:
            first = int(covered_idx[0])
            last = int(covered_idx[-1])
            cov_start = off + first + 1  # 1-based inclusive
            cov_end = off + last + 2  # half-open
            yield (pk, seq_name, "coverage", cov_start, cov_end, None)
            if cov_end - cov_start > len(reference) + 1:
                raise ValueError(
                    f"{pk}/{seq_name}: aligned sequence overruns reference "
                    f"({cov_end - 1} > {len(reference)})"
                )
            window = sbytes[first:last + 1]
            if ref_bytes is None:
                ref_bytes = np.frombuffer(
                    reference.upper().encode("latin-1"), dtype=np.uint8
                )
            # align the reference window to the covered span (positions past
            # the reference end always count as mutations)
            ref_lo = off + first
            ref_window = ref_bytes[ref_lo:ref_lo + window.size]
            if ref_window.size < window.size:
                ref_window = np.concatenate(
                    [ref_window, np.zeros(window.size - ref_window.size,
                                          dtype=np.uint8)]
                )
            interior_missing = window == miss_b
            mutated = (window != ref_window) & ~interior_missing
            for i in np.nonzero(interior_missing)[0]:
                yield (pk, seq_name, "missing", off + first + int(i) + 1,
                       None, None)
            for i in np.nonzero(mutated)[0]:
                yield (pk, seq_name, "mutation", off + first + int(i) + 1,
                       None, chr(window[int(i)]))
    for ins in ins_list:
        txt = str(ins)
        colon = txt.index(":")
        yield (pk, seq_name, "insertion", int(txt[:colon]), None,
               txt[colon + 1:].upper())


def ingest_records(
    spark: SparkSession,
    records_df: DataFrame,
    config: TableConfig,
) -> tuple[DataFrame, SequenceStore]:
    """Transform parsed NDJSON records into (main_table, SequenceStore).

    ``records_df`` must follow ``config.spark_schema()`` (from
    ``spark.read.json(path, schema=...)`` or ``createDataFrame``).
    """
    pk = config.primary_key
    seq_meta: list[tuple[str, str, str]] = [
        (name, ref.upper(), NUC_MISSING) for name, ref in config.nuc_sequences.items()
    ] + [
        (name, ref.upper(), AA_MISSING) for name, ref in config.aa_sequences.items()
    ]
    seq_cols = [name for name, _, _ in seq_meta]

    # ``sequenceCompressed`` (base64 + zstd with the column's reference genome
    # as raw-content dictionary; takes precedence over ``sequence`` —
    # ``documentation/input_format.md:206-208``) is decompressed JVM-side via
    # the bundled zstd-jni UDF *before* the Python diffing pass, so the hot
    # mapInPandas stage only ever sees plain aligned strings. When the JVM
    # helper cannot be built (no JDK), compressed payloads surface a clear
    # error in the Python pass below instead.
    if seq_cols and ensure_zstd_udfs(spark):
        for seq_name, ref, _missing in seq_meta:
            dict_hex = ref.encode("utf-8").hex()
            payload = F.col(seq_name)
            records_df = records_df.withColumn(
                seq_name,
                F.when(payload.isNull(), payload).otherwise(
                    F.struct(
                        F.when(
                            payload.getField("sequenceCompressed").isNotNull(),
                            F.expr(
                                f"zstd_dict_decompress(unbase64("
                                f"`{seq_name}`.sequenceCompressed), "
                                f"X'{dict_hex}')"
                            ),
                        ).otherwise(payload.getField("sequence"))
                        .alias("sequence"),
                        F.lit(None).cast("string").alias("sequenceCompressed"),
                        payload.getField("insertions").alias("insertions"),
                        payload.getField("offset").alias("offset"),
                    )
                ),
            )

    # ``unaligned_<seq>`` companion columns (reference: ZSTD_COMPRESSED_STRING
    # columns fed by the ``unaligned_<seq>`` input fields,
    # ``documentation/input_format.md:112-124,230-236``) — kept as plain
    # strings; Parquet+zstd provides the compression the reference hand-rolls.
    have = set(records_df.columns)
    main = records_df.select(
        pk,
        *config.metadata.keys(),
        *[
            (F.col(f"unaligned_{s}") if f"unaligned_{s}" in have
             else F.lit(None).cast("string")).alias(f"unaligned_{s}")
            for s in config.nuc_sequences
        ],
    )

    refs = {name: (ref, missing) for name, ref, missing in seq_meta}

    def explode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            pks = pdf[pk]
            # column-wise iteration (iterrows would materialize a Series per
            # record — this loop is the ingest hot path)
            for seq_name in seq_cols:
                ref, missing_sym = refs[seq_name]
                ref_bytes = np.frombuffer(ref.encode("latin-1"), dtype=np.uint8)
                for rec_pk, payload in zip(pks, pdf[seq_name]):
                    if payload is None:
                        continue
                    # payload arrives as a dict-like Row
                    get = payload.get if hasattr(payload, "get") else payload.__getitem__
                    seq = get("sequence")
                    if seq is None and get("sequenceCompressed") is not None:
                        # only reachable when the JVM zstd helper could not be
                        # built (ensure_zstd_udfs returned False)
                        raise RuntimeError(
                            "sequenceCompressed (zstd-dict) ingest requires "
                            "the JVM zstd UDF, which failed to build in this "
                            "environment; provide 'sequence' instead"
                        )
                    rows.extend(
                        _diff_one(
                            rec_pk, seq_name, seq, get("insertions"),
                            get("offset"), ref, missing_sym,
                            ref_bytes=ref_bytes,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["pk", "seq_name", "kind", "pos", "pos2", "symbol"]
            )

    if seq_cols:
        events = records_df.select(pk, *seq_cols).mapInPandas(
            explode_batch, schema=_SIDE_SCHEMA
        )
        # One wide shuffle-free pass; split by kind (Catalyst collapses the
        # four filters into one scan of the cached events when materialized).
        events = events.persist()
        mutations = events.filter(F.col("kind") == "mutation").select(
            "pk", "seq_name", "pos", "symbol"
        )
        coverage = events.filter(F.col("kind") == "coverage").select(
            "pk", "seq_name", F.col("pos").alias("cov_start"),
            F.col("pos2").alias("cov_end"),
        )
        missing = events.filter(F.col("kind") == "missing").select(
            "pk", "seq_name", "pos"
        )
        insertions = events.filter(F.col("kind") == "insertion").select(
            "pk", "seq_name", "pos", F.col("symbol").alias("inserted")
        )
    else:
        empty = local_relation(spark, [], _SIDE_SCHEMA)
        mutations = empty.select("pk", "seq_name", "pos", "symbol")
        coverage = empty.select(
            "pk", "seq_name", F.col("pos").alias("cov_start"),
            F.col("pos2").alias("cov_end"),
        )
        missing = empty.select("pk", "seq_name", "pos")
        insertions = empty.select(
            "pk", "seq_name", "pos", F.col("symbol").alias("inserted")
        )

    ref_rows = [
        (name, i + 1, ref[i], name in config.aa_sequences)
        for name, ref, _ in seq_meta
        for i in range(len(ref))
    ]
    reference = local_relation(
        spark, ref_rows or [("__none__", 1, "A", False)],
        "seq_name string, pos int, ref_symbol string, is_aa boolean",
    )
    if not ref_rows:
        reference = reference.filter(F.lit(False))

    return main, SequenceStore(
        mutations=mutations,
        coverage=coverage,
        missing=missing,
        insertions=insertions,
        reference=reference,
    )


def _decompressed_json_lines(path_bytes):
    """(path, bytes) → JSON lines, transparently decompressing .zst/.xz.

    Runs on executors (one task per file — the same parallelism contract
    as Hadoop's non-splittable compression codecs). zstd decompression is
    pyarrow's streaming codec (no decompressed-size header needed); xz is
    stdlib lzma.
    """
    path, data = path_bytes
    if path.endswith(".zst"):
        import pyarrow as pa

        raw = pa.input_stream(pa.BufferReader(data), compression="zstd").read()
        raw = raw.to_pybytes() if hasattr(raw, "to_pybytes") else bytes(raw)
    elif path.endswith(".xz"):
        import lzma

        raw = lzma.decompress(bytes(data))
    else:
        raw = bytes(data)
    for line in raw.decode("utf-8").splitlines():
        if line.strip():
            yield line


def ingest_ndjson(
    spark: SparkSession, path: str, config: TableConfig
) -> tuple[DataFrame, SequenceStore]:
    """Read line-delimited JSON with the declared schema and ingest.

    ``.zst``/``.xz`` inputs (the reference supports both,
    ``documentation/incremental_preprocessing.md:24-36``) are decompressed
    Spark-side via ``binaryFiles`` — the container's Hadoop has no native
    zstd/xz codecs, so this path does NOT rely on them. Each compressed
    file decompresses wholly within one task, exactly the parallelism a
    Hadoop non-splittable codec would give; plain and ``.gz`` inputs go
    through the regular (splittable for plain) json reader.
    """
    if path.endswith((".zst", ".xz")):
        lines = spark.sparkContext.binaryFiles(path).flatMap(
            _decompressed_json_lines
        )
        records = spark.read.json(lines, schema=config.spark_schema())
    else:
        records = spark.read.json(path, schema=config.spark_schema())
    main, store = ingest_records(spark, records, config)

    # Duplicate-primary-key validation (storage/table.h:56) — fail the ingest
    # job, mirroring the reference's atomic abort.
    dupes = (
        main.groupBy(config.primary_key).count().filter(F.col("count") > 1).limit(1)
    ).collect()
    if dupes:
        raise ValueError(
            f"duplicate primary key {dupes[0][0]!r} in {path}"
        )
    return main, store
