"""Database catalog: named tables + normalized sequence/hierarchy side tables.

The reference's ``silo::Database`` holds a map of primary-keyed tables whose
sequence columns are stored as bitmap index triples
(``/root/reference/src/silo/storage/table.h:16-68``,
``storage/column/sequence_column.h:58-170``). Our Spark-native equivalent
(SURVEY.md §7.1) stores each sequence column as four normalized long-form
Parquet tables, which Catalyst can filter/join with full pushdown:

- ``seq_mutations  (pk, seq_name, pos, symbol)``  ≙ VerticalSequenceIndex
- ``seq_coverage   (pk, seq_name, cov_start, cov_end)`` ≙ HorizontalCoverageIndex
- ``seq_missing    (pk, seq_name, pos)``          ≙ interior-N bitmaps
- ``seq_insertions (pk, seq_name, pos, inserted)`` ≙ InsertionIndex
- ``reference_genomes (seq_name, pos, ref_symbol)`` — long form of the refs

plus hierarchy tables:

- ``lineage_closure (col, ancestor, descendant, mode)`` ≙ LineageIndex
- ``phylo_nodes (col, node, parent, depth, euler_in, euler_out)`` ≙ PhyloTree

Scale notes: ``seq_mutations`` is the big one (rows × avg-mutations). It is
written partitioned/bucketed so that (a) ``pos`` range predicates prune files
and (b) joins on ``pk`` against the main table are co-located. Reference
genomes / closures / phylo nodes are tiny → broadcast joins.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SequenceStore:
    """Side tables for ALL sequence columns of one logical table.

    ``seq_name`` distinguishes segments/genes (e.g. ``main``, ``S``); amino
    acid sequences carry ``is_aa=True`` rows in ``reference_genomes`` via the
    ``is_aa`` column.
    """

    mutations: DataFrame
    coverage: DataFrame
    missing: DataFrame
    insertions: DataFrame
    reference: DataFrame  # (seq_name, pos, ref_symbol, is_aa)
    #: Adapted per-position storage baseline ``(seq_name, pos, local_symbol)``
    #: — the symbol a row WITHOUT an explicit ``seq_mutations`` entry stores
    #: at that position (``vertical_sequence_index.h:71-82``: flip the stored
    #: reference to the majority symbol to minimize stored diffs). ``None``
    #: means the storage baseline IS the published reference genome. Query
    #: semantics (mutationFrom, hasMutation, the ``.`` wildcard) always stay
    #: anchored to the published ``reference``.
    local_reference: DataFrame | None = None
    #: Optional ``(seq_name, pos, trigram, pk)`` inverted index over stored
    #: insertions (``insertion_index.cpp`` analog, built by
    #: ``sources.insertion_index``); ``InsertionContains`` uses it to
    #: pre-filter regex candidates when present.
    insertion_trigrams: DataFrame | None = None
    _ref_cache: dict[str, dict[int, str]] = field(default_factory=dict)
    _local_cache: dict[str, dict[int, str]] = field(default_factory=dict)
    _aa_names: set[str] | None = None

    def ref_symbol(self, seq_name: str, pos: int) -> str:
        """Driver-side reference-genome lookup (cached; genome ≤ ~30k nt)."""
        if seq_name not in self._ref_cache:
            rows = self.reference.filter(F.col("seq_name") == seq_name).collect()
            if not rows:
                raise KeyError(f"unknown sequence name: {seq_name!r}")
            self._ref_cache[seq_name] = {r["pos"]: r["ref_symbol"] for r in rows}
        try:
            return self._ref_cache[seq_name][pos]
        except KeyError:
            raise ValueError(
                f"position {pos} out of range for sequence {seq_name!r}"
            ) from None

    def ref_length(self, seq_name: str) -> int:
        self.ref_symbol(seq_name, 1)  # populate cache / validate name
        return len(self._ref_cache[seq_name])

    def local_symbol(self, seq_name: str, pos: int) -> str:
        """The storage-baseline symbol at ``pos`` — what a row with no
        explicit mutation entry stores there. Falls back to the published
        reference symbol when the store is unadapted."""
        if self.local_reference is None:
            return self.ref_symbol(seq_name, pos)
        if seq_name not in self._local_cache:
            rows = self.local_reference.filter(
                F.col("seq_name") == seq_name
            ).collect()
            self._local_cache[seq_name] = {
                r["pos"]: r["local_symbol"] for r in rows
            }
        sym = self._local_cache[seq_name].get(pos)
        # positions absent from the adaptation table keep the published symbol
        return sym if sym is not None else self.ref_symbol(seq_name, pos)

    def is_amino_acid(self, seq_name: str) -> bool:
        if self._aa_names is None:
            rows = self.reference.select("seq_name", "is_aa").distinct().collect()
            self._aa_names = {r["seq_name"] for r in rows if r["is_aa"]}
        return seq_name in self._aa_names


class Database:
    """Named tables + per-table sequence stores + hierarchy tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}
        self.primary_keys: dict[str, str] = {}
        self.sequence_stores: dict[str, SequenceStore] = {}
        # lineage column name -> closure DataFrame (ancestor, descendant, mode)
        self.lineage_closures: dict[str, DataFrame] = {}
        # lineage column name -> original definition YAML text (served by
        # GET /lineageDefinition/<col>)
        self.lineage_definitions: dict[str, str] = {}
        # 10-digit data-version timestamp (reference: data_version.h)
        self.data_version: str = "0000000000"
        # lineage column name -> relation DataFrame (documentation/lineage_definitions.md:96-140)
        self.lineage_relations: dict[str, DataFrame] = {}
        # phylo column name -> nodes DataFrame (node, parent, depth, euler_in, euler_out, branch_length)
        self.phylo_nodes: dict[str, DataFrame] = {}
        # model artifact name -> DataFrame (k-means centroids, PQ codebooks,
        # BPE merge tables, ...). Train-once artifacts version with the data
        # they were trained on — same lifecycle discipline as the minhash
        # band state and the lineage closures (reference instinct: every
        # derived index lives in the version directory, storage.py).
        self.models: dict[str, DataFrame] = {}
        # model artifact name -> free-form metadata dict (kind, params)
        self.model_meta: dict[str, dict] = {}

    # -- registration -----------------------------------------------------
    def register_table(
        self, name: str, df: DataFrame, primary_key: str = "primary_key"
    ) -> None:
        self.tables[name] = df
        self.primary_keys[name] = primary_key
        df.createOrReplaceTempView(name)

    def register_sequence_store(self, table: str, store: SequenceStore) -> None:
        self.sequence_stores[table] = store

    def register_lineage(
        self, column: str, closure: DataFrame,
        relation: DataFrame | None = None,
        definition_text: str | None = None,
    ) -> None:
        self.lineage_closures[column] = closure
        if relation is not None:
            self.lineage_relations[column] = relation
        if definition_text is not None:
            self.lineage_definitions[column] = definition_text

    def register_phylo_tree(self, column: str, nodes: DataFrame) -> None:
        self.phylo_nodes[column] = nodes

    def register_model(
        self, name: str, df: DataFrame, meta: dict | None = None
    ) -> None:
        """Register a train-once model artifact (a small DataFrame: k-means
        centroid table, PQ codebook table, BPE merge table) so
        :func:`lapis_silo_spark.storage.save_version` persists it and
        ``load_version`` restores it with the data it was trained on."""
        self.models[name] = df
        self.model_meta[name] = dict(meta or {})

    # -- access -----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        try:
            return self.tables[name]
        except KeyError:
            raise KeyError(f"unknown table: {name!r}") from None

    def primary_key(self, name: str) -> str:
        return self.primary_keys.get(name, "primary_key")

    def model(self, name: str) -> DataFrame:
        try:
            return self.models[name]
        except KeyError:
            raise KeyError(f"unknown model artifact: {name!r}") from None

    def sequence_store(self, table: str) -> SequenceStore:
        try:
            return self.sequence_stores[table]
        except KeyError:
            raise KeyError(f"table {table!r} has no sequence columns") from None

    def phylo_descendant_names(self, column: str, node: str) -> DataFrame:
        """All node names (internal + leaves) in the subtree rooted at ``node``.

        Uses the precomputed Euler-tour interval (``euler_in``/``euler_out``)
        — one broadcastable filter instead of the reference's pointer-chasing
        tree walk (``src/silo/common/phylo_tree.h``).
        """
        nodes = self.phylo_nodes[column]
        anchor = nodes.filter(F.col("node") == node).select(
            F.col("euler_in").alias("a_in"), F.col("euler_out").alias("a_out")
        )
        return (
            nodes.crossJoin(F.broadcast(anchor))
            .filter(
                (F.col("euler_in") >= F.col("a_in"))
                & (F.col("euler_out") <= F.col("a_out"))
            )
            .select("node")
        )

    # -- convenience ------------------------------------------------------
    def read_parquet(self, path: str) -> DataFrame:
        """Read parquet, normalizing ns-precision timestamps to TimestampType.

        Spark has no nanosecond timestamp type; with
        ``spark.sql.legacy.parquet.nanosAsLong`` such columns arrive as long
        nanos — detect them from the parquet footer and convert (µs
        truncation), so downstream operators see real timestamps.
        """
        df = self.spark.read.parquet(path)
        try:
            import pyarrow.parquet as pq
            import pyarrow.types as pat

            first = path
            if os.path.isdir(path):
                parts = [
                    p for p in sorted(os.listdir(path)) if p.endswith(".parquet")
                ]
                if parts:
                    first = os.path.join(path, parts[0])
            schema = pq.read_schema(first)
            for fld in schema:
                if pat.is_timestamp(fld.type) and fld.type.unit == "ns":
                    # `div`, not `/`: epoch nanos (~1.7e18) exceed a
                    # double's 53-bit mantissa, so float division can be
                    # off by ±128 ns — enough to flip the µs digit.
                    df = df.withColumn(
                        fld.name,
                        F.timestamp_micros(F.expr(f"`{fld.name}` div 1000")),
                    )
        except Exception:
            pass  # non-local filesystems: leave columns as read
        return df

    def register_parquet_dir(self, sf_dir: str) -> None:
        for f in sorted(os.listdir(sf_dir)):
            if f.endswith(".parquet"):
                name = f[: -len(".parquet")]
                self.register_table(
                    name, self.read_parquet(os.path.join(sf_dir, f))
                )
