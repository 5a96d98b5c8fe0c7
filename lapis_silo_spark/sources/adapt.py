"""Local-reference adaptation — the reference's storage optimization of
flipping the per-position stored baseline to the majority symbol so the
mutations side table shrinks (``src/silo/storage/column/
vertical_sequence_index.h:71-82``).

Spark-first shape: the majority vote is ONE pass over the side tables
(interval-delta coverage counts + a mutation groupBy, both keyed on the tiny
genome-length grid), and the rewrite touches only the flipped positions —
a broadcast join against the (≤ genome-length) flip set, never a full-table
shuffle. Row-level stored symbols are IDENTICAL before and after (pinned by
tests/test_adapt.py); only which (pk, pos) pairs need an explicit
``seq_mutations`` entry changes. At 100 TB this is the difference between
storing a delta per read per amplicon-consensus position and storing almost
nothing for clustered data.

Query semantics stay anchored to the PUBLISHED reference genome
(``mutationFrom``, ``hasMutation``, the ``.`` wildcard); the query layer
resolves "row has no explicit entry" through
:meth:`SequenceStore.local_symbol`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lapis_silo_spark.alphabets import AA_MISSING, NUC_MISSING
from lapis_silo_spark.catalog import SequenceStore
from lapis_silo_spark.session import local_relation


def _missing_sym_col() -> F.Column:
    return F.when(F.col("is_aa"), F.lit(AA_MISSING)).otherwise(
        F.lit(NUC_MISSING)
    )


def _current_local(store: SequenceStore) -> DataFrame:
    """(seq_name, pos, cur_local) — the store's CURRENT baseline symbol."""
    grid = store.reference.select("seq_name", "pos", "ref_symbol")
    if store.local_reference is None:
        return grid.select(
            "seq_name", "pos", F.col("ref_symbol").alias("cur_local")
        )
    return grid.join(
        store.local_reference, on=["seq_name", "pos"], how="left"
    ).select(
        "seq_name",
        "pos",
        F.coalesce("local_symbol", "ref_symbol").alias("cur_local"),
    )


def _in_range_counts(cov: DataFrame, grid: DataFrame) -> DataFrame:
    """Per-position covered-row counts via the interval-delta prefix sum
    (the same trick mutations_aggregate uses — the window runs over the
    genome-length grid, broadcast scale regardless of table size)."""
    deltas = (
        cov.select(
            "seq_name", F.col("cov_start").alias("pos"), F.lit(1).alias("d")
        )
        .unionAll(
            cov.select(
                "seq_name", F.col("cov_end").alias("pos"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("seq_name", "pos")
        .agg(F.sum("d").alias("d"))
    )
    w = Window.partitionBy("seq_name").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(deltas, on=["seq_name", "pos"], how="left")
        .withColumn("d", F.coalesce(F.col("d"), F.lit(0)))
        .withColumn("in_range", F.sum("d").over(w))
        .drop("d")
    )


def rebase_mutations(
    store: SequenceStore, new_local: DataFrame
) -> SequenceStore:
    """Rewrite ``seq_mutations`` so absence-of-entry means ``new_local``
    instead of the store's current baseline, WITHOUT changing any row's
    stored symbol.

    ``new_local``: (seq_name, pos, local_symbol). Only positions where the
    baseline actually flips are touched: explicit entries equal to the new
    baseline are dropped, and previously-implicit rows (covered, not
    missing, no entry) at flipped positions gain an explicit entry carrying
    the OLD baseline symbol.
    """
    cur = _current_local(store)
    flip = F.broadcast(
        new_local.join(cur, on=["seq_name", "pos"])
        .filter(F.col("local_symbol") != F.col("cur_local"))
        .select("seq_name", "pos", "local_symbol", "cur_local")
    )

    new_map = F.broadcast(new_local)
    kept = (
        store.mutations.join(new_map, on=["seq_name", "pos"], how="left")
        .filter(
            F.col("local_symbol").isNull()
            | (F.col("symbol") != F.col("local_symbol"))
        )
        .select(*store.mutations.columns)
    )

    # previously-implicit rows at flipped positions → explicit entries with
    # the old baseline symbol. Interval containment against the broadcast
    # flip set (≤ genome length), then remove missing / already-explicit.
    implicit = (
        store.coverage.alias("c")
        .join(
            flip.alias("f"),
            on=[
                F.col("c.seq_name") == F.col("f.seq_name"),
                F.col("f.pos") >= F.col("c.cov_start"),
                F.col("f.pos") < F.col("c.cov_end"),
            ],
        )
        .select(
            F.col("c.pk").alias("pk"),
            F.col("c.seq_name").alias("seq_name"),
            F.col("f.pos").alias("pos"),
            F.col("f.cur_local").alias("symbol"),
        )
        .join(store.missing, on=["pk", "seq_name", "pos"], how="left_anti")
        .join(
            store.mutations.select("pk", "seq_name", "pos"),
            on=["pk", "seq_name", "pos"],
            how="left_anti",
        )
    )

    return SequenceStore(
        mutations=kept.unionByName(implicit.select(*store.mutations.columns)),
        coverage=store.coverage,
        missing=store.missing,
        insertions=store.insertions,
        reference=store.reference,
        local_reference=new_local,
        insertion_trigrams=store.insertion_trigrams,
    )


def adapt_local_reference(store: SequenceStore) -> SequenceStore:
    """Adapt the storage baseline to the per-position MAJORITY stored
    symbol (``vertical_sequence_index.h:71-82``) and rebase the mutations
    side table accordingly. Idempotent once the majority is the baseline;
    ties keep the published reference symbol, then break lexicographically
    (deterministic across runs).
    """
    grid = store.reference.select(
        "seq_name", "pos", "ref_symbol", _missing_sym_col().alias("missing_sym")
    )
    cur = _current_local(store)

    in_range = _in_range_counts(store.coverage, grid)
    missing_counts = store.missing.groupBy("seq_name", "pos").agg(
        F.count(F.lit(1)).alias("n_missing")
    )
    mut_counts = store.mutations.groupBy("seq_name", "pos", "symbol").agg(
        F.count(F.lit(1)).alias("n")
    )
    expl = mut_counts.join(
        grid.select("seq_name", "pos", "missing_sym"), on=["seq_name", "pos"]
    )
    expl_missing = expl.filter(F.col("symbol") == F.col("missing_sym")).select(
        "seq_name", "pos", F.col("n").alias("n_expl_missing")
    )
    expl_sym = expl.filter(F.col("symbol") != F.col("missing_sym"))
    expl_tot = expl_sym.groupBy("seq_name", "pos").agg(
        F.sum("n").alias("n_expl")
    )

    implicit_votes = (
        in_range.join(missing_counts, on=["seq_name", "pos"], how="left")
        .join(expl_missing, on=["seq_name", "pos"], how="left")
        .join(expl_tot, on=["seq_name", "pos"], how="left")
        .join(cur, on=["seq_name", "pos"])
        .select(
            "seq_name",
            "pos",
            F.col("cur_local").alias("symbol"),
            (
                F.col("in_range")
                - F.coalesce(F.col("n_missing"), F.lit(0))
                - F.coalesce(F.col("n_expl_missing"), F.lit(0))
                - F.coalesce(F.col("n_expl"), F.lit(0))
            ).alias("n"),
        )
        .filter(F.col("n") > 0)
    )

    votes = (
        expl_sym.select("seq_name", "pos", "symbol", "n")
        .unionByName(implicit_votes)
        .groupBy("seq_name", "pos", "symbol")
        .agg(F.sum("n").alias("n"))
        .join(grid.select("seq_name", "pos", "ref_symbol"),
              on=["seq_name", "pos"])
    )
    w = Window.partitionBy("seq_name", "pos").orderBy(
        F.col("n").desc(),
        (F.col("symbol") == F.col("ref_symbol")).desc(),
        F.col("symbol").asc(),
    )
    winner = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("seq_name", "pos", F.col("symbol").alias("local_symbol"))
    )
    # positions with zero stored rows keep the published symbol
    new_local = (
        grid.select("seq_name", "pos", "ref_symbol")
        .join(winner, on=["seq_name", "pos"], how="left")
        .select(
            "seq_name",
            "pos",
            F.coalesce("local_symbol", "ref_symbol").alias("local_symbol"),
        )
    )
    # The local reference is genome-length metadata (≤ ~30k rows/segment —
    # driver-scale BY DEFINITION, same as the published reference). Cut the
    # vote job out of its lineage: otherwise every downstream broadcast of
    # the baseline re-runs the whole majority aggregation per query.
    spark = store.reference.sparkSession
    new_local = local_relation(spark, new_local.collect(), new_local.schema)
    return rebase_mutations(store, new_local)


def merge_stores(old: SequenceStore, new: SequenceStore) -> SequenceStore:
    """Union an append batch's side tables into an existing store. When the
    existing store is adapted, the fresh batch (always diffed against the
    published reference at ingest) is first rebased onto the old baseline so
    absence-of-entry keeps one meaning across the merged table."""
    if old.local_reference is not None:
        new = rebase_mutations(new, old.local_reference)
    trigrams = old.insertion_trigrams
    if trigrams is not None:
        from lapis_silo_spark.sources.insertion_index import (
            build_insertion_trigram_index,
        )

        trigrams = trigrams.unionByName(build_insertion_trigram_index(new))
    return SequenceStore(
        mutations=old.mutations.unionByName(new.mutations),
        coverage=old.coverage.unionByName(new.coverage),
        missing=old.missing.unionByName(new.missing),
        insertions=old.insertions.unionByName(new.insertions),
        reference=new.reference,  # reference genome is fixed
        local_reference=old.local_reference,
        insertion_trigrams=trigrams,
    )
