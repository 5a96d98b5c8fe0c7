"""Aligned-sequence reconstruction for projections.

Reference: ``exec_node/table_scan.cpp`` rebuilds each projected sequence
column from the index structures (VerticalSequenceIndex + coverage + missing)
batch-by-batch. Relationally: per row,

    symbol(p) = mutation symbol            if (pk, p) ∈ seq_mutations
              | missing (N/X)              if p ∉ coverage or (pk, p) ∈ seq_missing
              | reference symbol at p      otherwise

The whole rebuild is a single JVM-side expression — three per-pk aggregations
(mutation map, coverage ranges, missing set), one join, then a
``transform(sequence(1, L), ...)`` + ``concat_ws`` that stays inside
whole-stage codegen. No Python UDF, so it scales with the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lapis_silo_spark.operators.relational import Pipeline


def with_sequence_column(pipeline: Pipeline, seq_name: str) -> Pipeline:
    """Return a pipeline whose DataFrame carries ``seq_name`` as a
    reconstructed aligned-sequence string column (NULL where the row has no
    stored sequence)."""
    db = pipeline.database
    store = db.sequence_store(pipeline.table_name)
    is_aa = store.is_amino_acid(seq_name)
    missing_sym = "X" if is_aa else "N"
    length = store.ref_length(seq_name)
    # the baseline an entry-less position stores is the LOCAL reference
    # (== published unless the store was adapted, sources/adapt.py)
    ref_str = "".join(
        store.local_symbol(seq_name, p) for p in range(1, length + 1)
    )
    pk = pipeline.pk

    sided = F.col("seq_name") == seq_name
    muts = (
        store.mutations.filter(sided)
        .groupBy("pk")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("pos", "symbol"))
            ).alias("_mut")
        )
    )
    cov = (
        store.coverage.filter(sided)
        .groupBy("pk")
        .agg(F.collect_list(F.struct("cov_start", "cov_end")).alias("_cov"))
    )
    miss = (
        store.missing.filter(sided)
        .groupBy("pk")
        .agg(F.collect_set("pos").alias("_miss"))
    )

    df = pipeline.df
    for side in (muts, cov, miss):
        # NEVER broadcast (or hash-build) these sides: each is
        # O(rows-with-sequence) with a genome-sized map/array per row, but
        # Spark's post-aggregation size estimate sees only row counts. The
        # default plan broadcast them — at sf1 (50k docs × ~3k-entry maps)
        # the broadcast build alone ships >1 GB through the driver
        # (maxResultSize abort; at 100 TB, a driver OOM). A shuffle_hash
        # hint then failed too: the per-partition hash map of genome-sized
        # values cannot acquire execution memory under 32 concurrent build
        # tasks. Sort-merge is the plan that is correct at EVERY scale for
        # wide-value pk joins — both sides stream and spill.
        df = df.join(
            side.withColumnRenamed("pk", pk).hint("merge"),
            on=pk, how="left",
        )

    ref_lit = F.lit(ref_str)
    cov_arr = F.coalesce(F.col("_cov"), F.array())
    miss_arr = F.coalesce(F.col("_miss"), F.array().cast("array<int>"))

    def char_at(p):
        covered = F.exists(
            cov_arr,
            lambda c: (c["cov_start"] <= p) & (p < c["cov_end"]),
        )
        base = F.when(
            covered & ~F.array_contains(miss_arr, p),
            F.substr(ref_lit, p, F.lit(1)),
        ).otherwise(F.lit(missing_sym))
        return F.coalesce(F.try_element_at(F.col("_mut"), p), base)

    seq_col = F.when(
        F.col("_cov").isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat_ws(
            "", F.transform(F.sequence(F.lit(1), F.lit(length)), char_at)
        )
    )
    df = df.withColumn(seq_name, seq_col).drop("_mut", "_cov", "_miss")
    return Pipeline(df, db, pipeline.table_name, pk)
