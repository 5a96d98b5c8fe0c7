"""``mutations()`` / ``insertions()`` domain aggregates.

Reference: ``src/silo/query_engine/operators/mutations_node.cpp`` (448 LoC of
custom bitmap arithmetic) and ``insertions_node.cpp``. Re-expressed as plain
Spark SQL over the normalized side tables — groupBy with map-side partial
aggregation, one shuffle keyed on (seq_name, pos), reference-genome join
broadcast. The count algebra mirrors ``mutations_node.cpp:205-283``:

    coverage(pos)   = #filtered rows with pos inside [cov_start, cov_end)
                      − #filtered rows with pos in seq_missing
                      − #filtered rows with an explicit missing-symbol mutation
    count(pos, sym) = #filtered rows with mutation sym at pos   (sym ≠ missing)
    proportion      = count / coverage,  emitted when ≥ minProportion

Per-position coverage is computed with the classic interval-delta trick: each
coverage range contributes (+1 at cov_start, −1 at cov_end); a prefix sum over
the (tiny, genome-length) position grid yields covered-row counts per
position. The grid comes from ``reference_genomes`` (~30k rows/segment), so
the window function runs over broadcast-scale data regardless of table size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lapis_silo_spark.alphabets import AA_MISSING, NUC_MISSING
from lapis_silo_spark.operators.relational import Pipeline
from lapis_silo_spark.session import local_relation


# driver budget for materializing the adapted-store coverage grid; genome
# grids are ~30k positions/segment, so this is ~60x headroom
_MAX_GRID_ROWS = 2_000_000


def _filtered_pks(pipeline: Pipeline) -> DataFrame:
    return pipeline.df.select(F.col(pipeline.pk).alias("pk")).dropDuplicates(["pk"])


def mutations_aggregate(
    pipeline: Pipeline,
    sequence_names: Sequence[str] | None = None,
    min_proportion: float = 0.05,
) -> DataFrame:
    """``mutations(minProportion, sequenceNames)`` over the filtered rows.

    Output schema matches the reference
    (``mutations_node.cpp:285-361``): ``mutationFrom, mutationTo, position,
    sequenceName, proportion, coverage, count``.
    """
    db = pipeline.database
    store = db.sequence_store(pipeline.table_name)
    pks = _filtered_pks(pipeline)

    muts = store.mutations
    cov = store.coverage
    miss = store.missing
    ref = store.reference
    if sequence_names:
        names = list(sequence_names)
        muts = muts.filter(F.col("seq_name").isin(names))
        cov = cov.filter(F.col("seq_name").isin(names))
        miss = miss.filter(F.col("seq_name").isin(names))
        ref = ref.filter(F.col("seq_name").isin(names))

    if not pipeline.full_table:
        # restrict side tables to the filtered row set; skipped entirely for
        # a whole-table aggregate — the reference's full-bitmap short-circuit
        muts = muts.join(pks, on="pk", how="left_semi")
        cov = cov.join(pks, on="pk", how="left_semi")
        miss = miss.join(pks, on="pk", how="left_semi")

    missing_sym = F.when(F.col("is_aa"), F.lit(AA_MISSING)).otherwise(
        F.lit(NUC_MISSING)
    )
    grid = ref.select(
        "seq_name", "pos", "ref_symbol", missing_sym.alias("missing_sym")
    )
    # storage baseline per position: after local-reference adaptation
    # (sources/adapt.py) an entry-less row stores local_symbol, which can
    # itself be a mutation vs the published reference
    local = store.local_reference
    if local is not None:
        if sequence_names:
            local = local.filter(F.col("seq_name").isin(list(sequence_names)))
        grid = grid.join(
            F.broadcast(local), on=["seq_name", "pos"], how="left"
        ).withColumn(
            "local_symbol", F.coalesce("local_symbol", "ref_symbol")
        )
    else:
        grid = grid.withColumn("local_symbol", F.col("ref_symbol"))

    # interval deltas → per-position covered-row counts (prefix sum on grid)
    deltas = (
        cov.select(F.col("seq_name"), F.col("cov_start").alias("pos"),
                   F.lit(1).alias("delta"))
        .unionAll(
            cov.select(F.col("seq_name"), F.col("cov_end").alias("pos"),
                       F.lit(-1).alias("delta"))
        )
        .groupBy("seq_name", "pos")
        .agg(F.sum("delta").alias("delta"))
    )
    w = Window.partitionBy("seq_name").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    covered = (
        grid.join(deltas, on=["seq_name", "pos"], how="left")
        .withColumn("delta", F.coalesce(F.col("delta"), F.lit(0)))
        .withColumn("in_range_count", F.sum("delta").over(w))
    )

    missing_counts = miss.groupBy("seq_name", "pos").agg(
        F.count(F.lit(1)).alias("missing_count")
    )
    mut_counts = muts.groupBy("seq_name", "pos", "symbol").agg(
        F.count(F.lit(1)).alias("count")
    )
    explicit_missing = (
        mut_counts.join(
            grid.select("seq_name", "pos", "missing_sym"), on=["seq_name", "pos"]
        )
        .filter(F.col("symbol") == F.col("missing_sym"))
        .select("seq_name", "pos", F.col("count").alias("explicit_missing_count"))
    )

    coverage_per_pos = (
        covered.join(missing_counts, on=["seq_name", "pos"], how="left")
        .join(explicit_missing, on=["seq_name", "pos"], how="left")
        .select(
            "seq_name",
            "pos",
            "ref_symbol",
            "local_symbol",
            "missing_sym",
            (
                F.col("in_range_count")
                - F.coalesce(F.col("missing_count"), F.lit(0))
                - F.coalesce(F.col("explicit_missing_count"), F.lit(0))
            ).alias("coverage"),
        )
    )

    if store.local_reference is not None:
        # entry-less rows store local_symbol: at flipped positions
        # (local != published ref) they count as mutated with that symbol.
        # default_count = coverage − explicit non-missing entries.
        # coverage_per_pos is referenced twice below (defaults + output
        # join). It is genome-length (the prefix-sum window above already
        # assumes the grid is driver-scale), so materialize it once and
        # rebuild as a LocalTableScan: the interval-delta shuffle runs
        # exactly once, nothing stays persisted after the query (no cache
        # registry growth in a long-lived server), and the accurate local
        # size lets the final join broadcast it.
        grid_rows = coverage_per_pos.collect()
        if len(grid_rows) > _MAX_GRID_ROWS:
            raise ValueError(
                f"coverage grid has {len(grid_rows)} rows, above the "
                f"driver materialization budget {_MAX_GRID_ROWS}; "
                "adapted-store aggregation assumes a genome-length grid"
            )
        coverage_per_pos = local_relation(
            pipeline.df.sparkSession, grid_rows, coverage_per_pos.schema
        )
        expl_tot = (
            mut_counts.join(
                grid.select("seq_name", "pos", "missing_sym"),
                on=["seq_name", "pos"],
            )
            .filter(F.col("symbol") != F.col("missing_sym"))
            .groupBy("seq_name", "pos")
            .agg(F.sum("count").alias("expl_tot"))
        )
        defaults = (
            coverage_per_pos.filter(
                F.col("local_symbol") != F.col("ref_symbol")
            )
            .join(expl_tot, on=["seq_name", "pos"], how="left")
            .select(
                "seq_name",
                "pos",
                F.col("local_symbol").alias("symbol"),
                (
                    F.col("coverage")
                    - F.coalesce(F.col("expl_tot"), F.lit(0))
                ).alias("count"),
            )
            .filter(F.col("count") > 0)
        )
        mut_counts = (
            mut_counts.unionByName(defaults)
            .groupBy("seq_name", "pos", "symbol")
            .agg(F.sum("count").alias("count"))
        )

    return (
        mut_counts.join(coverage_per_pos, on=["seq_name", "pos"], how="inner")
        .filter(
            (F.col("symbol") != F.col("missing_sym"))
            & (F.col("symbol") != F.col("ref_symbol"))
            & (F.col("coverage") > 0)
        )
        .withColumn("proportion", F.col("count") / F.col("coverage"))
        .filter(F.col("proportion") >= F.lit(min_proportion))
        .select(
            F.col("ref_symbol").alias("mutationFrom"),
            F.col("symbol").alias("mutationTo"),
            F.col("pos").alias("position"),
            F.col("seq_name").alias("sequenceName"),
            F.col("proportion"),
            F.col("coverage"),
            F.col("count"),
        )
    )


def insertions_aggregate(
    pipeline: Pipeline,
    sequence_names: Sequence[str] | None = None,
) -> DataFrame:
    """``insertions(sequenceNames)`` — per unique (position, inserted string)
    count of filtered rows carrying it (``insertions_node.cpp:54-109``).

    Output: ``insertedSymbols, position, sequenceName, count``.
    """
    db = pipeline.database
    store = db.sequence_store(pipeline.table_name)
    ins = store.insertions
    if sequence_names:
        ins = ins.filter(F.col("seq_name").isin(list(sequence_names)))
    if not pipeline.full_table:
        ins = ins.join(_filtered_pks(pipeline), on="pk", how="left_semi")
    return ins.groupBy("seq_name", "pos", "inserted").agg(
        F.count(F.lit(1)).alias("count")
    ).select(
        F.col("inserted").alias("insertedSymbols"),
        F.col("pos").alias("position"),
        F.col("seq_name").alias("sequenceName"),
        F.col("count"),
    )
