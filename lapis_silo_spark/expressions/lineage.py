"""Hierarchy predicates: lineage sub-clade membership and phylo descendants.

The reference precomputes, per lineage column, a bitmap per (value, mode)
covering the value's whole sub-clade (``storage/column/lineage_index.h:14-46``);
our equivalent precompute is the ``lineage_closure(ancestor, descendant,
mode)`` table built at ingest (:mod:`lapis_silo_spark.sources.lineage`), and
the filter is a flag join of the *column value* against the closure's
descendants — a broadcast hash join at any scale (closures are ~10^4 rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lapis_silo_spark.expressions.base import (
    CompileContext,
    Expression,
    QueryCompileError,
)

RECOMBINANT_MODES = {"doNotFollow", "alwaysFollow", "followIfFullyContainedInClade"}


class LineageFilter(Expression):
    """``lineage(col, value, includeSublineages, recombinantFollowingMode)`` —
    ``scalar_expressions/lineage_filter.cpp:44-68``."""

    def __init__(
        self,
        column: str,
        value: str | None,
        include_sublineages: bool = False,
        recombinant_mode: str = "doNotFollow",
    ):
        if recombinant_mode not in RECOMBINANT_MODES:
            raise QueryCompileError(
                f"unknown recombinantFollowingMode {recombinant_mode!r}; "
                f"expected one of {sorted(RECOMBINANT_MODES)}"
            )
        self.column = column
        self.value = value
        self.include_sublineages = include_sublineages
        self.recombinant_mode = recombinant_mode

    def compile(self, ctx: CompileContext) -> Column:
        if self.value is None:
            return F.col(self.column).isNull()
        if ctx.database is None or self.column not in ctx.database.lineage_closures:
            raise QueryCompileError(
                f"column {self.column!r} has no lineage definition"
            )
        if not self.include_sublineages:
            return F.coalesce(F.col(self.column) == F.lit(self.value), F.lit(False))
        closure = ctx.database.lineage_closures[self.column]
        descendants = closure.filter(
            (F.col("ancestor") == F.lit(self.value))
            & (F.col("mode") == F.lit(self.recombinant_mode))
        ).select(F.col("descendant").alias(self.column))
        flag = ctx.new_flag(descendants, key_cols=[self.column])
        return F.coalesce(F.col(flag), F.lit(False))


class PhyloDescendantOf(Expression):
    """``phyloDescendantOf(col, node)`` — membership of the row's tree-node id
    in the subtree under ``node`` (``scalar_expressions/phylo_child_filter.cpp``).

    Uses the Euler-tour interval precomputed in ``phylo_nodes`` instead of a
    tree walk; the descendant-name set is broadcast-joined against the column.
    """

    def __init__(self, column: str, node: str):
        self.column = column
        self.node = node

    def compile(self, ctx: CompileContext) -> Column:
        if ctx.database is None or self.column not in ctx.database.phylo_nodes:
            raise QueryCompileError(f"column {self.column!r} has no phylogenetic tree")
        descendants = ctx.database.phylo_descendant_names(
            self.column, self.node
        ).select(F.col("node").alias(self.column))
        flag = ctx.new_flag(descendants, key_cols=[self.column])
        return F.coalesce(F.col(flag), F.lit(False))
