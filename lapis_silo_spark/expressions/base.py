"""Expression base classes and the compile context.

Reference parity notes:

- ``AmbiguityMode`` mirrors ``silo::AmbiguityMode`` (UPPER_BOUND under
  ``maybe()``, LOWER_BOUND under ``exact()``, NONE default) —
  ``/root/reference/src/silo/query_engine/scalar_expressions/scalar_expression.h:24``.
- The reference compiles expressions to bitmap filter operators that return the
  set of surviving row ids. In Spark the equivalent of a "bitmap" is a keyed
  DataFrame of surviving primary keys; predicates that can be expressed as
  in-row boolean columns compile directly, and predicates that need an index
  lookup (sequence symbol tests, lineage membership) compile to a boolean
  *flag column* produced by a left join against a normalized side table. The
  :class:`CompileContext` accumulates those pending flag joins; the Filter
  operator applies them before evaluating the boolean expression and drops the
  flags afterwards. This keeps arbitrary boolean algebra (And/Or/Not/NOf)
  working uniformly over both kinds of predicate, exactly like the reference's
  Intersection/Union/Complement/Threshold operators do over bitmaps
  (``src/silo/query_engine/filter/operators/``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame

if TYPE_CHECKING:
    from lapis_silo_spark.catalog import Database


class QueryCompileError(ValueError):
    """Raised for queries the engine rejects at bind/compile time.

    Parity with the reference's bad-request errors (the 19 invalidQueries
    golden cases assert on these).
    """


class AmbiguityMode(enum.Enum):
    NONE = "none"
    UPPER_BOUND = "upper_bound"  # under maybe(): ambiguity symbols may match
    LOWER_BOUND = "lower_bound"  # under exact(): only certain matches


@dataclass
class FlagJoin:
    """A pending left join producing one boolean flag column.

    ``keys`` is a DataFrame with exactly the join key column(s) plus nothing
    else; after ``target.join(keys.withColumn(flag, lit(True)), on=key_cols,
    how='left')`` the flag is true iff the row's key appeared in ``keys``.
    At scale this is a hash join on the table's primary key — with the main
    table and side tables bucketed on ``pk`` it is co-located (no shuffle of
    the big side).
    """

    flag_name: str
    keys: DataFrame
    key_cols: list[str]


@dataclass
class CompileContext:
    """Everything an expression needs to compile itself.

    ``database`` grants access to the normalized side tables
    (``seq_mutations``/``seq_coverage``/``seq_missing``/``seq_insertions``/
    ``lineage_closure``/``phylo_nodes`` — SURVEY.md §7.1). ``pk`` is the
    target table's primary-key column.
    """

    database: "Database | None" = None
    table_name: str = "default"
    pk: str = "primary_key"
    mode: AmbiguityMode = AmbiguityMode.NONE
    flag_joins: list[FlagJoin] = field(default_factory=list)
    _flag_counter: int = 0

    def new_flag(self, keys: DataFrame, key_cols: list[str] | None = None) -> str:
        self._flag_counter += 1
        name = f"__silo_flag_{self._flag_counter}"
        self.flag_joins.append(
            FlagJoin(flag_name=name, keys=keys, key_cols=key_cols or [self.pk])
        )
        return name



class Expression:
    """Base of the scalar-expression tree.

    ``compile(ctx)`` returns a boolean ``Column`` whose three-valued-logic
    nulls must already be resolved: like the reference's bitmap semantics, a
    filter either keeps or drops a row — SQL NULL never leaks out of
    ``compile``. Concrete nodes wrap nullable tests in ``coalesce(_, False)``
    where needed.
    """

    def compile(self, ctx: CompileContext) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    # Boolean-algebra sugar
    def __and__(self, other: "Expression") -> "Expression":
        from lapis_silo_spark.expressions.core import And

        return And(self, other)

    def __or__(self, other: "Expression") -> "Expression":
        from lapis_silo_spark.expressions.core import Or

        return Or(self, other)

    def __invert__(self) -> "Expression":
        from lapis_silo_spark.expressions.core import Negation

        return Negation(self)


def apply_flag_joins(df: DataFrame, ctx: CompileContext) -> tuple[DataFrame, list[str]]:
    """Left-join every pending flag onto ``df``; return (df, flag_cols)."""
    from pyspark.sql import functions as F

    flags: list[str] = []
    for fj in ctx.flag_joins:
        keyed = fj.keys.dropDuplicates(fj.key_cols).withColumn(
            fj.flag_name, F.lit(True)
        )
        df = df.join(keyed, on=fj.key_cols, how="left")
        flags.append(fj.flag_name)
    ctx.flag_joins = []
    return df, flags
