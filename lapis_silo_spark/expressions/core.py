"""Metadata (non-sequence) predicates.

Parity map (reference file → this module):

- ``and.cpp`` / ``or.cpp`` / ``negation.cpp`` → :class:`And` / :class:`Or` /
  :class:`Negation` (Catalyst does the flattening / De-Morgan /
  constant-short-circuit rewrites the reference hand-codes at
  ``and.cpp:91-130``).
- ``equals.cpp`` → :class:`Equals` / :class:`NotEquals`.
- ``int_between.cpp`` / ``float_between.cpp`` / ``date_between.cpp`` →
  :class:`Between` (inclusive; null bound = open, matching
  ``query_documentation.md:498-505``).
- ``string_in_set.cpp`` → :class:`InSet`.
- ``is_null.cpp`` → :class:`IsNull` / :class:`IsNotNull`.
- ``string_search.cpp`` (RE2 partial match) → :class:`Like` via ``rlike``.
- ``nof.cpp`` (Threshold DP over bitmaps, ``filter/operators/threshold.cpp``)
  → :class:`NOf` as an integer sum of casted booleans — one Spark expression,
  no DP needed.
- Comparison operators ``< <= > >=`` → full support (the reference only
  supports a partial set, ``ast_to_query.cpp:139-201``; ours is a superset).

Null semantics: the reference's filters operate on bitmaps, so a row either
survives or not — SQL three-valued logic must not leak. Leaves compile to RAW
conditions (NULL stays NULL) so Catalyst pushes them into the Parquet scan;
at the filter boundary NULL means "not matched", which already matches the
bitmap semantics, and :class:`Negation` is the single point that resolves
NULL (``coalesce(NOT cond, true)``) so ``Negation(Equals(c, v))`` keeps rows
where ``c`` is NULL — the reference's complement within the full row universe
(``filter/operators/complement.cpp``).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from lapis_silo_spark.expressions.base import (
    CompileContext,
    Expression,
    QueryCompileError,
)


class TrueExpr(Expression):
    """``filter/operators/full.cpp`` — all rows."""

    def compile(self, ctx: CompileContext) -> Column:
        return F.lit(True)


class FalseExpr(Expression):
    """``filter/operators/empty.cpp`` — no rows."""

    def compile(self, ctx: CompileContext) -> Column:
        return F.lit(False)


class And(Expression):
    def __init__(self, *children: Expression):
        if not children:
            raise QueryCompileError("And requires at least one child")
        self.children = list(children)

    def compile(self, ctx: CompileContext) -> Column:
        out = self.children[0].compile(ctx)
        for child in self.children[1:]:
            out = out & child.compile(ctx)
        return out


class Or(Expression):
    def __init__(self, *children: Expression):
        if not children:
            raise QueryCompileError("Or requires at least one child")
        self.children = list(children)

    def compile(self, ctx: CompileContext) -> Column:
        out = self.children[0].compile(ctx)
        for child in self.children[1:]:
            out = out | child.compile(ctx)
        return out


class Negation(Expression):
    def __init__(self, child: Expression):
        self.child = child

    def compile(self, ctx: CompileContext) -> Column:
        # Complement within the row universe (``complement.cpp``): a row
        # matches the negation iff the child did NOT match — and in
        # three-valued logic "did not match" covers both FALSE and NULL.
        # Leaves deliberately compile to RAW conditions (so Catalyst can push
        # them into the Parquet scan); this coalesce is the single place
        # where NULL resolves, mirroring how the reference's bitmaps have no
        # null state at the operator level.
        return F.coalesce(~self.child.compile(ctx), F.lit(True))


class _ColumnPredicate(Expression):
    def __init__(self, column: str):
        self.column = column


class Equals(_ColumnPredicate):
    def __init__(self, column: str, value: Any):
        super().__init__(column)
        self.value = value

    def compile(self, ctx: CompileContext) -> Column:
        if self.value is None:
            # Reference treats `col = null` as isNull (input_format nulls are
            # first-class); keep that convenience.
            return F.col(self.column).isNull()
        # RAW condition (no null-coalescing) so the EqualTo pushes into the
        # Parquet scan; NULL rows yield NULL ⇒ not matched at the filter,
        # identical to the reference's bitmap semantics.
        return F.col(self.column) == F.lit(self.value)


class NotEquals(_ColumnPredicate):
    def __init__(self, column: str, value: Any):
        super().__init__(column)
        self.value = value

    def compile(self, ctx: CompileContext) -> Column:
        if self.value is None:
            return F.col(self.column).isNotNull()
        # A NULL cell does not equal v, so NOT EQUALS keeps it. The
        # IsNull ∨ ≠ form stays pushable (Or(IsNull, Not(EqualTo))).
        c = F.col(self.column)
        return c.isNull() | (c != F.lit(self.value))


class _Comparison(_ColumnPredicate):
    op: str = ""

    def __init__(self, column: str, value: Any):
        super().__init__(column)
        self.value = value

    def compile(self, ctx: CompileContext) -> Column:
        c = F.col(self.column)
        v = F.lit(self.value)
        cmp = {
            "<": c < v,
            "<=": c <= v,
            ">": c > v,
            ">=": c >= v,
        }[self.op]
        return cmp


class LessThan(_Comparison):
    op = "<"


class LessEquals(_Comparison):
    op = "<="


class GreaterThan(_Comparison):
    op = ">"


class GreaterEquals(_Comparison):
    op = ">="


class Between(_ColumnPredicate):
    """Inclusive range; a null bound means open on that side.

    Reference: ``int_between.cpp:49-95`` / ``date_between.cpp`` /
    ``float_between.cpp``. NOTE the reference's float ``to`` bound is
    *exclusive* (documented wart, ``query_documentation.md:504``); we use the
    consistent inclusive semantics — the SaneQL front-end can reproduce the
    wart when byte-compatibility with golden results demands it via
    ``float_to_exclusive=True``.
    """

    def __init__(self, column: str, low: Any = None, high: Any = None,
                 float_to_exclusive: bool = False):
        super().__init__(column)
        self.low = low
        self.high = high
        self.float_to_exclusive = float_to_exclusive

    def compile(self, ctx: CompileContext) -> Column:
        c = F.col(self.column)
        cond = F.lit(True)
        if self.low is not None:
            cond = cond & (c >= F.lit(self.low))
        if self.high is not None:
            upper = (c < F.lit(self.high)) if self.float_to_exclusive else (
                c <= F.lit(self.high)
            )
            cond = cond & upper
        if self.low is None and self.high is None:
            return c.isNotNull()
        return cond


class InSet(_ColumnPredicate):
    """``in(col, {values})`` — ``scalar_expressions/string_in_set.cpp``."""

    def __init__(self, column: str, values: Sequence[Any]):
        super().__init__(column)
        self.values = list(values)
        self.include_null = any(v is None for v in self.values)
        self.non_null = [v for v in self.values if v is not None]

    def compile(self, ctx: CompileContext) -> Column:
        c = F.col(self.column)
        cond = c.isin(self.non_null) if self.non_null else F.lit(False)
        if self.include_null:
            cond = cond | c.isNull()
        return cond


class IsNull(_ColumnPredicate):
    def compile(self, ctx: CompileContext) -> Column:
        return F.col(self.column).isNull()


class IsNotNull(_ColumnPredicate):
    def compile(self, ctx: CompileContext) -> Column:
        return F.col(self.column).isNotNull()


class Like(_ColumnPredicate):
    """``like(col, regex)`` — RE2 *partial* match (``string_search.cpp:30-50``).

    Spark's ``rlike`` is also a partial (find-anywhere) regex match, so the
    semantics line up; RE2 and Java regex dialects agree on the subset the
    reference documents.
    """

    def __init__(self, column: str, pattern: str):
        super().__init__(column)
        self.pattern = pattern

    def compile(self, ctx: CompileContext) -> Column:
        return F.col(self.column).rlike(self.pattern)


class NOf(Expression):
    """At-least / exactly n of k children — ``nof.cpp`` + ``threshold.cpp``.

    The reference runs a dynamic program over k bitmaps
    (``threshold.cpp:64-139``); in Spark the whole thing is
    ``sum(cast(child_i as int)) >= n`` — a single codegen'd expression, no
    custom operator, and it parallelizes for free.
    """

    def __init__(self, count: int, children: Sequence[Expression],
                 match_exactly: bool = False):
        if count < 0:
            raise QueryCompileError("nOf: count must be >= 0")
        self.count = count
        self.children = list(children)
        self.match_exactly = match_exactly

    def compile(self, ctx: CompileContext) -> Column:
        if not self.children:
            return F.lit(self.count == 0)
        total = F.lit(0)
        for child in self.children:
            # NULL child verdict counts as no-match (reference: absent from
            # the child bitmap), so resolve before the arithmetic.
            total = total + F.coalesce(child.compile(ctx), F.lit(False)).cast("int")
        return (total == F.lit(self.count)) if self.match_exactly else (
            total >= F.lit(self.count)
        )
