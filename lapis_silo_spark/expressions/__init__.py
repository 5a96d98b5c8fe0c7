"""Scalar-expression tree — the logical filter layer.

Mirrors the *semantics* of the reference's scalar expressions
(``/root/reference/src/silo/query_engine/scalar_expressions/``): a tree that is
(1) rewritten under an ambiguity mode (maybe/exact, reference
``scalar_expression.h:24``) and (2) compiled — here into PySpark boolean
``Column`` expressions plus, for sequence/hierarchy predicates, flag-producing
joins against normalized side tables (the Spark-native replacement for the
reference's bitmap filter operators in
``src/silo/query_engine/filter/operators/``).
"""

from lapis_silo_spark.expressions.base import (
    AmbiguityMode,
    CompileContext,
    Expression,
    QueryCompileError,
)
from lapis_silo_spark.expressions.core import (
    And,
    Between,
    Equals,
    FalseExpr,
    GreaterEquals,
    GreaterThan,
    InSet,
    IsNotNull,
    IsNull,
    LessEquals,
    LessThan,
    Like,
    Negation,
    NOf,
    NotEquals,
    Or,
    TrueExpr,
)
from lapis_silo_spark.expressions.sequence import (
    Exact,
    HasMutation,
    InsertionContains,
    Maybe,
    MutationProfile,
    SequenceAt,
    SymbolEquals,
)
from lapis_silo_spark.expressions.lineage import LineageFilter, PhyloDescendantOf

__all__ = [
    "AmbiguityMode",
    "CompileContext",
    "Expression",
    "QueryCompileError",
    "And",
    "Or",
    "Negation",
    "TrueExpr",
    "FalseExpr",
    "Equals",
    "NotEquals",
    "LessThan",
    "LessEquals",
    "GreaterThan",
    "GreaterEquals",
    "Between",
    "InSet",
    "IsNull",
    "IsNotNull",
    "Like",
    "NOf",
    "SequenceAt",
    "SymbolEquals",
    "HasMutation",
    "InsertionContains",
    "MutationProfile",
    "Maybe",
    "Exact",
    "LineageFilter",
    "PhyloDescendantOf",
]
