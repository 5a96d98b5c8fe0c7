"""SaneQL front-end: the reference's pipeline query language re-implemented as
a Python lexer/parser/binder that emits this engine's Pipeline + Expression
tree (and therefore plain Spark DataFrames).

Reference: ``/root/reference/src/silo/query_engine/saneql/`` — lexer.cpp,
parser.cpp (recursive descent), ast_to_query.cpp (function registries). The
grammar and function surface match; the *output* is a Catalyst logical plan
instead of a QueryNode tree, so all of the reference's rewrite passes
(``planner.cpp:60-71``) are subsumed by Catalyst.
"""

from lapis_silo_spark.saneql.binder import bind_query, execute_query
from lapis_silo_spark.saneql.lexer import QueryParseError
from lapis_silo_spark.saneql.parser import parse

__all__ = ["parse", "bind_query", "execute_query", "QueryParseError"]
