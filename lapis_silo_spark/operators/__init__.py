"""Pipeline operators — the relational streaming layer.

The reference executes these as Arrow Acero exec nodes
(``/root/reference/src/silo/query_engine/operators/query_node.h:18-44``); here
each is a DataFrame transformation composed through :class:`Pipeline`.
"""

from lapis_silo_spark.operators.relational import Pipeline
from lapis_silo_spark.operators.mutations import mutations_aggregate, insertions_aggregate
from lapis_silo_spark.operators.phylo import most_recent_common_ancestor, phylo_subtree

__all__ = [
    "Pipeline",
    "mutations_aggregate",
    "insertions_aggregate",
    "most_recent_common_ancestor",
    "phylo_subtree",
]
