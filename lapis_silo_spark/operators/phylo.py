"""Phylogenetic-tree operators: MRCA and induced subtree.

Reference: ``src/silo/query_engine/operators/most_recent_common_ancestor_node.cpp``
and ``phylo_subtree_node.cpp``. Both produce a SINGLE output row from the set
of tree-node ids carried by the filtered rows, so the distributed part is only
the distinct-value collection; the tree walk itself runs driver-side over the
(broadcast-scale) ``phylo_nodes`` table — same asymptotics as the reference,
which is single-node anyway, but the row filtering that feeds it is fully
distributed.

MRCA via Euler-tour intervals: the MRCA of a node set S is the deepest node
whose ``[euler_in, euler_out]`` interval contains ``[min euler_in(S),
max euler_out(S)]`` — no pointer chasing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lapis_silo_spark.operators.relational import Pipeline


def _node_sets(pipeline: Pipeline, column: str):
    """(present-in-tree node rows, missing names, null_count) for filtered rows."""
    db = pipeline.database
    nodes = db.phylo_nodes[column]
    vals = (
        pipeline.df.select(F.col(column).alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
    )
    joined = vals.join(nodes, on="node", how="left")
    present = joined.filter(F.col("euler_in").isNotNull()).collect()
    missing = [r["node"] for r in joined.filter(F.col("euler_in").isNull()).collect()]
    return nodes, present, sorted(missing)


def most_recent_common_ancestor(
    pipeline: Pipeline, column: str, print_nodes_not_in_tree: bool = False
) -> DataFrame:
    """One-row result ``{mrcaNode, mrcaParent, mrcaDepth, missingNodeCount
    [, missingFromTree]}`` (``most_recent_common_ancestor_node.cpp:75-85``)."""
    spark = pipeline.df.sparkSession
    nodes, present, missing = _node_sets(pipeline, column)

    if not present:
        row = (None, None, None, len(missing))
    else:
        lo = min(r["euler_in"] for r in present)
        hi = max(r["euler_out"] for r in present)
        mrca = (
            nodes.filter((F.col("euler_in") <= lo) & (F.col("euler_out") >= hi))
            .orderBy(F.col("depth").desc())
            .first()
        )
        row = (mrca["node"], mrca["parent"], mrca["depth"], len(missing))

    schema = "mrcaNode string, mrcaParent string, mrcaDepth int, missingNodeCount int"
    out = spark.createDataFrame([row], schema=schema)
    if print_nodes_not_in_tree:
        out = out.withColumn(
            "missingFromTree", F.lit(",".join(missing) if missing else None)
        )
    return out


def phylo_subtree(
    pipeline: Pipeline,
    column: str,
    print_nodes_not_in_tree: bool = False,
    contract_unary_nodes: bool = False,
) -> DataFrame:
    """Induced subtree of the filtered nodes as a Newick string
    (``phylo_subtree_node.cpp``): keep exactly the selected nodes plus every
    ancestor of ≥ 2 selected-subtree branches (or all ancestors when not
    contracting), then print nested-parenthesis Newick.
    """
    spark = pipeline.df.sparkSession
    db = pipeline.database
    nodes_df = db.phylo_nodes[column]
    _, present, missing = _node_sets(pipeline, column)
    selected = {r["node"] for r in present}

    all_nodes = nodes_df.collect()
    parent_of = {r["node"]: r["parent"] for r in all_nodes}
    depth_of = {r["node"]: r["depth"] for r in all_nodes}

    # Nodes to keep: selected nodes + all their ancestors.
    keep: set[str] = set()
    for n in selected:
        cur: str | None = n
        while cur is not None and cur not in keep:
            keep.add(cur)
            cur = parent_of.get(cur)

    children: dict[str, list[str]] = {}
    roots: list[str] = []
    for n in sorted(keep, key=lambda x: (depth_of.get(x, 0), x)):
        p = parent_of.get(n)
        if p is None or p not in keep:
            roots.append(n)
        else:
            children.setdefault(p, []).append(n)

    def render(n: str) -> str:
        kids = children.get(n, [])
        if contract_unary_nodes:
            # Contract chains of unary, unselected internal nodes.
            while len(kids) == 1 and n not in selected:
                n = kids[0]
                kids = children.get(n, [])
        if not kids:
            return n
        return "(" + ",".join(render(k) for k in sorted(kids)) + ")" + n

    newick = (
        ";".join(render(r) for r in sorted(roots)) + ";" if roots else ""
    )
    out = spark.createDataFrame(
        [(newick if roots else None,)], schema="newick string"
    )
    if print_nodes_not_in_tree:
        out = out.withColumn(
            "missingFromTree", F.lit(",".join(missing) if missing else None)
        )
    return out
