"""Phylogenetic-tree operators: MRCA and induced subtree.

Reference: ``src/silo/query_engine/operators/most_recent_common_ancestor_node.cpp``
and ``phylo_subtree_node.cpp``. Both produce a SINGLE output row from the set
of tree-node ids carried by the filtered rows, so the distributed part is only
the distinct-value collection; the tree walk itself runs driver-side over the
(broadcast-scale) ``phylo_nodes`` table — same asymptotics as the reference,
which is single-node anyway, but the row filtering that feeds it is fully
distributed.

Golden-test output contracts (endToEndTests/test/queries/):
- MRCA: {mrcaNode, mrcaParent, mrcaDepth, missingNodeCount[, missingFromTree]}
  where missingNodeCount counts filtered ROWS whose node is null or absent
  from the tree, and missingFromTree lists the distinct non-null absent values
  (MostRecentCommonAncestor_withMissingNode.json: count 3, list "key_1,key_35").
- phyloSubtree: {subtreeNewick, missingNodeCount[, missingFromTree]}; the
  newick carries branch lengths (Subtree_simpleQuery.json).

MRCA via Euler-tour intervals: the MRCA of a node set S is the deepest node
whose ``[euler_in, euler_out]`` interval contains ``[min euler_in(S),
max euler_out(S)]`` — no pointer chasing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lapis_silo_spark.operators.relational import Pipeline
from lapis_silo_spark.session import local_relation

# Driver budget for tree materializations. Both operators produce a single
# output row from a driver-side walk (same asymptotics as the reference,
# which is single-node anyway), so the collected set is bounded by the TREE
# size, not the table size — but a mis-registered high-cardinality column
# must fail fast with a clear message instead of OOMing the driver.
MAX_DRIVER_TREE_NODES = 2_000_000


def _bounded_collect(df: DataFrame, what: str) -> list:
    rows = df.limit(MAX_DRIVER_TREE_NODES + 1).collect()
    if len(rows) > MAX_DRIVER_TREE_NODES:
        raise ValueError(
            f"{what} exceeds the driver materialization budget of "
            f"{MAX_DRIVER_TREE_NODES} rows; phylo operators walk the tree "
            "driver-side and require a broadcast-scale phylo_nodes table "
            "(raise lapis_silo_spark.operators.phylo.MAX_DRIVER_TREE_NODES "
            "only with matching driver memory)"
        )
    return rows


def _node_sets(pipeline: Pipeline, column: str):
    """Collect, over the FILTERED rows:
    (nodes_df, present tree rows, distinct missing names, missing row count)."""
    db = pipeline.database
    nodes = db.phylo_nodes[column]
    vals = (
        pipeline.df.groupBy(F.col(column).alias("node"))
        .agg(F.count(F.lit(1)).alias("row_cnt"))
    )
    joined = _bounded_collect(
        vals.join(nodes, on="node", how="left"),
        f"distinct value set of column {column!r}",
    )
    present = [r for r in joined if r["node"] is not None and r["euler_in"] is not None]
    missing_names = sorted(
        r["node"] for r in joined if r["node"] is not None and r["euler_in"] is None
    )
    missing_rows = sum(
        r["row_cnt"]
        for r in joined
        if r["node"] is None or r["euler_in"] is None
    )
    return nodes, present, missing_names, missing_rows


def most_recent_common_ancestor(
    pipeline: Pipeline, column: str, print_nodes_not_in_tree: bool = False
) -> DataFrame:
    """One-row result (see module docstring for the golden contract)."""
    spark = pipeline.df.sparkSession
    nodes, present, missing_names, missing_rows = _node_sets(pipeline, column)

    if not present:
        row = (None, None, None, missing_rows)
    else:
        lo = min(r["euler_in"] for r in present)
        hi = max(r["euler_out"] for r in present)
        mrca = (
            nodes.filter((F.col("euler_in") <= lo) & (F.col("euler_out") >= hi))
            .orderBy(F.col("depth").desc())
            .first()
        )
        row = (mrca["node"], mrca["parent"], mrca["depth"], missing_rows)

    schema = "mrcaNode string, mrcaParent string, mrcaDepth int, missingNodeCount long"
    out = local_relation(spark, [row], schema)
    if print_nodes_not_in_tree:
        out = out.withColumn(
            "missingFromTree",
            F.lit(",".join(missing_names) if missing_names else None),
        )
    return out


def _format_branch_length(length: float | None) -> str:
    if length is None:
        return ""
    # Match the reference's shortest-roundtrip float formatting (1e-06 →
    # 1e-06); contraction sums re-round to the data's precision so float
    # addition noise (…3999999999998) doesn't leak into the Newick text
    text = repr(round(length, 11))
    return f":{text}"


def phylo_subtree(
    pipeline: Pipeline,
    column: str,
    print_nodes_not_in_tree: bool = False,
    contract_unary_nodes: bool = False,
) -> DataFrame:
    """Induced subtree of the filtered nodes as a Newick string with branch
    lengths (``phylo_subtree_node.cpp``): keep the selected nodes plus all
    their ancestors; optionally contract pass-through (unary, unselected)
    internal nodes, accumulating branch lengths along contracted chains.
    """
    spark = pipeline.df.sparkSession
    db = pipeline.database
    nodes_df = db.phylo_nodes[column]
    _, present, missing_names, missing_rows = _node_sets(pipeline, column)
    selected = {r["node"] for r in present}

    all_nodes = _bounded_collect(nodes_df, f"phylo tree for {column!r}")
    parent_of = {r["node"]: r["parent"] for r in all_nodes}
    depth_of = {r["node"]: r["depth"] for r in all_nodes}
    length_of = {r["node"]: r["branch_length"] for r in all_nodes}
    # euler_in follows the source tree's sibling order — the golden Newick
    # renders children in file order, not lexically
    order_of = {r["node"]: r["euler_in"] for r in all_nodes}

    # Root the induced subtree at the MRCA of the selected set
    # (Subtree_simpleQuery.json's output root is the selected keys' MRCA,
    # not the tree root).
    mrca: str | None = None
    if present:
        lo = min(r["euler_in"] for r in present)
        hi = max(r["euler_out"] for r in present)
        candidates = [
            r for r in all_nodes if r["euler_in"] <= lo and r["euler_out"] >= hi
        ]
        mrca = max(candidates, key=lambda r: r["depth"])["node"]

    keep: set[str] = set()
    for n in selected:
        cur: str | None = n
        while cur is not None and cur not in keep:
            keep.add(cur)
            if cur == mrca:
                break
            cur = parent_of.get(cur)

    children: dict[str, list[str]] = {}
    roots: list[str] = [mrca] if mrca is not None else []
    for n in sorted(keep, key=lambda x: (depth_of.get(x, 0), x)):
        p = parent_of.get(n)
        if n != mrca and p is not None and p in keep:
            children.setdefault(p, []).append(n)

    def render(n: str, acc_length: float | None = None) -> str:
        kids = children.get(n, [])
        length = length_of.get(n)
        if acc_length is not None:
            length = (length or 0.0) + acc_length
        if contract_unary_nodes and len(kids) == 1 and n not in selected:
            # pass-through node: splice it out, push its length to the child
            return render(kids[0], (length or 0.0) if length is not None else None)
        label = n + _format_branch_length(length)
        if not kids:
            return label
        kids = sorted(kids, key=lambda k: order_of.get(k, 0))
        return "(" + ",".join(render(k) for k in kids) + ")" + label

    def render_root(n: str) -> str:
        # root carries no branch length in the reference output
        kids = children.get(n, [])
        if contract_unary_nodes and len(kids) == 1 and n not in selected:
            return render_root(kids[0])
        if not kids:
            return n
        kids = sorted(kids, key=lambda k: order_of.get(k, 0))
        return "(" + ",".join(render(k) for k in kids) + ")" + n

    # no tree nodes selected → empty string, not null
    # (Subtree_onlyMissingNodes.json)
    newick = ";".join(render_root(r) for r in sorted(roots)) + ";" if roots else ""
    out = local_relation(
        spark, [(newick, missing_rows)],
        "subtreeNewick string, missingNodeCount long",
    )
    if print_nodes_not_in_tree:
        out = out.withColumn(
            "missingFromTree",
            F.lit(",".join(missing_names) if missing_names else None),
        )
    return out
