"""Pure-Python evaluator for the reference's e2e golden queries.

Interprets SaneQL ASTs (via :mod:`lapis_silo_spark.saneql.parser`) directly
over in-memory record dicts with *materialized* sequence strings. This is an
independent second implementation of the reference semantics — used to fit
the reconstructed exampleDataset (``build_dataset.py``) and as a cross-check
of the Spark engine.

Record shape::

    {
      "primary_key": str, ...metadata (dates as ISO strings)...,
      "_seq":  {name: str | None},    # aligned nuc; 'N' = unknown/uncovered
      "_aa":   {gene: str | None},    # aligned AA;  'X' = unknown
      "_nuc_ins": {name: {pos: [inserted, ...]}},
      "_aa_ins":  {gene: {pos: [inserted, ...]}},
      "_unaligned": {name: str | None},
    }

Semantics follow the reference exactly (citations inline):
- plain/exact symbol equality is literal; maybe() matches stored symbols at
  least as general as the searched one (symbol_equals.cpp:65-93).
- hasMutation excludes AMBIGUITY_SYMBOLS[ref] (has_mutation.cpp:54-64).
- filters are definite (bitmap) predicates: NULL metadata never matches a
  comparison, and ``!`` is a true complement.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

from lapis_silo_spark.alphabets import (
    AA_MISSING,
    NUC_MISSING,
    ambiguity_symbols,
)
from lapis_silo_spark.saneql import ast as A
from lapis_silo_spark.saneql.parser import parse


@dataclass
class Context:
    nuc_refs: dict[str, str]
    aa_refs: dict[str, str]
    lineage_parents: dict[str, list[str]]  # canonical child -> parents
    lineage_aliases: dict[str, str]        # alias -> canonical
    phylo_parent: dict[str, str | None]    # node -> parent (root -> None)
    phylo_branch: dict[str, float | None] = field(default_factory=dict)
    phylo_order: dict[str, int] = field(default_factory=dict)  # newick file order
    _lineage_desc: dict[str, set[str]] = field(default_factory=dict)

    def canonical(self, lineage: str) -> str:
        return self.lineage_aliases.get(lineage, lineage)

    def descendants(self, lineage: str) -> set[str]:
        """lineage + all sub-lineages (recombinants followed — the corpus
        only exercises the default mode)."""
        key = self.canonical(lineage)
        if key in self._lineage_desc:
            return self._lineage_desc[key]
        children: dict[str, set[str]] = {}
        for child, parents in self.lineage_parents.items():
            for p in parents:
                children.setdefault(p, set()).add(child)
        out = {key}
        stack = [key]
        while stack:
            for ch in children.get(stack.pop(), ()):  # noqa: B023
                if ch not in out:
                    out.add(ch)
                    stack.append(ch)
        self._lineage_desc[key] = out
        return out

    def phylo_depth(self, node: str) -> int:
        d = 0
        cur = self.phylo_parent.get(node)
        while cur is not None:
            d += 1
            cur = self.phylo_parent.get(cur)
        return d

    def phylo_ancestors(self, node: str) -> list[str]:
        out = [node]
        cur = self.phylo_parent.get(node)
        while cur is not None:
            out.append(cur)
            cur = self.phylo_parent.get(cur)
        return out


# --------------------------------------------------------------------------
# scalar predicate evaluation
# --------------------------------------------------------------------------

def _stored_symbol(rec: dict, seq: str, pos: int, is_aa: bool) -> str | None:
    s = (rec["_aa"] if is_aa else rec["_seq"]).get(seq)
    if s is None:
        return None
    return s[pos - 1]


def _symbol_equals(ctx: Context, rec: dict, seq: str, pos: int, symbol: str,
                   mode: str, is_aa: bool) -> bool:
    stored = _stored_symbol(rec, seq, pos, is_aa)
    if stored is None:
        return False  # null sequence never matches (symbol_in_set.cpp:104)
    ref = (ctx.aa_refs if is_aa else ctx.nuc_refs)[seq][pos - 1]
    searched = ref if symbol == "." else symbol
    if mode == "maybe":
        return stored in ambiguity_symbols(searched, is_aa)
    return stored == searched


def _has_mutation(ctx: Context, rec: dict, seq: str, pos: int,
                  mode: str, is_aa: bool) -> bool:
    stored = _stored_symbol(rec, seq, pos, is_aa)
    if stored is None:
        return False
    ref = (ctx.aa_refs if is_aa else ctx.nuc_refs)[seq][pos - 1]
    if mode == "maybe":
        return stored != ref
    return stored not in ambiguity_symbols(ref, is_aa)


def _ins_regex(value: str) -> re.Pattern:
    # insertion_contains.cpp:50-88 — symbols and .* wildcards, full-anchored,
    # case-insensitive; \* escapes a literal stop codon
    return re.compile(f"^(?:{value})$", re.IGNORECASE)


def _insertion_contains(rec: dict, seq: str, pos: int, value: str,
                        is_aa: bool) -> bool:
    table = rec["_aa_ins"] if is_aa else rec["_nuc_ins"]
    pat = _ins_regex(value)
    return any(pat.match(ins) for ins in table.get(seq, {}).get(pos, []))


def _to_py(node: A.Node) -> Any:
    if isinstance(node, A.StringLiteral):
        return node.value
    if isinstance(node, (A.IntLiteral, A.FloatLiteral, A.BoolLiteral)):
        return node.value
    if isinstance(node, A.NullLiteral):
        return None
    if isinstance(node, A.TypeCast):
        return _to_py(node.operand)  # dates stay ISO strings
    raise ValueError(f"not a literal: {node}")


def _named(call: A.FunctionCall) -> dict[str, A.Node]:
    return dict(call.named)


class Evaluator:
    def __init__(self, ctx: Context):
        self.ctx = ctx

    # -- predicates --------------------------------------------------------
    def pred(self, node: A.Node, mode: str = "none") -> Callable[[dict], bool]:
        ctx = self.ctx
        if isinstance(node, A.BinaryExpr):
            if node.op == "&&":
                l, r = self.pred(node.left, mode), self.pred(node.right, mode)
                return lambda rec: l(rec) and r(rec)
            if node.op == "||":
                l, r = self.pred(node.left, mode), self.pred(node.right, mode)
                return lambda rec: l(rec) or r(rec)
            # comparison column <op> literal
            col = node.left.name  # type: ignore[attr-defined]
            val = _to_py(node.right)
            op = node.op

            def cmp(rec: dict, col=col, val=val, op=op) -> bool:
                v = rec.get(col)
                if val is None:
                    # `col = null` is the null test (ast_to_query.cpp:95-96)
                    if op == "=":
                        return v is None
                    if op == "!=":
                        return v is not None
                    raise ValueError(f"{op} null")
                if v is None:
                    return False
                if op == "=":
                    return v == val
                if op == "!=":
                    return v != val
                if op == "<":
                    return v < val
                if op == "<=":
                    return v <= val
                if op == ">":
                    return v > val
                if op == ">=":
                    return v >= val
                raise ValueError(op)

            return cmp
        if isinstance(node, A.UnaryNotExpr):
            inner = self.pred(node.operand, mode)
            return lambda rec: not inner(rec)
        if isinstance(node, A.BoolLiteral):
            return lambda rec: node.value
        if isinstance(node, A.FunctionCall):
            return self._pred_call(node, mode)
        raise ValueError(f"unsupported predicate: {node}")

    def _pred_call(self, call: A.FunctionCall, mode: str) -> Callable[[dict], bool]:
        ctx = self.ctx
        name = call.function_name
        named = _named(call)
        if name == "maybe":
            return self.pred(call.positional[0], "maybe")
        if name == "exact":
            return self.pred(call.positional[0], "exact")
        if name in ("nucleotideEquals", "aminoAcidEquals"):
            is_aa = name == "aminoAcidEquals"
            pos = _to_py(named["position"])
            sym = _to_py(named["symbol"])
            seq = _to_py(named["sequenceName"])
            return lambda rec: _symbol_equals(ctx, rec, seq, pos, sym, mode, is_aa)
        if name in ("hasMutation", "hasAAMutation"):
            is_aa = name == "hasAAMutation"
            pos = _to_py(named["position"])
            seq = _to_py(named["sequenceName"])
            return lambda rec: _has_mutation(ctx, rec, seq, pos, mode, is_aa)
        if name in ("insertionContains", "aminoAcidInsertionContains"):
            is_aa = name == "aminoAcidInsertionContains"
            pos = _to_py(named["position"])
            value = _to_py(named["value"])
            seq = _to_py(named["sequenceName"])
            return lambda rec: _insertion_contains(rec, seq, pos, value, is_aa)
        if name == "nOf":
            k = _to_py(call.positional[0])
            preds = [self.pred(p, mode)
                     for p in call.positional[1].elements]  # type: ignore[attr-defined]
            exactly = bool(_to_py(named["matchExactly"])) if "matchExactly" in named else False
            if exactly:
                return lambda rec: sum(p(rec) for p in preds) == k
            return lambda rec: sum(p(rec) for p in preds) >= k
        if name == "lineage":
            col = call.positional[0].name  # type: ignore[attr-defined]
            value = _to_py(call.positional[1]) if call.positional[1:] else _to_py(named["value"])
            include = bool(_to_py(named["includeSublineages"])) if "includeSublineages" in named else False
            matching = (ctx.descendants(value) if include
                        else {ctx.canonical(value)})
            return lambda rec: (rec.get(col) is not None
                                and ctx.canonical(rec[col]) in matching)
        if name == "phyloDescendantOf":
            col = call.positional[0].name  # type: ignore[attr-defined]
            node = _to_py(call.positional[1])
            return lambda rec: (rec.get(col) in ctx.phylo_parent
                                and node in ctx.phylo_ancestors(rec[col])[1:])
        if name == "isNull":
            col = call.positional[0].name  # type: ignore[attr-defined]
            return lambda rec: rec.get(col) is None
        if name == "isNotNull":
            col = call.positional[0].name  # type: ignore[attr-defined]
            return lambda rec: rec.get(col) is not None
        if name == "between":
            col = call.positional[0].name  # type: ignore[attr-defined]
            lo, hi = _to_py(call.positional[1]), _to_py(call.positional[2])

            def between(rec: dict, col=col, lo=lo, hi=hi) -> bool:
                v = rec.get(col)
                if v is None:
                    return False
                if isinstance(v, float) and not isinstance(v, bool):
                    # float_between.cpp: exclusive upper bound
                    return lo <= v < hi
                return lo <= v <= hi

            return between
        if name == "like":
            col = call.positional[0].name  # type: ignore[attr-defined]
            pat = re.compile(_to_py(call.positional[1]))
            return lambda rec: (rec.get(col) is not None
                                and pat.search(rec[col]) is not None)
        raise ValueError(f"unsupported predicate call: {name}")

    # -- pipeline ----------------------------------------------------------
    def run(self, query: str, records: list[dict]) -> list[dict]:
        return self._run_node(parse(query), records)

    def _run_node(self, node: A.Node, records: list[dict]) -> list[dict]:
        if isinstance(node, A.Identifier):
            if node.name != "default":
                raise ValueError(f"unknown table {node.name}")
            return [dict(r) for r in records]
        if isinstance(node, A.FunctionCall) and node.function_name == "unionAll":
            out: list[dict] = []
            for part in node.positional:
                out.extend(self._run_node(part, records))
            return out
        if not isinstance(node, A.FunctionCall):
            raise ValueError(f"unsupported pipeline node: {node}")
        base = self._run_node(node.positional[0], records)
        name = node.function_name
        args = node.positional[1:]
        named = _named(node)
        if name == "filter":
            p = self.pred(args[0])
            return [r for r in base if p(r)]
        if name == "map":
            rec_node = args[0]
            if not isinstance(rec_node, A.RecordLiteral):
                raise ValueError("map() expects a record literal")
            return [self._map_row(r, rec_node) for r in base]
        if name == "groupBy":
            return self._group_by(base, args)
        if name == "orderBy":
            return self._order_by(base, args[0])
        if name == "project":
            cols = self._col_list(args[0])
            return [self._project_row(r, cols) for r in base]
        if name == "randomize":
            return base  # order-insensitive compare; seed only affects order
        if name == "limit":
            return base[: _to_py(args[0])]
        if name == "offset":
            return base[_to_py(args[0]):]
        if name in ("mutations", "aminoAcidMutations"):
            return self._mutations(base, name == "aminoAcidMutations", named)
        if name in ("insertions", "aminoAcidInsertions"):
            return self._insertions(base, name == "aminoAcidInsertions", named)
        if name == "mostRecentCommonAncestor":
            return self._mrca(base, args, named)
        if name == "phyloSubtree":
            return self._subtree(base, args, named)
        raise ValueError(f"unsupported pipeline op: {name}")

    def _map_row(self, rec: dict, rec_node: "A.RecordLiteral") -> dict:
        out = dict(rec)
        for f in rec_node.fields:
            out[f.name] = self._scalar_value(f.value, rec)
        return out

    def _scalar_value(self, node: A.Node, rec: dict):
        """map() value semantics. ``at()`` is 1-based character extraction
        (``map_node.cpp:63-71``: utf8_slice_codeunits — past-end slice is
        ``""``, null input stays null); on a SEQUENCE column the input is
        the materialized aligned string (null when the row stores no
        sequence — the null group of bitmap_aggregation_node.cpp:75-81)."""
        if isinstance(node, (A.IntLiteral, A.FloatLiteral, A.StringLiteral,
                             A.BoolLiteral)):
            return _to_py(node)
        if isinstance(node, A.Identifier):
            return rec.get(node.name)
        if isinstance(node, A.FunctionCall) and node.function_name == "at":
            col = node.positional[0].name  # type: ignore[attr-defined]
            pos = _to_py(node.positional[1])
            s = rec.get(col)
            if s is None:
                for store in ("_seq", "_aa"):
                    if col in rec.get(store, {}):
                        s = rec[store][col]
                        break
            if s is None:
                return None
            return s[pos - 1] if 1 <= pos <= len(s) else ""
        raise ValueError(f"unsupported map value: {node}")

    def _col_list(self, node: A.Node) -> list[str]:
        if isinstance(node, A.Identifier):
            return [node.name]
        if isinstance(node, A.SetLiteral):
            return [e.name for e in node.elements]  # type: ignore[attr-defined]
        if isinstance(node, A.RecordLiteral):
            return [f.name for f in node.fields]
        raise ValueError(f"unsupported column list: {node}")

    def _project_row(self, rec: dict, cols: list[str]) -> dict:
        out = {}
        for c in cols:
            if c.startswith("unaligned_"):
                out[c] = rec["_unaligned"].get(c[len("unaligned_"):])
            elif c in rec.get("_seq", {}):
                out[c] = self._render_aligned(rec["_seq"][c])
            elif c in rec.get("_aa", {}):
                out[c] = self._render_aligned(rec["_aa"][c])
            else:
                out[c] = rec.get(c)
        return out

    @staticmethod
    def _render_aligned(s: str | None) -> str | None:
        return s

    def _group_by(self, base: list[dict], args: list[A.Node]) -> list[dict]:
        aggs: list[str] = []
        keys: list[str] = []
        for a in args:
            if isinstance(a, A.RecordLiteral):
                for f in a.fields:
                    assert isinstance(f.value, A.FunctionCall) and \
                        f.value.function_name == "count"
                    aggs.append(f.name)
            else:
                keys.extend(self._col_list(a))
        groups: dict[tuple, int] = {}
        for r in base:
            k = tuple(r.get(c) for c in keys)
            groups[k] = groups.get(k, 0) + 1
        if not groups and not keys:
            groups[()] = 0  # global aggregate over zero rows -> one row
        out = []
        for k, n in groups.items():
            row = {c: v for c, v in zip(keys, k)}
            for a in aggs:
                row[a] = n
            out.append(row)
        return out

    def _order_by(self, base: list[dict], spec: A.Node) -> list[dict]:
        items = spec.elements if isinstance(spec, A.SetLiteral) else [spec]
        keys: list[tuple[str, bool]] = []  # (col, desc)
        for it in items:
            if isinstance(it, A.Identifier):
                keys.append((it.name, False))
            elif isinstance(it, A.FunctionCall) and it.function_name in ("asc", "desc"):
                keys.append((it.positional[0].name, it.function_name == "desc"))  # type: ignore[attr-defined]
            else:
                raise ValueError(f"unsupported orderBy item: {it}")
        out = list(base)
        for col, desc in reversed(keys):
            # nulls first on asc, last on desc (reference order_by semantics;
            # a plain not-null key flips correctly under reverse)
            out.sort(key=lambda r: (r.get(col) is not None,
                                    r.get(col) if r.get(col) is not None else 0),
                     reverse=desc)
        return out

    # -- sequence aggregations --------------------------------------------
    def _mutations(self, base: list[dict], is_aa: bool,
                   named: dict[str, A.Node]) -> list[dict]:
        ctx = self.ctx
        min_prop = _to_py(named["minProportion"]) if "minProportion" in named else 0.05
        refs = ctx.aa_refs if is_aa else ctx.nuc_refs
        seq_names = ([e.name for e in named["sequenceNames"].elements]  # type: ignore
                     if "sequenceNames" in named else sorted(refs))
        missing = AA_MISSING if is_aa else NUC_MISSING
        out = []
        store_key = "_aa" if is_aa else "_seq"
        for seq in seq_names:
            ref = refs[seq]
            counts: dict[int, dict[str, int]] = {}
            coverage: dict[int, int] = {}
            for rec in base:
                s = rec[store_key].get(seq)
                if s is None:
                    continue
                for i, (sym, r) in enumerate(zip(s, ref)):
                    if sym == missing:
                        continue
                    coverage[i] = coverage.get(i, 0) + 1
                    if sym != r:
                        counts.setdefault(i, {})
                        counts[i][sym] = counts[i].get(sym, 0) + 1
            for i, syms in counts.items():
                for sym, n in syms.items():
                    cov = coverage[i]
                    prop = n / cov
                    if prop >= min_prop:
                        out.append({
                            "sequenceName": seq, "position": i + 1,
                            "mutationFrom": ref[i], "mutationTo": sym,
                            "count": n, "coverage": cov,
                            "proportion": prop,
                        })
        return out

    def _insertions(self, base: list[dict], is_aa: bool,
                    named: dict[str, A.Node]) -> list[dict]:
        key = "_aa_ins" if is_aa else "_nuc_ins"
        refs = self.ctx.aa_refs if is_aa else self.ctx.nuc_refs
        seq_names = ([e.name for e in named["sequenceNames"].elements]  # type: ignore
                     if "sequenceNames" in named else sorted(refs))
        counts: dict[tuple, int] = {}
        for rec in base:
            for seq in seq_names:
                for pos, values in rec[key].get(seq, {}).items():
                    for v in values:
                        k = (seq, pos, v)
                        counts[k] = counts.get(k, 0) + 1
        return [{"sequenceName": s, "position": p, "insertedSymbols": v,
                 "count": n} for (s, p, v), n in counts.items()]

    # -- phylo actions -----------------------------------------------------
    def _tree_values(self, base: list[dict], col: str):
        in_tree, missing_named, missing_null = [], [], 0
        for rec in base:
            v = rec.get(col)
            if v is None:
                missing_null += 1
            elif v in self.ctx.phylo_parent:
                in_tree.append(v)
            else:
                missing_named.append(v)
        return in_tree, missing_named, missing_null

    def _mrca(self, base, args, named) -> list[dict]:
        col = _to_py(args[0])
        print_missing = ("printNodesNotInTree" in named
                         and _to_py(named["printNodesNotInTree"]))
        in_tree, missing_named, missing_null = self._tree_values(base, col)
        row: dict[str, Any] = {}
        if in_tree:
            paths = [list(reversed(self.ctx.phylo_ancestors(v))) for v in set(in_tree)]
            mrca = None
            for depth, nodes in enumerate(zip(*paths)):
                if len(set(nodes)) == 1:
                    mrca = nodes[0]
                else:
                    break
            row["mrcaNode"] = mrca
            row["mrcaParent"] = self.ctx.phylo_parent.get(mrca)
            row["mrcaDepth"] = self.ctx.phylo_depth(mrca)
        else:
            row["mrcaNode"] = None
            row["mrcaParent"] = None
            row["mrcaDepth"] = None
        row["missingNodeCount"] = len(missing_named) + missing_null
        if print_missing:
            row["missingFromTree"] = ",".join(sorted(missing_named))
        return [row]

    def _subtree(self, base, args, named) -> list[dict]:
        col = _to_py(args[0])
        contract = (_to_py(named["contractUnaryNodes"])
                    if "contractUnaryNodes" in named else True)
        print_missing = ("printNodesNotInTree" in named
                         and _to_py(named["printNodesNotInTree"]))
        in_tree, missing_named, missing_null = self._tree_values(base, col)
        newick = ""
        leaves = sorted(set(in_tree))
        if len(leaves) >= 2:
            # induced subtree: union of root-paths of the selected leaves,
            # rooted at their MRCA
            keep: set[str] = set()
            paths = {v: self.ctx.phylo_ancestors(v) for v in leaves}
            mrca_path = [list(reversed(p)) for p in paths.values()]
            mrca = None
            for nodes in zip(*mrca_path):
                if len(set(nodes)) == 1:
                    mrca = nodes[0]
                else:
                    break
            for v, anc in paths.items():
                for n in anc:
                    keep.add(n)
                    if n == mrca:
                        break
            children: dict[str, list[str]] = {}
            for n in keep:
                if n != mrca:
                    p = self.ctx.phylo_parent.get(n)
                    if p in keep:
                        children.setdefault(p, []).append(n)

            def render(n: str, blen: float | None) -> str:
                kids = sorted(children.get(n, []),
                              key=lambda c: self.ctx.phylo_order.get(c, 0))
                if contract and len(kids) == 1 and n != mrca:
                    child = kids[0]
                    cb = self.ctx.phylo_branch.get(child)
                    merged = (blen or 0.0) + (cb or 0.0)
                    return render(child, merged if (blen is not None or cb is not None) else None)
                body = ""
                if kids:
                    body = "(" + ",".join(
                        render(k, self.ctx.phylo_branch.get(k)) for k in kids
                    ) + ")"
                label = body + n
                if blen is not None:
                    label += f":{_fmt_branch(blen)}"
                return label

            newick = render(mrca, None) + ";"
        row: dict[str, Any] = {"subtreeNewick": newick,
                               "missingNodeCount": len(missing_named) + missing_null}
        if print_missing:
            row["missingFromTree"] = ",".join(sorted(missing_named))
        return [row]


def _fmt_branch(x: float) -> str:
    # branch sums re-round to the data's precision so float addition noise
    # (0.00023743999999999998) doesn't leak into the Newick text
    return repr(round(x, 11))
