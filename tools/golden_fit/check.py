"""Run every golden query through the pure-Python evaluator against a
candidate dataset and report mismatches.

Usage: python tools/golden_fit/check.py [--verbose] [golden-name ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, "/root/repo")

from facts import DATASET, all_goldens  # noqa: E402
from evaluator import Context, Evaluator  # noqa: E402

from lapis_silo_spark.sources.lineage import parse_lineage_definition_yaml  # noqa: E402
from lapis_silo_spark.sources.phylo import parse_newick  # noqa: E402


def build_context() -> Context:
    import facts

    nuc, aa = facts.references()
    parents, aliases = parse_lineage_definition_yaml(
        (DATASET / "lineage_definition.yaml").read_text())
    nwk_text = (DATASET / "phylogenetic_tree.nwk").read_text()
    nodes = parse_newick(nwk_text)
    import re as _re

    # child render order = appearance order in the newick text
    order = {m.group(0): m.start()
             for m in _re.finditer(r"[A-Za-z0-9_.]+", nwk_text)
             if not m.group(0).replace(".", "").isdigit()}
    return Context(
        nuc_refs=nuc, aa_refs=aa,
        lineage_parents=parents, lineage_aliases=aliases,
        phylo_parent={n: p for n, p, _ in nodes},
        phylo_branch={n: b for n, _, b in nodes},
        phylo_order=order,
    )


def normalize(rows: list[dict]) -> list[tuple]:
    def keyify(r: dict) -> tuple:
        return tuple(sorted(
            (k, "\0None" if v is None
             else repr(round(v, 9)) if isinstance(v, float) and not isinstance(v, bool)
             else repr(v))
            for k, v in r.items()
        ))
    return sorted(keyify(r) for r in rows)


def compare(got: list[dict], expected: list[dict]) -> str | None:
    g, e = normalize(got), normalize(expected)
    if g == e:
        return None
    missing = [r for r in e if r not in g]
    extra = [r for r in g if r not in e]
    return (f"rows got={len(got)} expected={len(expected)}; "
            f"missing={missing[:4]}... extra={extra[:4]}...")


def run(records: list[dict], only: list[str] | None = None,
        verbose: bool = False) -> tuple[int, int, list[str]]:
    ev = Evaluator(build_context())
    passed = failed = 0
    failures: list[str] = []
    for name, case in all_goldens():
        if only and name not in only:
            continue
        expected = case.get("expectedQueryResult") or []
        try:
            got = ev.run(case["query"], records)
        except Exception as exc:  # noqa: BLE001
            failed += 1
            failures.append(f"{name}: EVAL ERROR {type(exc).__name__}: {exc}")
            continue
        diff = compare(got, expected)
        if diff is None:
            passed += 1
        else:
            failed += 1
            failures.append(f"{name}: {diff}")
            if verbose:
                failures[-1] += (f"\n  GOT: {json.dumps(got[:6], default=str)}"
                                 f"\n  EXP: {json.dumps(expected[:6], default=str)}")
    return passed, failed, failures


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    verbose = "--verbose" in sys.argv
    from build_dataset import build_records

    records = build_records()
    passed, failed, failures = run(records, args or None, verbose)
    for f in failures:
        print("FAIL", f)
    print(f"{passed} passed, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
