"""Reconstruct the reference exampleDataset from its golden outputs.

The e2e corpus (`endToEndTests/test/queries/`) fully determines a dataset
that reproduces every expected result: Details-style goldens expose 62 full
metadata rows, `fastaAligned`/`fasta_*` expose every testSecondSequence,
groupBy goldens give exact marginal distributions for the remaining 38 rows,
and the mutation/insertion aggregation goldens pin the sequence stores. This
module assembles those facts into 100 records and fills the remaining
degrees of freedom deterministically so that **all** golden queries evaluate
to their expected outputs (verified by ``check.py`` / the Spark golden
suite).

The result is golden-equivalent rather than byte-identical to the original
``input_file.ndjson`` (which is not in the snapshot): wherever the corpus
does not constrain a value, a deterministic filler is used.
"""

from __future__ import annotations

import collections
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, "/root/repo")

import facts  # noqa: E402

MAIN = "main"
SECOND = "testSecondSequence"


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------

def _residual(field: str, golden: str, known: dict[str, dict]) -> collections.Counter:
    expected = facts.marginal(golden, field)
    have = collections.Counter(r[field] for r in known.values())
    residual = collections.Counter()
    for value, count in expected.items():
        rest = count - have.get(value, 0)
        assert rest >= 0, (field, value, count, have.get(value))
        if rest:
            residual[value] = rest
    assert sum(residual.values()) == 100 - len(known), field
    return residual


def _take(counter: collections.Counter, pred=None):
    for value in list(counter):
        if counter[value] > 0 and (pred is None or pred(value)):
            counter[value] -= 1
            return value
    raise AssertionError(f"counter exhausted: {counter} pred={pred}")


def build_metadata() -> dict[str, dict]:
    keys = facts.primary_keys()
    known = facts.known_metadata()
    booleans = facts.known_booleans()

    rows: dict[str, dict] = {}
    for pk in keys:
        if pk in known:
            row = dict(known[pk])
            assert row["usherTree"] in (pk, None)  # key_29 is null-usherTree
            rows[pk] = row

    unknown = [pk for pk in keys if pk not in known]

    division = _residual("division", "GroupByDivision", known)
    lineage = _residual("pango_lineage", "GroupByLineage", known)
    age = _residual("age", "OrderByAge", known)
    qc = _residual("qc_value", "OrderByFloat", known)

    # Vaud rows are named outright (fasta_manySequences)
    vaud = set(facts.vaud_keys())
    assert all(known[pk]["division"] == "Vaud" for pk in vaud if pk in known)

    # lineage closures for the boolean cross-constraints
    from check import build_context

    ctx = build_context()
    b1 = ctx.descendants("B.1")
    b11 = ctx.descendants("B.1.1")

    # date buckets from the cumulative count goldens:
    #   <=03-16: 51, =03-17: 0, =03-18: 1, =03-19: 1, >=03-20: 46, null: 1
    def bucket(d: str | None) -> str:
        if d is None:
            return "null"
        if d <= "2021-03-16":
            return "lo"
        if d == "2021-03-17":
            return "d17"
        if d == "2021-03-18":
            return "d18"
        if d == "2021-03-19":
            return "d19"
        return "hi"

    targets = {"lo": 51, "d17": 0, "d18": 1, "d19": 1, "hi": 46, "null": 1}
    have = collections.Counter(bucket(r["date"]) for r in known.values())
    date_pool = collections.Counter(
        {b: targets[b] - have[b] for b in targets if targets[b] - have[b] > 0}
    )
    assert all(targets[b] >= have[b] for b in targets)
    bucket_fill = {"lo": "2021-02-01", "d17": "2021-03-17", "d18": "2021-03-18",
                   "d19": "2021-03-19", "hi": "2021-04-05", "null": None}

    # unsorted_date: between('2021-03-18','2021-03-20') inclusive = 2 rows,
    # 98 rows outside (none null — dateBetween-style isNotNull isn't golden-
    # constrained for unsorted_date, but known rows are all non-null).
    in_range_known = sum(
        1 for r in known.values()
        if r["unsorted_date"] is not None
        and "2021-03-18" <= r["unsorted_date"] <= "2021-03-20"
    )
    udate_in_needed = 2 - in_range_known
    assert udate_in_needed >= 0

    # booleans: true = 41 global; false ∧ B.1-closure = 37 (exact!);
    # null ∨ B.1.1-closure = 68. Solved jointly with the lineage residual:
    # nearly every residual lineage is in the B.1 closure, so extra false
    # rows would overshoot 37 — the bool and lineage draws must be paired.
    known_bool = dict(booleans)
    unknown_bool = [pk for pk in unknown if pk not in known_bool]
    overlap = [pk for pk in unknown if pk in known_bool]  # bool fixed, rest unknown

    fb1_known = sum(
        1 for pk, v in known_bool.items()
        if v is False and pk in known
        and known[pk]["pango_lineage"] is not None
        and ctx.canonical(known[pk]["pango_lineage"]) in b1
    )
    nb11_known = sum(
        1 for pk, v in known_bool.items()
        if (v is None) or (
            pk in known and known[pk]["pango_lineage"] is not None
            and ctx.canonical(known[pk]["pango_lineage"]) in b11)
    )
    lin_pool = list(lineage.elements())  # residual lineages as a multiset
    nonb1 = [v for v in lin_pool if v is None or ctx.canonical(v) not in b1]
    b11_lins = [v for v in lin_pool if v is not None and ctx.canonical(v) in b11]
    b1_only = [v for v in lin_pool
               if v is not None and ctx.canonical(v) in b1
               and ctx.canonical(v) not in b11]

    lineage_assign: dict[str, str | None] = {}
    bool_assign: dict[str, bool | None] = {}

    # overlap rows with fixed FALSE bools: every one with a B.1-closure
    # lineage counts toward the exact 37 — park as many as possible on the
    # (scarce) non-B.1 lineages, the rest are forced contributors.
    ov_false = [pk for pk in overlap if known_bool[pk] is False]
    ov_null = [pk for pk in overlap if known_bool[pk] is None]
    ov_true = [pk for pk in overlap if known_bool[pk] is True]
    forced_false_b1 = 0
    for pk in ov_false:
        if nonb1:
            lineage_assign[pk] = nonb1.pop(0)
        else:
            lineage_assign[pk] = b1_only.pop(0)
            forced_false_b1 += 1
    # null-bool overlap rows are already counted in nb11 — keep them off
    # B.1.1 lineages to avoid double-spending
    for pk in ov_null:
        lineage_assign[pk] = (b1_only or nonb1).pop(0)
    # true overlap rows soak up B.1.1-closure lineages (satisfying nb11)
    for pk in ov_true:
        lineage_assign[pk] = (b11_lins or b1_only or nonb1).pop(0)

    nb11_from_lineage = sum(
        1 for pk, lin in lineage_assign.items()
        if known_bool[pk] is not None
        and lin is not None and ctx.canonical(lin) in b11
    )

    true_needed = 41 - sum(1 for v in known_bool.values() if v is True)
    fb1_needed = 37 - fb1_known - forced_false_b1
    # every remaining B.1.1 lineage will land on a true/false row below
    nb11_needed = 68 - nb11_known - nb11_from_lineage - len(b11_lins)
    null_needed = nb11_needed
    false_needed = len(unknown_bool) - true_needed - null_needed
    assert false_needed == fb1_needed, (false_needed, fb1_needed)
    assert min(true_needed, null_needed, false_needed) >= 0

    rest_lins = b11_lins + b1_only + nonb1
    # nulls must avoid B.1.1 lineages (no double count), B.1.1 leftovers go
    # to true/false rows; falses may take any B.1 lineage (closure nesting)
    for i, pk in enumerate(unknown_bool):
        if i < true_needed:
            bool_assign[pk] = True
            lineage_assign[pk] = rest_lins.pop(0)
        elif i < true_needed + false_needed:
            bool_assign[pk] = False
            lin = rest_lins.pop(0)
            assert lin is not None and ctx.canonical(lin) in b1
            lineage_assign[pk] = lin
        else:
            bool_assign[pk] = None
            nb11_ok = [v for v in rest_lins
                       if v is None or ctx.canonical(v) not in b11]
            lin = nb11_ok[0]
            rest_lins.remove(lin)
            lineage_assign[pk] = lin
    assert not rest_lins

    # divisions: Vaud keys take theirs; everyone else draws from the residual
    udate_assigned = 0
    for pk in unknown:
        row: dict = {"primary_key": pk, "region": "Europe",
                     "country": "Switzerland"}
        row["pango_lineage"] = lineage_assign[pk]
        if pk in vaud:
            row["division"] = _take(division, lambda v: v == "Vaud")
        else:
            row["division"] = _take(division, lambda v: v != "Vaud")
        row["age"] = _take(age)
        row["qc_value"] = _take(qc)
        b = _take(date_pool)
        if (b == "lo" and not any(r.get("date") == "2021-01-25"
                                  for r in rows.values())
                and pk not in facts.s214_epe_keys()):
            # insertionContainsStopCodon: the S:214:*EPE carrier is dated
            # 2021-01-25 — reserve one low-bucket row for it
            row["date"] = "2021-01-25"
        else:
            row["date"] = bucket_fill[b]
        if udate_assigned < udate_in_needed:
            row["unsorted_date"] = "2021-03-19"
            udate_assigned += 1
        else:
            row["unsorted_date"] = "2021-05-01"
        row["test_boolean_column"] = (
            bool_assign[pk] if pk in bool_assign else known_bool[pk]
        )
        row["usherTree"] = None if pk == "key_29" else pk
        rows[pk] = row
    assert udate_assigned == udate_in_needed
    return {pk: rows[pk] for pk in keys}


# ---------------------------------------------------------------------------
# sequences (fitted in build_sequences.py; imported here for assembly)
# ---------------------------------------------------------------------------

def build_records() -> list[dict]:
    from build_sequences import build_aa, build_insertions, build_main

    meta = build_metadata()
    aligned_second, unaligned_second = facts.second_sequences()
    unaligned_main = facts.unaligned_main_rows()
    keys = facts.primary_keys()

    main_seqs = build_main(meta)
    aa_seqs = build_aa(meta)
    nuc_ins, aa_ins = build_insertions(meta)

    records = []
    for pk in keys:
        rec = dict(meta[pk])
        rec["_seq"] = {MAIN: main_seqs[pk], SECOND: aligned_second[pk]}
        rec["_aa"] = aa_seqs[pk]
        rec["_nuc_ins"] = nuc_ins.get(pk, {})
        rec["_aa_ins"] = aa_ins.get(pk, {})
        rec["_unaligned"] = {
            MAIN: unaligned_main.get(pk),
            SECOND: unaligned_second[pk],
        }
        records.append(rec)
    return records


def main() -> int:
    records = build_records()
    out = Path(__file__).parent / "dataset_preview.json"
    slim = []
    for r in records[:5]:
        s = {k: v for k, v in r.items() if not k.startswith("_")}
        s["main_head"] = (r["_seq"][MAIN] or "")[:40]
        slim.append(s)
    out.write_text(json.dumps(slim, indent=1, default=str))
    print(f"built {len(records)} records; preview -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
