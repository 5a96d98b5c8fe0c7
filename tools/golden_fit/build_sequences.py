"""Sequence-store construction for the reconstructed exampleDataset.

``main`` is built from group templates over the reference genome whose
memberships were derived from the corpus' count/mutation goldens (see the
design notes in comments); amino-acid genes are fitted to the
aaMutDistribution tables; insertions follow the insertionsAction tables.

Representation: aligned sequences as full strings — 'N'/'X' = unknown
(uncovered or interior missing), '-' = covered deletion, otherwise the
stored symbol.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, "/root/repo")

import facts  # noqa: E402

NUC_REFS, AA_REFS = facts.references()
MAIN_REF = NUC_REFS["main"]
L = len(MAIN_REF)


class Seq:
    """Mutable sequence under construction."""

    def __init__(self, ref: str, missing: str = "N"):
        self.ref = ref
        self.missing = missing
        self.chars = [missing] * len(ref)

    def cover(self, start: int, end: int) -> "Seq":
        """Positions [start, end] (1-based, inclusive) become reference."""
        self.chars[start - 1:end] = list(self.ref[start - 1:end])
        return self

    def put(self, pos: int, sym: str) -> "Seq":
        self.chars[pos - 1] = sym
        return self

    def miss(self, *positions: int) -> "Seq":
        for p in positions:
            self.chars[p - 1] = self.missing
        return self

    def miss_range(self, start: int, end: int) -> "Seq":
        self.chars[start - 1:end] = [self.missing] * (end - start + 1)
        return self

    def delete_range(self, start: int, end: int) -> "Seq":
        self.chars[start - 1:end] = ["-"] * (end - start + 1)
        return self

    def render(self) -> str:
        return "".join(self.chars)


def _nof4_pks() -> list[str]:
    """The 4 rows matching nOf(2, {1-, 2T, 27542N}) — identified by their
    full metadata rows in nOf_2of3_details."""
    known = facts.known_metadata()
    out = []
    for r in facts.load_golden("nOf_2of3_details")["expectedQueryResult"]:
        matches = [pk for pk, row in known.items()
                   if all(row.get(k) == v for k, v in r.items())]
        assert len(matches) == 1, (r, matches)
        out.append(matches[0])
    return out


def main_groups(meta: dict[str, dict]) -> dict[str, list[str]]:
    """Deterministic pk -> group assignment.

    Groups (sizes pinned by the count goldens — see check.py):
      both42      '-'@1, N 2..99, cover 100..29869, muts 3037T/14408T/23403G,
                  '-' 29870..29903; 2 of them interior-miss@23403
      nof_plain   N 1..49, cover 50..27000, muts 241T/3037T/14408T/23403G;
                  6 of them start coverage at 3 (cover pos13);
                  4 of them additionally A122G
      nof_special del1 / pos2del / miss3037 ×2 / miss14408 / taildel ×4 /
                  cov29869
      start_only  '-'@1, cover 2..27000 (miss 86), T@2      — 2 rows
      end_only    cover 3..29903 (miss 86,122), '-'@29903   — 3 rows,
                  one with coverage from 1 and miss 27542
    """
    keys = facts.primary_keys()
    nof4 = _nof4_pks()
    rest = [pk for pk in keys if pk not in nof4]

    groups: dict[str, list[str]] = {
        # the 4 aggregated2 matchers: 1 del1 (in the nOf-53) + 2 start_only +
        # 1 end_only_cov1
        "del1": [nof4[0]],
        "start_only": nof4[1:3],
        "end_only_cov1": [nof4[3]],
    }
    it = iter(rest)

    def take(n: int) -> list[str]:
        return [next(it) for _ in range(n)]

    groups["both42"] = take(40)
    groups["both42_miss23403"] = take(2)
    groups["pos2del"] = take(1)
    groups["miss3037"] = take(2)
    groups["miss14408"] = take(1)
    groups["taildel"] = take(4)
    groups["cov29869"] = take(1)
    groups["nof_cov3"] = take(6)
    groups["nof_mut122"] = take(4)
    groups["nof_plain"] = take(33)
    groups["end_only"] = take(2)
    leftovers = list(it)
    assert not leftovers, leftovers
    return groups


def build_main(meta: dict[str, dict]) -> dict[str, str]:
    groups = main_groups(meta)
    out: dict[str, str] = {}

    def base_nof(s: Seq) -> Seq:
        return (s.put(241, "T").put(3037, "T").put(14408, "T")
                .put(23403, "G"))

    for g, pks in groups.items():
        for pk in pks:
            s = Seq(MAIN_REF)
            if g in ("both42", "both42_miss23403"):
                s.cover(100, 29869).put(1, "-")
                s.put(3037, "T").put(14408, "T")
                s.delete_range(29870, 29903)
                if g == "both42_miss23403":
                    s.miss(23403)
                else:
                    s.put(23403, "G")
            elif g == "del1":
                base_nof(s.cover(50, 27000)).put(1, "-")
            elif g == "pos2del":
                base_nof(s.cover(2, 27000)).put(2, "-")
            elif g == "miss3037":
                base_nof(s.cover(50, 27000)).miss(3037)
            elif g == "miss14408":
                base_nof(s.cover(50, 27000)).miss(14408)
            elif g == "taildel":
                base_nof(s.cover(50, 29869)).delete_range(29868, 29869)
            elif g == "cov29869":
                base_nof(s.cover(50, 29869)).miss(29868)
            elif g == "nof_cov3":
                base_nof(s.cover(3, 27000))
            elif g == "nof_mut122":
                base_nof(s.cover(50, 27000)).put(122, "G")
            elif g == "nof_plain":
                base_nof(s.cover(50, 27000))
            elif g == "start_only":
                s.cover(1, 27000).put(1, "-").miss(86)
            elif g == "end_only_cov1":
                s.cover(1, 29903).miss(86, 122, 27542).put(29903, "-")
            elif g == "end_only":
                s.cover(3, 29903).miss(86, 122).put(29903, "-")
            else:
                raise AssertionError(g)
            out[pk] = s.render()
    return out


# ---------------------------------------------------------------------------
# amino-acid genes
# ---------------------------------------------------------------------------

#: complete mutation tables (count goldens are exhaustive above the listed
#: thresholds); (gene, pos, from, to, count, coverage)
AA_TABLES = {
    "S": "aaMutDistribution",
    "N": "aaMutDistribution_multiple",   # N rows within
    "E": "aaMutDistribution_min0",
    "ALL04": "aaMutDistribution_all",    # cross-gene at 0.4 (ORF1a/ORF1b)
}


def _aa_constraints() -> dict[str, dict[int, dict]]:
    """gene -> pos -> {coverage, muts: {sym: count}, ref}"""
    rows: list[dict] = []
    for name in ("aaMutDistribution", "aaMutDistribution_multiple",
                 "aaMutDistribution_min0", "aaMutDistribution_all",
                 "aaMutDistribution_very_low"):
        rows.extend(facts.load_golden(name)["expectedQueryResult"])
    cons: dict[str, dict[int, dict]] = {}
    for r in rows:
        gene, pos = r["sequenceName"], r["position"]
        c = cons.setdefault(gene, {}).setdefault(
            pos, {"coverage": r["coverage"], "muts": {}, "ref": r["mutationFrom"]})
        assert c["coverage"] == r["coverage"], (gene, pos)
        prev = c["muts"].get(r["mutationTo"])
        assert prev is None or prev == r["count"]
        c["muts"][r["mutationTo"]] = r["count"]
    return cons


def build_aa(meta: dict[str, dict]) -> dict[str, dict[str, str | None]]:
    keys = facts.primary_keys()
    known_s = facts.s_gene_rows()
    cons = _aa_constraints()

    # start everyone at full reference
    seqs: dict[str, dict[str, list[str] | None]] = {
        pk: {g: list(ref) for g, ref in AA_REFS.items()} for pk in keys
    }
    for pk, s in known_s.items():
        assert s is not None
        seqs[pk]["S"] = list(s)

    # E:2 — AASymbolEquals says 99 of 100 rows read 'Y': one row is X there.
    x_e2_pk = _first_free(keys, known_s)
    seqs[x_e2_pk]["E"][1] = "X"

    # hasAAMutation(S:28) — exactly one certain mutation at S:28 (ref Y->C)
    hasmut_pk = _first_free(keys, known_s, skip={x_e2_pk})
    seqs[hasmut_pk]["S"][27] = "C"

    for gene, poss in cons.items():
        for pos, c in poss.items():
            ref_sym = AA_REFS[gene][pos - 1]
            assert ref_sym == c["ref"], (gene, pos, ref_sym, c["ref"])
            # current carriers among fixed rows
            have_cov = [pk for pk in keys
                        if seqs[pk][gene] is not None
                        and seqs[pk][gene][pos - 1] != "X"]
            deficit = len(have_cov) - c["coverage"]
            assert deficit >= 0, (gene, pos, deficit)
            # X out `deficit` rows, choosing rows not fixed by known S and
            # not already carrying the mutation at this position
            pool = [pk for pk in keys
                    if pk not in known_s or gene != "S"]
            xed = 0
            for pk in pool:
                if xed >= deficit:
                    break
                if seqs[pk][gene][pos - 1] == AA_REFS[gene][pos - 1]:
                    seqs[pk][gene][pos - 1] = "X"
                    xed += 1
            assert xed == deficit, (gene, pos, deficit, xed)
            for sym, count in c["muts"].items():
                have = sum(1 for pk in keys
                           if seqs[pk][gene][pos - 1] == sym)
                need = count - have
                assert need >= 0, (gene, pos, sym, need)
                placed = 0
                for pk in pool:
                    if placed >= need:
                        break
                    if seqs[pk][gene][pos - 1] == AA_REFS[gene][pos - 1]:
                        seqs[pk][gene][pos - 1] = sym
                        placed += 1
                assert placed == need, (gene, pos, sym, need, placed)

    return {pk: {g: ("".join(v) if v is not None else None)
                 for g, v in per.items()}
            for pk, per in seqs.items()}


def _first_free(keys, known_s, skip=frozenset()):
    for pk in keys:
        if pk not in known_s and pk not in skip:
            return pk
    raise AssertionError


# ---------------------------------------------------------------------------
# insertions
# ---------------------------------------------------------------------------

def build_insertions(meta: dict[str, dict]):
    keys = facts.primary_keys()
    epe_keys = facts.s214_epe_keys()          # S:214:EPE carriers (4)
    # the *EPE carrier is the row dated 2021-01-25 (insertionContainsStopCodon)
    star_candidates = [pk for pk in keys
                       if meta[pk]["date"] == "2021-01-25" and pk not in epe_keys]
    assert star_candidates, "need a 2021-01-25 row for the *EPE insertion"
    star_pk = star_candidates[0]

    used = set(epe_keys) | {star_pk}
    free = [pk for pk in keys if pk not in used]
    s143_pk, s210_pk, s247_pk, orf1a_pk = free[0], free[1], free[2], free[3]

    aa_ins: dict[str, dict] = {}

    def add_aa(pk, gene, pos, val):
        aa_ins.setdefault(pk, {}).setdefault(gene, {}).setdefault(pos, []).append(val)

    for pk in epe_keys:
        add_aa(pk, "S", 214, "EPE")
    add_aa(star_pk, "S", 214, "*EPE")
    add_aa(s143_pk, "S", 143, "T")
    add_aa(s210_pk, "S", 210, "IV")
    add_aa(s247_pk, "S", 247, "SGE")
    add_aa(orf1a_pk, "ORF1a", 3602, "F")

    # nucleotide insertions: 25701:CCC ×17, singles at 5959/22204/22339;
    # the 22339 carrier must not carry 25701 (insertionContains_noSeqCol → ∅)
    nuc_ins: dict[str, dict] = {}

    def add_nuc(pk, pos, val):
        nuc_ins.setdefault(pk, {}).setdefault("main", {}).setdefault(pos, []).append(val)

    n22339_pk, n22204_pk, n5959_pk = free[4], free[5], free[6]
    add_nuc(n22339_pk, 22339, "GCTGGT")
    add_nuc(n22204_pk, 22204, "CAGAA")
    add_nuc(n5959_pk, 5959, "TAT")
    ccc = [pk for pk in keys if pk != n22339_pk][:17]
    for pk in ccc:
        add_nuc(pk, 25701, "CCC")
    return nuc_ins, aa_ins
