"""Extract directly-recoverable facts from the reference golden corpus.

Row-level golden outputs expose concrete record values (metadata rows,
aligned/unaligned sequences, insertion carriers). Everything here is a
straight read of ``expectedQueryResult`` — no inference.
"""

from __future__ import annotations

import json
from pathlib import Path

QUERIES = Path("/root/reference/endToEndTests/test/queries")
DATASET = Path("/root/reference/testBaseData/exampleDataset")

METADATA_COLS = [
    "usherTree", "date", "unsorted_date", "region", "country",
    "pango_lineage", "division", "age", "qc_value", "test_boolean_column",
]


def load_golden(name: str) -> dict:
    return json.loads((QUERIES / f"{name}.json").read_text())


def all_goldens() -> list[tuple[str, dict]]:
    out = []
    for path in sorted(QUERIES.glob("**/*.json")):
        rel = str(path.relative_to(QUERIES))[:-len(".json")]
        out.append((rel, json.loads(path.read_text())))
    return out


def references() -> tuple[dict[str, str], dict[str, str]]:
    g = json.loads((DATASET / "reference_genomes.json").read_text())
    nuc = {e["name"]: e["sequence"].upper() for e in g["nucleotideSequences"]}
    aa = {e["name"]: e["sequence"].upper() for e in g["genes"]}
    return nuc, aa


def primary_keys() -> list[str]:
    return [r["primary_key"] for r in load_golden("fastaAligned")["expectedQueryResult"]]


def known_metadata() -> dict[str, dict]:
    """Full metadata rows exposed by Details-style goldens (62 keys)."""
    rows: dict[str, dict] = {}
    for name in ("DetailsOrderBy", "LimitLargerThanTable", "Offset0",
                 "OffsetLimitOverlap", "DetailsOrderByLimit", "nOf_2of3_details"):
        for r in load_golden(name)["expectedQueryResult"]:
            prev = rows.setdefault(r["primary_key"], {})
            for k, v in r.items():
                assert prev.get(k, v) == v, (name, r["primary_key"], k)
                prev[k] = v
    return rows


def known_booleans() -> dict[str, bool | None]:
    """test_boolean_column for the first 10 keys (boolean_Details) plus all
    Details rows."""
    out: dict[str, bool | None] = {}
    for r in load_golden("boolean_Details")["expectedQueryResult"]:
        out[r["primary_key"]] = r["test_boolean_column"]
    for pk, row in known_metadata().items():
        out[pk] = row["test_boolean_column"]
    return out


def second_sequences() -> tuple[dict[str, str | None], dict[str, str | None]]:
    aligned = {r["primary_key"]: r["testSecondSequence"]
               for r in load_golden("fastaAligned")["expectedQueryResult"]}
    unaligned = {r["primary_key"]: r["unaligned_testSecondSequence"]
                 for r in load_golden("fasta_allTestSequences")["expectedQueryResult"]}
    return aligned, unaligned


def s_gene_rows() -> dict[str, str | None]:
    """Full S sequences for the age<=30 rows (fastaAligned_multiple)."""
    return {r["primary_key"]: r["S"]
            for r in load_golden("fastaAligned_multiple")["expectedQueryResult"]}


def unaligned_main_rows() -> dict[str, str | None]:
    return {r["primary_key"]: r["unaligned_main"]
            for r in load_golden("fasta_oneRowTwoUnalignedSequences")["expectedQueryResult"]}


def vaud_keys() -> list[str]:
    return [r["primary_key"]
            for r in load_golden("fasta_manySequences")["expectedQueryResult"]]


def s214_epe_keys() -> list[str]:
    return [r["primary_key"]
            for r in load_golden("aaInsertionsContains")["expectedQueryResult"]]


def marginal(golden: str, field: str) -> dict:
    return {r[field]: r["count"] for r in load_golden(golden)["expectedQueryResult"]}
