"""Differential conformance fuzzing: seeded random SaneQL queries over the
reconstructed exampleDataset, executed by BOTH the Spark engine and the
pure-Python reference evaluator (``tools/golden_fit/evaluator.py``), must
agree row-for-row.

The golden corpus pins 134 fixed queries; this layer covers the
combinatorial space around them — nested boolean algebra over mixed
metadata + sequence predicates, maybe()/exact() wrappers, nOf, filtered
mutation/insertion aggregations — with deterministic seeds so failures
reproduce.
"""

from __future__ import annotations

import datetime as dt
import random
import sys
from pathlib import Path

import pytest

from lapis_silo_spark.saneql import execute_query

E2E = Path("/root/reference/endToEndTests/test")
GOLDEN_FIT = Path(__file__).resolve().parent.parent / "tools" / "golden_fit"

pytestmark = pytest.mark.skipif(
    not E2E.exists(), reason="reference golden corpus not available"
)

from test_goldens import _normalize, golden_db  # noqa: E402,F401


def _gen_predicate(rng: random.Random, depth: int = 0) -> str:
    """Random predicate over the exampleDataset's columns and sequences."""
    leaves = [
        lambda: f"country = '{rng.choice(['Switzerland', 'Germany'])}'",
        lambda: f"division = '{rng.choice(['Aargau', 'Bern', 'Vaud', 'Zürich'])}'",
        lambda: f"age {rng.choice(['<=', '>=', '='])} {rng.randint(20, 60)}",
        lambda: f"age.between({rng.randint(20, 50)}, {rng.randint(50, 60)})",
        # the reference implements only < and >= for floats (the binder
        # faithfully rejects the rest — golden invalidQueries pin that)
        lambda: f"qc_value {rng.choice(['<', '>='])} 0.9{rng.randint(0, 9)}",
        lambda: "qc_value.isNull()",
        lambda: "test_boolean_column = true",
        lambda: "test_boolean_column = false",
        lambda: "test_boolean_column.isNull()",
        lambda: f"date {rng.choice(['<=', '>='])} '2021-0{rng.randint(1, 4)}-15'::date",
        lambda: f"pango_lineage.lineage('{rng.choice(['B.1.1.7', 'B.1', 'B.1.1', 'AY.43'])}', "
                f"includeSublineages:={rng.choice(['true', 'false'])})",
        lambda: f"primary_key.like('key_{rng.randint(1, 9)}')",
        lambda: (f"nucleotideEquals(position:={rng.choice([1, 2, 13, 86, 122, 241, 3037, 23403, 29903])}, "
                 f"symbol:='{rng.choice(['A', 'C', 'G', 'T', '-', 'N'])}', sequenceName:='main')"),
        lambda: (f"nucleotideEquals(position:={rng.randint(1, 4)}, "
                 f"symbol:='{rng.choice(['A', 'C', 'G', 'T', 'R', 'Y', '-', 'N'])}', "
                 "sequenceName:='testSecondSequence')"),
        lambda: (f"aminoAcidEquals(position:={rng.choice([2, 9, 18, 20])}, "
                 f"symbol:='{rng.choice(['Y', 'I', 'L', 'X'])}', sequenceName:='E')"),
        lambda: f"hasMutation(position:={rng.choice([2, 122, 241, 3037])}, sequenceName:='main')",
        lambda: f"hasAAMutation(position:={rng.choice([9, 28, 142])}, sequenceName:='S')",
        lambda: (f"insertionContains(position:=25701, value:='{rng.choice(['CCC', 'CC.*', '.*C'])}', "
                 "sequenceName:='main')"),
        lambda: (f"aminoAcidInsertionContains(position:=214, "
                 f"value:='{rng.choice(['EPE', 'E.*E', '.*PE'])}', sequenceName:='S')"),
        lambda: (f"aminoAcidEquals(position:={rng.choice([19, 142, 478, 614, 681])}, "
                 f"symbol:='{rng.choice(['R', 'D', 'K', 'G', 'H', 'X', '-'])}', "
                 "sequenceName:='S')"),
        lambda: (f"usherTree.phyloDescendantOf('NODE_00000{rng.randint(10, 96)}')"),
        lambda: (f"pango_lineage.lineage('{rng.choice(['B.1.617.2', 'XBB', 'GD', 'P.1'])}', "
                 f"includeSublineages:=true)"),
    ]
    if depth >= 2:
        return rng.choice(leaves)()
    roll = rng.random()
    if roll < 0.35:
        return (f"({_gen_predicate(rng, depth + 1)}) && "
                f"({_gen_predicate(rng, depth + 1)})")
    if roll < 0.6:
        return (f"({_gen_predicate(rng, depth + 1)}) || "
                f"({_gen_predicate(rng, depth + 1)})")
    if roll < 0.7:
        return f"!({_gen_predicate(rng, depth + 1)})"
    if roll < 0.78:
        inner = rng.choice(leaves[-6:-1])()  # sequence leaves only
        return f"{rng.choice(['maybe', 'exact'])}({inner})"
    if roll < 0.86:
        picks = ", ".join(rng.choice(leaves)() for _ in range(3))
        return f"nOf({rng.randint(1, 3)}, {{{picks}}})"
    return rng.choice(leaves)()


def _gen_query(rng: random.Random) -> str:
    pred = _gen_predicate(rng)
    action = rng.random()
    if action < 0.45:
        tail = ".groupBy({count:=count()})"
    elif action < 0.6:
        key = rng.choice(["division", "pango_lineage", "age", "test_boolean_column"])
        tail = f".groupBy({{count:=count()}},{{{key}}}).orderBy({{{key}}})"
    elif action < 0.75:
        tail = (".orderBy({primary_key})"
                ".project({primary_key, division, age, qc_value})")
    elif action < 0.78:
        # at() on a sequence column as a groupBy key (SequenceAt path;
        # positions cover mutation hotspots, the last base, and past-end)
        seq = rng.choice(["main", "testSecondSequence", "S"])
        pos = rng.choice({"main": [1, 241, 3037, 29903, 50000],
                          "testSecondSequence": [1, 2, 4, 9],
                          "S": [19, 501, 1273, 2000]}[seq])
        tail = (f".map({{s := {seq}.at({pos})}})"
                ".groupBy({count:=count()},{s})")
    elif action < 0.8:
        tail = f".mutations(minProportion:={rng.choice([0.3, 0.7, 1])})"
    elif action < 0.87:
        names = rng.choice(["{S}", "{E}", "{S, N}"])
        tail = (f".aminoAcidMutations(minProportion:="
                f"{rng.choice([0.3, 0.5])}, sequenceNames:={names})")
    elif action < 0.92:
        tail = rng.choice([".insertions()",
                           ".aminoAcidInsertions(sequenceNames:={S})"])
    else:
        tail = (".orderBy({primary_key})"
                f".offset({rng.randint(0, 5)}).limit({rng.randint(1, 20)})"
                ".project({primary_key, age})")
    return f"default.filter({pred}){tail}"


@pytest.fixture(scope="session")
def evaluator_and_records():
    sys.path.insert(0, str(GOLDEN_FIT))
    from build_dataset import build_records
    from check import build_context
    from evaluator import Evaluator

    return Evaluator(build_context()), build_records()


# one pytest case per seed so failures name the reproducing seed
@pytest.mark.parametrize("seed", range(int(__import__("os").environ.get("FUZZ_SEEDS", "40"))))
def test_engine_matches_reference_evaluator(golden_db, evaluator_and_records,
                                            seed):
    ev, records = evaluator_and_records
    rng = random.Random(31_000 + seed)
    query = _gen_query(rng)
    expected = ev.run(query, records)
    rows = [r.asDict() for r in execute_query(golden_db, query).collect()]
    assert _normalize(rows) == _normalize(expected), f"query: {query}"


@pytest.fixture(scope="session")
def adapted_golden_db(golden_db, spark):
    """The exampleDataset with its storage baseline flipped to the
    per-position majority symbol (sources/adapt.py) — every query answer
    must be identical to the unadapted store's."""
    from lapis_silo_spark.catalog import Database
    from lapis_silo_spark.sources.adapt import adapt_local_reference

    store = adapt_local_reference(golden_db.sequence_store("default"))
    store.mutations.persist()
    db = Database(spark)
    db.register_table(
        "default", golden_db.table("default"), primary_key="primary_key"
    )
    db.register_sequence_store("default", store)
    db.register_lineage(
        "pango_lineage", golden_db.lineage_closures["pango_lineage"]
    )
    db.register_phylo_tree("usherTree", golden_db.phylo_nodes["usherTree"])
    return db


@pytest.mark.parametrize(
    "seed",
    range(int(__import__("os").environ.get("FUZZ_SEEDS_ADAPTED", "15"))),
)
def test_adapted_store_matches_reference_evaluator(
    adapted_golden_db, evaluator_and_records, seed
):
    """Differential fuzz over the ADAPTED store: local-reference adaptation
    is a pure storage-layout change, so the same seeded queries must agree
    with the pure-Python evaluator row-for-row."""
    ev, records = evaluator_and_records
    rng = random.Random(47_000 + seed)
    query = _gen_query(rng)
    expected = ev.run(query, records)
    rows = [
        r.asDict()
        for r in execute_query(adapted_golden_db, query).collect()
    ]
    assert _normalize(rows) == _normalize(expected), f"query: {query}"
