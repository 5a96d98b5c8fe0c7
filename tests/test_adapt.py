"""Local-reference adaptation (sources/adapt.py): the storage baseline flips
to the majority stored symbol (vertical_sequence_index.h:71-82) WITHOUT
changing any query answer — every stored row symbol is identical before and
after, only which (pk, pos) pairs carry an explicit seq_mutations entry
changes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.expressions import HasMutation, Maybe, SymbolEquals
from lapis_silo_spark.expressions.sequence import (
    MutationProfile,
    MutationProfileAggregate,
)
from lapis_silo_spark.operators import Pipeline
from lapis_silo_spark.operators.mutations import mutations_aggregate
from lapis_silo_spark.operators.reconstruct import with_sequence_column
from lapis_silo_spark.sources.adapt import adapt_local_reference, merge_stores
from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records

REF = "ACGTACGTAC"  # positions 1..10; pos 2 ref 'C'


def _seq(s, insertions=None, offset=None):
    return {
        "sequence": s,
        "sequenceCompressed": None,
        "insertions": insertions or [],
        "offset": offset,
    }


# Majority engineering at pos 2 (ref C): four rows store G, one stores ref C,
# one stores interior N, one is uncovered there, one has no sequence at all.
RECORDS = [
    {"primary_key": "r1", "main": _seq("AGGTACGTAC")},          # pos2 G, pos3 G=ref
    {"primary_key": "r2", "main": _seq("AGNTACGTAC")},          # pos2 G, pos5... N at pos3
    {"primary_key": "r3", "main": _seq("AGGTACTTAC")},          # pos2 G, pos7 T
    {"primary_key": "r4", "main": _seq("AGGTACGTAC", insertions=["4:GG"])},
    {"primary_key": "r5", "main": _seq(REF)},                   # all-reference row
    {"primary_key": "r6", "main": _seq("GTACGTAC", offset=2)},  # covers [3,11): no pos-2 vote
    {"primary_key": "r7", "main": None},                        # null sequence
]


def _config():
    return TableConfig(
        name="default", primary_key="primary_key", metadata={},
        nuc_sequences={"main": REF},
    )


def _db_with(spark, main, store) -> Database:
    db = Database(spark)
    db.register_table("default", main, primary_key="primary_key")
    db.register_sequence_store("default", store)
    return db


@pytest.fixture(scope="module")
def stores(spark):
    config = _config()
    records = spark.createDataFrame(RECORDS, schema=config.spark_schema())
    main, store = ingest_records(spark, records, config)
    for side in (store.mutations, store.coverage, store.missing,
                 store.insertions):
        side.persist()
    adapted = adapt_local_reference(store)
    adapted.mutations.persist()
    return main, store, adapted


def _pks(db, expr) -> set[str]:
    return {
        r["primary_key"]
        for r in Pipeline.scan(db, "default")
        .filter(expr)
        .df.select("primary_key")
        .collect()
    }


def test_majority_flip_and_shrink(stores):
    main, store, adapted = stores
    local = {
        r["pos"]: r["local_symbol"]
        for r in adapted.local_reference.collect()
    }
    # pos 2: stored symbols are G,G,G,G,C,(N),(uncovered) → majority G
    assert local[2] == "G"
    # every other position keeps the published symbol (no other majority flip)
    for pos, sym in local.items():
        if pos != 2:
            assert sym == REF[pos - 1], pos
    # the rewrite dropped 4 G-entries and added 1 C-entry (for r5) → smaller
    assert adapted.mutations.count() < store.mutations.count()


def test_adaptation_is_idempotent(stores, spark):
    _, _, adapted = stores
    again = adapt_local_reference(adapted)
    assert again.mutations.count() == adapted.mutations.count()
    a = {(r["pos"], r["local_symbol"]) for r in again.local_reference.collect()}
    b = {(r["pos"], r["local_symbol"])
         for r in adapted.local_reference.collect()}
    assert a == b


FILTERS = [
    lambda: SymbolEquals("main", 2, "G"),
    lambda: SymbolEquals("main", 2, "C"),
    lambda: SymbolEquals("main", 2, "."),   # '.' = published reference symbol
    lambda: SymbolEquals("main", 2, "N"),
    lambda: SymbolEquals("main", 7, "T"),
    lambda: Maybe(SymbolEquals("main", 2, "C")),
    lambda: Maybe(SymbolEquals("main", 2, "G")),
    lambda: HasMutation("main", 2),
    lambda: HasMutation("main", 3),
    lambda: HasMutation("main", 7),
    lambda: Maybe(HasMutation("main", 2)),
    lambda: Maybe(HasMutation("main", 5)),
    lambda: MutationProfile("main", "AG", distance=0),
    lambda: MutationProfile("main", REF, distance=1),
    lambda: MutationProfileAggregate(
        "main", [(i + 1, REF[i]) for i in range(10)], distance=1
    ),
]


@pytest.mark.parametrize("make_expr", FILTERS)
def test_filters_unchanged_by_adaptation(stores, spark, make_expr):
    main, store, adapted = stores
    db = _db_with(spark, main, store)
    db_a = _db_with(spark, main, adapted)
    assert _pks(db, make_expr()) == _pks(db_a, make_expr())


def test_mutations_aggregate_unchanged(stores, spark):
    main, store, adapted = stores
    rows = lambda db: sorted(  # noqa: E731
        (r["position"], r["mutationFrom"], r["mutationTo"], r["coverage"],
         r["count"], round(r["proportion"], 9))
        for r in mutations_aggregate(
            Pipeline.scan(db, "default"), min_proportion=0.0
        ).collect()
    )
    before = rows(_db_with(spark, main, store))
    after = rows(_db_with(spark, main, adapted))
    assert before == after
    # sanity: the flipped position reports its mutation vs the PUBLISHED ref
    assert any(p == 2 and mf == "C" and mt == "G"
               for p, mf, mt, *_ in after)


def test_reconstruction_unchanged(stores, spark):
    main, store, adapted = stores
    seqs = lambda db: {  # noqa: E731
        r["primary_key"]: r["main"]
        for r in with_sequence_column(
            Pipeline.scan(db, "default"), "main"
        ).df.select("primary_key", "main").collect()
    }
    before = seqs(_db_with(spark, main, store))
    after = seqs(_db_with(spark, main, adapted))
    assert before == after
    assert before["r1"] == "AGGTACGTAC" and before["r7"] is None


def test_merge_rebases_fresh_batch(stores, spark):
    """Appending an (unadapted, diffed-vs-published) batch onto an adapted
    store keeps one baseline meaning across the union."""
    main, store, adapted = stores
    config = _config()
    batch = spark.createDataFrame(
        [{"primary_key": "r8", "main": _seq("ACGTACGTAC")},   # ref-equal
         {"primary_key": "r9", "main": _seq("AGGAACGTAC")}],  # pos2 G, pos4 A
        schema=config.spark_schema(),
    )
    new_main, new_store = ingest_records(spark, batch, config)
    merged = merge_stores(adapted, new_store)
    db = _db_with(spark, main.unionByName(new_main), merged)

    assert _pks(db, SymbolEquals("main", 2, "G")) == {
        "r1", "r2", "r3", "r4", "r9"
    }
    assert _pks(db, SymbolEquals("main", 2, "C")) == {"r5", "r8"}
    seqs = {
        r["primary_key"]: r["main"]
        for r in with_sequence_column(Pipeline.scan(db, "default"), "main")
        .df.select("primary_key", "main").collect()
    }
    assert seqs["r8"] == REF and seqs["r9"] == "AGGAACGTAC"


def test_storage_roundtrip_preserves_adaptation(stores, spark, tmp_path):
    from lapis_silo_spark.storage import load_version, save_version

    main, store, adapted = stores
    db = _db_with(spark, main, adapted)
    root = str(tmp_path / "adapted_store")
    save_version(db, root)
    loaded = load_version(spark, root)
    lstore = loaded.sequence_store("default")
    assert lstore.local_reference is not None
    assert lstore.local_symbol("main", 2) == "G"
    assert _pks(loaded, HasMutation("main", 2)) == _pks(
        db, HasMutation("main", 2)
    )
