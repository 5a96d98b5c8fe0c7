"""Insertion 3-mer inverted index (sources/insertion_index.py ≙
insertion_index.cpp): the posting-list pre-filter must never change
InsertionContains answers, for every pattern shape the grammar allows."""

from __future__ import annotations

import pytest

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.expressions import InsertionContains
from lapis_silo_spark.operators import Pipeline
from lapis_silo_spark.sources.insertion_index import (
    build_insertion_trigram_index,
    trigrams_of,
    with_insertion_index,
)


def test_required_trigrams_extraction():
    assert trigrams_of("CCC") == ["CCC"]
    assert trigrams_of("ACGT") == ["ACG", "CGT"]
    assert trigrams_of("AC.*GTA") == ["GTA"]      # 2-char segment: no 3-run
    assert trigrams_of("A.*C") == []              # no literal 3-run at all
    assert trigrams_of("cc\\*g") == ["C*G", "CC*"]  # escaped stop codon
    assert trigrams_of(".*") == []


@pytest.fixture(scope="module")
def indexed_db(spark, example_db):
    store = with_insertion_index(example_db.sequence_store("default"))
    store.insertion_trigrams.persist()
    db = Database(spark)
    db.register_table(
        "default", example_db.table("default"), primary_key="primary_key"
    )
    db.register_sequence_store("default", store)
    return db


def _pks(db, expr):
    return {
        r["primary_key"]
        for r in Pipeline.scan(db, "default")
        .filter(expr)
        .df.select("primary_key")
        .collect()
    }


# (seq_name, position, value) over the conftest fixture's insertions:
# k1 main 5:CCC, k2 main 5:CGG, k3 main 0:TAT
PATTERNS = [
    ("main", 5, "CCC"),     # exact trigram hit
    ("main", 5, "CGG"),
    ("main", 5, "C.*"),     # no literal 3-run → scan fallback
    ("main", 5, ".*GG"),
    ("main", 5, "CC.*"),
    ("main", 5, "TTT"),     # no match at all
    ("main", 0, "TAT"),
    ("main", 0, "T.*T"),
    ("main", 3, "CCC"),     # wrong position → empty
]


@pytest.mark.parametrize("seq,pos,value", PATTERNS)
def test_index_preserves_answers(spark, example_db, indexed_db,
                                 seq, pos, value):
    expr = InsertionContains(seq, pos, value)
    assert _pks(example_db, expr) == _pks(indexed_db, expr)


def test_index_contents(spark, example_db):
    idx = build_insertion_trigram_index(
        example_db.sequence_store("default")
    )
    rows = {
        (r["seq_name"], r["pos"], r["trigram"], r["pk"])
        for r in idx.collect()
    }
    assert ("main", 5, "CCC", "k1") in rows
    assert ("main", 5, "CGG", "k2") in rows
    assert ("main", 0, "TAT", "k3") in rows
    # 2-char insertions produce no postings; nothing shorter than 3 indexed
    assert all(len(t[2]) == 3 for t in rows)


def test_storage_roundtrip_preserves_index(spark, example_db, tmp_path):
    from lapis_silo_spark.storage import load_version, save_version

    store = with_insertion_index(example_db.sequence_store("default"))
    db = Database(spark)
    db.register_table(
        "default", example_db.table("default"), primary_key="primary_key"
    )
    db.register_sequence_store("default", store)
    root = str(tmp_path / "indexed_store")
    save_version(db, root)
    loaded = load_version(spark, root)
    lstore = loaded.sequence_store("default")
    assert lstore.insertion_trigrams is not None
    expr = InsertionContains("main", 5, "CCC")
    assert _pks(loaded, expr) == _pks(db, expr) == {"k1"}
