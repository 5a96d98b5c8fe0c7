"""``at()`` on SEQUENCE columns — the BitmapAggregationNode workload.

Reference semantics (``operators/bitmap_aggregation_node.cpp:51-129``,
``operators/map_node.cpp:63-71``): the stored symbol at the position —
mutation symbol | local reference (covered, unmutated) | missing N/X —
with a NULL key for rows storing no sequence and ``""`` past the genome end
(utf8_slice_codeunits semantics).

Fixture (conftest): REF_MAIN=ACGTACGTAC; k1 full ref; k2 = ACTTNCGTAC
(mutation G3T, interior missing 5); k3 = NNGTRCGNNN (covered [3,8),
ambiguity R5); k4 NULL sequence. REF_S=MSKLV*; k2 S missing X3; k3 S K3A.
"""

from __future__ import annotations

import pytest

from lapis_silo_spark.expressions import QueryCompileError, SequenceAt
from lapis_silo_spark.operators import Pipeline
from lapis_silo_spark.operators.reconstruct import with_sequence_column
from lapis_silo_spark.saneql import execute_query


def _at_values(db, seq_name: str, pos: int) -> dict[str, str | None]:
    out = (
        Pipeline.scan(db, "default")
        .map({"s": SequenceAt(seq_name, pos)})
        .project(["primary_key", "s"])
        .df.collect()
    )
    return {r["primary_key"]: r["s"] for r in out}


# -- value semantics (golden-style, mirroring at.cpp / map_node.cpp) ---------

def test_at_mutation_vs_reference(example_db):
    assert _at_values(example_db, "main", 3) == {
        "k1": "G", "k2": "T", "k3": "G", "k4": None,
    }


def test_at_missing_and_ambiguity(example_db):
    # interior missing -> N; stored ambiguity code is the value itself
    assert _at_values(example_db, "main", 5) == {
        "k1": "A", "k2": "N", "k3": "R", "k4": None,
    }


def test_at_uncovered_leading(example_db):
    # k3's coverage starts at 3: pos1 is missing for it
    assert _at_values(example_db, "main", 1) == {
        "k1": "A", "k2": "A", "k3": "N", "k4": None,
    }


def test_at_out_of_range_is_empty_string(example_db):
    # utf8_slice_codeunits past-end => "" (map_node.cpp:64-71); null
    # sequence stays null
    assert _at_values(example_db, "main", 11) == {
        "k1": "", "k2": "", "k3": "", "k4": None,
    }


def test_at_amino_acid_gene(example_db):
    assert _at_values(example_db, "S", 3) == {
        "k1": "K", "k2": "X", "k3": "A", "k4": None,
    }


def test_at_position_zero_rejected(example_db):
    with pytest.raises(QueryCompileError):
        SequenceAt("main", 0)


# -- equivalence with full reconstruction ------------------------------------

@pytest.mark.parametrize("pos", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
def test_at_matches_reconstructed_substring(example_db, pos):
    """The targeted lookup must agree with substr(reconstruct(main), p, 1)
    at every position — the generic at() path the rewrite pass replaces."""
    from pyspark.sql import functions as F

    rebuilt = with_sequence_column(Pipeline.scan(example_db, "default"), "main")
    expect = {
        r["primary_key"]: r["c"]
        for r in rebuilt.df.select(
            "primary_key", F.substring("main", pos, 1).alias("c")
        ).collect()
    }
    # substring of NULL is NULL; of a full string never "" for pos<=L
    assert _at_values(example_db, "main", pos) == expect


# -- SaneQL path: map + groupBy keys (the co-occurrence shape) ---------------

def test_saneql_map_at_on_sequence(example_db):
    rows = execute_query(
        example_db, "default.map({s3 := main.at(3)})"
    ).select("primary_key", "s3").collect()
    assert {r["primary_key"]: r["s3"] for r in rows} == {
        "k1": "G", "k2": "T", "k3": "G", "k4": None,
    }


def test_saneql_cooccurrence_groupby(example_db):
    """co_occurrence_benchmark.cpp:81 shape: map(at(p)) x k -> groupBy count.
    Null sequences form their own (null, null) group
    (bitmap_aggregation_node.cpp:75-81)."""
    rows = execute_query(
        example_db,
        "default.map({s3 := main.at(3), s5 := main.at(5)})"
        ".groupBy({count := count()}, {s3, s5})",
    ).collect()
    got = {(r["s3"], r["s5"]): r["count"] for r in rows}
    assert got == {
        ("G", "A"): 1,   # k1
        ("T", "N"): 1,   # k2
        ("G", "R"): 1,   # k3
        (None, None): 1,  # k4
    }


def test_saneql_at_metadata_still_substring(example_db):
    rows = execute_query(
        example_db, "default.map({c := country.at(1)})"
    ).select("primary_key", "c").collect()
    assert {r["primary_key"]: r["c"] for r in rows} == {
        "k1": "S", "k2": "S", "k3": "G", "k4": "G",
    }


def test_saneql_at_unknown_field_still_errors(example_db):
    with pytest.raises(QueryCompileError, match="not found"):
        execute_query(example_db, "default.map({x := nope.at(1)})")


# -- plan shape: targeted join, not reconstruction ----------------------------

def test_at_plan_has_no_genome_length_transform(example_db):
    """The whole point: reading one symbol must NOT compile to the
    O(genome-length) transform(sequence(1, L), ...) rebuild."""
    df = execute_query(
        example_db,
        "default.map({s3 := main.at(3), s5 := main.at(5)})"
        ".groupBy({count := count()}, {s3, s5})",
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "transform(sequence(" not in plan
    assert "concat_ws" not in plan


def test_at_batches_positions_into_one_mutations_join(example_db):
    """All at() positions on one sequence share ONE aggregated side-table
    pass (SURVEY §7.3 collapse): the optimized plan reads seq-side tables a
    bounded number of times (mutations once, coverage once, missing once),
    not once per position."""
    df = execute_query(
        example_db,
        "default.map({a := main.at(1), b := main.at(3), c := main.at(5), "
        "d := main.at(7)}).groupBy({count := count()}, {a, b, c, d})",
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate per side table -> at most 3 joins regardless of k=4
    assert plan.count("Join LeftOuter") <= 3
