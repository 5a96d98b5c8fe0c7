"""Sequence-predicate semantics against the hand-computable example dataset.

Fixture rows (see conftest): reference main=ACGTACGTAC, S=MSKLV*.
 k1 full reference; k2 mutation G3T + missing N5 (S: missing X3);
 k3 covered [3,8) with ambiguity R5 (S: mutation K3A); k4 NULL sequences.
"""

from __future__ import annotations

import pytest

from lapis_silo_spark.expressions import (
    And,
    Equals,
    Exact,
    HasMutation,
    InsertionContains,
    Maybe,
    MutationProfile,
    NOf,
    SymbolEquals,
)
from lapis_silo_spark.operators import Pipeline
from lapis_silo_spark.operators.mutations import (
    insertions_aggregate,
    mutations_aggregate,
)

from conftest import pks


def scan(db):
    return Pipeline.scan(db, "default")


# -- symbolEquals: the 4-way compile strategy --------------------------------

def test_symbol_equals_mutation_match(example_db):
    assert pks(scan(example_db).filter(SymbolEquals("main", 3, "T"))) == {"k2"}


def test_symbol_equals_reference_match(example_db):
    # ref G at 3: k1 (full ref), k3 (covered, unmutated at 3); NOT k2
    # (mutation), NOT k4 (null sequence)
    assert pks(scan(example_db).filter(SymbolEquals("main", 3, "G"))) == {"k1", "k3"}


def test_symbol_equals_missing_uncovered(example_db):
    # N at pos1: only k3 (coverage starts at 3); k4's null sequence must NOT
    # match (symbol_in_set.cpp:104-126)
    assert pks(scan(example_db).filter(SymbolEquals("main", 1, "N"))) == {"k3"}


def test_symbol_equals_missing_interior(example_db):
    assert pks(scan(example_db).filter(SymbolEquals("main", 5, "N"))) == {"k2"}


def test_symbol_equals_ambiguity_symbol_direct(example_db):
    # searching the ambiguity code R itself (mode NONE = literal stored match)
    assert pks(scan(example_db).filter(SymbolEquals("main", 5, "R"))) == {"k3"}


def test_symbol_equals_reference_wildcard(example_db):
    # '.' = reference symbol at that position
    assert pks(scan(example_db).filter(SymbolEquals("main", 3, "."))) == {"k1", "k3"}


def test_maybe_expands_ambiguity(example_db):
    # maybe(A@5): k1 ref A; k2 missing N (could be A); k3 R={A,G} (could be A)
    assert pks(scan(example_db).filter(Maybe(SymbolEquals("main", 5, "A")))) == {
        "k1",
        "k2",
        "k3",
    }


def test_exact_tightens_ambiguity(example_db):
    assert pks(scan(example_db).filter(Exact(SymbolEquals("main", 5, "A")))) == {"k1"}


def test_amino_acid_symbols(example_db):
    assert pks(scan(example_db).filter(SymbolEquals("S", 3, "K"))) == {"k1"}
    assert pks(scan(example_db).filter(SymbolEquals("S", 3, "X"))) == {"k2"}
    assert pks(scan(example_db).filter(SymbolEquals("S", 3, "A"))) == {"k3"}


# -- hasMutation -------------------------------------------------------------

def test_has_mutation(example_db):
    assert pks(scan(example_db).filter(HasMutation("main", 3))) == {"k2"}
    # k3 stores R={A,G} over ref A at 5 — it COULD be the reference, so it is
    # not a certain mutation (has_mutation.cpp:61-64 removes every symbol in
    # AMBIGUITY_SYMBOLS[ref]); k2's missing N at 5 isn't one either
    assert pks(scan(example_db).filter(HasMutation("main", 5))) == set()
    assert pks(scan(example_db).filter(HasMutation("main", 1))) == set()
    # under maybe() only the reference symbol itself is ruled out: k2 (missing
    # could be anything) and k3 (R could be G) both match
    assert pks(scan(example_db).filter(Maybe(HasMutation("main", 5)))) == {
        "k2",
        "k3",
    }


# -- insertionContains -------------------------------------------------------

def test_insertion_contains(example_db):
    assert pks(scan(example_db).filter(InsertionContains("main", 5, "C.*"))) == {
        "k1",
        "k2",
    }
    assert pks(scan(example_db).filter(InsertionContains("main", 5, "C.*G"))) == {
        "k2"
    }
    assert pks(scan(example_db).filter(InsertionContains("main", 0, "TAT"))) == {"k3"}
    assert pks(scan(example_db).filter(InsertionContains("main", 5, "CCC"))) == {"k1"}


# -- boolean algebra over mixed metadata + sequence predicates ---------------

def test_mixed_and(example_db):
    expr = And(Equals("country", "Switzerland"), SymbolEquals("main", 3, "T"))
    assert pks(scan(example_db).filter(expr)) == {"k2"}


def test_nof_over_sequence_predicates(example_db):
    expr = NOf(
        2,
        [
            SymbolEquals("main", 3, "T"),  # k2
            HasMutation("main", 5),  # nobody (R over ref A is not certain)
            Equals("country", "Switzerland"),  # k1,k2
        ],
    )
    assert pks(scan(example_db).filter(expr)) == {"k2"}


# -- mutationProfile ---------------------------------------------------------

def test_mutation_profile_distance0(example_db):
    # k1: zero differences. k3: uncovered=N and R@5 are ambiguity-compatible
    # with the profile → also zero conservative differences.
    expr = MutationProfile("main", "ACGTACGTAC", distance=0)
    assert pks(scan(example_db).filter(expr)) == {"k1", "k3"}


def test_mutation_profile_distance1(example_db):
    # k2 has exactly one conservative difference (T@3); missing N@5 doesn't count
    expr = MutationProfile("main", "ACGTACGTAC", distance=1)
    assert pks(scan(example_db).filter(expr)) == {"k1", "k2", "k3"}


def test_mutation_profile_skips_profile_missing(example_db):
    # profile N positions are skipped entirely (mutation_profile.cpp) —
    # k2's sole difference (T@3) falls in the skipped range, so it matches too
    expr = MutationProfile("main", "NNNTACGTAC", distance=0)
    assert pks(scan(example_db).filter(expr)) == {"k1", "k2", "k3"}


# -- mutations() / insertions() aggregates ----------------------------------

def test_mutations_aggregate(example_db):
    rows = mutations_aggregate(
        scan(example_db), min_proportion=0.0
    ).collect()
    by_key = {
        (r["sequenceName"], r["position"], r["mutationTo"]): r for r in rows
    }
    assert set(by_key) == {("main", 3, "T"), ("main", 5, "R"), ("S", 3, "A")}
    g3t = by_key[("main", 3, "T")]
    assert g3t["mutationFrom"] == "G"
    assert g3t["count"] == 1
    assert g3t["coverage"] == 3  # k1,k2,k3 all cover pos 3
    a5r = by_key[("main", 5, "R")]
    assert a5r["coverage"] == 2  # k1,k3 (k2 missing at 5)
    assert a5r["proportion"] == pytest.approx(0.5)
    k3a = by_key[("S", 3, "A")]
    assert k3a["mutationFrom"] == "K"
    assert k3a["coverage"] == 2  # k1,k3 (k2 has X at 3)


def test_mutations_aggregate_min_proportion(example_db):
    rows = mutations_aggregate(scan(example_db), min_proportion=0.4).collect()
    keys = {(r["sequenceName"], r["position"], r["mutationTo"]) for r in rows}
    assert keys == {("main", 5, "R"), ("S", 3, "A")}  # 1/3 < 0.4 drops G3T


def test_mutations_aggregate_filtered(example_db):
    p = scan(example_db).filter(Equals("country", "Switzerland"))  # k1,k2
    rows = mutations_aggregate(p, min_proportion=0.0).collect()
    keys = {(r["sequenceName"], r["position"], r["mutationTo"]) for r in rows}
    assert keys == {("main", 3, "T")}
    (row,) = rows
    assert row["coverage"] == 2 and row["count"] == 1


def test_mutations_aggregate_sequence_filter(example_db):
    rows = mutations_aggregate(
        scan(example_db), sequence_names=["S"], min_proportion=0.0
    ).collect()
    assert {r["sequenceName"] for r in rows} == {"S"}


def test_insertions_aggregate(example_db):
    rows = insertions_aggregate(scan(example_db)).collect()
    got = {(r["sequenceName"], r["position"], r["insertedSymbols"], r["count"])
           for r in rows}
    assert got == {
        ("main", 5, "CCC", 1),
        ("main", 5, "CGG", 1),
        ("main", 0, "TAT", 1),
    }


# -- mutation-profile aggregate path (scale) ---------------------------------

def test_mutation_profile_aggregate_equivalence(example_db):
    """The constant-join aggregate path must agree with the per-position
    reduction for every profile/distance on the fixture."""
    from lapis_silo_spark.expressions.sequence import (
        MutationProfileAggregate,
        build_mutation_profile,
    )

    profiles = [
        "ACGTACGTAC",   # full reference
        "ACTTACGTAC",   # k2's mutation G3T
        "NNGTRCGNNN",   # k3's stored form (R treated as searched symbol)
        "TTTTTTTTTT",   # far from everything
    ]
    for profile in profiles:
        pairs = [(i + 1, s) for i, s in enumerate(profile) if s != "N"]
        for distance in (0, 1, 3, 8):
            per_pos = build_mutation_profile("main", pairs, distance,
                                             is_amino_acid=False)
            agg = MutationProfileAggregate("main", pairs, distance,
                                           is_amino_acid=False)
            got_a = pks(scan(example_db).filter(per_pos))
            got_b = pks(scan(example_db).filter(agg))
            assert got_a == got_b, (profile, distance, got_a, got_b)


def test_mutation_profile_join_count_constant_in_distance(example_db):
    """nof_sequence_filter.cpp's sweep axis: the optimized-plan join count
    of the aggregate path must be IDENTICAL at every distance AND at every
    profile length — predicates batch into aggregated side-table passes,
    they never become joins (round-9 VERDICT #4; measured at scale by
    tools/genomic_scale_bench.py workload G)."""
    from lapis_silo_spark.expressions.sequence import MutationProfileAggregate

    def joins(pairs, distance):
        df = scan(example_db).filter(
            MutationProfileAggregate("main", pairs, distance,
                                     is_amino_acid=False)
        ).df
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return sum(1 for ln in plan.splitlines()
                   if ln.lstrip("+-: ").startswith("Join"))

    short = [(i + 1, "A") for i in range(4)]
    long = [(1 + (i % 10), "ACGT"[i % 4]) for i in range(400)]
    # distances stay < #pairs: at distance >= #pairs the expression is the
    # (join-free) always-true degenerate case, not the aggregate plan
    counts = {joins(p, d) for p in (short, long) for d in (0, 1, 3)}
    counts |= {joins(long, d) for d in (5, 8, 100)}
    assert len(counts) == 1, counts


def test_mutation_profile_aggregate_chosen_for_long_profiles(example_db):
    """Long profiles must auto-select the aggregate path (and it must
    actually execute) — split back out of the join-count test above so a
    join-count failure can't mask the selection check (round-10 ADVICE)."""
    from lapis_silo_spark.expressions.sequence import (
        AGGREGATE_PROFILE_THRESHOLD,
        MutationProfileAggregate,
        build_mutation_profile,
    )

    pairs = [(1 + (i % 10), "A") for i in range(AGGREGATE_PROFILE_THRESHOLD + 1)]
    expr = build_mutation_profile("main", pairs, 2, is_amino_acid=False)
    assert isinstance(expr, MutationProfileAggregate)

    # and it executes: distance 9 (< #positions, so non-degenerate) is large
    # enough that every sequenced row matches; k4 (null sequence) must not
    out = pks(scan(example_db).filter(
        MutationProfileAggregate("main", [(p, "A") for p in range(1, 11)], 9,
                                 is_amino_acid=False)
    ))
    assert out == {"k1", "k2", "k3"}


# -- sequenceCompressed ingest (JVM zstd-dict UDF) ---------------------------

def test_sequence_compressed_ingest_matches_plain(spark):
    """zstd-dict payloads (input_format.md:206-208) must diff identically to
    plain sequences, and take precedence over `sequence` when both present."""
    from pyspark.sql import functions as F

    from lapis_silo_spark.jvm import ensure_zstd_udfs
    from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records

    assert ensure_zstd_udfs(spark), "JVM zstd UDF must build in this env"

    ref = "ACGTACGTAC"
    dict_hex = ref.encode().hex()
    plain_seqs = {"p1": "ACTTNCGTAC", "p2": "NNGTRCGNNN", "p3": ref}

    def b64(s: str) -> str:
        return spark.sql(
            f"SELECT base64(zstd_dict_compress('{s}', X'{dict_hex}'))"
        ).collect()[0][0]

    config = TableConfig(primary_key="pk", nuc_sequences={"main": ref})

    def ingest(records):
        df = spark.createDataFrame(records, schema=config.spark_schema())
        _, store = ingest_records(spark, df, config)
        muts = {tuple(r) for r in store.mutations.collect()}
        cov = {tuple(r) for r in store.coverage.collect()}
        miss = {tuple(r) for r in store.missing.collect()}
        return muts, cov, miss

    plain = ingest([
        {"pk": k, "main": {"sequence": s, "sequenceCompressed": None,
                           "insertions": [], "offset": None}}
        for k, s in plain_seqs.items()
    ])
    compressed = ingest([
        # "wrong" plain sequence alongside: compressed must win (precedence)
        {"pk": k, "main": {"sequence": ref if k != "p3" else None,
                           "sequenceCompressed": b64(s),
                           "insertions": [], "offset": None}}
        for k, s in plain_seqs.items()
    ])
    assert compressed == plain
    muts, _, _ = plain
    assert ("p1", "main", 3, "T") in muts  # sanity: diffing really ran
