"""Insertion 3-mer inverted index — the Spark analog of the reference's
regex-search accelerator (``src/silo/storage/column/insertion_index.cpp``:
every inserted string is indexed by its overlapping trigrams; a regex query
intersects the posting lists of the trigrams its literal segments contain,
then runs the exact regex only on the survivors).

Spark-first shape: the index is one long-form side table
``(seq_name, pos, trigram, pk)`` written sorted by ``(seq_name, pos,
trigram)`` so Parquet row-group stats prune the point lookups. At query
time ``InsertionContains`` turns the full insertions scan into: posting
intersection (groupBy pk, count-distinct == |required trigrams|) → semi-join
→ exact ``rlike`` refine on that tiny candidate set. Patterns whose literal
segments have no 3-run (e.g. ``A.*``) fall back to the pruned scan — same
answers either way (pinned by tests/test_insertion_index.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lapis_silo_spark.catalog import SequenceStore


def trigrams_of(value: str) -> list[str]:
    """The distinct trigrams a pattern REQUIRES: every 3-substring of each
    literal segment (segments are the runs between ``.*`` wildcards;
    ``\\*`` is the escaped literal stop codon). A match must contain all
    of them, so the posting intersection is a safe pre-filter."""
    out: set[str] = set()
    for part in value.upper().split(".*"):
        lit = part.replace("\\*", "*")
        out.update(lit[i : i + 3] for i in range(len(lit) - 2))
    return sorted(out)


def build_insertion_trigram_index(store: SequenceStore) -> DataFrame:
    """``(seq_name, pos, trigram, pk)`` — one row per distinct trigram of
    each stored insertion. One explode pass over the (small) insertions
    side table; no shuffle beyond the dedup."""
    t = F.upper(F.col("inserted"))
    grams = F.when(
        F.length(t) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - 2),
                lambda i: F.substr(t, i, F.lit(3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return store.insertions.select(
        "seq_name", "pos", "pk", F.explode(grams).alias("trigram")
    )


def with_insertion_index(store: SequenceStore) -> SequenceStore:
    """A copy of ``store`` carrying the trigram index (builds it if absent)."""
    return SequenceStore(
        mutations=store.mutations,
        coverage=store.coverage,
        missing=store.missing,
        insertions=store.insertions,
        reference=store.reference,
        local_reference=store.local_reference,
        insertion_trigrams=(
            store.insertion_trigrams
            if store.insertion_trigrams is not None
            else build_insertion_trigram_index(store)
        ),
    )
