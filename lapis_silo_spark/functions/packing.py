"""Sequence packing for training batches: GPT-style concat-and-chunk.

Pretraining pipelines concatenate documents in a fixed order and split the
token stream at a fixed context-window budget; each document lands in the
chunk(s) its tokens fall into. This operator assigns every document its
starting chunk and offset — ``bin = floor(tokens_before / budget)`` over a
running token sum in deterministic ``order_col`` order, which is pure
window algebra (one shuffle, whole-stage codegen'd, SQL-reproducible — the
registered query's DuckDB oracle recomputes it exactly).

Scale note: a single unpartitioned running sum would serialize on one
task. ``shards`` (default: keyed by a hash of the order column) splits the
corpus into independent token streams, each packed separately — the
standard practice (per-worker packing) and the plan that holds at 100 TB:
one hash shuffle, per-shard windows, no global sort barrier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lapis_silo_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    shards: int = 1,
    n_tokens: Column | None = None,
    shard_col: Column | None = None,
) -> DataFrame:
    """Assign each document ``(shard, bin, bin_offset, n_tokens)``.

    ``bin`` is the context-window index where the document STARTS when the
    shard's documents are concatenated in ``id_col`` order and split every
    ``budget`` tokens; ``bin_offset`` is its first token's position inside
    that window. Long documents simply span multiple consecutive bins
    (standard packing semantics — no document is dropped or truncated).
    ``n_tokens`` defaults to whitespace token count; pass any Column (e.g.
    a BPE estimate) to pack on a different budget currency. ``shard_col``
    overrides the default xxhash shard assignment (e.g. with a
    SQL-reproducible key, or a curriculum/epoch key).
    """
    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    if shards <= 0:
        raise ValueError("pack_sequences: shards must be positive")
    toks = n_tokens if n_tokens is not None else token_count(text_col)
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        toks.cast("long").alias("n_tokens"),
        shard.cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tokens_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "id",
        "shard",
        F.floor(tokens_before / F.lit(budget)).cast("long").alias("bin"),
        F.pmod(tokens_before, F.lit(budget)).cast("long").alias("bin_offset"),
        "n_tokens",
    )
