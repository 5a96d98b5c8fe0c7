"""Train/eval decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard large-scale training-data hygiene step (the reference engine has
no analog — this is part of the training-pipeline superset): benchmark/eval
text must not leak into the training corpus, and the detector of record is
exact word-n-gram overlap.

Scale design: the eval set is orders of magnitude smaller than the training
corpus, so its distinct n-gram table is **broadcast** — the contamination
check is then a map-side hash join against the exploded training n-grams; the
only shuffle is the final per-document aggregation. At 100 TB of training
text with a ~100 MB eval-gram table this is a single pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lapis_silo_spark.functions.text import word_ngrams


def eval_ngram_table(
    eval_df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the evaluation set (column ``gram``)."""
    return (
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )


def contaminated_docs(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per contaminated training doc: ``(id_col, hits)`` where ``hits`` is the
    number of distinct eval n-grams it contains (> 0 rows only)."""
    grams = eval_ngram_table(eval_df, text_col, n)
    train_grams = train_df.select(
        id_col, F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    # Join BEFORE deduplicating: the broadcast join is map-side, so only the
    # grams that actually hit the eval set ever reach a shuffle — at corpus
    # scale contamination is sparse, so this shuffles a sliver of the data a
    # distinct-then-join formulation would move. countDistinct still does a
    # partial (map-side) aggregate of that sliver.
    return (
        train_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("hits"))
    )
