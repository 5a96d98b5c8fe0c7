"""Temporal join operators: as-of join and binned interval range join.

The reference engine has NO non-equi / as-of / range joins — its JoinNode is
hash equi-join only (src/silo/query_engine/operators/join_node.cpp:88-91;
SURVEY §2.5 lists these as absent). These are Spark-superset operators that
time-series and training-data pipelines need constantly, built scale-first:

- ``asof_join``: union both sides + ONE shuffle on the key + a running
  ``last(..., ignorenulls)`` window. Never materializes the O(|left|×|right|)
  candidate set a naive inequality join produces; each key group is sorted
  once. This is the plan you want at 100 TB — the naive formulation is a
  BroadcastNestedLoopJoin that cannot finish.
- ``range_join_binned``: bucketize the bounded interval so the predicate
  becomes an equi-join on (key..., bin) + an exact refine filter. Catalyst
  then picks a shuffled hash join (or broadcast hash join for a small side)
  instead of BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    prefix: str = "asof_",
    inclusive: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` (backward as-of; ``<`` when ``inclusive=False``),
    matching on the equi-keys ``on``. Left rows with no prior right row get
    NULL payload (left-outer semantics).

    Plan shape: tag rows with a side marker, union, and run one
    ``last(struct(payload), ignorenulls=True)`` over a window partitioned by
    the keys and ordered by (ts, side[, tiebreak]) — right rows sort before
    left rows at equal ts when inclusive, after when exclusive. The payload
    rides in ONE struct so all columns always come from the same right row
    (per-column ``last`` would mix rows when a payload field is NULL).

    ``tiebreak`` (a right column name) makes the winner among equal-ts right
    rows deterministic; without it Spark's sort is free to pick any.
    """
    on = list(on)
    payload = list(payload)
    lcols = left.columns
    left_side, right_side = (1, 0) if inclusive else (0, 1)

    tb_col = (
        F.col(tiebreak).cast("string") if tiebreak is not None else F.lit(None)
    )
    l_tagged = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast("string").alias("__tb"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        tb_col.cast("string").alias("__tb"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(),
                 F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__r_last", F.last("__r", ignorenulls=True).over(w))
    return matched.filter(F.col("__side") == left_side).select(
        *lcols,
        *[F.col(f"__r_last.{c}").alias(prefix + c) for c in payload],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_lo: Column,
    left_hi: Column,
    right_point: Column,
    bin_width: int,
) -> DataFrame:
    """Inner interval join: pairs where ``right_point`` falls in the left
    row's inclusive numeric range ``[left_lo, left_hi]`` and the equi-keys
    ``on`` match. Bounds and point must be numeric (convert timestamps with
    ``F.unix_micros`` first); ``bin_width`` should be ≈ the typical interval
    width so each left row spans O(1) bins.

    Plan shape: the left row explodes into its covered bins
    (``sequence(floor(lo/w), floor(hi/w))``), the right point maps to its
    single bin, and the join runs as an equi-join on (on..., bin) followed by
    the exact range refine. Output columns = left columns + right columns;
    callers needing left-outer counts aggregate the pairs and join back to
    the left side (see ``range_join_clicks`` in driver_queries).
    """
    on = list(on)
    w = F.lit(bin_width).cast("long")
    l_binned = left.withColumn("__lo", left_lo.cast("long")).withColumn(
        "__hi", left_hi.cast("long")
    ).withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(F.col("__lo") / w),
                             F.floor(F.col("__hi") / w))),
    )
    r_binned = right.withColumn("__pt", right_point.cast("long")).withColumn(
        "__bin", F.floor(F.col("__pt") / w)
    )
    joined = l_binned.join(r_binned, on=on + ["__bin"]).filter(
        F.col("__pt").between(F.col("__lo"), F.col("__hi"))
    )
    return joined.drop("__lo", "__hi", "__pt", "__bin")
