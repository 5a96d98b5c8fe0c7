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


def to_micros(c: Column | str) -> Column:
    """Epoch microseconds from a TIMESTAMP *or* TIMESTAMP_NTZ column.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ (the type Parquet files written
    without timezone metadata load as), so every temporal operator goes
    through this helper. The ``cast("timestamp")`` is a no-op for TIMESTAMP
    and interprets NTZ wall-clock values under the session timezone — which
    ``session.get_spark`` pins to UTC, so the mapping is stable and
    DST-free. Time *differences* are therefore exact for both types.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


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
    :func:`to_micros` first); ``bin_width`` should be ≈ the typical interval
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


def sessionize(
    events: DataFrame,
    on: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: assign every event a per-key ``session_seq``
    (1-based), where a new session starts whenever the time since the key's
    previous event exceeds ``gap_seconds``. The reference has no windowing at
    all (SURVEY §2.5); this is the batch analytic a clickstream/training-log
    pipeline needs before per-session aggregation.

    Plan shape: ONE shuffle — both windows (the ``lag`` that marks session
    boundaries and the running ``sum`` that numbers them) share the same
    partitioning ``on`` and ordering, so Catalyst plans a single Exchange +
    Sort and evaluates both Window operators over it. Never collects to the
    driver; compare Spark's built-in ``session_window`` which only emits
    per-session aggregates, not per-event assignment.

    ``tiebreak`` orders same-timestamp events deterministically.
    """
    on = list(on)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak is not None else []
    )
    w_lag = Window.partitionBy(*on).orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(F.col(ts_col)).over(w_lag)
    is_new = (
        prev_ts.isNull()
        | (to_micros(ts_col) - to_micros(prev_ts)
           > gap_seconds * 1_000_000)
    ).cast("long")
    return events.withColumn("session_seq", F.sum(is_new).over(w_run))


def session_stats(
    events: DataFrame,
    on: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    aggs: dict[str, Column] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output: one row per
    (key..., session_seq) with ``session_start``, ``session_end``,
    ``n_events``, ``duration_s``, plus any caller ``aggs``. The groupBy keys
    are a superset of the window partitioning, so the aggregation reuses the
    sessionize shuffle's partitioning (no second Exchange of the full data).
    """
    on = list(on)
    extra = dict(aggs or {})
    sess = sessionize(events, on, ts_col, gap_seconds, tiebreak=tiebreak)
    dur = to_micros(F.max(ts_col)) - to_micros(F.min(ts_col))
    return sess.groupBy(*on, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (dur / 1_000_000.0).alias("duration_s"),
        *[c.alias(name) for name, c in extra.items()],
    )
