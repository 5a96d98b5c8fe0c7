"""Temporal join operators (operators/temporal.py): as-of join and binned
interval range join. The reference has neither (hash equi-join only,
join_node.cpp:88-91) — these are the time-series superset, so fixtures are
hand-computed rather than reference-derived.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lapis_silo_spark.operators.temporal import asof_join, range_join_binned


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # (id, key, ts)
            (1, "u", 10),
            (2, "u", 20),
            (3, "u", 5),   # before any right row
            (4, "v", 10),  # key with one right row at the same ts
            (5, "w", 10),  # key with no right rows at all
        ],
        "id int, key string, ts int",
    )
    right = spark.createDataFrame(
        [
            # (key, rts, tag, maybe_null)
            ("u", 8, "r8", None),
            ("u", 10, "r10", "x"),
            ("u", 15, "r15", None),
            ("v", 10, "rv", "y"),
        ],
        "key string, rts int, tag string, maybe_null string",
    )
    return left, right


def _asof_map(df, col="asof_tag"):
    return {r["id"]: r[col] for r in df.collect()}


def test_asof_inclusive_takes_equal_ts_row(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts",
                    payload=["tag"], tiebreak="tag")
    assert _asof_map(out) == {1: "r10", 2: "r15", 3: None, 4: "rv", 5: None}


def test_asof_exclusive_skips_equal_ts_row(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts",
                    payload=["tag"], inclusive=False, tiebreak="tag")
    # at ts=10 the equal-ts right rows (r10, rv) no longer qualify
    assert _asof_map(out) == {1: "r8", 2: "r15", 3: None, 4: None, 5: None}


def test_asof_payload_columns_come_from_the_same_row(spark, frames):
    """A NULL payload field must NOT be back-filled from an earlier right row
    (the struct-packing guarantee; per-column last(ignorenulls) would leak
    'x' from the ts=10 row into the ts=15 match)."""
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts",
                    payload=["tag", "maybe_null"], tiebreak="tag")
    row = {r["id"]: (r["asof_tag"], r["asof_maybe_null"]) for r in out.collect()}
    assert row[2] == ("r15", None)  # not ("r15", "x")
    assert row[1] == ("r10", "x")


def test_asof_equal_ts_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame([(1, "u", 10)], "id int, key string, ts int")
    right = spark.createDataFrame(
        [("u", 10, "a"), ("u", 10, "b"), ("u", 10, "c")],
        "key string, rts int, tag string",
    )
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts",
                    payload=["tag"], tiebreak="tag")
    # string-ordered tiebreak: the largest tiebreak value wins (last in order)
    assert _asof_map(out) == {1: "c"}


def test_asof_preserves_left_columns_and_row_count(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts",
                    payload=["tag"], tiebreak="tag")
    assert out.columns == ["id", "key", "ts", "asof_tag"]
    assert out.count() == left.count()


def test_asof_plan_is_single_shuffle_window(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts",
                    payload=["tag"], tiebreak="tag")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


# -- range join --------------------------------------------------------------


@pytest.fixture(scope="module")
def range_frames(spark):
    left = spark.createDataFrame(
        [
            # (id, key, lo, hi): inclusive interval
            (1, "u", 10, 20),
            (2, "u", 100, 330),  # spans 4 bins at width 100
            (3, "v", 10, 20),
        ],
        "id int, key string, lo int, hi int",
    )
    right = spark.createDataFrame(
        [
            ("u", 10, "p10"),    # on the lower bound (inclusive)
            ("u", 20, "p20"),    # on the upper bound (inclusive)
            ("u", 21, "p21"),    # just outside
            ("u", 200, "p200"),  # bin boundary inside interval 2
            ("u", 330, "p330"),  # upper bound of interval 2
            ("u", 331, "p331"),  # outside
            ("v", 15, "pv"),
            ("w", 15, "pw"),     # key with no left interval
        ],
        "key string, pt int, ptag string",
    )
    return left, right


def test_range_join_inclusive_bounds_and_bin_spans(spark, range_frames):
    left, right = range_frames
    out = range_join_binned(
        left, right, on=["key"],
        left_lo=F.col("lo"), left_hi=F.col("hi"),
        right_point=F.col("pt"), bin_width=100,
    )
    got = sorted((r["id"], r["ptag"]) for r in out.collect())
    assert got == [(1, "p10"), (1, "p20"), (2, "p200"), (2, "p330"),
                   (3, "pv")]


def test_range_join_no_duplicate_pairs_across_bins(spark, range_frames):
    """A point matching an interval that spans several bins appears once —
    the point lives in exactly one bin."""
    left, right = range_frames
    out = range_join_binned(
        left, right, on=["key"],
        left_lo=F.col("lo"), left_hi=F.col("hi"),
        right_point=F.col("pt"), bin_width=7,  # awkward width, many bins
    )
    pairs = [(r["id"], r["ptag"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    assert sorted(pairs) == [(1, "p10"), (1, "p20"), (2, "p200"),
                             (2, "p330"), (3, "pv")]


def test_range_join_plan_is_equi_join(spark, range_frames):
    left, right = range_frames
    out = range_join_binned(
        left, right, on=["key"],
        left_lo=F.col("lo"), left_hi=F.col("hi"),
        right_point=F.col("pt"), bin_width=100,
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_sessionize_gap_boundaries(spark):
    import datetime as dt

    from lapis_silo_spark.operators.temporal import session_stats, sessionize

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    # u1: gap of exactly 60s does NOT split (strict >); 61s does.
    rows = [
        ("u1", 1, at(0)),
        ("u1", 2, at(60)),
        ("u1", 3, at(121)),
        ("u2", 4, at(0)),
    ]
    df = spark.createDataFrame(rows, schema="user string, eid long, ts timestamp")
    out = {
        (r["user"], r["eid"]): r["session_seq"]
        for r in sessionize(df, ["user"], "ts", 60, tiebreak="eid").collect()
    }
    assert out == {("u1", 1): 1, ("u1", 2): 1, ("u1", 3): 2, ("u2", 4): 1}

    stats = {
        (r["user"], r["session_seq"]): (r["n_events"], r["duration_s"])
        for r in session_stats(df, ["user"], "ts", 60, tiebreak="eid").collect()
    }
    assert stats == {
        ("u1", 1): (2, 60.0),
        ("u1", 2): (1, 0.0),
        ("u2", 1): (1, 0.0),
    }


def test_sessionize_single_shuffle(spark):
    import datetime as dt

    from lapis_silo_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [("u1", 1, dt.datetime(2024, 1, 1))],
        schema="user string, eid long, ts timestamp",
    )
    out = sessionize(df, ["user"], "ts", 60, tiebreak="eid")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # both windows must share ONE exchange (plus nothing else shuffling);
    # formatted plans print each node twice (tree line + detail header)
    assert plan.count(") Exchange") == 1
