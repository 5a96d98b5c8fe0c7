"""Serving query-timeout semantics (round-5 VERDICT #7).

The reference bounds every ``POST /query`` at 120 s (DEFAULT_TIMEOUT_
TWO_MINUTES, app/src/query_handler.cpp:34) and surfaces
``Request timed out, no batch within N seconds.`` through its error
handler (query_plan.cpp:121). The Spark analog must ALSO cancel the
request's jobs — a timed-out query must stop consuming executor slots.
"""

import time

import pytest

from lapis_silo_spark.server import QueryTimeoutError, _run_with_timeout


def test_run_with_timeout_cancels_spark_jobs(spark):
    def slow():
        return (
            spark.sparkContext.parallelize(range(64), 64)
            .map(lambda x: time.sleep(30) or x)
            .collect()
        )

    t0 = time.monotonic()
    with pytest.raises(QueryTimeoutError, match="no batch within 3 seconds"):
        _run_with_timeout(spark, slow, 3, "test-timeout-cancel")
    # returned at the timeout, not after the 30 s sleep
    assert time.monotonic() - t0 < 15
    # and the job group really was cancelled: executors free up
    tracker = spark.sparkContext.statusTracker()
    for _ in range(40):
        if not tracker.getActiveJobsIds():
            break
        time.sleep(0.5)
    assert not tracker.getActiveJobsIds()


def test_run_with_timeout_passes_results_and_errors(spark):
    assert _run_with_timeout(spark, lambda: 42, 30, "t-ok") == 42
    with pytest.raises(ValueError, match="boom"):
        _run_with_timeout(
            spark, lambda: (_ for _ in ()).throw(ValueError("boom")),
            30, "t-err",
        )


def test_http_query_timeout_error_shape(example_db):
    """A too-slow query returns the reference's 500 + timeout message while
    the server stays healthy for subsequent queries."""
    from lapis_silo_spark.server import create_app

    app = create_app(example_db, query_timeout=0)
    client = app.test_client()
    resp = client.post("/query", data="default.groupBy({cnt := count()})")
    assert resp.status_code == 500
    body = resp.get_json()
    assert "Request timed out, no batch within 0 seconds." in body["message"]
    assert resp.headers.get("X-Request-Id")

    # same db served without the artificial clamp still answers
    ok_app = create_app(example_db)
    ok = ok_app.test_client().post(
        "/query", data="default.groupBy({cnt := count()})"
    )
    assert ok.status_code == 200
