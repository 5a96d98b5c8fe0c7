"""Serving query-timeout + streaming-body semantics (round-5 VERDICT #7, #2).

The reference bounds every ``POST /query`` at 120 s (DEFAULT_TIMEOUT_
TWO_MINUTES, app/src/query_handler.cpp:34) and surfaces
``Request timed out, no batch within N seconds.`` through its error
handler (query_plan.cpp:121). The Spark analog must ALSO cancel the
request's jobs — a timed-out query must stop consuming executor slots.
Round 6 adds the streaming response contract (query_plan.cpp:174-194):
the body is produced chunk-wise through a bounded queue, never assembled
in driver memory, and the first chunk gates the HTTP status.
"""

import time

import pytest

from lapis_silo_spark.server import QueryTimeoutError, _stream_with_timeout


def test_stream_timeout_cancels_spark_jobs(spark):
    def slow_chunks():
        rows = (
            spark.sparkContext.parallelize(range(64), 64)
            .map(lambda x: time.sleep(30) or x)
            .collect()
        )
        yield str(rows)

    t0 = time.monotonic()
    with pytest.raises(QueryTimeoutError, match="no batch within 3 seconds"):
        _stream_with_timeout(spark, slow_chunks, 3, "test-timeout-cancel")
    # returned at the timeout, not after the 30 s sleep
    assert time.monotonic() - t0 < 15
    # and the job group really was cancelled: executors free up
    tracker = spark.sparkContext.statusTracker()
    for _ in range(40):
        if not tracker.getActiveJobsIds():
            break
        time.sleep(0.5)
    assert not tracker.getActiveJobsIds()


def test_stream_passes_chunks_and_errors(spark):
    out = list(_stream_with_timeout(
        spark, lambda: iter(["a", "b", "c"]), 30, "t-ok"
    ))
    assert out == ["a", "b", "c"]
    # empty result: valid zero-chunk stream, no error
    assert list(_stream_with_timeout(spark, lambda: iter([]), 30, "t-empty")) == []
    # an error BEFORE the first chunk surfaces at call time (pre-response),
    # so the HTTP layer can still answer with a clean 400/500
    with pytest.raises(ValueError, match="boom"):
        _stream_with_timeout(
            spark, lambda: (_ for _ in ()).throw(ValueError("boom")),
            30, "t-err",
        )


def test_stream_is_incremental_not_buffered(spark):
    """The producer must not run ahead of the consumer by more than the
    bounded queue (backpressure): with a slow consumer, chunks are produced
    lazily, proving the body is never assembled up front."""
    from lapis_silo_spark import server as srv

    produced = []

    def chunks():
        for i in range(srv.MAX_BUFFERED_CHUNKS * 3):
            produced.append(i)
            yield str(i)

    gen = _stream_with_timeout(spark, chunks, 30, "t-backpressure")
    first = next(gen)
    assert first == "0"
    # give the producer a moment to run ahead as far as the queue allows
    time.sleep(1.0)
    # bounded: first chunk + queue capacity + at most a couple in flight
    assert len(produced) <= srv.MAX_BUFFERED_CHUNKS + 4
    rest = list(gen)
    assert len(rest) == srv.MAX_BUFFERED_CHUNKS * 3 - 1


def test_stream_close_unblocks_producer(spark):
    """Closing the response mid-stream (client disconnect) lets a producer
    blocked on the full queue exit instead of leaking the thread."""
    finished = []

    def chunks():
        for i in range(10_000):
            yield str(i)
        finished.append(True)

    gen = _stream_with_timeout(spark, chunks, 30, "t-close")
    assert next(gen) == "0"
    gen.close()  # Flask does this on disconnect
    # producer observes the closed flag (queue drained) and exits early
    time.sleep(1.0)
    assert not finished  # never ran to completion


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


def test_arrow_stream_timestamps_survive_non_utc_host_tz(spark):
    """toLocalIterator yields NAIVE local-wall-time datetimes
    (fromInternal uses datetime.fromtimestamp), while the Arrow schema
    declares timestamp[us, tz=UTC] — the sink must localize before
    building batches or every value shifts by the host's UTC offset."""
    import datetime as dt
    import io
    import os
    import time as time_mod

    import pyarrow as pa

    from lapis_silo_spark.server import _arrow_ipc_chunks

    instant = dt.datetime(2026, 1, 15, 17, 30, 0, tzinfo=dt.timezone.utc)
    # created BEFORE the TZ switch: aware datetimes convert tz-independently
    df = spark.createDataFrame([(1, instant)], "id long, ts timestamp")

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time_mod.tzset()
    try:
        data = b"".join(_arrow_ipc_chunks(df))
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time_mod.tzset()

    tbl = pa.ipc.open_stream(io.BytesIO(data)).read_all()
    [got] = tbl.column("ts").to_pylist()
    assert got == instant, f"shifted: {got!r} != {instant!r}"


def test_stream_first_chunk_timeout_unblocks_producer(spark):
    """A FIRST-chunk timeout must drain the queue and set the closed flag
    (gen() never exists to run its cleanup), so a producer that slipped
    past cancelJobGroup can't block in q.put() forever."""
    import threading

    finished = threading.Event()

    def chunks():
        try:
            time.sleep(1.2)  # outlast the 1 s timeout
            for _ in range(200):  # >> MAX_BUFFERED_CHUNKS if not stopped
                yield b"x" * 1024
        finally:
            # runs when the producer loop observes the closed flag and
            # drops the generator (GeneratorExit) — i.e. it did NOT hang
            finished.set()

    with pytest.raises(QueryTimeoutError):
        _stream_with_timeout(spark, chunks, 1, "first-chunk-timeout-test")
    assert finished.wait(10), "producer still blocked after timeout"


def test_stream_close_before_first_iteration_runs_cleanup(spark):
    """werkzeug may close() a response iterable it never iterated (teardown
    error, disconnect before the first write). A bare generator's close()
    is a no-op before the first next(), so cleanup must live on the
    wrapper: the producer blocked in q.put() has to observe the closed
    flag and exit instead of leaking."""
    from lapis_silo_spark import server as srv

    produced = []
    done = []

    def chunks():
        for i in range(srv.MAX_BUFFERED_CHUNKS * 4):
            produced.append(i)
            yield str(i)
        done.append(True)

    gen = _stream_with_timeout(spark, chunks, 30, "t-close-unstarted")
    # NO iteration of the response body at all — discard it immediately
    gen.close()
    deadline = time.time() + 5
    # producer drains within the deadline: it stops enqueueing (closed
    # flag observed after the queue drain) and never runs to completion
    while time.time() < deadline and len(produced) and not done:
        count = len(produced)
        time.sleep(0.3)
        if len(produced) == count:
            break
    assert not done  # never ran to completion -> thread exited early
