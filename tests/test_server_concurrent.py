"""Serving under concurrent load (round-10 VERDICT #5).

The reference serves many simultaneous requests from a Poco worker pool
with 16 KB flush / 64 MB backpressure bounds
(``/root/reference/src/silo/query_engine/query_plan.cpp:174-194``); the
Spark analog is one shared SparkSession + a threaded HTTP server, each
request streaming through its own bounded queue under a per-request job
group. This drives ~8 concurrent ``POST /query`` streams over REAL
sockets — a mix of distinct NDJSON result bodies and requests that hit
the query timeout — and asserts:

- no cross-request state leak: every response's body rows satisfy that
  request's own predicate and row count, and ``X-Request-Id`` echoes the
  id that request sent;
- a timed-out request's job-group cancellation does NOT kill concurrent
  healthy requests (per-request tags, thread-local job groups);
- correct ``data-version`` and ``result-ordering`` headers on every
  successful response;
- bounded driver memory while all bodies stream (RSS smoke bound), and
  no Spark jobs left running once the dust settles.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from urllib import request as urlreq
from urllib.error import HTTPError

import pytest

PORT = 8431
TIMEOUT_S = 6


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


@pytest.fixture(scope="module")
def served_db(spark):
    """Threaded HTTP server over a real db: the sf0.001 genomic store, the
    lineitem volume table, and a deliberately slow table (30 s sleeping
    tasks) that can never beat the server's 6 s query timeout."""
    from lapis_silo_spark.driver_queries import genomic_db
    from lapis_silo_spark.server import create_app

    db = genomic_db(spark, "/root/testdata/sf0.001")
    db.register_table(
        "lineitem",
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        primary_key="l_orderkey",
    )
    slow = spark.createDataFrame(
        spark.sparkContext.parallelize(range(4), 4).map(
            lambda i: (time.sleep(30), i)[1:]
        ),
        "id long",
    )
    db.register_table("slow", slow, primary_key="id")

    app = create_app(db, query_timeout=TIMEOUT_S)
    threading.Thread(
        target=lambda: app.run(
            host="127.0.0.1", port=PORT, threaded=True, use_reloader=False
        ),
        daemon=True,
    ).start()

    def post(query: str, rid: str):
        req = urlreq.Request(
            f"http://127.0.0.1:{PORT}/query", data=query.encode(),
            method="POST", headers={"X-Request-Id": rid},
        )
        try:
            with urlreq.urlopen(req, timeout=120) as resp:
                return resp.status, dict(resp.headers), resp.read().decode()
        except HTTPError as exc:
            return (exc.code, dict(exc.headers),
                    exc.read().decode(errors="replace"))

    # server up + codegen warm (one cheap request, retried until the
    # socket accepts)
    for _ in range(120):
        try:
            post("lineitem.filter(l_linenumber = 7)", "warm")
            break
        except OSError:
            time.sleep(0.5)
    return db, post


def test_eight_concurrent_streams_no_cross_request_leak(spark, served_db):
    db, post = served_db
    # the binder reproduces the reference's PARTIAL `<` (not implemented
    # for integer expressions), so request-distinguishing predicates use
    # equality on l_linenumber — each value has a distinct row count
    thresholds = [1, 2, 3, 4, 5]
    expected = {
        k: db.tables["lineitem"].filter(f"l_linenumber = {k}").count()
        for k in thresholds
    }
    # distinct expected counts, or the no-mixing assertion proves nothing
    assert len(set(expected.values())) == len(thresholds)

    jobs = [("large", k) for k in thresholds] + [("timeout", None)] * 3
    rss_before = _rss_mb()

    def run(job):
        kind, k = job
        rid = f"{kind}-{k}-{uuid.uuid4()}"
        if kind == "large":
            q = f"lineitem.filter(l_linenumber = {k})"
        else:
            q = "slow.groupBy({count := count()})"
        status, headers, body = post(q, rid)
        return kind, k, rid, status, headers, body

    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        results = list(pool.map(run, jobs))

    rss_after = _rss_mb()

    for kind, k, rid, status, headers, body in results:
        # header isolation: each response carries ITS request's id and the
        # db's data version — on errors too (error() passes the request's
        # headers through)
        assert headers.get("X-Request-Id") == rid
        assert headers.get("data-version") == db.data_version
        if kind == "timeout":
            assert status == 500, body
            assert (
                f"Request timed out, no batch within {TIMEOUT_S} seconds"
                in body
            )
            continue
        # healthy requests must survive their neighbors' cancellations
        assert status == 200, body
        assert "result-ordering" in headers
        rows = [json.loads(ln) for ln in body.splitlines() if ln]
        assert len(rows) == expected[k]
        assert all(r["l_linenumber"] == k for r in rows)

    # bounded memory: five streamed NDJSON bodies + three cancelled
    # streams must not accumulate driver-side (bounded queues, no
    # whole-body assembly) — smoke bound, generous for GC slack
    assert rss_after - rss_before < 256, (rss_before, rss_after)

    # the timed-out requests' job groups were cancelled: nothing may still
    # occupy executor slots once responses are in
    tracker = spark.sparkContext.statusTracker()
    for _ in range(60):
        if not tracker.getActiveJobsIds():
            break
        time.sleep(0.5)
    assert not tracker.getActiveJobsIds()
