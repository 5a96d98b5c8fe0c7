"""HTTP façade: the reference's serving API over the Spark engine.

Endpoints (reference ``app/src/``):

- ``POST /query``               SaneQL body → NDJSON (default) or Arrow IPC
  stream under ``Accept: application/vnd.apache.arrow.stream``
  (``query_handler.cpp:38-99``).
- ``GET /info``                 database info JSON (``info_handler.cpp``).
- ``GET /health``               ``{"status": "UP"}`` (``health_handler.cpp``).
- ``GET /lineageDefinition/<col>``  original lineage YAML
  (``lineage_definition_handler.cpp``).
- anything else                 404 ``{"error": "Not found", ...}``
  (``not_found_handler.cpp``).

Headers: every response carries ``data-version`` (10-digit version
timestamp) and ``X-Request-Id`` (echoed or generated,
``request_id_handler.cpp``); ``/query`` additionally reports
``result-ordering`` — a JSON array of ``{field, order, nullPlacement}``
(``query_plan.cpp:16-29``). Errors return the reference's
``{"error", "message"}`` JSON shape with 400/500.
"""

from __future__ import annotations

import io
import json
import queue as queue_mod
import uuid

from pyspark.sql import functions as F

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.expressions.base import QueryCompileError

ARROW_MIME = "application/vnd.apache.arrow.stream"
QUERY_TIMEOUT_SECONDS = 120  # reference default, query_handler.cpp:34
#: NDJSON chunk flush threshold — the reference's ndjson_sink flushes its
#: line buffer to the wire at 16 KB (``exec_node/ndjson_sink.cpp``).
FLUSH_BYTES = 16 * 1024
#: Bounded producer→response queue depth. The producer thread blocks once
#: this many chunks are unread — the backpressure window the reference
#: implements with its 64 MB bounded batch pipe (``query_plan.cpp:174-194``);
#: 64 slots × ~16 KB chunks ≈ 1 MB of driver buffering, plus at most one
#: in-flight partition inside toLocalIterator.
MAX_BUFFERED_CHUNKS = 64
#: Arrow IPC record-batch size for the streaming sink.
ARROW_BATCH_ROWS = 8192


class QueryTimeoutError(RuntimeError):
    """A query exceeded the serving timeout; message mirrors the
    reference's ExecutionError (query_plan.cpp:121)."""


class _CleanupStream:
    """Iterable wrapper whose ``close()`` ALWAYS runs the stream cleanup.

    A bare generator's ``close()`` is a no-op when the generator was never
    started, so ``finally`` never runs if werkzeug discards the response
    before its first iteration (teardown error, disconnect before the
    first write) — leaking the producer thread blocked in ``q.put()`` and
    leaving the request's Spark jobs running. werkzeug always calls
    ``close()`` on the response iterable; this wrapper makes that call
    sufficient on every path."""

    def __init__(self, gen, cleanup):
        self._gen = gen
        self._cleanup = cleanup

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._gen)

    def close(self):
        try:
            self._gen.close()
        finally:
            self._cleanup()


def _stream_with_timeout(spark, chunks_fn, seconds: int, tag: str):
    """Stream ``chunks_fn()`` (a generator of response chunks backed by
    ``toLocalIterator``) through a bounded queue with the reference's
    serving semantics (``query_plan.cpp:109-194``):

    - a producer ``InheritableThread`` runs the Spark jobs under a
      per-request job group and feeds a ``MAX_BUFFERED_CHUNKS``-slot queue
      (backpressure: a slow client stalls the producer, never grows driver
      memory — the response body is NEVER assembled in driver memory);
    - each chunk must arrive within ``seconds`` (the reference's per-batch
      future wait) or the request's Spark jobs are cancelled and
      :class:`QueryTimeoutError` raises;
    - the FIRST chunk is awaited before the HTTP status is committed, so
      bind/execution errors still surface as clean 400/500 responses;
      mid-stream failures abort the chunked transfer (reference behavior —
      the sink cannot un-send a 200);
    - closing the response (client disconnect) cancels the job group and
      unblocks the producer.

    Returns a generator yielding the chunks (possibly none).
    """
    from pyspark import InheritableThread

    q: queue_mod.Queue = queue_mod.Queue(maxsize=MAX_BUFFERED_CHUNKS)
    state = {"closed": False}

    def producer():
        sc = spark.sparkContext
        sc.setJobGroup(tag, "http query", interruptOnCancel=True)
        try:
            for chunk in chunks_fn():
                if state["closed"]:
                    return
                q.put(("chunk", chunk))
            q.put(("done", None))
        except BaseException as exc:  # surfaced in the consumer
            q.put(("err", exc))

    t = InheritableThread(target=producer, daemon=True)
    t.start()

    def cleanup():
        # normal end: jobs already finished, cancel is a no-op.
        # timeout / client disconnect / discarded response: stop the Spark
        # jobs and drain the queue so a producer blocked in put() can
        # observe the closed flag and exit.
        state["closed"] = True
        spark.sparkContext.cancelJobGroup(tag)
        try:
            while True:
                q.get_nowait()
        except queue_mod.Empty:
            pass

    def next_chunk():
        try:
            kind, payload = q.get(timeout=seconds)
        except queue_mod.Empty:
            # full cleanup here, not only on generator close: a FIRST-chunk
            # timeout raises before gen() exists, and a producer that got
            # past cancelJobGroup (prefetched toLocalIterator partitions)
            # would otherwise block in q.put() forever — leaking the thread
            # and MAX_BUFFERED_CHUNKS of body per timed-out request
            cleanup()
            raise QueryTimeoutError(
                f"Request timed out, no batch within {seconds} seconds."
            ) from None
        if kind == "err":
            raise payload
        return None if kind == "done" else payload

    first = next_chunk()  # pre-response: errors/timeout → clean 400/500

    def gen():
        try:
            chunk = first
            while chunk is not None:
                yield chunk
                chunk = next_chunk()
        finally:
            cleanup()

    return _CleanupStream(gen(), cleanup)


def database_info(db: Database) -> dict:
    """Shape-compatible ``/info`` payload (``info.test.js``): the bitmap-size
    gauges map to the normalized side tables' row counts."""
    sequence_count = db.table("default").count() if "default" in db.tables else 0
    horizontal = 0
    vertical = 0
    for store in db.sequence_stores.values():
        horizontal += store.coverage.count() + store.missing.count()
        vertical += store.mutations.count() + store.insertions.count()
    return {
        "version": "lapis-silo-spark/0.1",
        "sequenceCount": sequence_count,
        "horizontalBitmapsSize": horizontal,
        "verticalBitmapsSize": vertical,
    }


def create_app(db: Database, query_timeout: int = QUERY_TIMEOUT_SECONDS):
    """Build the Flask app serving ``db``. Import-guarded so the engine
    library works without Flask installed. ``query_timeout`` bounds each
    ``POST /query``'s execution (reference default 120 s); on expiry the
    request's Spark jobs are cancelled and a 500 with the reference's
    timeout message is returned."""
    from flask import Flask, Response, request

    app = Flask("lapis_silo_spark")

    def base_headers() -> dict[str, str]:
        rid = request.headers.get("X-Request-Id") or str(uuid.uuid4())
        return {"X-Request-Id": rid, "data-version": db.data_version}

    def error(status: int, err: str, message: str, headers=None) -> Response:
        return Response(
            json.dumps({"error": err, "message": message}),
            status=status,
            content_type="application/json",
            headers=headers or base_headers(),
        )

    @app.post("/query")
    def query() -> Response:
        headers = base_headers()
        text = request.get_data(as_text=True)
        try:
            from lapis_silo_spark.saneql import bind_query

            pipeline = bind_query(db, text)
            headers["result-ordering"] = json.dumps(pipeline.ordering)
            spark = pipeline.df.sparkSession
            tag = f"http-query-{headers['X-Request-Id']}"
            if ARROW_MIME in request.headers.get("Accept", ""):
                body = _stream_with_timeout(
                    spark, lambda: _arrow_ipc_chunks(pipeline.df),
                    query_timeout, tag,
                )
                return Response(
                    body, content_type=ARROW_MIME, headers=headers
                )
            df = pipeline.df
            # emit null fields explicitly, matching the reference's rows
            # (Spark's toJSON drops them); streamed via toLocalIterator +
            # 16 KB chunk flushes so a large result never materializes
            # driver-side at once (reference ndjson_sink semantics)
            jdf = df.select(
                F.to_json(
                    F.struct(*df.columns), {"ignoreNullFields": "false"}
                ).alias("j")
            )

            def ndjson_chunks():
                buf: list[str] = []
                size = 0
                for r in jdf.toLocalIterator():
                    line = r["j"] + "\n"
                    buf.append(line)
                    size += len(line)
                    if size >= FLUSH_BYTES:
                        yield "".join(buf)
                        buf, size = [], 0
                if buf:
                    yield "".join(buf)

            body = _stream_with_timeout(
                spark, ndjson_chunks, query_timeout, tag
            )
            return Response(
                body, content_type="application/x-ndjson", headers=headers
            )
        except QueryCompileError as exc:
            return error(400, "Bad request", str(exc), headers)
        except Exception as exc:  # mirror error_request_handler.cpp
            return error(500, "Internal server error", str(exc), headers)

    info_cache: dict[str, dict] = {}

    @app.get("/info")
    def info() -> Response:
        # counts are immutable per data version — compute once, not per poll
        if db.data_version not in info_cache:
            info_cache.clear()
            info_cache[db.data_version] = database_info(db)
        return Response(
            json.dumps(info_cache[db.data_version]),
            content_type="application/json",
            headers=base_headers(),
        )

    @app.get("/health")
    def health() -> Response:
        return Response(
            json.dumps({"status": "UP"}),
            content_type="application/json",
            headers=base_headers(),
        )

    @app.get("/lineageDefinition/<column>")
    def lineage_definition(column: str) -> Response:
        known_columns = set()
        for df in db.tables.values():
            known_columns.update(df.columns)
        if column not in known_columns:
            return error(
                400, "Bad request",
                f"The column {column} does not exist in this instance.",
            )
        if column not in db.lineage_definitions:
            return error(
                400, "Bad request",
                f"The column {column} does not have a lineageIndex defined.",
            )
        return Response(
            db.lineage_definitions[column],
            content_type="application/yaml",
            headers=base_headers(),
        )

    @app.errorhandler(404)
    def not_found(_exc) -> Response:
        return error(
            404, "Not found", f"Resource {request.path} does not exist"
        )

    return app


def _arrow_ipc_chunks(df):
    """Arrow IPC stream sink (``exec_node/arrow_ipc_sink.cpp``), batch-wise:
    rows from ``toLocalIterator`` are packed into ``ARROW_BATCH_ROWS``-row
    record batches and each batch's IPC bytes yielded as soon as it is
    written — driver memory holds one batch, never the table. The stream
    header (schema message) is emitted first, so empty results still
    produce a valid, schema-bearing IPC stream."""
    import datetime as _dt

    import pyarrow as pa
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    # to_arrow_schema maps TimestampType to timestamp[us, tz=UTC], but
    # toLocalIterator materializes timestamps via fromInternal's
    # datetime.fromtimestamp — NAIVE wall time in the driver PROCESS'S OS
    # zone — and from_pylist would stamp that as UTC, shifting every value
    # by the host offset on non-UTC hosts. astimezone() on a naive datetime
    # attaches the OS-local zone (DST-aware per instant, the exact inverse
    # of fromtimestamp); the result must then be handed over as NAIVE UTC
    # wall time because pyarrow's from_pylist ignores tzinfo against a
    # tz-typed field (verified on pyarrow 16: an aware 12:30-05:00 lands as
    # 12:30Z). (TimestampNTZType stays naive by design; the catalog has no
    # nested timestamps — struct fields would need a schema walk.)
    _ts_cols = [
        f.name for f in df.schema.fields
        if type(f.dataType) is T.TimestampType
    ]

    def _localize(d: dict) -> dict:
        for c in _ts_cols:
            v = d.get(c)
            if isinstance(v, _dt.datetime) and v.tzinfo is None:
                d[c] = (
                    v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                )
        return d

    sink = io.BytesIO()
    writer = pa.ipc.new_stream(sink, schema)

    def take():
        data = sink.getvalue()
        sink.seek(0)
        sink.truncate(0)
        return data

    rows: list[dict] = []
    for row in df.toLocalIterator():
        rows.append(_localize(row.asDict(recursive=True)))
        if len(rows) >= ARROW_BATCH_ROWS:
            writer.write_batch(pa.RecordBatch.from_pylist(rows, schema=schema))
            rows = []
            yield take()
    if rows:
        writer.write_batch(pa.RecordBatch.from_pylist(rows, schema=schema))
    writer.close()
    yield take()


def serve(db: Database, host: str = "127.0.0.1", port: int = 8081) -> None:
    create_app(db).run(host=host, port=port, threaded=True)
