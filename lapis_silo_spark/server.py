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
import uuid

from pyspark.sql import functions as F

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.expressions.base import QueryCompileError

ARROW_MIME = "application/vnd.apache.arrow.stream"
QUERY_TIMEOUT_SECONDS = 120  # reference default, query_handler.cpp:34


class QueryTimeoutError(RuntimeError):
    """A query exceeded the serving timeout; message mirrors the
    reference's ExecutionError (query_plan.cpp:121)."""


def _run_with_timeout(spark, fn, seconds: int, tag: str):
    """Run ``fn`` (a driver-side materialization) under a per-request job
    group and CANCEL its Spark jobs if it exceeds ``seconds`` — the Spark
    analog of the reference's per-batch future wait
    (query_plan.cpp:109-122): a timed-out query stops consuming executor
    slots instead of running to completion unobserved.

    Uses ``InheritableThread`` + pinned-thread job groups so cancellation
    targets exactly this request's jobs, not other concurrent queries.
    """
    from pyspark import InheritableThread

    box: dict = {}

    def target():
        sc = spark.sparkContext
        sc.setJobGroup(tag, "http query", interruptOnCancel=True)
        try:
            box["value"] = fn()
        except BaseException as exc:  # surfaced in the request thread
            box["error"] = exc

    t = InheritableThread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(tag)
        raise QueryTimeoutError(
            f"Request timed out, no batch within {seconds} seconds."
        )
    if "error" in box:
        raise box["error"]
    return box["value"]


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
                body = _run_with_timeout(
                    spark, lambda: _arrow_ipc_bytes(pipeline.df),
                    query_timeout, tag,
                )
                return Response(
                    body, content_type=ARROW_MIME, headers=headers
                )
            df = pipeline.df
            # emit null fields explicitly, matching the reference's rows
            # (Spark's toJSON drops them); streamed via toLocalIterator so a
            # large result never materializes driver-side at once
            jdf = df.select(
                F.to_json(
                    F.struct(*df.columns), {"ignoreNullFields": "false"}
                ).alias("j")
            )
            ndjson = _run_with_timeout(
                spark,
                lambda: "".join(r["j"] + "\n" for r in jdf.toLocalIterator()),
                query_timeout, tag,
            )
            return Response(
                ndjson, content_type="application/x-ndjson", headers=headers
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


def _arrow_ipc_bytes(df) -> bytes:
    """Arrow IPC stream sink (``exec_node/arrow_ipc_sink.cpp``): PySpark's
    native Arrow collect + one IPC stream write."""
    import pyarrow as pa

    table = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue()


def serve(db: Database, host: str = "127.0.0.1", port: int = 8081) -> None:
    create_app(db).run(host=host, port=port, threaded=True)
