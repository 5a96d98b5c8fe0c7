"""evobench-style serving replay harness — the reference's layer-4
regression net (``benchmarking/README.md:40-60``, ``bin/api-query-iter`` +
``bin/api-query-log-compare``): replay a query corpus over ``POST /query``
against a versioned dataset, log per-query latency, and CHECKSUM each
query's result against a stored good log. A regression that changes
results while staying fast is caught here, on the serving path, without
waiting for the next oracle run.

Semantics mirrored from the reference:

- the first run against a missing good log STORES it (``good-api-query-log
  .csv`` "is automatically stored upon the first benchmarking run");
- later runs compare checksums and flag differences not matched by an
  ignore-regex file (one pattern per line; empty/missing = ignore nothing);
- ``--repeat`` runs each query N times (median latency reported),
  ``--concurrency`` replays with a thread pool (the serving path is one
  shared SparkSession — this doubles as the head-of-line-blocking probe).

Checksum: md5 over the SORTED response body lines — order-insensitive, so
queries without a total order stay stable across partitionings — plus the
HTTP status. Response headers (data-version, request id) are excluded:
they legitimately vary between dataset versions.

Usage::

    python tools/replay.py [--queries DIR|FILE.ndjson] [--url http://host:port]
        [--good-log CSV] [--log-csv CSV] [--ignore-regex FILE]
        [--repeat N] [--concurrency C] [--limit K]

Default target is an in-process app serving the golden-equivalent dataset
(``tools/golden_fit/golden_db.py``); default corpus is the reference's e2e
query suite. Exit 1 on any non-ignored checksum/status difference.
"""

from __future__ import annotations

import argparse
import csv
import hashlib
import json
import os
import re
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = Path("/root/reference/endToEndTests/test/queries")
DEFAULT_GOOD_LOG = Path(__file__).resolve().parent / "replay_good_log.csv"

FIELDS = ["name", "status", "checksum", "arrow_checksum",
          "latency_ms_median", "latency_ms_min", "latency_ms_max"]


def load_cases(source: Path) -> list[dict]:
    """Corpus = golden-suite directory of ``{query: ...}`` JSON files, or an
    NDJSON file with one ``{"name": ..., "query": ...}`` object per line
    (the reference's ``queries/queries.ndjson`` shape)."""
    if source.is_dir():
        cases = []
        for path in sorted(source.glob("**/*.json")):
            data = json.loads(path.read_text())
            name = str(path.relative_to(source))[:-len(".json")]
            cases.append({"name": name, "query": data["query"]})
        return cases
    return [
        json.loads(line)
        for line in source.read_text().splitlines()
        if line.strip()
    ]


def result_checksum(status: int, body: str) -> str:
    """Order-insensitive result digest: status + sorted body lines."""
    lines = sorted(line for line in body.splitlines() if line)
    h = hashlib.md5()
    h.update(str(status).encode())
    for line in lines:
        h.update(b"\n")
        h.update(line.encode())
    return h.hexdigest()


ARROW_MIME = "application/vnd.apache.arrow.stream"


def arrow_checksum(status: int, content_type: str, data: bytes) -> str:
    """Content-based digest of the Arrow IPC response path (round-5
    VERDICT #8): parse the stream and hash column-name-sorted, row-sorted
    values, so the checksum is stable across batch splits and row order —
    the same order-insensitivity contract as the NDJSON checksum. Non-200
    or non-Arrow responses hash their raw bytes."""
    h = hashlib.md5()
    h.update(str(status).encode())
    if status == 200 and ARROW_MIME in (content_type or ""):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        table = ipc.open_stream(pa.BufferReader(data)).read_all()
        cols = sorted(table.column_names)
        for row in sorted(
            "|".join(repr(r[c]) for c in cols) for r in table.to_pylist()
        ):
            h.update(b"\n")
            h.update(row.encode())
    else:
        h.update(data)
    return h.hexdigest()


def replay(post, cases: list[dict], repeat: int = 1,
           concurrency: int = 1) -> list[dict]:
    """Run every case ``repeat`` times through ``post(query_text) ->
    (status, body)``; returns one log row per case. With concurrency > 1
    the cases are replayed from a thread pool (repeats of one case stay
    sequential so latency samples are honest)."""

    def run_case(case: dict) -> dict:
        samples = []
        status, body = 0, ""
        for _ in range(repeat):
            t0 = time.monotonic()
            status, body = post(case["query"])
            samples.append((time.monotonic() - t0) * 1000)
        # second pass through content negotiation: the Arrow IPC sink is
        # its own output path (ArrowIpcSink vs NdjsonSink in the
        # reference) and gets its own checksum column
        a_status, a_ctype, a_bytes = post(case["query"], accept=ARROW_MIME)
        return {
            "name": case["name"],
            "status": status,
            "checksum": result_checksum(status, body),
            "arrow_checksum": arrow_checksum(a_status, a_ctype, a_bytes),
            "latency_ms_median": round(statistics.median(samples), 2),
            "latency_ms_min": round(min(samples), 2),
            "latency_ms_max": round(max(samples), 2),
        }

    if concurrency <= 1:
        return [run_case(c) for c in cases]
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        return list(pool.map(run_case, cases))


def compare(rows: list[dict], good_rows: list[dict],
            ignore_patterns: list[str]) -> list[str]:
    """Differences vs the good log, minus ignored query names. A query
    missing from the good log is reported as new (informational, not a
    failure); a changed checksum or status is a failure."""
    ignore = [re.compile(p) for p in ignore_patterns if p.strip()]
    good = {r["name"]: r for r in good_rows}
    problems = []
    for row in rows:
        if any(p.search(row["name"]) for p in ignore):
            continue
        base = good.get(row["name"])
        if base is None:
            continue  # new query — will be added when the good log rotates
        if str(row["status"]) != str(base["status"]):
            problems.append(
                f"{row['name']}: status {base['status']} -> {row['status']}"
            )
        elif row["checksum"] != base["checksum"]:
            problems.append(
                f"{row['name']}: checksum {base['checksum']} -> "
                f"{row['checksum']}"
            )
        elif base.get("arrow_checksum") and (
            row.get("arrow_checksum") != base["arrow_checksum"]
        ):
            problems.append(
                f"{row['name']}: arrow_checksum "
                f"{base['arrow_checksum']} -> {row.get('arrow_checksum')}"
            )
    return problems


def write_log(path: Path, rows: list[dict]) -> None:
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)


def read_log(path: Path) -> list[dict]:
    with open(path, newline="") as fh:
        return list(csv.DictReader(fh))


def _http_post(url: str):
    from urllib import request as urlreq

    def post(query: str, accept: str | None = None):
        headers = {"Accept": accept} if accept else {}
        req = urlreq.Request(
            f"{url.rstrip('/')}/query", data=query.encode(), method="POST",
            headers=headers,
        )
        try:
            with urlreq.urlopen(req, timeout=300) as resp:
                data = resp.read()
                ctype = resp.headers.get("Content-Type", "")
                if accept:
                    return resp.status, ctype, data
                return resp.status, data.decode()
        except urlreq.HTTPError as e:  # 4xx/5xx still carry a body
            data = e.read()
            if accept:
                return e.code, e.headers.get("Content-Type", ""), data
            return e.code, data.decode()

    return post


def _inprocess_post():
    from lapis_silo_spark.server import create_app
    from lapis_silo_spark.session import get_spark

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden_fit")
    )
    from golden_db import build_golden_db

    app = create_app(build_golden_db(get_spark()))
    app.testing = True
    client = app.test_client()

    def post(query: str, accept: str | None = None):
        headers = {"Accept": accept} if accept else {}
        resp = client.post("/query", data=query, headers=headers)
        if accept:
            return (resp.status_code, resp.content_type or "",
                    resp.get_data())
        return resp.status_code, resp.get_data(as_text=True)

    return post


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=str(GOLDEN_QUERIES))
    ap.add_argument("--url", default=None,
                    help="live server base URL; default: in-process golden app")
    ap.add_argument("--good-log", default=str(DEFAULT_GOOD_LOG))
    ap.add_argument("--log-csv", default="replay_log.csv")
    ap.add_argument("--ignore-regex", default=None,
                    help="file of regexes, one per line (empty = none)")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=1)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    cases = load_cases(Path(args.queries))
    if args.limit:
        cases = cases[: args.limit]
    post = _http_post(args.url) if args.url else _inprocess_post()

    rows = replay(post, cases, repeat=args.repeat,
                  concurrency=args.concurrency)
    write_log(Path(args.log_csv), rows)
    total_ms = sum(r["latency_ms_median"] for r in rows)
    print(f"replayed {len(rows)} queries, "
          f"sum of median latencies {total_ms:.0f} ms -> {args.log_csv}")

    good_path = Path(args.good_log)
    if not good_path.exists():
        write_log(good_path, rows)
        print(f"stored good log: {good_path}")
        return 0

    patterns: list[str] = []
    if args.ignore_regex and Path(args.ignore_regex).exists():
        patterns = Path(args.ignore_regex).read_text().splitlines()
    problems = compare(rows, read_log(good_path), patterns)
    for p in problems:
        print(f"CHECKSUM MISMATCH {p}")
    if problems:
        print(f"{len(problems)} differences vs {good_path}")
        return 1
    print(f"all checksums match {good_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
