"""evobench-style REGISTRY checksum replay — result-drift regression net.

The reference's benchmarking harness re-runs a fixed query corpus and
checksums every result against a stored good log
(``/root/reference/benchmarking/README.md:40-60``: the good log "is
automatically stored upon the first benchmarking run"; later runs diff
checksums and fail on any unexplained change). ``tools/replay.py`` mirrors
that on the SERVING path (HTTP + golden corpus); this tool mirrors it on
the ENGINE path: every ``queries()`` entry in the 130-row registry runs
against the pinned sf0.01 fixture and its order-insensitive result hash is
diffed against the committed ``tools/good_query_log.json``.

This catches the failure mode the oracle gate cannot: a change that shifts
BOTH the Spark query and its DuckDB oracle (shared helper, shared constant,
re-rolled seed) keeps the oracle gate green while silently changing what
users get. The good log pins the *absolute* results between rounds — one
command, no DuckDB, fails on any drift.

Hash: md5 over the sorted column names plus the SORTED normalized row
tuples (same ``normalize`` as the oracle checker) — order-insensitive, so
results without a total order stay stable across partition counts and AQE
decisions.

Usage::

    python tools/replay_corpus.py                 # replay + diff (exit 1 on drift)
    python tools/replay_corpus.py --store         # (re)write the full good log
    python tools/replay_corpus.py --update q1 q2  # refresh named entries only
    python tools/replay_corpus.py q1 q2           # replay a subset
    python tools/replay_corpus.py --sf 1          # sf1 fixture + sf1 good log

New queries absent from the good log are reported and appended on
``--store``/``--update``; a missing log file is stored on first run
(reference semantics). Default fixture: ``$SPARK_GRAFT_SF_DIR`` or
``/root/testdata/sf0.01`` — the committed ``good_query_log.json`` is ONLY
valid for sf0.01. ``--sf 1`` switches to the generated
``/root/repo/testdata_sf1`` fixture and diffs against the separate
``good_query_log_sf1.json`` (round-10 VERDICT #7: scale-dependent paths —
sampling cutoffs, quantiles — only drift at scale, so the sf0.01 log
cannot catch them)."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import normalize  # noqa: E402

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
GOOD_LOG = os.path.join(_TOOLS_DIR, "good_query_log.json")
#: per-scale-factor (good log, fixture dir) for the --sf flag
SF_CONFIGS = {
    "0.01": (GOOD_LOG, "/root/testdata/sf0.01"),
    "1": (os.path.join(_TOOLS_DIR, "good_query_log_sf1.json"),
          os.path.join(os.path.dirname(_TOOLS_DIR), "testdata_sf1")),
}


def result_checksum(sdf) -> tuple[str, int, list[str]]:
    cols = sorted(sdf.columns)
    rows = sorted(
        "\x1f".join(normalize(row[c]) for c in cols) for row in sdf.collect()
    )
    h = hashlib.md5()
    h.update("\x1e".join(cols).encode())
    for r in rows:
        h.update(b"\x1d")
        h.update(r.encode())
    return h.hexdigest(), len(rows), cols


def main() -> int:
    argv = sys.argv[1:]
    store = "--store" in argv
    if store:
        argv.remove("--store")
    sf = "0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
        if sf not in SF_CONFIGS:
            print(f"--sf {sf}: no committed good log; known: "
                  f"{sorted(SF_CONFIGS)}")
            return 2
    update: list[str] = []
    if "--update" in argv:
        i = argv.index("--update")
        update = argv[i + 1:]
        argv = argv[:i]
    only = set(argv or update) or None

    good_log, default_dir = SF_CONFIGS[sf]
    sf_dir = (os.environ.get("SPARK_GRAFT_SF_DIR", default_dir)
              if sf == "0.01" else default_dir)

    good: dict[str, dict] = {}
    if os.path.exists(good_log):
        with open(good_log) as fh:
            good = json.load(fh)
    elif not store:
        print(f"good log {good_log} missing — storing it (first run)")
        store = True

    from lapis_silo_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark()
    queries = entrymod.queries()

    drift: list[str] = []
    fresh: list[str] = []
    errors: list[str] = []
    out = dict(good)
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        t0 = time.perf_counter()
        try:
            checksum, nrows, _cols = result_checksum(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            errors.append(name)
            print(f"ERROR {name}: {exc}")
            continue
        dt = time.perf_counter() - t0
        entry = {"checksum": checksum, "rows": nrows}
        if name not in good:
            fresh.append(name)
            out[name] = entry
            print(f"new   {name}: rows={nrows} {checksum} ({dt:.1f}s)")
        elif good[name]["checksum"] != checksum or good[name]["rows"] != nrows:
            if store or name in update:
                out[name] = entry
                print(f"upd   {name}: rows={good[name]['rows']}→{nrows} "
                      f"{good[name]['checksum'][:8]}→{checksum[:8]} ({dt:.1f}s)")
            else:
                drift.append(name)
                print(f"DRIFT {name}: rows={good[name]['rows']}→{nrows} "
                      f"checksum {good[name]['checksum']}→{checksum} ({dt:.1f}s)")
        else:
            print(f"ok    {name}: rows={nrows} ({dt:.1f}s)", flush=True)

    stale = [] if only else sorted(set(good) - set(queries))
    if stale:
        print(f"stale log entries (query no longer registered): {stale}")
        if store:
            for name in stale:
                out.pop(name, None)

    if store or update or fresh:
        with open(good_log, "w") as fh:
            json.dump(dict(sorted(out.items())), fh, indent=1)
            fh.write("\n")
        print(f"wrote {good_log} ({len(out)} entries)")

    n_checked = len([n for n in queries if not only or n in only])
    print(f"\n{n_checked - len(drift) - len(errors)}/{n_checked} stable"
          f" | drift={len(drift)} errors={len(errors)} new={len(fresh)}")
    if drift:
        print("DRIFTED:", sorted(drift))
    return 1 if (drift or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
