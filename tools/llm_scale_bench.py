"""LLM-operator scale curves (round-10 VERDICT #2): the genomic side has
GENOMIC_SCALE artifacts; this produces the dedup/ANN/text twin — the six
heaviest LLM-pipeline registry rows at three scale points spanning 10x,
with the empirical scaling exponent fitted per row.

The banded/bucketed designs predict ~linear walls (exponent ~1); an
exponent drifting toward 2 names a quadratic leak. Corpora are generated
by tools/gen_sf.py with ``--tables documents,embeddings`` (the six rows
touch only those tables), at sf {1, 3, 10} under ``llm_scale_sf*/`` —
all three points from the SAME filtered generation path, so the curve is
apples-to-apples (a filtered dir's RNG stream differs from the full-gen
fixtures; see gen_sf.generate).

Usage::

    python tools/llm_scale_bench.py [--runs 2] [--out LLM_SCALE_r11.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    "dedup_minhash_clusters",
    "dedup_embedding_clusters_lsh",
    "dedup_substring_spans",
    "decontam_near_dup",
    "pipeline_curation_near_dup",
    "tokenizer_bpe_encode",
]
SCALES = [1, 3, 10]


def ensure_corpus(sf: int) -> str:
    out = os.path.join(REPO, f"llm_scale_sf{sf}")
    marker = os.path.join(out, "documents.parquet")
    if not os.path.exists(marker):
        from gen_sf import generate

        print(f"generating {out} ...", flush=True)
        generate(float(sf), out, only={"documents", "embeddings"})
    return out


def fit_exponent(scales: list[float], walls: list[float]) -> float:
    """Least-squares slope of log(wall) vs log(scale)."""
    xs = [math.log(s) for s in scales]
    ys = [math.log(w) for w in walls]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> int:
    runs = 2
    out_path = os.path.join(REPO, "LLM_SCALE_r11.json")
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
        if a.startswith("--out"):
            out_path = a.split("=")[1]

    dirs = {sf: ensure_corpus(sf) for sf in SCALES}

    from lapis_silo_spark.driver_queries import QUERIES
    from lapis_silo_spark.session import get_spark

    spark = get_spark(app_name="llm-scale-bench")

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    result = {
        "rows": {}, "scales": SCALES, "runs": runs,
        "corpus": {str(sf): {
            "dir": d,
            "documents": 50000 * sf, "embeddings": 20000 * sf,
        } for sf, d in dirs.items()},
    }
    for name in ROWS:
        fn = QUERIES[name]
        entry = {"walls_s": {}, "result_rows": {}, "loadavg_1m": {}}
        for sf in SCALES:
            best, nrows = None, None
            for _ in range(runs):
                t0 = time.perf_counter()
                nrows = fn(spark, dirs[sf]).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            entry["walls_s"][str(sf)] = round(best, 3)
            entry["result_rows"][str(sf)] = nrows
            entry["loadavg_1m"][str(sf)] = loadavg()
            print(f"{name} sf{sf}: {best:.2f}s rows={nrows}", flush=True)
        entry["exponent"] = round(fit_exponent(
            [float(s) for s in SCALES],
            [entry["walls_s"][str(s)] for s in SCALES],
        ), 3)
        result["rows"][name] = entry
        print(f"{name}: exponent={entry['exponent']}", flush=True)

    result["verdict"] = {
        n: ("subquadratic" if e["exponent"] < 1.7 else "QUADRATIC-LEAK")
        for n, e in result["rows"].items()
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
