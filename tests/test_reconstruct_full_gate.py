"""Machine-checked correctness for ``genomic_reconstruct_full``.

This row is deliberately registered PAST the driver's 50-slot gate window
(it is the 4,000-nt scale row, ~30 s at sf0.01 — see tests/test_gate_order.py)
and was therefore only value-checked in committed CORRECTNESS_* artifacts,
which can silently go stale as code changes (round-9 ADVICE). This test keeps
it in the automated suite: run the Spark query and its DuckDB oracle at
sf0.001 (same checker semantics, small enough for per-commit latency) and
compare the full value multisets.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_reconstruct_full_matches_oracle(spark):
    from tools.check_correctness import TABLES, normalize

    import __spark_entry__ as entrymod

    fn = entrymod.queries()["genomic_reconstruct_full"]
    oracle = entrymod.oracle_sql()["genomic_reconstruct_full"]

    sdf = fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = Counter(
        tuple(normalize(row[c]) for c in scols) for row in sdf.collect()
    )

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    rel = con.execute(oracle)
    ocols_raw = [d[0] for d in rel.description]
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    assert sorted(ocols_raw) == scols
    orows = Counter(
        tuple(normalize(row[i]) for i in order) for row in rel.fetchall()
    )
    assert srows == orows
    assert sum(srows.values()) > 0
