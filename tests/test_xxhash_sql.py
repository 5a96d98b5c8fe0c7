"""Parity of the DuckDB XXH64 reimplementation with Spark's ``xxhash64``.

The ``dedup_minhash_lsh_pairs_fast`` oracle stands on this: DuckDB must
reproduce Spark's 32-bit shingle hash (``pmod(xxhash64(s), 2^32)``)
bit-for-bit for every printable-ASCII 5-byte shingle.
"""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from lapis_silo_spark.functions.xxhash_sql import xxhash32_ctes


def _duck_hashes(shingles):
    ctes, final = xxhash32_ctes("sh", "s", k=len(shingles[0]))
    con = duckdb.connect()
    con.execute("CREATE TABLE sh(id INT, s VARCHAR)")
    con.executemany("INSERT INTO sh VALUES (?, ?)",
                    list(enumerate(shingles)))
    rows = con.execute(
        f"WITH {ctes} SELECT id, h32 FROM {final}"
    ).fetchall()
    return {i: h for i, h in rows}


@pytest.mark.parametrize("k", [5, 6, 7])
def test_xxhash32_matches_spark(spark, k):
    rng = random.Random(20260814 + k)
    printable = string.printable[:95]  # the normalized-text alphabet
    shingles = list({
        "".join(rng.choices(printable, k=k)) for _ in range(500)
    })
    df = spark.createDataFrame(list(enumerate(shingles)), ["id", "s"])
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", F.pmod(F.xxhash64("s"), F.lit(2 ** 32)).alias("h")
        ).collect()
    }
    duck = _duck_hashes(shingles)
    assert got == duck


def test_xxhash32_rejects_unsupported_width():
    with pytest.raises(ValueError):
        xxhash32_ctes("t", "s", k=4)
    with pytest.raises(ValueError):
        xxhash32_ctes("t", "s", k=8)
