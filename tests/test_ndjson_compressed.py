"""Compressed NDJSON ingest (.zst / .xz) — round-5 VERDICT #5.

The reference ingests zstd- and xz-compressed NDJSON chunks
(documentation/incremental_preprocessing.md:24-36). This container's
Hadoop lacks the native codecs, so ingest_ndjson decompresses Spark-side
(binaryFiles → pyarrow zstd stream / stdlib lzma); these tests pin that
the compressed paths yield IDENTICAL store contents to the plain file.
"""

import lzma

import pyarrow as pa
import pytest

from lapis_silo_spark.sources.ndjson import TableConfig, ingest_ndjson

NDJSON = (
    '{"primary_key": "a1", "country": "CH", "age": 4, '
    '"main": {"sequence": "ACTT", "insertions": [], "offset": null}}\n'
    '{"primary_key": "a2", "country": "DE", "age": 7, '
    '"main": {"sequence": "ACGT", "insertions": ["2:GG"], "offset": null}}\n'
    '{"primary_key": "a3", "country": "FR", "age": 9, "main": null}\n'
)


@pytest.fixture(scope="module")
def config():
    return TableConfig(
        name="default",
        primary_key="primary_key",
        metadata={"country": "string", "age": "int"},
        nuc_sequences={"main": "ACGT"},
    )


def _snapshot(main, store):
    rows = {
        tuple(r) for r in main.select("primary_key", "country", "age").collect()
    }
    muts = {tuple(r) for r in store.mutations.collect()}
    ins = {tuple(r) for r in store.insertions.collect()}
    return rows, muts, ins


def _write_zst(path, text: str) -> None:
    sink = pa.BufferOutputStream()
    with pa.output_stream(sink, compression="zstd") as out:
        out.write(text.encode())
    path.write_bytes(sink.getvalue().to_pybytes())


@pytest.mark.parametrize("ext", ["zst", "xz"])
def test_compressed_ingest_matches_plain(spark, tmp_path, config, ext):
    plain = tmp_path / "batch.ndjson"
    plain.write_text(NDJSON)
    comp = tmp_path / f"batch.ndjson.{ext}"
    if ext == "zst":
        _write_zst(comp, NDJSON)
    else:
        comp.write_bytes(lzma.compress(NDJSON.encode()))

    expected = _snapshot(*ingest_ndjson(spark, str(plain), config))
    got = _snapshot(*ingest_ndjson(spark, str(comp), config))
    assert got == expected
    assert {r[0] for r in got[0]} == {"a1", "a2", "a3"}


def test_compressed_duplicate_keys_still_rejected(spark, tmp_path, config):
    comp = tmp_path / "dup.ndjson.xz"
    comp.write_bytes(lzma.compress(
        (NDJSON + '{"primary_key": "a1", "country": "XX", "age": 1, '
                  '"main": null}\n').encode()
    ))
    with pytest.raises(ValueError, match="duplicate primary key"):
        ingest_ndjson(spark, str(comp), config)
