"""The evobench-style replay harness (tools/replay.py): per-query result
checksums over the serving path, compared against a stored good log —
the reference's layer-4 regression net (benchmarking/README.md:40-60).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from replay import (  # noqa: E402
    compare,
    read_log,
    replay,
    result_checksum,
    write_log,
)


def test_checksum_is_order_insensitive_but_value_sensitive():
    a = result_checksum(200, '{"x": 1}\n{"x": 2}\n')
    b = result_checksum(200, '{"x": 2}\n{"x": 1}\n')
    c = result_checksum(200, '{"x": 2}\n{"x": 3}\n')
    d = result_checksum(500, '{"x": 1}\n{"x": 2}\n')
    assert a == b  # row order never fails the gate
    assert a != c  # values do
    assert a != d  # so does status


def test_doctored_result_fails_compare():
    rows = [
        {"name": "q1", "status": 200, "checksum": "aaa"},
        {"name": "q2", "status": 200, "checksum": "bbb"},
    ]
    good = [dict(r) for r in rows]
    assert compare(rows, good, []) == []
    # a regression that changes q2's result must be flagged...
    good[1]["checksum"] = "doctored"
    problems = compare(rows, good, [])
    assert len(problems) == 1 and "q2" in problems[0]
    # ...unless the ignore regex covers it (reference's escape hatch)
    assert compare(rows, good, ["^q2$"]) == []
    # a status flip is flagged even when checksums are regenerated
    good2 = [dict(r) for r in rows]
    good2[0]["status"] = 400
    assert any("status" in p for p in compare(rows, good2, []))


def test_replay_over_serving_path_round_trips(example_db, tmp_path):
    """Replay real queries through POST /query twice: identical checksums;
    then doctor the stored log and assert the compare gate trips."""
    flask = pytest.importorskip("flask")  # noqa: F841

    from lapis_silo_spark.server import create_app

    app = create_app(example_db)
    app.testing = True
    client = app.test_client()

    def post(query: str, accept: str | None = None):
        headers = {"Accept": accept} if accept else {}
        resp = client.post("/query", data=query, headers=headers)
        if accept:
            return resp.status_code, resp.content_type or "", resp.get_data()
        return resp.status_code, resp.get_data(as_text=True)

    cases = [
        {"name": "count_by_country",
         "query": "default.groupBy({country}, {count := count()})"},
        {"name": "details",
         "query": "default.project({primary_key, country})"},
        {"name": "invalid", "query": "default.nonsense()"},
    ]
    rows1 = replay(post, cases, repeat=2)
    rows2 = replay(post, cases, repeat=1, concurrency=2)
    assert [r["checksum"] for r in rows1] == [r["checksum"] for r in rows2]
    assert {r["name"]: r["status"] for r in rows1}["invalid"] == 400

    log = tmp_path / "good.csv"
    write_log(log, rows1)
    assert compare(rows2, read_log(log), []) == []
    # doctor one stored checksum → the gate must fail
    doctored = read_log(log)
    doctored[0]["checksum"] = "0" * 32
    assert any("count_by_country" in p
               for p in compare(rows2, doctored, []))
    # doctor the ARROW checksum only → the gate must also fail (the IPC
    # output path has its own digest column, round-5 VERDICT #8)
    doctored2 = read_log(log)
    assert doctored2[0]["arrow_checksum"]
    doctored2[0]["arrow_checksum"] = "0" * 32
    assert any("arrow_checksum" in p
               for p in compare(rows2, doctored2, []))


def test_committed_good_log_covers_golden_corpus():
    """The committed good log must cover the full reference e2e corpus, all
    served with HTTP 200 (invalid queries live in invalidQueries/, not
    here)."""
    good = Path(__file__).resolve().parent.parent / "tools" / "replay_good_log.csv"
    corpus = Path("/root/reference/endToEndTests/test/queries")
    if not corpus.exists():
        pytest.skip("reference corpus not available")
    rows = read_log(good)
    names = {r["name"] for r in rows}
    expected = {
        str(p.relative_to(corpus))[:-len(".json")]
        for p in corpus.glob("**/*.json")
    }
    assert names == expected
    assert all(r["status"] == "200" for r in rows)


def test_sf1_good_log_covers_registry_and_replays_subset(spark):
    """The committed sf1 registry good log (round-10 VERDICT #7) must
    cover every registered query, and a fast subset must replay
    byte-identical against the sf1 fixture — the CI-style hook for the
    scale-dependent drift the sf0.01 log cannot catch (sampling cutoffs,
    quantiles). The full sweep is tools/replay_corpus.py --sf 1."""
    import json

    import replay_corpus as rc

    good_log, sf1_dir = rc.SF_CONFIGS["1"]
    if not Path(sf1_dir, "documents.parquet").exists():
        pytest.skip("sf1 fixture not generated (tools/gen_sf.py --sf 1)")
    good = json.loads(Path(good_log).read_text())

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    assert set(good) == set(queries), (
        "sf1 good log out of date with the registry — rerun "
        "tools/replay_corpus.py --sf 1 --store"
    )

    # scale-sensitive subset: quantile cutoff, hash sampling, a window,
    # and a dedup row — cheap enough for the suite, scale-shaped enough
    # to drift if a cutoff/seed path changes
    for name in (
        "quality_quantile_filter",
        "sample_stratified_hash",
        "window_rank_topn",
        "dedup_exact_groups",
    ):
        checksum, nrows, _ = rc.result_checksum(
            queries[name](spark, sf1_dir)
        )
        assert good[name]["rows"] == nrows, name
        assert good[name]["checksum"] == checksum, name
