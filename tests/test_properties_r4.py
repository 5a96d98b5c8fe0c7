"""Property-based tests for the round-4 operators: fused near-dup
clustering, the Bloom sketch, and the Y4M demux — invariants checked on
hypothesis-generated inputs against independent pure-Python replays.

Example counts are deliberately small: every example pays a Spark job.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "theta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=10).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(texts=corpus_strategy)
@SETTINGS
def test_minhash_dedup_clusters_invariants(spark, texts):
    """Structural invariants on arbitrary corpora: one output row per
    input row; exactly one canonical per cluster; cluster_id is the
    cluster's minimum id; exact twins (same normalized text) always share
    a cluster; cluster sizes sum to the corpus size."""
    from lapis_silo_spark.functions.dedup import minhash_dedup_clusters

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_dedup_clusters(
        df, "doc_id", "text", threshold=0.5, n_perms=16, n_bands=4
    ).collect()

    assert len(out) == len(rows)
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = [m["id"] for m in members]
        assert cid == min(ids)
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)
    assert sum(len(m) for m in by_cluster.values()) == len(rows)
    # exact twins always collapse (digest path, independent of LSH luck)
    norm = {}
    cluster_of = {r["id"]: r["cluster_id"] for r in out}
    for i, t in rows:
        key = " ".join(t.strip().lower().split())
        norm.setdefault(key, []).append(i)
    for ids in norm.values():
        assert len({cluster_of[i] for i in ids}) == 1


@given(
    members=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                    min_size=1, max_size=30),
    probes=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                   min_size=1, max_size=30),
)
@SETTINGS
def test_bloom_probe_matches_python_replay(spark, members, probes):
    """The Spark bloom is bit-identical to an independent pure-Python
    replay of the md5 position algebra — members always probe true, and
    every probe verdict (false positives included) matches the replay."""
    from lapis_silo_spark.functions.sketches import (
        BLOOM_BITS_PER_WORD,
        bloom_build,
        bloom_probe,
    )

    n_words, n_hashes = 8, 3
    n_bits = n_words * BLOOM_BITS_PER_WORD

    def positions(v: str):
        return [
            int(hashlib.md5(f"{v}:{i}".encode()).hexdigest()[:8], 16) % n_bits
            for i in range(n_hashes)
        ]

    words = [0] * n_words
    for v in members:
        for p in positions(v):
            words[p // BLOOM_BITS_PER_WORD] |= 1 << (
                p % BLOOM_BITS_PER_WORD
            )

    def py_probe(v: str) -> bool:
        return all(
            words[p // BLOOM_BITS_PER_WORD]
            & (1 << (p % BLOOM_BITS_PER_WORD))
            for p in positions(v)
        )

    mdf = spark.createDataFrame([(v,) for v in members], "val string")
    bloom = bloom_build(mdf, "val", n_words, n_hashes)
    got_words = {r["word"]: r["bits"] for r in bloom.collect()}
    assert got_words == {i: w for i, w in enumerate(words) if w}

    pdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(sorted(members | probes))],
        "id long, val string",
    )
    got = {r["val"]: r["maybe_member"]
           for r in bloom_probe(pdf, "id", "val", bloom,
                                n_words, n_hashes).collect()}
    for v in members:
        assert got[v] is True  # no false negatives, ever
    for v in sorted(members | probes):
        assert got[v] == py_probe(v)


@given(
    dims=st.sampled_from([(2, 2), (4, 2), (3, 5)]),
    lumas=st.lists(st.integers(0, 255), min_size=1, max_size=9),
    colorspace=st.sampled_from(["C420", "C422", "C444", "Cmono"]),
    every=st.integers(1, 4),
)
@SETTINGS
def test_y4m_demux_roundtrip(spark, dims, lumas, colorspace, every):
    """y4m_payload → frame_sample_plan round-trips: sampled indices are
    exactly range(0, n, every) and every sampled frame's mean luma equals
    the constant fill."""
    from lapis_silo_spark.functions import multimodal

    w, h = dims
    if colorspace.startswith("C420") and (w % 2 or h % 2):
        w, h = w * 2, h * 2  # 420 chroma needs even plane dims
    payload = multimodal.y4m_payload(w, h, lumas, colorspace=colorspace)
    df = spark.createDataFrame([(1, payload)], "id long, payload binary")
    got = sorted(
        multimodal.frame_sample_plan(df, "id", "payload", every_nth=every)
        .collect(),
        key=lambda r: r["frame_index"],
    )
    expect = list(range(0, len(lumas), every))
    assert [r["frame_index"] for r in got] == expect
    assert [r["mean_y"] for r in got] == [float(lumas[j]) for j in expect]
    assert all((r["width"], r["height"], r["n_frames"]) == (w, h, len(lumas))
               for r in got)
