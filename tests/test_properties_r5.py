"""Property-based tests for the round-5 operators: substring-span dedup,
token-window chunking, and the count-min sketch — invariants checked on
hypothesis-generated inputs against independent pure-Python replays.

Example counts are deliberately small: every example pays a Spark job.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "theta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(texts=corpus_strategy, k=st.integers(min_value=2, max_value=4))
@SETTINGS
def test_substring_spans_invariants(spark, texts, k):
    """On arbitrary corpora: one output row per doc; coverage bounds hold
    (0 <= dup_tokens <= n_tokens); clean + dup partitions every doc; an
    appended exact copy of the corpus' longest doc is fully duplicated
    when it has >= k tokens."""
    from lapis_silo_spark.functions.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    rows = list(enumerate(texts))
    longest = max(texts, key=lambda t: len(t.split()))
    copy_id = len(rows)
    rows.append((copy_id, longest))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    spans = {r["id"]: r for r in
             duplicate_spans(df, "doc_id", "text", k=k).collect()}
    clean = {r["id"]: r for r in
             remove_duplicate_spans(df, "doc_id", "text", k=k).collect()}
    assert set(spans) == set(clean) == {r[0] for r in rows}
    for i, text in rows:
        s, c = spans[i], clean[i]
        assert s["n_tokens"] == len(text.split())
        assert 0 <= s["dup_tokens"] <= s["n_tokens"]
        assert c["clean_tokens"] + s["dup_tokens"] == s["n_tokens"]
        kept = c["clean_text"].split() if c["clean_text"] else []
        assert len(kept) == c["clean_tokens"]
    if len(longest.split()) >= k:
        # the copy has strictly larger (id, pos) everywhere -> every one of
        # its grams is non-canonical -> fully covered
        assert spans[copy_id]["dup_fraction"] == 1.0
        assert clean[copy_id]["clean_text"] == ""


@given(
    texts=corpus_strategy,
    size=st.integers(min_value=2, max_value=6),
    stride_off=st.integers(min_value=0, max_value=4),
)
@SETTINGS
def test_chunk_windows_reassembles(spark, texts, size, stride_off):
    """Chunks tile every doc: per doc, chunk_ids are 0..n-1, starts advance
    by stride, every token position is covered, and stride == size
    reassembles the exact text by concatenation."""
    from lapis_silo_spark.functions.text import chunk_windows

    stride = max(1, size - stride_off)
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_windows(df, "doc_id", "text", size=size, stride=stride)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r["id"], []).append(r)
    for i, text in rows:
        toks = text.split()
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            got = c["chunk_text"].split()
            start = c["chunk_start"]
            assert got == toks[start:start + size]
            assert c["chunk_tokens"] == len(got)
            covered.update(range(start, start + len(got)))
        assert covered == set(range(len(toks)))
        if stride == size:
            assert " ".join(c["chunk_text"] for c in chunks) == " ".join(toks)


@given(
    values=st.lists(st.sampled_from(WORDS), min_size=1, max_size=60),
    width=st.sampled_from([8, 64, 512]),
)
@SETTINGS
def test_count_min_overcount_property(spark, values, width):
    """est >= exact for every value at ANY width (even a deliberately
    collision-heavy width=8), and min-over-hashes <= per-hash totals."""
    from collections import Counter

    from lapis_silo_spark.functions.sketches import (
        count_min_build,
        count_min_estimate,
    )

    exact = Counter(values)
    df = spark.createDataFrame(list(enumerate(values)), "i long, term string")
    sketch = count_min_build(df, "term", n_width=width, n_hashes=3)
    est = {
        r["val"]: r["est_count"]
        for r in count_min_estimate(df, "term", sketch,
                                    n_width=width, n_hashes=3).collect()
    }
    assert set(est) == set(exact)
    total = len(values)
    for t, c in exact.items():
        assert c <= est[t] <= total, t
