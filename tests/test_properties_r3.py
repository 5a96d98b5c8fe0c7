"""Property-based differential tests for the round-3 curation operators.

Each Spark operator is replayed by an independent pure-Python reference on
hypothesis-generated corpora; results must agree exactly. This extends the
engine's differential-testing layer (tests/test_differential.py for SaneQL)
to the training-data surface — the reference repo has no property-based
tests at all (SURVEY §5), so this is superset rigor, not parity.

Example counts are deliberately small: every example pays a Spark job.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip()).lower()
    return t.split(" ")  # NB: "" splits to [""] — same as Spark/DuckDB


@given(texts=doc_strategy)
@SETTINGS
def test_duplicate_passages_matches_python(spark, texts):
    from lapis_silo_spark.functions.dedup import duplicate_passages

    df = spark.createDataFrame(
        list(enumerate(texts)), schema="doc_id long, text string"
    )
    got = {
        r["gram"]: (r["n_docs"], r["n_occurrences"])
        for r in duplicate_passages(df, "doc_id", "text", n=2,
                                    min_docs=2).collect()
    }

    per_gram: dict[str, Counter] = defaultdict(Counter)
    for i, text in enumerate(texts):
        toks = _norm_tokens(text)
        for j in range(len(toks) - 1):
            per_gram[" ".join(toks[j:j + 2])][i] += 1
    want = {
        g: (len(c), sum(c.values()))
        for g, c in per_gram.items()
        if len(c) >= 2
    }
    assert got == want


@given(texts=doc_strategy)
@SETTINGS
def test_vocab_and_encoding_match_python(spark, texts):
    from lapis_silo_spark.functions.text import build_vocab, encode_token_ids

    df = spark.createDataFrame(
        list(enumerate(texts)), schema="doc_id long, text string"
    )
    vocab_df = build_vocab(df, "text", min_count=1)
    got_vocab = {r["term"]: r["term_id"] for r in vocab_df.collect()}

    counts: Counter = Counter()
    for text in texts:
        counts.update(_norm_tokens(text))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    want_vocab = {term: i for i, (term, _) in enumerate(ranked)}
    assert got_vocab == want_vocab

    got_enc = {
        r["id"]: (r["token_ids"], r["n_tokens"], r["n_oov"])
        for r in encode_token_ids(df, "doc_id", "text", vocab_df).collect()
    }
    for i, text in enumerate(texts):
        toks = _norm_tokens(text)
        assert got_enc[i] == ([want_vocab[t] for t in toks], len(toks), 0)


@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=4,
    ),
    budget=st.floats(min_value=0.01, max_value=1.0),
)
@settings(max_examples=200, deadline=None)
def test_mixture_rates_properties(counts, budget):
    """Pure-function invariants: rates live on the 256-grid in [0, 1];
    under-represented strata cap at 1; the quantized expected sample size
    never exceeds the target by more than the quantization step."""
    from lapis_silo_spark.functions.sampling import mixture_rates

    strata = sorted(counts)
    weights = {s: 1.0 / len(strata) for s in strata}
    rates = mixture_rates(counts, weights, budget)
    total = sum(counts.values())
    for s, rate in rates.items():
        assert 0.0 <= rate <= 1.0
        assert rate * 256 == int(rate * 256)  # exactly on the grid
        want = min(1.0, weights[s] * budget * total / counts[s])
        assert abs(rate - want) <= 1 / 512  # half-up quantization error
    # a stratum whose fair share exceeds its population keeps everything
    for s in strata:
        if weights[s] * budget * total >= counts[s] * (1 + 1 / 256):
            assert rates[s] == 1.0


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-5, max_value=5).map(float),
            min_size=4, max_size=4,
        ),
        min_size=3, max_size=12, unique_by=tuple,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@SETTINGS
def test_kmeans_matches_python(spark, vecs, k):
    """The Spark k-means must equal a sequential pure-Python Lloyd under the
    same rounding discipline (the same property the DuckDB oracle checks,
    but on adversarial hypothesis inputs rather than one fixed corpus)."""
    from lapis_silo_spark.functions.clustering import kmeans_assign

    if len(vecs) < k:
        return
    df = spark.createDataFrame(
        list(enumerate(vecs)), schema="id long, vec array<double>"
    )
    got = {r["id"]: r["cluster"]
           for r in kmeans_assign(df, "id", "vec", k=k,
                                  iterations=2).collect()}

    cents = [[round(x, 6) for x in v] for v in vecs[:k]]

    def assign(v, cs):
        best, best_d = 0, None
        for ci, c in enumerate(cs):
            d = round(sum((a - b) * (a - b) for a, b in zip(v, c)), 9)
            if best_d is None or d < best_d:
                best, best_d = ci, d
        return best

    for _ in range(2):
        groups: dict[int, list] = defaultdict(list)
        for v in vecs:
            groups[assign(v, cents)].append(v)
        for ci in range(k):
            if groups.get(ci):
                dims = zip(*groups[ci])
                cents[ci] = [round(sum(d) / len(groups[ci]), 6)
                             for d in dims]
    want = {i: assign(v, cents) for i, v in enumerate(vecs)}
    assert got == want


@given(
    texts=doc_strategy,
    threshold=st.sampled_from([0.25, 0.5, 0.75]),
)
@SETTINGS
def test_hash_sample_is_stable_subset(spark, texts, threshold):
    """Determinism + monotonicity: the kept set is a pure function of ids,
    and raising the rate can only grow it (hash thresholds are nested)."""
    from lapis_silo_spark.functions.sampling import hash_sample

    df = spark.createDataFrame(
        list(enumerate(texts)), schema="doc_id long, text string"
    )
    small = {r["doc_id"]
             for r in df.filter(hash_sample("doc_id", threshold)).collect()}
    again = {r["doc_id"]
             for r in df.filter(hash_sample("doc_id", threshold)).collect()}
    big = {r["doc_id"]
           for r in df.filter(hash_sample("doc_id", 1.0)).collect()}
    assert small == again
    assert small <= big
    assert big == {i for i in range(len(texts))}
