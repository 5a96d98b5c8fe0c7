"""Property-based tests for the round-7 operators: distributed BPE
tokenizer training/encoding, line-level dedup, and DSIR importance
resampling — checked on hypothesis-generated inputs against independent
pure-Python replays.

Example counts are deliberately small: every example pays a Spark job
(BPE training pays one per merge step).
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lapis_silo_spark.functions.tokenizer import EOW

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny ASCII alphabet: short words from {a, b} force dense pair collisions
# and frequent ties (exercising the lexicographic tie-break); spaces make
# multi-word docs. Plain ASCII keeps Java's \s+ and Python's str.split()
# in exact agreement.
word_strategy = st.text(alphabet="ab", min_size=0, max_size=5)
doc_strategy = st.lists(word_strategy, min_size=0, max_size=6).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=5)


# ---------------------------------------------------------------------------
# Pure-Python BPE reference (greedy left-to-right merge, Sennrich 2016)
# ---------------------------------------------------------------------------

def _norm_words(texts: list[str]) -> list[str]:
    words = []
    for t in texts:
        n = " ".join(t.lower().split())
        words.extend(n.split(" "))
    return words


def _apply_merge(seq: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _ref_bpe_train(texts: list[str], n_merges: int, min_freq: int = 2):
    freqs = Counter(_norm_words(texts))
    seqs = {w: list(w) + [EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in freqs.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        pc = Counter({k: v for k, v in pc.items() if v >= min_freq})
        if not pc:
            break
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, f))
        for w in seqs:
            seqs[w] = _apply_merge(seqs[w], a, b)
    return merges


def _ref_bpe_encode_count(text: str, merges) -> int:
    pairs = [
        (m["left_sym"], m["right_sym"]) if isinstance(m, dict) else m[:2]
        for m in merges
    ]
    n = 0
    norm = " ".join(text.lower().split())
    for w in norm.split(" "):
        s = list(w) + [EOW]
        for a, b in pairs:
            s = _apply_merge(s, a, b)
        n += len(s)
    return n


@given(texts=corpus_strategy)
@SETTINGS
def test_bpe_train_matches_pure_python(spark, texts):
    """Distributed training reproduces the reference algorithm exactly —
    merge pairs, order, and frequencies — including tie-breaks and early
    exhaustion."""
    from lapis_silo_spark.functions.tokenizer import bpe_train

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (m["left_sym"], m["right_sym"], m["pair_freq"])
        for m in bpe_train(docs, "text", n_merges=4)
    ]
    assert got == _ref_bpe_train(texts, 4)


@given(texts=corpus_strategy)
@SETTINGS
def test_bpe_encode_count_matches_pure_python(spark, texts):
    """The chained-literal-replace encoder counts exactly the symbols the
    sequential per-word merge loop produces, for every document."""
    from lapis_silo_spark.functions.tokenizer import (
        bpe_encode_count,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    merges = bpe_train(docs, "text", n_merges=3)
    got = {
        r["id"]: r["n"]
        for r in docs.select(
            "id", bpe_encode_count("text", merges).alias("n")
        ).collect()
    }
    assert got == {
        i: _ref_bpe_encode_count(t, merges) for i, t in enumerate(texts)
    }


# ---------------------------------------------------------------------------
# Line-level dedup
# ---------------------------------------------------------------------------

line_strategy = st.sampled_from(["x", "y y", "z", "w w w", ""])
linedoc_strategy = st.lists(line_strategy, min_size=0, max_size=5).map(
    "\n".join
)
linecorpus_strategy = st.lists(linedoc_strategy, min_size=1, max_size=5)


def _ref_remove_lines(texts, min_count: int, keep_first: bool):
    occ = []
    for i, t in enumerate(texts, start=1):
        for p, line in enumerate(t.split("\n"), start=1):
            occ.append((i, p, line))
    counts = Counter(line for _, _, line in occ)
    canonical = {}
    for i, p, line in occ:
        if line not in canonical or (i, p) < canonical[line]:
            canonical[line] = (i, p)
    out = {}
    for i, t in enumerate(texts, start=1):
        lines = t.split("\n")
        kept, dropped = [], 0
        for p, line in enumerate(lines, start=1):
            dup = counts[line] >= min_count
            if dup and not (keep_first and canonical[line] == (i, p)):
                dropped += 1
            else:
                kept.append(line)
        out[i] = (len(lines), dropped, "\n".join(kept))
    return out


@given(
    texts=linecorpus_strategy,
    min_count=st.sampled_from([2, 3]),
    keep_first=st.booleans(),
)
@SETTINGS
def test_remove_duplicate_lines_matches_pure_python(
    spark, texts, min_count, keep_first
):
    """remove_duplicate_lines agrees exactly with the brute-force replay —
    within-doc repeats, empty lines, empty docs, canonical-occurrence
    retention, both keep_first modes."""
    from lapis_silo_spark.functions.dedup import remove_duplicate_lines

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts, start=1)],
        "doc_id int, text string",
    )
    got = {
        r["id"]: (r["n_lines"], r["n_dropped"], r["clean_text"])
        for r in remove_duplicate_lines(
            docs, "doc_id", text_col="text", min_count=min_count,
            keep_first=keep_first, normalize=False,
        ).collect()
    }
    assert got == _ref_remove_lines(texts, min_count, keep_first)


# ---------------------------------------------------------------------------
# DSIR: the integer weight's sign equals the smoothed log-ratio's sign
# ---------------------------------------------------------------------------

@given(
    t_b=st.integers(min_value=0, max_value=10**6),
    s_b=st.integers(min_value=0, max_value=10**6),
    tt=st.integers(min_value=0, max_value=10**9),
    ss=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_dsir_integer_weight_sign_equals_log_ratio(t_b, s_b, tt, ss):
    """(t_b+1)(S+B) - (s_b+1)(T+B) has the same sign as
    log((t_b+1)/(T+B)) - log((s_b+1)/(S+B)) for any counts — the integer
    form IS the DSIR decision, not an approximation of it."""
    B = 1024
    w = (t_b + 1) * (ss + B) - (s_b + 1) * (tt + B)
    lr = math.log((t_b + 1) / (tt + B)) - math.log((s_b + 1) / (ss + B))
    if w == 0:
        # exact ratio equality -> log-ratio 0 up to float rounding
        assert abs(lr) < 1e-9
    else:
        assert (w > 0) == (lr > 0)


def test_dsir_scores_hand_computed(spark):
    """Four-doc corpus, tiny bucket space: target-only vocabulary scores
    positive, source-only vocabulary negative, sub-ngram docs exactly 0."""
    from lapis_silo_spark.functions.sampling import (
        dsir_importance_weights,
        dsir_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "good stuff good stuff", "tgt"),
            (2, "good stuff", "tgt"),
            (3, "junk mail junk mail junk", "src"),
            (4, "one", "src"),  # a single token: no bigram, score 0
        ],
        "doc_id int, text string, source string",
    )
    w = dsir_importance_weights(
        docs, "text", F.col("source") == "tgt", ngram=2, n_buckets=64
    )
    got = {
        r["id"]: int(r["score"])
        for r in dsir_scores(
            docs, "doc_id", "text", w, ngram=2, n_buckets=64
        ).collect()
    }
    assert got[1] > 0 and got[2] > 0, got
    assert got[3] < 0, got
    assert got[4] == 0, got


# ---------------------------------------------------------------------------
# Round-7 review regressions
# ---------------------------------------------------------------------------

def test_nan_vectors_never_merge(spark):
    """Spark sorts NaN above every double, so `NaN > 0` is TRUE and a NaN
    cosine passes `>= threshold` — without explicit isnan() guards a
    NaN-element vector entered LSH bucketing and over-merged clusters
    (review finding, confirmed by repro). Both the candidate-pair path and
    the fused clusters path must treat NaN vectors as degenerate
    singletons, exactly like numpy's NaN-false comparisons do."""
    from lapis_silo_spark.functions.dedup import embedding_dedup_clusters
    from lapis_silo_spark.functions.similarity import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [float("nan"), 1.0, 0.0, 0.0]),
            (4, [float("nan"), 1.0, 0.0, 0.0]),
        ],
        "doc_id bigint, vec array<double>",
    )
    pairs = lsh_candidate_pairs(
        docs, "doc_id", "vec", threshold=0.9, n_planes=4, n_tables=2, dim=4
    ).collect()
    assert pairs == []  # NaN cosine must not pass the threshold
    for method in ("blocked", "lsh"):
        out = {
            r["id"]: (r["cluster_id"], r["cluster_size"])
            for r in embedding_dedup_clusters(
                docs, "doc_id", "vec", threshold=0.9, method=method, dim=4
            ).collect()
        }
        assert len(out) == 4
        # every NaN/orthogonal vector is its own singleton cluster
        assert all(size == 1 for _, size in out.values()), (method, out)


def test_bpe_symbols_align_with_oracle_on_line_terminators(spark):
    """U+2028 survives both engines' ASCII \\s+ normalization into words,
    but Java's `.` skips line terminators while RE2's matches them — the
    (?s) flag keeps Spark's initial symbol split identical to the oracle's
    (review finding, confirmed by repro)."""
    import duckdb

    from lapis_silo_spark.functions.tokenizer import (
        bpe_train,
        bpe_train_oracle_sql,
    )

    rows = [(1, "a b a b ab ab")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe_train(docs, "text", n_merges=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ora = con.execute(bpe_train_oracle_sql(n_merges=3)).fetchall()
    assert [
        (m["step"], m["left_sym"], m["right_sym"], m["merged"],
         m["pair_freq"])
        for m in merges
    ] == ora
