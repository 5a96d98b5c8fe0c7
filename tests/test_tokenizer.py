"""BPE tokenizer training/encoding, line-level dedup, and the linear
quality classifier (round-7 operators).

Hand-computed fixtures pin the exact semantics the DuckDB oracles replay at
sf0.01 (driver_queries: tokenizer_bpe_train / tokenizer_bpe_encode /
dedup_line_report / dedup_line_clean / text_quality_classifier).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from lapis_silo_spark.functions.dedup import (
    duplicate_line_report,
    remove_duplicate_lines,
)
from lapis_silo_spark.functions.text import (
    linear_classifier_score,
    linear_classifier_scores_joined,
    reflow_lines,
)
from lapis_silo_spark.functions.tokenizer import (
    EOW,
    bpe_doc_seq,
    bpe_encode_count,
    bpe_encode_oracle_sql,
    bpe_train,
    bpe_train_oracle_sql,
    merge_replace,
)


# ---------------------------------------------------------------------------
# BPE training
# ---------------------------------------------------------------------------

def test_bpe_train_hand_computed(spark):
    # 'aab' x3, 'ab' x2: pairs (a,a)=3, (a,b)=5, (b,EOW)=5 -> tie on 5
    # breaks lexicographically: (a,b) wins step 1.  After merging 'ab':
    # (a,ab)=3, (ab,EOW)=5 -> 'ab'+EOW step 2; then (a,'ab'+EOW)=3 step 3.
    docs = spark.createDataFrame(
        [("aab",)] * 3 + [("ab",)] * 2, "text string"
    )
    merges = bpe_train(docs, "text", n_merges=3)
    got = [(m["left_sym"], m["right_sym"], m["pair_freq"]) for m in merges]
    assert got == [("a", "b", 5), ("ab", EOW, 5), ("a", "ab" + EOW, 3)]


def test_bpe_train_stops_when_exhausted(spark):
    # single word 'ab' once: every pair has freq 1 < min_pair_freq=2
    docs = spark.createDataFrame([("ab",)], "text string")
    assert bpe_train(docs, "text", n_merges=5) == []


def test_merge_replace_greedy_left_to_right(spark):
    # 'aaaa' -> merge (a,a) must give 'aa aa', not 'aaa a' or overlap
    row = spark.range(1).select(
        merge_replace(F.lit(f" a  a  a  a  {EOW} "), "a", "a").alias("s")
    ).first()
    assert row["s"] == f" aa  aa  {EOW} "


def test_merge_replace_symbol_boundary_safe(spark):
    # symbols ('xa', 'b'): merging (a, b) must NOT match inside 'xa  b'
    row = spark.range(1).select(
        merge_replace(F.lit(f" xa  b  {EOW} "), "a", "b").alias("s")
    ).first()
    assert row["s"] == f" xa  b  {EOW} "


def test_bpe_encode_count_matches_manual(spark):
    # doc 'aab ab aab': after merges [(a,b), (ab,EOW)]:
    #   'aab' -> ' a  a  b  EOW ' -(a,b)-> ' a  ab  EOW '
    #            -(ab,EOW)-> ' a  abEOW '              = 2 symbols
    #   'ab'  -> ' ab  EOW ' -> ' abEOW '              = 1 symbol
    # total = 2 + 1 + 2 = 5
    docs = spark.createDataFrame([("aab ab aab",)], "text string")
    n = docs.select(
        bpe_encode_count("text", [("a", "b"), ("ab", EOW)]).alias("n")
    ).first()["n"]
    assert n == 5


def test_bpe_doc_seq_word_concat_has_no_false_pairs(spark):
    # across-word boundary renders as 'EOW  x' — a pair whose left symbol
    # ends in EOW is never learned (the marker is sanitized out of text,
    # so it only ever appears word-final), hence no cross-word merge can
    # fire; check the rendering contract the argument rests on
    row = spark.range(1).select(
        bpe_doc_seq(F.lit("ab cd")).alias("s")
    ).first()
    assert row["s"] == f" a  b  {EOW}  c  d  {EOW} "


def test_bpe_marker_cannot_be_assembled_from_text(spark):
    # round-7 advisory: with a TEXTUAL marker ('</w>'), a document
    # containing those literal characters could assemble a marker symbol
    # mid-word and later merge across word boundaries.  The control-char
    # marker + sanitization closes this: '</w>' in text is just four
    # ordinary symbols, and a literal \x01 in text is stripped before
    # word splitting in BOTH engines.
    rows = [(1, "x</w>y x</w>y a\x01b a\x01b", "s1")]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    merges = bpe_train(docs, "text", n_merges=2)
    # '\x01' stripped -> word 'ab'; '</w>' chars survive as symbols
    assert all(EOW not in m["left_sym"][:-1] for m in merges)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id INT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    ora = con.execute(bpe_train_oracle_sql(n_merges=2)).fetchall()
    assert [
        (m["step"], m["left_sym"], m["right_sym"], m["merged"], m["pair_freq"])
        for m in merges
    ] == ora


def test_bpe_train_many_merges_is_local(spark):
    # round-7 verdict #3: training wall must be independent of the
    # per-merge Spark job floor.  300 distinct 4-symbol words (disjoint
    # alphabets, freq 2 each) admit 4 merges apiece = 1200 learnable
    # merges; a per-merge driver round-trip would cost >1000 Spark jobs
    # (minutes) — the local learner does it in one job + milliseconds.
    words = [
        "".join(chr(0x4E00 + 4 * i + k) for k in range(4)) for i in range(300)
    ]
    docs = spark.createDataFrame(
        [(" ".join(words),), (" ".join(words),)], "text string"
    )
    import time

    t0 = time.monotonic()
    merges = bpe_train(docs, "text", n_merges=1000)
    wall = time.monotonic() - t0
    assert len(merges) == 1000
    # every word contributes pair_freq=2 merges; steps strictly ordered
    assert all(m["pair_freq"] == 2 for m in merges)
    assert [m["step"] for m in merges] == list(range(1, 1001))
    assert wall < 60  # one aggregation + local learning, not 1000 jobs


def test_bpe_oracles_replay_training_and_encoding(spark):
    rows = [
        (1, "low lower lowest", "s1"),
        (2, "low low slow", "s1"),
        (3, "lower slower slowest", "s2"),
        (4, "newest newest low", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    merges = bpe_train(docs, "text", n_merges=6)
    enc = (
        docs.select("source", bpe_encode_count("text", merges).alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("bpe_tokens"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id INT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    ora_train = con.execute(bpe_train_oracle_sql(n_merges=6)).fetchall()
    assert [
        (m["step"], m["left_sym"], m["right_sym"], m["merged"], m["pair_freq"])
        for m in merges
    ] == ora_train
    ora_enc = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe_encode_oracle_sql(n_merges=6)).fetchall()
    }
    assert {r["source"]: (r["n_docs"], r["bpe_tokens"]) for r in enc} == ora_enc


# ---------------------------------------------------------------------------
# Line-level dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def line_docs(spark):
    # shared boilerplate line 'cookie banner' in docs 1,2,3 (twice in 3);
    # 'unique one'/'unique two' appear once; doc 4 is all boilerplate
    return spark.createDataFrame(
        [
            (1, "cookie banner\nunique one"),
            (2, "unique two\ncookie banner"),
            (3, "cookie banner\ncookie banner\nbody text"),
            (4, "cookie banner"),
        ],
        "doc_id int, text string",
    )


def test_duplicate_line_report(spark, line_docs):
    rows = duplicate_line_report(
        line_docs, "doc_id", text_col="text", min_docs=2
    ).collect()
    assert [(r["line"], r["n_docs"], r["n_occurrences"]) for r in rows] == [
        ("cookie banner", 4, 5)
    ]


def test_remove_duplicate_lines_keep_first(spark, line_docs):
    got = {
        r["id"]: (r["n_lines"], r["n_dropped"], r["clean_text"])
        for r in remove_duplicate_lines(
            line_docs, "doc_id", text_col="text", min_count=2
        ).collect()
    }
    # canonical occurrence is (doc 1, pos 1) — every other copy drops
    assert got == {
        1: (2, 0, "cookie banner\nunique one"),
        2: (2, 1, "unique two"),
        3: (3, 2, "body text"),
        4: (1, 1, ""),
    }


def test_remove_duplicate_lines_drop_all(spark, line_docs):
    got = {
        r["id"]: r["clean_text"]
        for r in remove_duplicate_lines(
            line_docs, "doc_id", text_col="text", min_count=2,
            keep_first=False,
        ).collect()
    }
    assert got[1] == "unique one" and got[4] == ""


def test_remove_duplicate_lines_min_count(spark, line_docs):
    # min_count=6 > the 5 occurrences: nothing drops
    rows = remove_duplicate_lines(
        line_docs, "doc_id", text_col="text", min_count=6
    ).collect()
    assert all(r["n_dropped"] == 0 for r in rows)


def test_remove_duplicate_lines_normalize_keys(spark):
    # case/whitespace-insensitive keying, raw text preserved in output
    docs = spark.createDataFrame(
        [(1, "Hello  World\nkeep me"), (2, "hello world")],
        "doc_id int, text string",
    )
    got = {
        r["id"]: r["clean_text"]
        for r in remove_duplicate_lines(
            docs, "doc_id", text_col="text", min_count=2, normalize=True
        ).collect()
    }
    assert got == {1: "Hello  World\nkeep me", 2: ""}


def test_line_array_requires_exactly_one_source(spark, line_docs):
    with pytest.raises(ValueError):
        remove_duplicate_lines(line_docs, "doc_id")
    with pytest.raises(ValueError):
        remove_duplicate_lines(
            line_docs, "doc_id", text_col="text", lines_col="text"
        )


def test_reflow_lines(spark):
    docs = spark.createDataFrame(
        [("a b c d e f g h i j",)], "text string"
    )
    row = docs.select(reflow_lines("text", 4).alias("l")).first()
    assert row["l"] == ["a b c d", "e f g h", "i j"]
    # empty text -> one empty line (matches string_split semantics)
    row = spark.createDataFrame([("",)], "text string").select(
        reflow_lines("text", 4).alias("l")
    ).first()
    assert row["l"] == [""]


def test_reflow_lines_null_text_non_ansi(spark):
    # round-7 advisory: under ansi=false, size(null) = -1 makes
    # sequence(0, -1) DESCEND -> [null, null] lines unless the input is
    # coalesced; pin one empty line under BOTH ansi settings
    docs = spark.createDataFrame([(None,)], "text string")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for ansi in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            row = docs.select(reflow_lines("text", 4).alias("l")).first()
            assert row["l"] == [""], ansi
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


# ---------------------------------------------------------------------------
# Linear quality classifier
# ---------------------------------------------------------------------------

def test_linear_classifier_score_hand_computed(spark):
    w = {"good": 1.0, "bad": -2.0}
    row = spark.createDataFrame(
        [("good bad unknown good",)], "text string"
    ).select(linear_classifier_score("text", w, bias=0.5).alias("s")).first()
    expected = 1.0 / (1.0 + math.exp(-(0.5 + (1.0 - 2.0 + 0.0 + 1.0) / 4)))
    assert row["s"] == pytest.approx(expected, abs=1e-12)


def test_linear_classifier_joined_matches_literal(spark):
    w = {"fast": 0.75, "slow": -1.25, "table": 0.125}
    docs = spark.createDataFrame(
        [(1, "fast table slow"), (2, "slow slow"), (3, "nothing here")],
        "doc_id int, text string",
    )
    lit = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id",
            linear_classifier_score("text", w, bias=-0.25).alias("s"),
        ).collect()
    }
    wdf = spark.createDataFrame(
        list(w.items()), "token string, weight double"
    )
    joined = {
        r["id"]: r["score"]
        for r in linear_classifier_scores_joined(
            docs, "doc_id", "text", wdf, bias=-0.25
        ).collect()
    }
    assert set(lit) == set(joined)
    for k in lit:
        assert lit[k] == pytest.approx(joined[k], abs=1e-12)


def test_remove_duplicate_lines_null_text(spark):
    # null text normalizes to one empty line (the substring twins' '' / 0
    # contract): no nulls or -1 sizes leak into the output
    docs = spark.createDataFrame(
        [(1, None), (2, "keep me")], "doc_id int, text string"
    )
    got = {
        r["id"]: (r["n_lines"], r["n_dropped"], r["clean_text"])
        for r in remove_duplicate_lines(
            docs, "doc_id", text_col="text", min_count=2
        ).collect()
    }
    assert got == {1: (1, 0, ""), 2: (1, 0, "keep me")}
