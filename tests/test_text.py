

def test_word_ngram_rows_matches_expression_path(spark):
    """The Arrow gram-row producer (round 11) must emit the exact multiset of
    ``explode(word_ngrams(...))`` — including the NULL-text quirk (one
    empty-string gram) and the distinct form — across edge cases: NULL,
    empty, whitespace-only, shorter-than-n, untrimmed tab/newline
    whitespace, uppercase, repeated grams, multibyte UTF-8."""
    from pyspark.sql import functions as F

    from lapis_silo_spark.functions.text import word_ngram_rows, word_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e"),
            (2, None),
            (3, ""),
            (4, "   "),
            (5, "a b"),
            (6, "\tA  b\nC d\x0be f\r g h"),
            (7, "héllo wörld héllo wörld héllo wörld"),
            (8, "日本語 テキスト 日本語 テキスト 日本語"),
            (9, "x y x y x y x y"),
        ],
        ["doc_id", "text"],
    )

    for n in (1, 2, 3):
        exp = sorted(
            (r["id"], r["gram"])
            for r in docs.select(
                F.col("doc_id").alias("id"),
                F.explode(word_ngrams("text", n)).alias("gram"),
            ).collect()
        )
        arr = sorted(
            (r["id"], r["gram"])
            for r in word_ngram_rows(
                docs, [("id", F.col("doc_id"))], "text", n
            ).collect()
        )
        assert arr == exp and len(exp) > 0, f"plain n={n}"

        exp_d = sorted(
            (r["id"], r["gram"])
            for r in docs.select(
                F.col("doc_id").alias("id"),
                F.explode(
                    F.array_distinct(word_ngrams("text", n))
                ).alias("gram"),
            ).collect()
        )
        arr_d = sorted(
            (r["id"], r["gram"])
            for r in word_ngram_rows(
                docs, [("id", F.col("doc_id"))], "text", n, distinct=True
            ).collect()
        )
        assert arr_d == exp_d and len(exp_d) > 0, f"distinct n={n}"

    # expression passthrough + no-passthrough forms
    flagged = sorted(
        (r["_t"], r["gram"])
        for r in word_ngram_rows(
            docs,
            [("_t", F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(0)))],
            "text",
            2,
        ).collect()
    )
    exp_f = sorted(
        (r["_t"], r["gram"])
        for r in docs.select(
            F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(0)).alias("_t"),
            F.explode(word_ngrams("text", 2)).alias("gram"),
        ).collect()
    )
    assert flagged == exp_f

    bare = sorted(
        r["gram"] for r in word_ngram_rows(docs, [], "text", 2).collect()
    )
    exp_b = sorted(
        r["gram"]
        for r in docs.select(
            F.explode(word_ngrams("text", 2)).alias("gram")
        ).collect()
    )
    assert bare == exp_b


def test_ngram_repetition_rows_matches_expression_path(spark):
    """The Arrow repetition-stats producer must reproduce the expression
    fold's fractions exactly (division + rounding applied identically
    JVM-side) across NULL/empty/short/repetitive/multibyte texts."""
    from pyspark.sql import functions as F

    from lapis_silo_spark.functions.text import (
        dup_ngram_char_fraction,
        ngram_repetition_rows,
        top_ngram_char_fraction,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e"),
            (2, None),
            (3, ""),
            (4, "   "),
            (5, "a"),
            (6, "x y x y x y x y x y"),
            (7, "\tA  b\nC d\x0be f\r g h a b c d"),
            (8, "héllo wörld héllo wörld héllo wörld"),
            (9, "one two three one two three one two"),
        ],
        ["doc_id", "text"],
    )
    exp = {
        r["doc_id"]: (r["t"], r["d"])
        for r in docs.select(
            "doc_id",
            F.round(top_ngram_char_fraction("text", 2), 6).alias("t"),
            F.round(dup_ngram_char_fraction("text", 3), 6).alias("d"),
        ).collect()
    }
    stats = ngram_repetition_rows(
        docs, [("doc_id", F.col("doc_id"))], "text", top_n=2, dup_n=3
    )
    frac = (
        lambda num: F.when(
            F.col("norm_len") > 0, F.col(num) / F.col("norm_len")
        ).otherwise(F.lit(0.0))
    )
    got = {
        r["doc_id"]: (r["t"], r["d"])
        for r in stats.select(
            "doc_id",
            F.round(frac("top_chars"), 6).alias("t"),
            F.round(frac("dup_chars"), 6).alias("d"),
        ).collect()
    }
    assert got == exp and len(exp) == 9


def test_reflow_line_rows_matches_expression_path(spark):
    """The Arrow reflow producer must emit exactly reflow_lines()'s arrays
    (NULL -> one empty line; normalization; fixed-width windows)."""
    from pyspark.sql import functions as F

    from lapis_silo_spark.functions.text import reflow_line_rows, reflow_lines

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k"),
            (2, None),
            (3, ""),
            (4, "   "),
            (5, "one"),
            (6, "\tA  b\nC d\x0be f\r g h i"),
            (7, "héllo wörld héllo wörld héllo"),
        ],
        ["doc_id", "text"],
    )
    for w in (3, 8):
        exp = {
            r["doc_id"]: r["lines"]
            for r in docs.select(
                "doc_id", reflow_lines("text", w).alias("lines")
            ).collect()
        }
        got = {
            r["doc_id"]: r["lines"]
            for r in reflow_line_rows(
                docs, [("doc_id", F.col("doc_id"))], "text", w
            ).collect()
        }
        assert got == exp and len(exp) == 7, f"w={w}"
