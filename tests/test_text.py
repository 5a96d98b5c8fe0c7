

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
