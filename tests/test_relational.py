"""Relational operator semantics (SURVEY §2.1/§2.3 metadata subset)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lapis_silo_spark.catalog import Database
from lapis_silo_spark.expressions import (
    Between,
    Equals,
    InSet,
    IsNull,
    Like,
    Negation,
    NOf,
    NotEquals,
    QueryCompileError,
    TrueExpr,
)
from lapis_silo_spark.operators import Pipeline


@pytest.fixture(scope="module")
def db(spark):
    d = Database(spark)
    d.register_table(
        "t",
        spark.createDataFrame(
            [
                ("a", 1, "x"),
                ("b", 2, None),
                ("c", None, "y"),
                ("d", 4, "x"),
            ],
            schema="pk string, v int, s string",
        ),
        primary_key="pk",
    )
    return d


def keys(p):
    return sorted(r["pk"] for r in p.df.select("pk").collect())


def test_equals_null_never_matches(db):
    assert keys(Pipeline.scan(db, "t").filter(Equals("v", 2))) == ["b"]
    # NULL cell doesn't equal anything
    assert keys(Pipeline.scan(db, "t").filter(Equals("s", "x"))) == ["a", "d"]


def test_negation_is_row_universe_complement(db):
    # complement.cpp semantics: NOT(=) keeps NULL rows
    assert keys(Pipeline.scan(db, "t").filter(Negation(Equals("s", "x")))) == [
        "b",
        "c",
    ]
    assert keys(Pipeline.scan(db, "t").filter(NotEquals("s", "x"))) == ["b", "c"]


def test_between_open_bounds(db):
    assert keys(Pipeline.scan(db, "t").filter(Between("v", 2, None))) == ["b", "d"]
    assert keys(Pipeline.scan(db, "t").filter(Between("v", None, 2))) == ["a", "b"]
    # both open = isNotNull (null = open bound, query_documentation.md:498)
    assert keys(Pipeline.scan(db, "t").filter(Between("v", None, None))) == [
        "a",
        "b",
        "d",
    ]


def test_in_set_with_null(db):
    assert keys(Pipeline.scan(db, "t").filter(InSet("s", ["x", None]))) == [
        "a",
        "b",
        "d",
    ]
    assert keys(Pipeline.scan(db, "t").filter(IsNull("v"))) == ["c"]


def test_like_partial_match(db):
    d = Database(db.spark)
    d.register_table(
        "u",
        db.spark.createDataFrame(
            [("a", "Basel-Land"), ("b", "Basel-Stadt"), ("c", "Bern")],
            schema="pk string, div string",
        ),
    )
    assert keys(Pipeline.scan(d, "u").filter(Like("div", "Basel"))) == ["a", "b"]
    assert keys(Pipeline.scan(d, "u").filter(Like("div", "^Bern$"))) == ["c"]


def test_nof_semantics(db):
    exprs = [Equals("pk", "a"), Equals("s", "x"), Between("v", None, 2)]
    # a: [T,T,T]=3, b: [F,F,T]=1, c: [F,F,F]=0... c has s='y' F, v NULL F
    # d: [F,T,F]=1
    assert keys(Pipeline.scan(db, "t").filter(NOf(2, exprs))) == ["a"]
    assert keys(Pipeline.scan(db, "t").filter(NOf(1, exprs, match_exactly=True))) == [
        "b",
        "d",
    ]
    assert keys(Pipeline.scan(db, "t").filter(NOf(0, exprs))) == ["a", "b", "c", "d"]


def test_orderby_null_placement(db):
    # asc ⇒ nulls first, desc ⇒ nulls last (order_by_node.cpp:92-96)
    p = Pipeline.scan(db, "t").order_by([("v", True)])
    assert [r["pk"] for r in p.df.collect()] == ["c", "a", "b", "d"]
    p = Pipeline.scan(db, "t").order_by([("v", False)])
    assert [r["pk"] for r in p.df.collect()] == ["d", "b", "a", "c"]


def test_orderby_randomize_deterministic(db):
    p1 = Pipeline.scan(db, "t")
    p1.pk = "pk"
    order1 = [r["pk"] for r in p1.order_by([], randomize_seed=7).df.collect()]
    order2 = [r["pk"] for r in p1.order_by([], randomize_seed=7).df.collect()]
    order3 = [r["pk"] for r in p1.order_by([], randomize_seed=8).df.collect()]
    assert order1 == order2
    assert sorted(order1) == ["a", "b", "c", "d"]
    assert order1 != order3  # overwhelmingly likely for xxhash64


def test_limit_offset(db):
    p = Pipeline.scan(db, "t").order_by([("pk", True)]).offset(1).limit(2)
    assert keys(p) == ["b", "c"]


def test_map_replaces_in_place(db):
    p = Pipeline.scan(db, "t").map({"v": F.coalesce(F.col("v"), F.lit(0))})
    assert p.df.columns == ["pk", "v", "s"]
    assert sorted(r["v"] for r in p.df.collect()) == [0, 1, 2, 4]


def test_group_by_null_key_group(db):
    rows = (
        Pipeline.scan(db, "t")
        .group_by({"cnt": F.count(F.lit(1))}, ["s"])
        .df.collect()
    )
    as_map = {r["s"]: r["cnt"] for r in rows}
    assert as_map == {"x": 2, None: 1, "y": 1}


def test_join_rejections(db):
    with pytest.raises(QueryCompileError, match="duplicate output column"):
        Pipeline.scan(db, "t").join(Pipeline.scan(db, "t"), on=[("pk", "pk")])
    with pytest.raises(QueryCompileError, match="unknown join type"):
        Pipeline.scan(db, "t").join(
            Pipeline.scan(db, "t"), on=[("pk", "pk")], how="cross"
        )


def test_union_all_keeps_duplicates(db):
    p = Pipeline.scan(db, "t").project(["pk"])
    assert p.union_all(p).df.count() == 8
    with pytest.raises(QueryCompileError, match="identical schemas"):
        p.union_all(Pipeline.scan(db, "t").project(["v"]))


def test_schema_node(db):
    rows = Pipeline.scan(db, "t").schema_().df.collect()
    assert [(r["fieldName"], r["type"]) for r in rows] == [
        ("pk", "string"),
        ("v", "int"),
        ("s", "string"),
    ]


def test_filter_true_false(db):
    assert Pipeline.scan(db, "t").filter(TrueExpr()).df.count() == 4
    assert Pipeline.scan(db, "t").filter(Negation(TrueExpr())).df.count() == 0
