"""local_relation contract: pure-JVM LocalRelation plan shape for the
common case, NaN preservation via the classic-path fallback (round-10
ADVICE: the pandas/Arrow route coerces float NaN -> NULL)."""

import math

from lapis_silo_spark.session import local_relation


def _plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_local_relation_is_jvm_side(spark):
    df = local_relation(
        spark, [(1, "a"), (2, None)], "id long, name string"
    )
    assert "LocalRelation" in _plan(df)
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, None)]


def test_local_relation_empty_keeps_shape(spark):
    df = local_relation(spark, [], "id long, name string")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"


def test_local_relation_preserves_nan(spark):
    # pandas would store NaN in a float64 column and Arrow reads it as
    # null; the helper must detect the NaN and take the classic path so
    # NaN survives as NaN (not NULL)
    df = local_relation(
        spark, [(1, float("nan")), (2, 0.5), (3, None)], "id long, x double"
    )
    got = {r["id"]: r["x"] for r in df.collect()}
    assert math.isnan(got[1])
    assert got[2] == 0.5
    assert got[3] is None
    # and NaN-free float frames still take the LocalRelation route
    clean = local_relation(spark, [(1, 0.5)], "id long, x double")
    assert "LocalRelation" in _plan(clean)
