"""UDF surface parity: the three Python UDF tiers Spark offers, pinned
against the pure-expression result so semantics (and the preferred
ordering) are explicit:

  built-in expression  >  Arrow-optimized @udf  >  pandas_udf  >  row @udf

The engine's hot paths use ONLY the first (whole-stage codegen) with
pandas_udf/mapInPandas where expressions can't reach (SCALE.md); these
tests exist because a migrating user WILL bring UDFs, and the contract
(same results, declared null behavior, Arrow batch transfer) should be
demonstrated, not assumed."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import LongType


def test_arrow_udf_matches_expression(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    expected = [r.v for r in df.select((F.col("id") * 2 + F.col("k")).alias("v"))
                .orderBy("id").collect()]

    @udf(returnType=LongType(), useArrow=True)
    def arrow_f(i, k):
        return i * 2 + k

    got = [r.v for r in df.select(arrow_f("id", "k").alias("v")).orderBy("id").collect()]
    assert got == expected

    @pandas_udf(LongType())
    def vec_f(i: pd.Series, k: pd.Series) -> pd.Series:
        return i * 2 + k

    got_vec = [r.v for r in df.select(vec_f("id", "k").alias("v")).orderBy("id").collect()]
    assert got_vec == expected


def test_udf_null_passthrough(spark):
    df = spark.createDataFrame([(1,), (None,)], "x long")

    @udf(returnType=LongType(), useArrow=True)
    def inc(x):
        return None if x is None else x + 1

    out = {r.x: r.y for r in df.select("x", inc("x").alias("y")).collect()}
    assert out == {1: 2, None: None}


def test_grouped_pandas_udf_matches_groupby(spark):
    df = spark.range(100).select((F.col("id") % 5).alias("g"), F.col("id").alias("v"))
    expected = {
        r.g: r.s for r in df.groupBy("g").agg(F.sum("v").alias("s")).collect()
    }

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [pdf["g"].iloc[0]], "s": [pdf["v"].sum()]})

    got = {
        r.g: r.s
        for r in df.groupBy("g").applyInPandas(agg, "g long, s long").collect()
    }
    assert got == expected
