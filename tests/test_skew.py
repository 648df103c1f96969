"""Salted join: exact equality with the plain join, hot-key spread."""

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import skew


def _sets(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_equals_plain_join(spark):
    # hot key: 90% of left rows share k=0
    left = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame([(0, "hot"), (10, "a"), (20, "b")], "k long, tag string")
    got = skew.salted_join(left, right, ["k"], salt=8)
    want = left.join(right, ["k"])
    assert _sets(got) == _sets(want)


def test_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    right = spark.createDataFrame([(1, "m")], "k long, tag string")
    got = skew.salted_join(left, right, ["k"], salt=4, how="left")
    want = left.join(right, ["k"], "left")
    assert _sets(got) == _sets(want)


def test_salt_spreads_hot_key(spark):
    left = spark.range(2000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    salted = left.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.lit(0), F.col("k"), F.lit(1), F.col("v")), F.lit(8)
        ).cast("int"),
    )
    n_shards = salted.select("_salt").distinct().count()
    assert n_shards == 8  # every shard sees part of the hot key


def test_rejects_unsupported_how(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        skew.salted_join(df, df, ["id"], how="full")
