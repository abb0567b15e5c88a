"""Join strategies: bucketed co-location (no Exchange) + salted skew join."""

import pytest
from pyspark.sql import functions as F

from harvester_spark.operators.joins import (bucketed_join, salted_join,
                                             write_bucketed)


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, "t_left", "k", buckets=8)
    write_bucketed(right, "t_right", "k", buckets=8)
    # force the big-big (sort-merge) strategy the bucketing exists for;
    # at toy sizes Spark would otherwise just broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, "t_left", "t_right", "k")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # co-located: neither side re-shuffles (the shuffle was paid once
        # at write time); no Exchange hashpartitioning anywhere
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert out.count() == 2000
        r = out.filter(F.col("k") == 7).first()
        assert r["a"] == 14 and r["b"] == 21
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_correct_under_skew(spark):
    # 10k rows, 95% share one hot key
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(1)).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("d"))
    got = salted_join(big, dim, "k", salts=8)
    plain = big.join(dim, "k")
    assert got.count() == plain.count() == 10_000
    # value-exact: every row keeps exactly its dim match
    bad = got.filter(F.col("d") != F.col("k") * 10).count()
    assert bad == 0
    agg = got.groupBy("k").count().filter(F.col("k") == 1).first()
    assert agg["count"] == 9500


def test_salted_join_rejects_outer(spark):
    """ADVICE r2: right/full outer would emit unmatched dim rows once per
    salt replica — rejected up front."""
    import pytest
    big = spark.range(3).select(F.col("id").alias("k"))
    dim = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, dim, "k", how=how)
    # left stays fine: unmatched BIG rows appear exactly once
    left = salted_join(big.union(spark.sql("SELECT 99 AS k")), dim, "k",
                       how="left")
    assert left.count() == 4
