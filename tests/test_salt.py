"""salted_join equivalence: on a deliberately skewed key distribution
the salted join must return exactly the plain join's rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_express_spark.operators.salt import salted_join


def _skewed(spark):
    # one hot key (k=0) holding 90% of rows, a long tail of cold keys
    left = spark.range(1000).select(
        F.col("id").alias("lid"), F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k")
    )
    right = spark.range(1000).select(
        F.col("id").alias("rid"), F.when(F.col("id") < 450, 0).otherwise(F.col("id")).alias("k")
    )
    return left, right


def test_salted_join_equals_plain_join(spark):
    left, right = _skewed(spark)
    plain = {(r["lid"], r["rid"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["lid"], r["rid"])
        for r in salted_join(left, right, on=["k"], salt_from="rid", tiles=8).collect()
    }
    assert salted == plain
    # hot block (900 × 450) + cold tail overlap (k = 900..999 on both sides)
    assert len(plain) == 900 * 450 + 100


def test_salted_join_rejects_outer(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], salt_from="rid", how="left")


def test_aqe_splits_skewed_join_partitions(spark):
    """The OTHER skew treatment beside salting: AQE's runtime skew-join
    split. A 90%-one-key fact joined to a dim under forced-low
    thresholds must finalize as SortMergeJoin(skew=true) with an
    AQEShuffleRead that splits the hot partition — proving the runtime
    re-plan path the 100 TB design leans on is actually live, not just
    configured."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 500000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = fact.join(dim, "k").groupBy().count()
        # 450k hot-key rows match dim key 7; of the distinct keys
        # (k = id where id % 10 == 9) only those < 1000 hit the dim
        assert j.collect()[0][0] == 450000 + 100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
