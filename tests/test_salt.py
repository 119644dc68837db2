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
