"""Bucketed co-located join (SURVEY.md §7 / 100 TB posture): two tables
bucketed on the join key must join with NO Exchange (shuffle) on either
side, and the results must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_express_spark.catalog import DataLake, load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    lake = DataLake(spark, str(tmp_path_factory.mktemp("bucket_lake")))
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    lake.save_bucketed(orders, "orders_b", bucket_by="o_custkey", n_buckets=8)
    lake.save_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        bucket_by="o_custkey",
        n_buckets=8,
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join planner must choose a non-broadcast
    # strategy — the point is that bucketing removes the Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(bucketed):
    spark = bucketed
    got = (
        spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s"))
        .collect()[0]
    )
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    want = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partition_by layout must turn an equality filter on
    the partition key into PartitionFilters at the scan — at 100 TB
    that is the difference between reading one directory and reading
    the corpus. Row counts must match the unpartitioned filter."""
    from pyspark.sql import functions as F

    from polars_express_spark.catalog import DataLake, load_table
    from tests.conftest import SF_DIR

    lake = DataLake(spark, str(tmp_path))
    docs = load_table(spark, SF_DIR, "documents")
    lake.save(docs, "docs_part", partition_by=["lang"])
    filtered = lake.load("docs_part").where(F.col("lang") == "en")
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "lang" in pf  # filter reached the partition pruner
    assert filtered.count() == docs.where(F.col("lang") == "en").count()
