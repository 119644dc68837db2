"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (Q13, TPC-H Q3 shape: 3-way join +
                  filtered agg + distributed top-k) at sf0.001.
queries()       — every implemented operator from SURVEY.md §2 as a
                  named (spark, sf_dir) -> DataFrame callable.
oracle_sql()    — DuckDB twin for EVERY registered query. The count is
                  LIVE, never hardcoded here (it went stale twice):
                  len(queries()) == len(oracle_sql()) is asserted by
                  tests/test_registry_shapes.py against the registry.
                  Hash/approximate operators (fingerprint,
                  simhash, minhash/LSH, ANN, sampling) register
                  bounded-invariant forms whose exact part the oracle
                  recomputes, so nothing falls back to the rows-only
                  check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from polars_express_spark.queries.registry import all_queries

    return all_queries()["q13_multi_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polars_express_spark.queries.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from polars_express_spark.queries.registry import all_oracles

    return all_oracles()
