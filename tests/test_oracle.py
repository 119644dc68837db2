"""Differential oracle suite: every registered query with a DuckDB twin
runs through both engines at the test SF and must match (SURVEY.md §5.2.1
— the binding correctness gate, mirroring the driver's t2 check).
"""

from __future__ import annotations

import pytest

from polars_express_spark.queries.registry import all_oracles, all_queries
from tests.conftest import compare_query

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, ddb, name):
    """Queries without a SQL twin must still run and return a stable schema."""
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns, name
    assert rows is not None
