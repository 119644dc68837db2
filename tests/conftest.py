"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata views registered, and the oracle-compare
helper that mirrors the driver's check (row count + schema-insensitive
column order + 6-dp float rounding + order-insensitive row compare).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

# run the whole suite with scaled4's negative-input guard armed: any
# query site feeding signed data to the split-long accumulator fails
# loudly here instead of hashing wrong sums (production plans stay
# guard-free / pure codegen — the env var is read at expression-build
# time, see _util.scaled4)
os.environ.setdefault("SPARK_GRAFT_DEBUG_ASSERT", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from polars_express_spark.session import get_spark

    s = get_spark(app_name="polars_express_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def canon_rows(rows):
    """Rows → sorted tuples with floats at 6dp (driver-compare mirror)."""
    out = [tuple(_canon_value(v) for v in row) for row in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare_query(spark, ddb, fn, sql, sf_dir=SF_DIR):
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    rel = ddb.execute(sql)
    ddb_cols = [d[0] for d in rel.description]
    ddb_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"column mismatch: spark={spark_cols} duckdb={ddb_cols}"
    )
    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [ddb_cols.index(c) for c in order]
    s_rows = [tuple(row[i] for i in s_idx) for row in sdf.collect()]
    d_rows = [tuple(row[i] for i in d_idx) for row in ddb_rows]
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = canon_rows(s_rows), canon_rows(d_rows)
    for i, (a, b) in enumerate(zip(cs, cd)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  duckdb: {b}"
