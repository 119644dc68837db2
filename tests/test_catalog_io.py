"""DataLake write-sink unit tests (SURVEY.md §2.1): every format
round-trips through save()+load(), partitionBy lays out Hive-style
directories, and unsupported formats are rejected.
"""

from __future__ import annotations

import os

import pytest

from polars_express_spark.catalog import DataLake, load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def lake(spark, tmp_path):
    return DataLake(spark, str(tmp_path))


def _nation(spark):
    return load_table(spark, SF_DIR, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_save_load_roundtrip(spark, lake, fmt):
    n = _nation(spark)
    path = lake.save(n, f"nation_{fmt}", fmt=fmt)
    assert os.path.isdir(path)
    back = lake.load(f"nation_{fmt}")
    got = {
        (int(r["n_nationkey"]), r["n_name"]) for r in back.select("n_nationkey", "n_name").collect()
    }
    want = {(int(r["n_nationkey"]), r["n_name"]) for r in n.select("n_nationkey", "n_name").collect()}
    assert got == want and got


def test_save_partition_by(spark, lake):
    n = _nation(spark)
    lake.save(n, "nation_parts", fmt="parquet", partition_by=["n_regionkey"])
    root = os.path.join(lake.base_dir, "nation_parts.parquet")
    assert any(d.startswith("n_regionkey=") for d in os.listdir(root))
    assert lake.load("nation_parts").count() == n.count()


def test_save_rejects_unknown_format(spark, lake):
    with pytest.raises(ValueError):
        lake.save(_nation(spark), "x", fmt="avro")
