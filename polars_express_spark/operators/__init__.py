"""Composed operators Spark lacks natively (SURVEY.md §2.3, §2.10)."""

from polars_express_spark.operators.asof import asof_join_backward
from polars_express_spark.operators.salt import salted_join
from polars_express_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)

__all__ = [
    "asof_join_backward",
    "salted_join",
    "deterministic_sample",
    "stratified_sample",
]
