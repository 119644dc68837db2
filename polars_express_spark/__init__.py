"""polars_express_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference engine (Homer-Mctavish/polars-express, a
Rust/Axum/Polars web service — see SURVEY.md). Everything here is built
on the public Apache Spark DataFrame / SQL / Structured Streaming APIs:
the logical plan is declared declaratively and Catalyst/Tungsten pick
the physical strategy (SURVEY.md §4).

Layout:
  session.py    — SparkSession bootstrap tuned for local[N] and for scale
  catalog.py    — DataLake: id → path catalog (reference src/main.rs:17-57)
  sinks.py      — canonical JSON row sink (reference src/main.rs:207-255)
  api.py        — the three reference endpoints: preview / delays / regression
  operators/    — composed operators Spark lacks natively (as-of join, top-k…)
  functions/    — column-expression helpers (regression, text, dedup, similarity)
  queries/      — the declared correctness corpus (SURVEY.md §2.11 Q1–Q37 + extras)
  streaming/    — Structured Streaming operators over the events table
"""

from polars_express_spark.session import get_spark
from polars_express_spark.catalog import DataLake, load_table, register_views

__all__ = ["get_spark", "DataLake", "load_table", "register_views"]
__version__ = "0.1.0"
