"""Set-operation corpus: Q23 (SURVEY.md §2.7).

Union rides polars' lazy concat (Tier L); intersect/except have no polars
op (Tier G) and are Spark natives.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.queries.registry import query


def _sides(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").selectExpr("s_nationkey AS nationkey")
    c = load_table(spark, sf_dir, "customer").selectExpr("c_nationkey AS nationkey")
    return s, c


@query(
    "q23_union_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    UNION ALL
    SELECT c_nationkey FROM customer
    """,
)
def q23_union_all(spark, sf_dir):
    s, c = _sides(spark, sf_dir)
    return s.unionByName(c)


@query(
    "q23_union_distinct",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    UNION
    SELECT c_nationkey FROM customer
    """,
)
def q23_union_distinct(spark, sf_dir):
    s, c = _sides(spark, sf_dir)
    return s.unionByName(c).distinct()


@query(
    "q23_intersect",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    INTERSECT
    SELECT c_nationkey FROM customer
    """,
)
def q23_intersect(spark, sf_dir):
    s, c = _sides(spark, sf_dir)
    return s.intersect(c)


@query(
    "q23_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q23_except(spark, sf_dir):
    """EXCEPT DISTINCT (customer-side first: more likely non-empty)."""
    s, c = _sides(spark, sf_dir)
    return c.subtract(s)


@query(
    "q23b_except_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity > 45
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
)
def q23b_except_all(spark, sf_dir):
    """EXCEPT ALL (§2.7, the bag-semantics twin of q23_except):
    multiplicities subtract instead of collapsing — the form that
    preserves duplicate counts for reconciliation workloads. Spark
    plans it as a count-annotated aggregate + generate, all
    partial→final; keys are exact ints."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("suppkey"))
    b = li.where(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b)


@query(
    "q23b_intersect_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
)
def q23b_intersect_all(spark, sf_dir):
    """INTERSECT ALL (§2.7): min-of-multiplicities bag intersection."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("suppkey"))
    b = li.where(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)
