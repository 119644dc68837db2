"""TPC-H headline join/aggregate shapes (§2.11 extension, r9).

The reference's linked Polars surface is a general-purpose OLAP engine
(Cargo.toml:8 — lazy/csv/parquet build of Polars 0.42); the canonical
workload for "same query capabilities" on such an engine is the TPC-H
shape family. q13_multi_join already carries Q3; this module adds the
remaining shapes expressible over the driver's column subset (no
partsupp table, no l_shipmode/l_commitdate/l_receiptdate), each chosen
for a DISTINCT Catalyst pattern:

- Q5  — multi-dim snowflake join (region→nation→supplier broadcast
        chain + two fact shuffles) with a cross-table equality
        (c_nationkey = s_nationkey) that is NOT a star-join edge;
- Q10 — fact-heavy join + grouped top-k on an aggregated measure;
- Q13 — outer join with a join-condition residual predicate, then an
        aggregate OF an aggregate (distribution of counts);
- Q17 — correlated scalar subquery (per-part average) decorrelated
        into a broadcast self-join of a filtered fact slice;
- Q18 — HAVING-filtered semi-join spine (big orders) re-joined to the
        facts.

Dates/filters are adapted to the driver testdata's value ranges
(TESTDATA.md; probed ranges: o_orderdate 1995-2001, regions AFRICA…,
brands Brand#N). Revenue sums ride the exact decimal/split-long
contracts of _util so the 6-dp driver hash is partition-order-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.queries._util import dsum, sql_dsum
from polars_express_spark.queries.registry import query


@query(
    "q_tpch_q5",
    oracle=f"""
    WITH j AS (
      SELECT n_name, l_extendedprice * (1 - l_discount) AS rev
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'AFRICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT n_name, {sql_dsum("rev", "revenue")}
    FROM j GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    ordering customer and the supplying supplier sit in the SAME nation
    of one region.

    Plan shape (the point of the query): region→nation→supplier is a
    broadcast chain — region is 5 rows, the filtered nation×supplier
    dim is a kilobyte-scale frame even at large SF once one region is
    selected — so lineitem picks up (s_suppkey, n_name, s_nationkey)
    map-side with zero shuffle. The two remaining joins are the real
    fact shuffles: lineitem⋈orders on orderkey, then ⋈customer on
    custkey, with the c_nationkey = s_nationkey residual evaluated
    inside the join. At 100 TB both shuffles are on high-cardinality
    uniform keys (orderkey/custkey) — no skew, and AQE would demote the
    supplier broadcast to shuffle if an unfiltered region blew past the
    threshold."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    n = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(dsum(F.col("rev"), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    WITH j AS (
      SELECT c_custkey, c_name, c_acctbal, n_name,
             l_extendedprice * (1 - l_discount) AS rev
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-07-01'
    )
    SELECT c_custkey, c_name, c_acctbal, n_name, {sql_dsum("rev", "revenue")}
    FROM j GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): the 20 customers with the
    most revenue lost to returns in one half-year.

    Plan shape: returnflag + date filters push to both fact scans
    before the orderkey shuffle; nation broadcasts onto customer;
    the grouped revenue then feeds TakeOrderedAndProject — the top-20
    never globally sorts the per-customer aggregate. Group keys carry
    the customer attributes (name, acctbal, nation) through the
    aggregate instead of re-joining them after the top-k; at 100 TB
    that widens the shuffle rows slightly but saves a second customer
    probe, the standard Q10 trade."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    cn = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cn, F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("rev"), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q13",
    oracle="""
    WITH co AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): how many customers placed
    0, 1, 2, … non-urgent orders — an aggregate OF an aggregate over a
    left outer join whose RESIDUAL predicate (o_orderpriority filter)
    lives in the join condition, not a WHERE (a WHERE would turn the
    outer join inner and lose the 0-order customers).

    Plan shape: the orders side is filtered before the custkey shuffle;
    count(o_orderkey) counts only matched rows, so join-miss customers
    land in the c_count = 0 bucket. The second aggregate is tiny
    (distinct counts, bounded by max orders/customer) — it collapses to
    a near-driver-sized frame regardless of SF."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    j = c.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    co = j.groupBy("c_custkey").agg(F.count("o_custkey").alias("c_count"))
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q17",
    oracle=f"""
    WITH bl AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#11' AND p_size < 25
    ), th AS (
      SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_th
      FROM bl GROUP BY l_partkey
    ), hit AS (
      SELECT l_extendedprice FROM bl JOIN th ON l_partkey = t_partkey
      WHERE l_quantity < qty_th
    ), agg AS (
      SELECT count(*) AS n_matched, {sql_dsum("l_extendedprice", "__s")} FROM hit
    )
    SELECT n_matched, __s / 7.0 AS avg_yearly FROM agg
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
    orders below 20% of a part's average quantity were not filled — the
    canonical CORRELATED SCALAR SUBQUERY (per-part average compared
    against each row of the same part).

    Decorrelation, Spark-first: filter the fact once through the tiny
    brand/size part slice (broadcast semi-ish join), compute the
    per-part averages from that SAME slice (the filter is on part
    attributes only, so the slice holds every lineitem of the selected
    parts), broadcast the per-part thresholds back, and filter. The
    whole correlated comparison costs one scan of the brand slice plus
    two kilobyte broadcasts — no repeated subquery per row, which is
    what a naive correlated plan does and what dies at 100 TB.

    Threshold exactness: l_quantity is integral (≤ 50), so the per-part
    double sums and averages are exact in any order, and 0.2·avg is the
    same double on both engines — the strict `<` boundary cannot
    diverge."""
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#11") & (F.col("p_size") < 25))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    bl = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).drop(
        "p_partkey"
    )
    th = bl.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_th")
    )
    hit = bl.join(F.broadcast(th), F.col("l_partkey") == F.col("t_partkey")).where(
        F.col("l_quantity") < F.col("qty_th")
    )
    return hit.agg(
        F.count(F.lit(1)).alias("n_matched"), dsum(F.col("l_extendedprice"), "__s")
    ).select(
        "n_matched", (F.col("__s") / F.lit(7.0)).alias("avg_yearly")
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS b_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = b_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300, with their customers, largest totalprice first.

    Plan shape: the HAVING aggregate runs FIRST and acts as the join
    spine — lineitem collapses to one row per qualifying order before
    any join, so orders/customer only ever see the (rare) big orders.
    The aggregate is partial→final on orderkey; the survivors are a
    vanishing fraction (46 orders at sf0.01), so both subsequent joins
    are effectively broadcast-sized at any SF where the 300-threshold
    stays selective. total_qty sums integral quantities — exact in any
    partition order, no decimal needed."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(o, F.col("o_orderkey") == F.col("b_orderkey")).join(
        c, F.col("c_custkey") == F.col("o_custkey")
    )
    return j.select(
        "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
    ).orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(100)
