"""Product-analytics corpus: ordered funnel conversion and cohort
retention over the events stream table (SURVEY.md §2.4/§2.5 extensions
— the classic event-analytics shapes every OLAP engine is asked for).

Both are exact-integer queries (counts of users and exact-int ratios),
so the cross-engine hash has no FP surface at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.queries.registry import query

_FUNNEL = ("view", "click", "purchase")


@query(
    "q_funnel",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts > t1.t1 GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts > t2.t2 GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_stage1,
           (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_stage2,
           (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_stage3,
           (SELECT CAST(count(*) AS DOUBLE) FROM t3)
             / (SELECT count(*) FROM t1) AS conv_full
    """,
)
def q_funnel(spark, sf_dir):
    """Strictly-ordered funnel conversion (view → click → purchase):
    a user advances to stage k+1 only with an event STRICTLY AFTER
    their stage-k time — the product-analytics query (Amplitude/GA
    shape) that plain per-type counts get wrong. Three conditional
    min-aggregates chained by user_id equi-joins; every stage
    partitions on user_id, so at 100 TB the three shuffles co-locate
    and AQE collapses the later (shrinking) stages. All outputs are
    exact integers + one exact int ratio."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    t1 = (
        ev.where(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == _FUNNEL[1])
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == _FUNNEL[2])
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_users = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    c1 = t1.agg(F.count(F.lit(1)).cast("bigint").alias("n_stage1"))
    c2 = t2.agg(F.count(F.lit(1)).cast("bigint").alias("n_stage2"))
    c3 = t3.agg(F.count(F.lit(1)).cast("bigint").alias("n_stage3"))
    return (
        n_users.crossJoin(c1)
        .crossJoin(c2)
        .crossJoin(c3)
        .select(
            "n_users",
            "n_stage1",
            "n_stage2",
            "n_stage3",
            (F.col("n_stage3").cast("double") / F.col("n_stage1")).alias("conv_full"),
        )
    )


@query(
    "q_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS c_week
      FROM events GROUP BY user_id
    )
    SELECT c.c_week AS cohort_week,
           CAST(datediff('day', c.c_week, CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7 AS BIGINT)
             AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN cohort c USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by their first-seen week
    (ISO Monday truncation, identical in both engines), counted
    distinct in each subsequent activity week — the (cohort, offset)
    triangle every retention dashboard draws. One groupBy(user) for
    cohorts, one user-key join back, one partial→final distinct count;
    offsets are exact day-diffs of week-truncated timestamps divided
    by 7 (always integral)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("c_week")
    )
    return (
        ev.join(cohort, "user_id")
        .select(
            F.col("c_week").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("c_week"))
                / F.lit(7)
            )
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )
