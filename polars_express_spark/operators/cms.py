"""Count-min sketch — fixed-size frequency estimation (§2.4/§2.10
sketch family, beside freqItems heavy hitters and HLL approx-distinct).

Spark ships a count_min_sketch AGGREGATE but no function to QUERY the
binary it returns, so this builds the sketch as what it really is: a
d×w counter TABLE, i.e. a DataFrame of (row, bucket, cnt) produced by
one partial→final hash aggregate over d hashed copies of the input.
That keeps every step distributed and mergeable:

- UPDATE: explode each item to d rows (i, h_i(item) mod w), groupBy,
  count — map-side combine collapses the stream to ≤ d·w rows no
  matter the input size (the sketch property);
- MERGE: union two sketch frames and re-aggregate (counters add);
- QUERY: join the probe items' d positions against the sketch and take
  min(cnt) per item — the sketch is ≤ d·w rows, so Catalyst broadcasts
  it and the probe never shuffles.

Guarantees (classic CM bounds): estimate ≥ true count ALWAYS (each
counter only ever over-counts via collisions) — that invariant is what
q_cms_tokens hash-checks; estimate ≤ true + εN with probability 1−δ
for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ — asserted as a pytest bound at fixed SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_update(df: DataFrame, col: str, depth: int = 4, width: int = 2048) -> DataFrame:
    """Fold a column into a (row, bucket, cnt) count-min sketch frame."""
    c = F.col(col)
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(c, F.lit(i)), F.lit(width)).alias("b"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.where(c.isNotNull())
        .select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counters add — union + re-aggregate (the mergeable-sketch law)."""
    return a.unionByName(b).groupBy("i", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Point-query the sketch for each item: min over the d counters.

    `depth`/`width` must match cms_update. Items whose (i, b) hits an
    absent sketch row have true bucket count 0 → estimate 0 (coalesce).
    Returns `items` columns plus `est`. Duplicate item rows collapse to
    one output row (the grouped estimate); `items` must not already
    carry columns named i/b/cnt/est (the sketch's public schema).
    """
    c = F.col(col)
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(c, F.lit(i)), F.lit(width)).alias("b"),
            )
            for i in range(depth)
        ]
    )
    probed = items.select(*items.columns, F.explode(probes).alias("p")).select(
        *items.columns, F.col("p.i").alias("i"), F.col("p.b").alias("b")
    )
    joined = probed.join(F.broadcast(sketch), ["i", "b"], "left").withColumn(
        "cnt", F.coalesce("cnt", F.lit(0))
    )
    return joined.groupBy(*items.columns).agg(F.min("cnt").alias("est"))
