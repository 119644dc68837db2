"""Grid-bucketed radius join — planar proximity search (§2.3 non-equi
family; the spatial twin of the time-range joins in range_join.py).

The naive "all pairs within distance r" predicate is a cartesian
product. The standard spatial-engine rewrite is GRID BUCKETING with
cell size = r: any pair within r lies either in the same cell or in
horizontally/vertically/diagonally adjacent cells, so candidates come
from equi-joining one side's cell against the OTHER side's 3×3 cell
neighborhood (a 9× explode of the smaller/probe side — never a
cartesian), then the exact distance predicate filters. With integer
coordinates the squared distance is exact int64 arithmetic — no
trigonometry, so the oracle replay is bit-identical. At 100 TB the
cell id is the shuffle/partition key, exactly like the time buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    lx: str,
    ly: str,
    rx: str,
    ry: str,
    radius: int,
) -> DataFrame:
    """All (left, right) pairs with squared planar distance ≤ radius².

    The RIGHT side explodes to its 3×3 neighbor cells (9 rows each —
    make it the smaller side); the left side maps to its single cell.
    Returns all columns of both plus `dist2`. Coordinates are treated
    as integers (exact arithmetic); floor-div cells are correct for
    negative coordinates too.
    """
    r = int(radius)
    cell = lambda c: F.floor(F.col(c).cast("bigint") / F.lit(r))  # noqa: E731
    lb = left.withColumn(
        "__cell",
        F.struct(cell(lx).alias("cx"), cell(ly).alias("cy")),
    )
    neighbors = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(-1), F.lit(1)),
                lambda dx: F.transform(
                    F.sequence(F.lit(-1), F.lit(1)),
                    lambda dy: F.struct(
                        (cell(rx) + dx).alias("cx"), (cell(ry) + dy).alias("cy")
                    ),
                ),
            )
        )
    )
    rb = right.withColumn("__cell", neighbors)
    dx = F.col(lx).cast("bigint") - F.col(rx).cast("bigint")
    dy = F.col(ly).cast("bigint") - F.col(ry).cast("bigint")
    dist2 = (dx * dx + dy * dy).alias("dist2")
    return (
        lb.join(rb, "__cell")
        .where(dx * dx + dy * dy <= F.lit(r * r))
        .drop("__cell")
        .withColumn("dist2", dist2)
    )
