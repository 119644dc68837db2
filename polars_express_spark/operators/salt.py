"""Salted equi-join — the generic hot-key skew treatment (SURVEY.md §7,
100 TB posture; used by q_embed_neardup's label blocks).

A shuffled equi-join sends every row of a key to one reducer; a hot key
(one label/customer/shingle dominating the data) serializes the join.
Salting splits each key into `tiles` sub-keys: the right side is
bucketed by a hash of a high-cardinality column, the left side is
replicated once per tile. Results are IDENTICAL to the plain join —
every (left, right) pair still meets exactly once, on exactly one tile —
only the shuffle-key distribution changes. Cost: left side × tiles
rows through the shuffle, so salt the smaller/narrower side.

AQE's skew-join splitting handles sort-merge cases adaptively; explicit
salting is for when you know the skew up front (e.g. quadratic
block-join pair generation) or the join shape AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_COL = "__salt_tile"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_from: str,
    tiles: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left ⋈ right` on `on`, with the hot-key shuffle split
    `tiles` ways.

    salt_from: a high-cardinality column of `right` (an id) whose hash
    spreads that side's rows uniformly across tiles. `left` is
    replicated once per tile (explode of a literal range — no shuffle of
    its own). Inner join only: any outer variant would null-extend an
    unmatched left row once PER TILE, changing the result.
    """
    if how != "inner":
        raise ValueError(f"salted_join supports inner only, got {how!r}")
    lt = left.withColumn(
        TILE_COL, F.explode(F.sequence(F.lit(0), F.lit(tiles - 1)))
    )
    rt = right.withColumn(
        TILE_COL, F.pmod(F.hash(F.col(salt_from)), F.lit(tiles)).cast("int")
    )
    return lt.join(rt, [*on, TILE_COL], how).drop(TILE_COL)
