"""Z-order (Morton) clustering — multi-dimension data layout for
min/max file skipping (§2.1 lake family; the same layout primitive
Delta/Iceberg expose as OPTIMIZE ZORDER BY).

Why: range-partitioning on ONE column gives perfect skipping on that
column and none on any other. Interleaving the bits of two key columns
into one Morton key and range-partitioning on THAT gives every file a
small rectangle in (x, y) space — min/max footer stats then prune scans
filtered on EITHER column, the property q_zorder's per-bucket min/max
spans surface and tests/test_scale_ops verifies against a naive layout.

The key is pure integer bit-spreading (shift/mask chains), i.e. plain
whole-stage-codegen JVM arithmetic — exactly replayable in ANSI SQL,
which is what makes q_zorder an exact-hash oracle query. Constant
shifts only, so pyspark's literal-only shiftleft() suffices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread-bits masks: 16 significant bits → even bit positions of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """0bxyz → 0b x0y0z0 (16 low bits to even positions), on bigint."""
    v = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton2(x: Column | str, y: Column | str) -> Column:
    """Interleave the low 16 bits of x (even positions) and y (odd)."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    return _spread16(xc).bitwiseOR(F.shiftleft(_spread16(yc), 1))


def sql_morton2(x: str, y: str) -> str:
    """DuckDB/ANSI twin of morton2 — identical shift/mask chain."""

    def spread(e: str) -> str:
        v = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD:
            v = f"(({v} | ({v} << {shift})) & {mask})"
        return v

    return f"({spread(x)} | ({spread(y)} << 1))"


def zorder_layout(df: DataFrame, x: str, y: str, num_files: int) -> DataFrame:
    """Range-partition by the Morton key and sort within partitions —
    the write-side layout pass: each output file covers one compact
    z-curve segment, i.e. a small (x, y) rectangle for footer stats."""
    zk = morton2(x, y).alias("__zkey")
    return (
        df.withColumn("__zkey", zk)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
