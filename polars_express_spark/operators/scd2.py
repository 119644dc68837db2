"""SCD2 merge — slowly-changing-dimension type-2 snapshot upsert.

The CDC/upsert primitive a lakehouse pipeline runs per batch: given the
current dimension snapshot and an update batch, emit the next snapshot
where updated keys get a NEW current row and their previous row is kept
as closed history; inserts appear as version-1 current rows; untouched
rows pass through.

Spark-first shape: ONE full outer equi-join on the key, then a
union of the two projections. No window functions, no driver state.
At scale the update batch is typically tiny relative to the base —
Spark's AQE/broadcast machinery turns the outer join into a broadcast
join automatically; when both sides are huge, bucketing the base table
on the key (catalog.save_bucketed) makes the merge shuffle-free on the
base side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    old_val: str,
    new_val: str,
) -> DataFrame:
    """Merge `updates(key, new_val)` into `base(key, old_val)`.

    A NULL `new_val` on a PRESENT update row is a DELETE tombstone (the
    standard CDC encoding): the key's row is closed into history and no
    current row is emitted. Returns (key, val, version, is_current):
    - untouched base rows   → (key, old_val, 1, true)
    - updated keys          → (key, old_val, 1, false) AND
                              (key, new_val, 2, true)
    - inserted keys         → (key, new_val, 1, true)
    - deleted keys          → (key, old_val, 1, false) only
    - delete of an absent key → nothing
    """
    # presence marker: a full-outer miss and a NULL tombstone value are
    # otherwise indistinguishable on the update side
    upd = updates.withColumn("__upd", F.lit(True))
    j = base.join(upd, key, "full")
    present = F.col("__upd").isNotNull()
    updated = present & F.col(old_val).isNotNull() & F.col(new_val).isNotNull()
    deleted = present & F.col(new_val).isNull()
    current = j.where(~deleted).select(
        F.col(key),
        F.coalesce(new_val, old_val).alias("val"),
        F.when(updated, F.lit(2)).otherwise(F.lit(1)).alias("version"),
        F.lit(True).alias("is_current"),
    )
    history = j.where(present & F.col(old_val).isNotNull()).select(
        F.col(key),
        F.col(old_val).alias("val"),
        F.lit(1).alias("version"),
        F.lit(False).alias("is_current"),
    )
    return current.unionByName(history)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    val: str,
) -> DataFrame:
    """Change-data-feed generation — diff two snapshots into the CDC
    batch that transforms one into the other (the third leg of the CDC
    triptych: scd2_merge applies a batch write-side, merge_on_read
    resolves one read-side, snapshot_diff DERIVES one).

    ONE full outer equi-join on the key; rows classify as:
    - insert: key only in `new`  → (key, 'insert', NULL, new_val)
    - delete: key only in `old`  → (key, 'delete', old_val, NULL)
    - update: both, val differs (NULL-safe) → (key, 'update', old, new)
    Unchanged keys are dropped — output size scales with the CHANGE
    volume, not the table, which is what makes diff-based replication
    cheap at 100 TB.
    """
    o = old.select(F.col(key).alias("__ok"), F.col(val).alias("old_val"))
    n = new.select(F.col(key).alias("__nk"), F.col(val).alias("new_val"))
    j = o.join(n, F.col("__ok") == F.col("__nk"), "full")
    change = (
        F.when(F.col("__ok").isNull(), F.lit("insert"))
        .when(F.col("__nk").isNull(), F.lit("delete"))
        .when(~F.col("old_val").eqNullSafe(F.col("new_val")), F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            F.coalesce("__ok", "__nk").alias(key),
            "change",
            "old_val",
            "new_val",
        )
    )


def merge_on_read(
    base: DataFrame,
    log: DataFrame,
    key: str,
    seq: str,
    val: str,
    op: str = "op",
) -> DataFrame:
    """Read-side CDC merge (the Iceberg/Delta merge-on-read shape):
    resolve the CURRENT view of `base` plus an unapplied change log
    WITHOUT rewriting the base files.

    `log` rows are (key, seq, val, op) with op ∈ {'upsert','delete'}
    and seq strictly increasing per key batch (base rows rank as
    seq = −∞). Latest-wins: one union + one per-key window pick —
    at 100 TB the log is a sliver of the base, and the single
    row_number window shuffles only on the key (the same partitioning
    a bucketed base already has), which is exactly why readers prefer
    this over rewriting until compaction.

    Returns (key, val) for keys whose latest operation is not a delete.
    """
    b = base.select(
        F.col(key),
        F.lit(None).cast("long").alias("__seq"),
        F.col(val).alias("__val"),
        F.lit("upsert").alias("__op"),
    )
    l = log.select(
        F.col(key),
        F.col(seq).cast("long").alias("__seq"),
        F.col(val).alias("__val"),
        F.col(op).alias("__op"),
    )
    w = Window.partitionBy(key).orderBy(F.col("__seq").desc_nulls_last())
    return (
        b.unionByName(l)
        .withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("__op") != "delete"))
        .select(F.col(key), F.col("__val").alias(val))
    )
