"""Incremental aggregate maintenance — materialized-view refresh
(§2.4 lake/warehouse family, beside SCD2/merge-on-read: those maintain
ROWS incrementally, this maintains AGGREGATES incrementally).

The delta rule for distributive aggregates: for a view
`SELECT keys, count(*), sum(x) GROUP BY keys`, a new data batch can be
folded into the stored state with one aggregate OVER THE BATCH plus one
key-partitioned outer merge — cost proportional to the batch, never a
recompute of the base. Counts and decimal-exact sums are associative
and commutative, so maintained state ≡ full recompute EXACTLY (the
registered q_incr_agg hashes that equality against a recompute oracle).
min/max are also foldable for inserts; deletes would need retractable
aggregates (counts/sums subtract; min/max do not) — out of scope here
and documented, matching every production incremental-view engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_agg_states(
    state: DataFrame, delta_state: DataFrame, keys: list[str], agg_cols: list[str]
) -> DataFrame:
    """Fold a batch's aggregate state into the stored state.

    Both inputs carry `keys` + `agg_cols` (counts / decimal sums —
    anything associative under +). Full outer join on the keys,
    column-wise coalesce-add; new keys appear, untouched keys pass
    through. ONE key-partitioned join — at scale the stored state is
    bucketed by the keys and the delta is broadcast-size.
    """
    d = delta_state
    for c in keys + agg_cols:
        d = d.withColumnRenamed(c, f"__d_{c}")
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__d_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = state.join(d, cond, "full")
    zero = F.lit(0)
    return j.select(
        *[F.coalesce(F.col(k), F.col(f"__d_{k}")).alias(k) for k in keys],
        *[
            (F.coalesce(F.col(c), zero) + F.coalesce(F.col(f"__d_{c}"), zero)).alias(c)
            for c in agg_cols
        ],
    )
