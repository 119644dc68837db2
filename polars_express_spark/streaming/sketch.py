"""Streaming sketch maintenance (§2.9 + §2.10 sketch family): fold an
unbounded stream into a bounded count-min sketch, one micro-batch at a
time.

Why this shape: a sketch is a commutative monoid (cms_merge is
associative + commutative with the empty sketch as identity), which is
exactly the algebra foreachBatch needs for exactly-once-per-batch
incremental aggregation WITHOUT keeping unbounded state in the stream:
each micro-batch is folded by the same partial→final aggregate as
batch (cms_update on the batch frame — fully distributed), and only
the ≤ d·w finished counters cross to the accumulator. The golden
contract (tests/test_streaming.py) is the monoid law itself: streaming
the table in K micro-batches and merging must equal one batch sketch —
bit-for-bit, since counters are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from polars_express_spark.operators.cms import cms_update


class StreamingCms:
    """Driver-held accumulator: dict[(row, bucket)] -> count. Bounded at
    d·w entries by construction — the collect-safe sketch class (same
    boundary argument as the IVF centroid and Bloom bitmap collects)."""

    def __init__(self, col: str, depth: int = 4, width: int = 2048):
        self.col, self.depth, self.width = col, depth, width
        self.counters: dict[tuple[int, int], int] = {}

    def absorb(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch into the sketch."""
        sk = cms_update(batch_df, self.col, depth=self.depth, width=self.width)
        for r in sk.collect():
            k = (r["i"], r["b"])
            self.counters[k] = self.counters.get(k, 0) + r["cnt"]

    def estimate(self, item_hashes: list[tuple[int, int]]) -> int:
        """Point query over pre-computed (row, bucket) probe positions."""
        return min(self.counters.get(k, 0) for k in item_hashes)


def stream_cms(
    stream: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    checkpoint: str | None = None,
) -> tuple[StreamingCms, "object"]:
    """Attach a StreamingCms accumulator to a stream via foreachBatch
    and run it to completion (availableNow). Returns (sketch, query).
    Without `checkpoint`, Spark uses a session-temp checkpoint dir —
    fine for the golden harness; pass one for durable restart."""
    acc = StreamingCms(col, depth=depth, width=width)
    w = stream.writeStream.foreachBatch(acc.absorb).trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    return acc, q
