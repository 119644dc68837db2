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
    boundary argument as the IVF centroid and Bloom bitmap collects).

    Exactly-once: foreachBatch is AT-LEAST-once — after a checkpoint
    restart Spark re-delivers the last uncommitted batch — so absorb()
    is idempotent per batch_id (the standard foreachBatch pattern:
    batch ids are monotonically increasing and stable across restarts).
    For restarts of the DRIVER PROCESS itself, snapshot()/restore()
    round-trip the full accumulator state; persist the snapshot in the
    same transaction as your sink writes and the sketch resumes exactly
    (the golden suite proves snapshot → restore → continue ≡ one
    uninterrupted run)."""

    def __init__(self, col: str, depth: int = 4, width: int = 2048):
        self.col, self.depth, self.width = col, depth, width
        self.counters: dict[tuple[int, int], int] = {}
        self._last_batch: int = -1

    def absorb(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch into the sketch.
        A re-delivered batch_id (restart replay) is a no-op."""
        if batch_id <= self._last_batch:
            return
        sk = cms_update(batch_df, self.col, depth=self.depth, width=self.width)
        for r in sk.collect():
            k = (r["i"], r["b"])
            self.counters[k] = self.counters.get(k, 0) + r["cnt"]
        self._last_batch = batch_id

    def estimate(self, item_hashes: list[tuple[int, int]]) -> int:
        """Point query over pre-computed (row, bucket) probe positions."""
        return min(self.counters.get(k, 0) for k in item_hashes)

    def snapshot(self) -> dict:
        """JSON-serializable full state (≤ d·w counter entries)."""
        return {
            "col": self.col,
            "depth": self.depth,
            "width": self.width,
            "last_batch": self._last_batch,
            "counters": [[i, b, c] for (i, b), c in sorted(self.counters.items())],
        }

    @classmethod
    def restore(cls, state: dict) -> "StreamingCms":
        acc = cls(state["col"], depth=state["depth"], width=state["width"])
        acc.counters = {(i, b): c for i, b, c in state["counters"]}
        acc._last_batch = state["last_batch"]
        return acc


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


class StreamingBloomDedup:
    """Approximate stream dedup in FIXED memory (the web-crawl /
    trillion-token pattern: dedup URLs or fingerprints across an
    unbounded stream where an exact key set cannot fit anywhere).

    The accumulator is one m-bit Bloom bitmap (m/64 longs on the
    driver, OR-merged per batch — blooms form the same commutative
    monoid as the CMS counters). Per micro-batch, executor-side:
    exact dropDuplicates WITHIN the batch, then the JVM bit-test
    predicate drops keys probably seen in ANY earlier batch.

    Contract (golden-tested): true duplicates NEVER survive (a key,
    once inserted, always tests positive), so survivors ⊆ first
    occurrences; a false positive can drop a genuinely new key with
    probability ≈ the bloom fp rate — the documented trade for O(m)
    state. Use exact incremental_dedup (streaming/windows.py) when the
    key set fits; use this when it can't.

    Exactly-once: absorb() is idempotent per batch_id (foreachBatch is
    at-least-once; a restart-replayed batch must not re-emit survivors
    or re-OR an already-merged bitmap — the merge is idempotent but the
    SINK call is not). snapshot()/restore() round-trip the bitmap +
    high-water mark for driver-process restarts; persist alongside the
    sink transaction.
    """

    def __init__(
        self, key: str, num_bits: int = 1 << 16, num_hashes: int = 5, sink_fn=None
    ):
        from polars_express_spark.operators.bloom import BloomFilter

        num_bits = max(64, (num_bits + 63) // 64 * 64)
        self.key = key
        self._bf = BloomFilter(tuple([0] * (num_bits // 64)), num_bits, num_hashes)
        # survivors flow to sink_fn(DataFrame, batch_id) when given (the
        # production path — write to the lake, never the driver); the
        # default driver list is the golden-test convenience only
        self._sink_fn = sink_fn
        self.survivors: list = []
        self._last_batch: int = -1

    def snapshot(self) -> dict:
        """JSON-serializable full state (m/64 longs + params)."""
        return {
            "key": self.key,
            "num_bits": self._bf.num_bits,
            "num_hashes": self._bf.num_hashes,
            "last_batch": self._last_batch,
            "words": list(self._bf.words),
        }

    @classmethod
    def restore(cls, state: dict, sink_fn=None) -> "StreamingBloomDedup":
        from polars_express_spark.operators.bloom import BloomFilter

        acc = cls(
            state["key"],
            num_bits=state["num_bits"],
            num_hashes=state["num_hashes"],
            sink_fn=sink_fn,
        )
        acc._bf = BloomFilter(
            tuple(state["words"]), state["num_bits"], state["num_hashes"]
        )
        acc._last_batch = state["last_batch"]
        return acc

    def absorb(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from polars_express_spark.operators.bloom import (
            BloomFilter,
            bloom_build,
            bloom_might_contain,
        )

        if batch_id <= self._last_batch:  # restart replay — already folded
            return
        batch = batch_df.dropDuplicates([self.key])
        # ship the bitmap as a broadcast 1-row FRAME (same shape as
        # bloom_pruned_join): read from data it's a per-partition
        # constant, where the inline-array-literal default would rebuild
        # the m/64-element CreateArray per row (bloom.py:97-102)
        wdf = batch_df.sparkSession.createDataFrame(
            [(list(self._bf.words),)], "__bloom_words array<bigint>"
        )
        fresh = (
            batch.crossJoin(F.broadcast(wdf))
            .where(
                ~bloom_might_contain(self._bf, self.key, words=F.col("__bloom_words"))
                | F.col(self.key).isNull()  # NULL keys pass through untracked
            )
            .drop("__bloom_words")
        )
        if self._sink_fn is not None:
            self._sink_fn(fresh, batch_id)
        else:
            self.survivors.extend(fresh.collect())
        add = bloom_build(
            batch, self.key, num_bits=self._bf.num_bits, num_hashes=self._bf.num_hashes
        )
        merged = tuple(a | b for a, b in zip(self._bf.words, add.words))
        self._bf = BloomFilter(merged, self._bf.num_bits, self._bf.num_hashes)
        self._last_batch = batch_id


def stream_bloom_dedup(
    stream: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    checkpoint: str | None = None,
    sink_fn=None,
) -> tuple[StreamingBloomDedup, "object"]:
    """Run a stream through the fixed-memory Bloom dedup to completion
    (availableNow). Returns (accumulator, query)."""
    acc = StreamingBloomDedup(
        key, num_bits=num_bits, num_hashes=num_hashes, sink_fn=sink_fn
    )
    w = stream.writeStream.foreachBatch(acc.absorb).trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    return acc, q


# ---------------------------------------------------------------------------
# Durable accumulator state (r8, VERDICT r7 next-step #6): snapshot()
# landed in r7 with in-memory goldens only — the missing piece was
# persisting the snapshot WITH the sink write so a driver-process crash
# can restore from the lake and continue exactly. The transaction story
# is ordering + idempotence, not atomicity: the snapshot lands AFTER the
# batch's idempotent data write, so whichever side a crash falls on, the
# replayed batch reconciles it —
#   crash BEFORE the snapshot: restored state has last_batch = k-1, the
#     replay re-folds batch k and rewrites its (dynamic-overwrite)
#     partition with identical content;
#   crash AFTER the snapshot: restored state has last_batch = k, the
#     replay is an accumulator no-op and the partition rewrite is a
#     no-op too.
# Either way the lake and the sketch agree after the replay — the same
# argument Structured Streaming's own sink/checkpoint pairing makes.
# ---------------------------------------------------------------------------


def _state_path(lake, data_id: str) -> str:
    import os

    return os.path.join(lake.base_dir, f"{data_id}.state.json")


def persist_state(lake, data_id: str, state: dict) -> None:
    """Atomically persist an accumulator snapshot next to its dataset
    (<base>/<data_id>.state.json): write-temp + os.replace, so readers
    never observe a torn file even if the process dies mid-write."""
    import json
    import os

    os.makedirs(lake.base_dir, exist_ok=True)
    path = _state_path(lake, data_id)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def load_state(lake, data_id: str) -> dict | None:
    """Read a persisted snapshot, or None if the dataset has none yet."""
    import json

    try:
        with open(_state_path(lake, data_id)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def durable_foreach_batch(lake, data_id: str, acc, fmt: str = "parquet",
                          write_raw: bool = False):
    """foreachBatch hook factory pairing an accumulator with the lake:
    per micro-batch it (1) optionally writes the RAW batch through
    write_batch_idempotent (for accumulators like StreamingCms that
    only fold state — survivor-emitting accumulators instead write
    through their own sink_fn), (2) runs ``acc.absorb``, then (3)
    persists ``acc.snapshot()`` atomically. See the ordering/idempotence
    argument above for why this is restart-exact."""
    from polars_express_spark.streaming.windows import write_batch_idempotent

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        if write_raw:
            write_batch_idempotent(lake, data_id, fmt, batch_df, batch_id)
        acc.absorb(batch_df, batch_id)
        persist_state(lake, data_id, acc.snapshot())

    return hook


def durable_bloom_dedup(lake, data_id: str, key: str, fmt: str = "parquet",
                        num_bits: int = 1 << 16, num_hashes: int = 5):
    """(accumulator, hook) for a lake-durable streaming Bloom dedup:
    survivors land idempotently in ``<data_id>.<fmt>`` partitions, the
    bitmap snapshot rides ``<data_id>.state.json``, and CONSTRUCTION
    RESTORES from an existing snapshot — so after a driver crash, simply
    rebuilding this object over the same lake resumes the stream exactly
    where the last completed batch left it (golden: crash-at-batch-k →
    rebuild → replay ≡ one uninterrupted run)."""
    from polars_express_spark.streaming.windows import write_batch_idempotent

    def sink_fn(df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(lake, data_id, fmt, df, batch_id)

    state = load_state(lake, data_id)
    if state is not None:
        if state["key"] != key:
            raise ValueError(
                f"snapshot at {_state_path(lake, data_id)!r} tracks key "
                f"{state['key']!r}, not {key!r}"
            )
        acc = StreamingBloomDedup.restore(state, sink_fn=sink_fn)
    else:
        acc = StreamingBloomDedup(
            key, num_bits=num_bits, num_hashes=num_hashes, sink_fn=sink_fn
        )
    return acc, durable_foreach_batch(lake, data_id, acc, fmt=fmt)


class StreamingQuantile:
    """Streaming quantile estimation in FIXED memory with a RELATIVE
    error guarantee (the DDSketch scheme — Masson/Rim/Lee, VLDB 2019:
    log-scale bins of ratio γ = (1+α)/(1−α); any value in bin i,
    covering (γ^(i−1), γ^i], is represented by 2γ^i/(γ+1), which is
    within α of every value in the bin). Percentile monitoring over an
    unbounded stream — p50/p95/p99 latency, price, score — where the
    exact operator (operators/quantile.py) has no finite state.

    Per micro-batch, executor-side: one partial→final groupBy over the
    bin index (a pure-codegen ceil(ln x / ln γ) expression) — only the
    ≤ max_bins finished (sign, bin, count) rows cross to the driver.
    Bin counters form the same commutative monoid as the CMS counters,
    so K micro-batches merged ≡ one batch fold, counter-for-counter
    (the golden contract). Negative values mirror into their own store;
    zeros count separately; NULL/NaN are ignored (as percentile does).

    Memory bound: each store keeps ≤ max_bins bins; overflow collapses
    the smallest-magnitude bins into the lowest kept one (DDSketch's
    collapse rule) — upper quantiles keep the α guarantee, the
    collapsed low tail degrades gracefully. α=0.01 spans double range
    in < 7100 bins/store, so the default never collapses in practice.

    Exactly-once / durability: absorb() is idempotent per batch_id;
    snapshot()/restore() round-trip the full state, composing with
    durable_foreach_batch for lake-persisted restarts like the other
    accumulators."""

    def __init__(self, col: str, alpha: float = 0.01, max_bins: int = 8192):
        if not 0.0 < alpha < 1.0:
            raise ValueError(f"alpha must be in (0, 1), got {alpha}")
        self.col, self.alpha, self.max_bins = col, alpha, max_bins
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zeros: int = 0
        self._last_batch: int = -1

    def _mid(self, i: int) -> float:
        return 2.0 * self.gamma**i / (self.gamma + 1.0)

    def _collapse(self, store: dict[int, int], highest: bool = False) -> None:
        """Bound a store at max_bins by merging overflow bins into the
        nearest survivor. The positive store collapses its LOWEST
        indices (near-zero positives); the mirrored negative store
        collapses its HIGHEST indices — those are the most-negative
        values, so both rules degrade the same far-from-typical low
        tail of the real line, matching reference DDSketch's
        highest-collapsing negative store (r10, ADVICE: the old
        lowest-index rule on the neg store degraded near-zero negative
        estimates instead). Unreachable at the default max_bins=8192
        (needs a magnitude span of gamma^8192); the direction still
        matters for small tuned budgets."""
        if len(store) <= self.max_bins:
            return
        keys = sorted(store, reverse=highest)
        overflow = len(store) - self.max_bins
        spill = sum(store.pop(k) for k in keys[:overflow])
        store[keys[overflow]] = store.get(keys[overflow], 0) + spill

    def absorb(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch. A re-delivered
        batch_id (restart replay) is a no-op."""
        import math

        from pyspark.sql import functions as F

        if batch_id <= self._last_batch:
            return
        c = F.col(self.col).cast("double")
        lg = F.lit(math.log(self.gamma))
        binned = (
            batch_df.where(c.isNotNull() & ~F.isnan(c))
            .select(
                F.when(c > 0, F.lit(1))
                .when(c < 0, F.lit(-1))
                .otherwise(F.lit(0))
                .alias("__sgn"),
                F.when(c > 0, F.ceil(F.log(c) / lg))
                .when(c < 0, F.ceil(F.log(-c) / lg))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("__bin"),
            )
            .groupBy("__sgn", "__bin")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        for r in binned.collect():
            if r["__sgn"] == 0:
                self.zeros += r["__c"]
            elif r["__sgn"] > 0:
                self.pos[r["__bin"]] = self.pos.get(r["__bin"], 0) + r["__c"]
            else:
                self.neg[r["__bin"]] = self.neg.get(r["__bin"], 0) + r["__c"]
        self._collapse(self.pos)
        self._collapse(self.neg, highest=True)
        self._last_batch = batch_id

    def count(self) -> int:
        return self.zeros + sum(self.pos.values()) + sum(self.neg.values())

    def estimate(self, q: float) -> float | None:
        """q-quantile estimate (relative error ≤ α for uncollapsed
        bins); None on an empty sketch. Rank semantics match the
        nearest-rank walk over ⌊q·(n−1)⌋."""
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0, 1], got {q}")
        n = self.count()
        if n == 0:
            return None
        rank = q * (n - 1)
        cum = 0
        for i in sorted(self.neg, reverse=True):  # most negative first
            cum += self.neg[i]
            if cum > rank:
                return -self._mid(i)
        if self.zeros:
            cum += self.zeros
            if cum > rank:
                return 0.0
        for i in sorted(self.pos):
            cum += self.pos[i]
            if cum > rank:
                return self._mid(i)
        if self.pos:  # rank == n−1 boundary
            return self._mid(max(self.pos))
        return 0.0 if self.zeros else -self._mid(min(self.neg))

    def snapshot(self) -> dict:
        """JSON-serializable full state (≤ 2·max_bins + 1 counters)."""
        return {
            "col": self.col,
            "alpha": self.alpha,
            "max_bins": self.max_bins,
            "last_batch": self._last_batch,
            "zeros": self.zeros,
            "pos": [[i, c] for i, c in sorted(self.pos.items())],
            "neg": [[i, c] for i, c in sorted(self.neg.items())],
        }

    @classmethod
    def restore(cls, state: dict) -> "StreamingQuantile":
        acc = cls(state["col"], alpha=state["alpha"], max_bins=state["max_bins"])
        acc.zeros = state["zeros"]
        acc.pos = {i: c for i, c in state["pos"]}
        acc.neg = {i: c for i, c in state["neg"]}
        acc._last_batch = state["last_batch"]
        return acc


class StreamingTopK:
    """Streaming heavy hitters (top-k items) in FIXED memory — the
    Misra–Gries summary, maintained per micro-batch through the
    mergeable-summaries construction (Agarwal et al., PODS 2012). CMS
    answers "how often did THIS item occur" but cannot enumerate the
    frequent items; this accumulator answers "WHICH items are frequent"
    over an unbounded stream with ≤ ``capacity`` counters of state.

    Per micro-batch, executor-side: one exact partial→final groupBy
    count, then TakeOrdered top-(capacity+1) by count — only those
    rows cross to the driver however wide the batch's key space is.
    The batch's Misra–Gries summary is formed by dropping the
    (capacity+1)-th count δ from every kept counter (valid: every
    dropped item's count is ≤ δ), merged into the accumulator by
    pointwise addition, and the accumulator is re-truncated the same
    way when it outgrows capacity.

    Guarantee (the MG invariant, golden-tested): for EVERY item,
    ``est ≤ true ≤ est + err`` (est = 0 when untracked), with
    ``err ≤ n / (capacity + 1)`` — so every item with true count
    > err is tracked, and ``err`` is reported honestly per sketch
    rather than assumed. When capacity covers the stream's distinct
    keys the summary is EXACT (err = 0) and K micro-batch folds equal
    one batch fold counter-for-counter — the same monoid golden as the
    CMS/HLL/DDSketch siblings.

    Exactly-once / durability: absorb() is idempotent per batch_id;
    snapshot()/restore() round-trip the full state and compose with
    durable_foreach_batch for lake-persisted driver restarts."""

    def __init__(self, col: str, capacity: int = 256):
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        self.col, self.capacity = col, capacity
        self.counters: dict = {}
        self.err: int = 0
        self._last_batch: int = -1

    def absorb(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch. A re-delivered
        batch_id (restart replay) is a no-op. NULL keys are ignored
        (they are not an item)."""
        from pyspark.sql import functions as F

        if batch_id <= self._last_batch:
            return
        rows = (
            batch_df.where(F.col(self.col).isNotNull())
            .groupBy(self.col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col(self.col).asc())
            .limit(self.capacity + 1)
            .collect()
        )
        # batch MG summary: δ = the (capacity+1)-th largest count (0
        # when the batch has ≤ capacity distinct keys — the exact case)
        delta = rows[self.capacity]["__c"] if len(rows) > self.capacity else 0
        for r in rows[: self.capacity]:
            kept = r["__c"] - delta
            if kept > 0:
                k = r[self.col]
                self.counters[k] = self.counters.get(k, 0) + kept
        self.err += delta
        self._truncate()
        self._last_batch = batch_id

    def _truncate(self) -> None:
        """Re-bound the merged summary at ``capacity`` counters by
        subtracting the (capacity+1)-th largest estimate from all and
        dropping the non-positive — each unit of err removed is paid by
        ≥ capacity+1 units of stream mass, which is what keeps the
        total at err ≤ n/(capacity+1)."""
        if len(self.counters) <= self.capacity:
            return
        cut = sorted(self.counters.values(), reverse=True)[self.capacity]
        self.counters = {k: v - cut for k, v in self.counters.items() if v > cut}
        self.err += cut

    def topk(self, m: int) -> list:
        """Top-m (item, estimate) by estimated count, ties broken by
        item for determinism. True counts sit in
        [estimate, estimate + self.err]."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return items[:m]

    def snapshot(self) -> dict:
        """JSON-serializable full state (≤ capacity counter entries)."""
        return {
            "col": self.col,
            "capacity": self.capacity,
            "err": self.err,
            "last_batch": self._last_batch,
            "counters": sorted(
                ([k, v] for k, v in self.counters.items()),
                key=lambda kv: str(kv[0]),
            ),
        }

    @classmethod
    def restore(cls, state: dict) -> "StreamingTopK":
        acc = cls(state["col"], capacity=state["capacity"])
        acc.counters = {k: v for k, v in state["counters"]}
        acc.err = state["err"]
        acc._last_batch = state["last_batch"]
        return acc


def stream_topk(
    stream: DataFrame,
    col: str,
    capacity: int = 256,
    checkpoint: str | None = None,
) -> tuple[StreamingTopK, "object"]:
    """Run a stream through the Misra–Gries accumulator to completion
    (availableNow). Returns (sketch, query)."""
    acc = StreamingTopK(col, capacity=capacity)
    w = stream.writeStream.foreachBatch(acc.absorb).trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    return acc, q


def stream_quantile(
    stream: DataFrame,
    col: str,
    alpha: float = 0.01,
    max_bins: int = 8192,
    checkpoint: str | None = None,
) -> tuple[StreamingQuantile, "object"]:
    """Run a stream through the DDSketch accumulator to completion
    (availableNow). Returns (sketch, query)."""
    acc = StreamingQuantile(col, alpha=alpha, max_bins=max_bins)
    w = stream.writeStream.foreachBatch(acc.absorb).trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    return acc, q


class StreamingHll:
    """Streaming distinct-count estimation in fixed memory: one
    Datasketches HLL sketch (Spark-native hll_sketch_agg /
    hll_union_agg — the same binary family as q_hll_union's batch
    rollup) maintained across micro-batches.

    Register-max algebra makes HLL the cleanest monoid of the family:
    the union of per-batch sketches has EXACTLY the register state of a
    direct build over the concatenated stream (each register is a max,
    and max is associative/commutative/idempotent), so the streaming
    estimate equals the batch estimate — not approximately, equal (the
    golden contract). Idempotence also means a replayed batch folds to
    the same state even if it slipped past the batch_id guard.

    Per micro-batch: one distributed partial→final hll_sketch_agg; one
    ~KB binary crosses to the driver; the union with the accumulator
    runs as a 2-row Spark job (no Python datasketches dependency).
    snapshot()/restore() carry the sketch as base64 and compose with
    durable_foreach_batch like the other accumulators."""

    def __init__(self, col: str, lgk: int = 12):
        self.col, self.lgk = col, lgk
        self.sketch: bytes | None = None
        self._last_batch: int = -1

    def absorb(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if batch_id <= self._last_batch:
            return
        sk = batch_df.agg(
            F.hll_sketch_agg(self.col, F.lit(self.lgk)).alias("s")
        ).collect()[0]["s"]
        if sk is not None:
            if self.sketch is None:
                self.sketch = bytes(sk)
            else:
                spark = batch_df.sparkSession
                two = spark.createDataFrame(
                    [(bytes(self.sketch),), (bytes(sk),)], "s binary"
                )
                self.sketch = bytes(
                    two.agg(F.hll_union_agg("s").alias("u")).collect()[0]["u"]
                )
        self._last_batch = batch_id

    def estimate(self, spark) -> float:
        """Distinct-count estimate of everything absorbed so far."""
        from pyspark.sql import functions as F

        if self.sketch is None:
            return 0.0
        one = spark.createDataFrame([(bytes(self.sketch),)], "s binary")
        return float(
            one.select(F.hll_sketch_estimate("s").alias("e")).collect()[0]["e"]
        )

    def snapshot(self) -> dict:
        import base64

        return {
            "col": self.col,
            "lgk": self.lgk,
            "last_batch": self._last_batch,
            "sketch": None
            if self.sketch is None
            else base64.b64encode(self.sketch).decode("ascii"),
        }

    @classmethod
    def restore(cls, state: dict) -> "StreamingHll":
        import base64

        acc = cls(state["col"], lgk=state["lgk"])
        acc.sketch = (
            None if state["sketch"] is None else base64.b64decode(state["sketch"])
        )
        acc._last_batch = state["last_batch"]
        return acc
