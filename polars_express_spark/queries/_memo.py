"""Bounded per-application memo for materialized intermediate frames.

Several query families share expensive intermediates — the shingle
arrays, the verified jaccard pair frame, the exact cosine top-k, the ANN
bucket/assignment tables. Each is the local-mode stand-in for a
persisted inter-stage table in the 100 TB design, so it is materialized
ONCE per (application, dataset, params) and every consumer reads the
materialization.

The round-3 version was a pair of module-level dicts with no eviction:
harmless over a bench run, an executor-storage leak over a long server
lifetime with many datasets (ADVICE r3). This is the one LRU-bounded
store both query families now use:

- each entry remembers the SparkSession that built it; entries whose
  SparkContext has been STOPPED are dropped on the next access (test
  suites and repeated server runs create fresh sessions in one
  process). Entries of other live sessions are left alone, so two
  concurrent sessions never thrash each other's memos;
- at most ``capacity`` frames are held; overflow evicts the least
  recently used entry and best-effort ``unpersist()``s it. For
  ``cache()``d frames that frees the storage immediately; for
  ``localCheckpoint``ed frames the blocks are released by Spark's
  ContextCleaner once the evicted reference is garbage collected —
  either way storage is bounded by ``capacity``, not by the number of
  (dataset, params) combinations ever seen;
- ``release(sf_dir)`` drops every entry for one dataset explicitly
  (server hook for dataset deletion / reload);
- all mutation happens under one lock — the stated use case includes a
  threaded HTTP server, and the eviction loops iterate the store.

persist='checkpoint' → lazy ``localCheckpoint``: truncates lineage and
survives an external ``spark.catalog.clearCache()`` (the bench issues
one between queries). persist='cache' → plain ``cache()`` for frames
whose lineage is cheap but recompute is not.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable


def _is_stopped(spark) -> bool:
    """True iff the session's SparkContext has been stopped.

    ``SparkContext.stop()`` nulls ``_jsc``; a probe that only reads the
    attribute never launches jobs and cannot raise on a live context.
    """
    try:
        return spark.sparkContext._jsc is None
    except Exception:
        return True


class FrameMemo:
    def __init__(self, capacity: int = 24):
        self.capacity = capacity
        self._lock = threading.Lock()
        #: key -> (DataFrame, owning SparkSession)
        self._entries: OrderedDict[tuple, tuple] = OrderedDict()

    def get(self, spark, key: tuple, build: Callable, persist: str = "checkpoint"):
        """Return the memoized frame for `key`, building it on first use.

        LIFETIME CONTRACT (ADVICE r5): a returned handle is guaranteed
        valid only until the entry is evicted — eviction unpersists, and
        for localCheckpoint'd frames lineage is truncated, so a held
        handle may fail with missing checkpoint blocks rather than
        recompute. Consumers must either use the frame within the query
        that fetched it (every current caller does) or size `capacity`
        above the working set; long-lived pins should copy via
        .localCheckpoint() of their own.
        """
        app = spark.sparkContext.applicationId
        full = (app, *key)
        with self._lock:
            # drop only entries whose owning session is actually dead —
            # concurrent live sessions keep their memos (ADVICE r4)
            for k, (_, owner) in [(k, v) for k, v in self._entries.items()]:
                if _is_stopped(owner):
                    self._evict(k)
            if full in self._entries:
                self._entries.move_to_end(full)
                return self._entries[full][0]
            while len(self._entries) >= self.capacity:
                self._evict(next(iter(self._entries)))
        # build OUTSIDE the lock: plan construction can be slow and may
        # itself consult the memo (shingle frame feeding the pair frame)
        df = build()
        df = df.localCheckpoint(eager=False) if persist == "checkpoint" else df.cache()
        with self._lock:
            if full not in self._entries:  # lost a race: keep the first build
                # re-check capacity at insert: concurrent misses all pass
                # the pre-build eviction loop, so without this the store
                # could exceed its bound by the number of racing threads
                while len(self._entries) >= self.capacity:
                    self._evict(next(iter(self._entries)))
                self._entries[full] = (df, spark)
            return self._entries[full][0]

    def _evict(self, key: tuple) -> None:  # caller holds the lock
        df, _ = self._entries.pop(key)
        try:
            # localCheckpoint'd frames: DataFrame.unpersist() is a
            # CacheManager call that does NOT free the checkpoint RDD's
            # blocks — without this they linger until Python GC releases
            # the py4j handle and the ContextCleaner runs (measured: ~2s
            # after an explicit gc, unbounded lag without one). Unpersist
            # the LogicalRDD's internal RDD directly so executor storage
            # is promptly bounded by `capacity`.
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:
            pass
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass

    def release(self, token=None) -> None:
        """Drop entries whose key mentions `token` (e.g. an sf_dir); all if None.

        String tokens match by substring against string key elements, so
        releasing a lake base_dir also drops memos keyed on dataset paths
        under it (and trailing-slash variants) — the DataLake mutation
        hook relies on this (catalog.py:_invalidate_memos)."""
        with self._lock:
            for k in list(self._entries):
                if token is None or token in k or (
                    isinstance(token, str)
                    and any(isinstance(e, str) and token.rstrip("/") in e for e in k)
                ):
                    self._evict(k)

    def __len__(self) -> int:
        return len(self._entries)


#: process-wide store shared by the pipeline / similarity query families
FRAMES = FrameMemo()
