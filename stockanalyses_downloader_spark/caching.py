"""Persist lifecycle tracking for query-path caches.

Several operators persist() mid-plan because one frame feeds multiple
consumers (LSH bands feed both sides of a self-join; IVF lists feed
the candidate side and the list-size aggregate). persist() is the
right call DURING a query, but the handles outlive the query: a
long-lived session sweeping the whole registry would accumulate
cached blocks until LRU eviction churn sets in.

Contract: operators route every query-path persist through
``tracked_persist``; a harness that runs many queries in one session
calls ``release_tracked()`` after materializing each query's result
(bench.py does; the registry sweep test pins that the storage
footprint returns to baseline). Releasing is safe once the consumer
has collected/written the result — unpersist on a consumed frame
only drops cache blocks, never data.

Not tracked here: ``localCheckpoint`` frames (graph.py's iterative
connected components, kmeans' per-iteration barrier). Those HOLD the
result data (checkpoint truncates lineage — unpersisting one before
the caller consumes it would lose the frame), so their lifetime is
correctly tied to the result DataFrame's lifetime: Spark's
ContextCleaner frees the blocks when the frame is garbage-collected.
The superseded per-iteration checkpoints inside those loops are
already freed eagerly by the loop itself where safe (kmeans'
``cent.unpersist()``).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                    ) -> DataFrame:
    """persist() with session-level lifetime tracking (see module
    docstring). Lazy, exactly like bare persist()."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False: async block
    drop, same as bare unpersist). Returns how many were released.
    Idempotent; unpersisting an already-unpersisted frame is a
    no-op in Spark."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session already stopped
            pass
    return n


def release_all(spark) -> int:
    """Session-level full release: tracked persists, the SQL cache,
    AND any still-persisted RDDs (localCheckpoint blocks included —
    ``clearCache()`` alone never reaches those). Returns how many
    persisted RDDs were dropped.

    Only safe once every outstanding result has been consumed:
    localCheckpoint frames cannot recompute after their blocks are
    dropped (checkpointing truncated the lineage), so a caller still
    holding an unconsumed checkpointed DataFrame loses it. This is
    the harness-level sweep hook (end of a bench run / test session),
    not a per-query call — per-query hygiene is ``release_tracked``."""
    release_tracked()
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for rdd in rdds:
        try:
            rdd.unpersist()
        except Exception:  # noqa: BLE001
            pass
    return len(rdds)
