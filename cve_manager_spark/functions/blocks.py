"""Deterministic cleanup of dead localCheckpoint/persist blocks.

ContextCleaner only reclaims out-of-scope RDD blocks when a driver GC
happens to run (the periodic-GC safety net in session.STATIC_CONF bounds
the lag to minutes), so operators that checkpoint per round/per batch
otherwise hold every superseded generation's blocks — storage that
competes with execution memory (optimization guide §5) and, measured
locally, inflates whatever queries run next. These helpers let an
operator free blocks the moment they are provably dead.

An unpersisted local checkpoint is unrecoverable BY DESIGN: re-reading
it fails loudly (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), never silently
recomputes stale data — so a wrong id set is a crash, not a wrong
answer.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently marked persistent (registered at
    persist/localCheckpoint call time, before materialization)."""
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Free the blocks of the given persistent RDD ids (non-blocking).

    Callers may only pass ids whose data no live DataFrame can ever
    re-read — superseded iteration state, or scope-local pins whose
    consumers have all completed.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


@contextmanager
def scoped_checkpoint_blocks(spark: SparkSession) -> Iterator[None]:
    """Free every RDD persisted inside the scope when it exits.

    For code whose checkpoints are pins local to the scope (a streaming
    micro-batch's delta, pinned before a state write and dead once the
    batch's writes complete): everything the scope registered is
    unpersisted on exit, success or raise.
    """
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        unpersist_rdd_ids(spark, persistent_rdd_ids(spark) - before)
