"""Skew mitigation operators (SURVEY §4.2 / BASELINE 100 TB design note).

AQE's skew-join splitting handles join-side skew automatically, but a
skewed *aggregation* key (one giant group) still funnels one partition
through one task. ``salted_agg`` is the classic two-phase fix:

    phase 1: groupBy(key, salt) partial-aggregate  (spreads the hot key
             over `buckets` tasks)
    phase 2: groupBy(key) combine the partials

Results are identical to the direct aggregation for any associative
aggregate — and with exact-decimal sums they are *bitwise* identical,
which the driver oracle verifies (plans/relational.py:agg_salted).

``salt_column`` uses a deterministic hash of a row-unique column rather
than rand(): re-runs and speculative task retries must land rows in the
same salt bucket or results become nondeterministic under retry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(unique_col: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of a row-unique column.
    (rand() would break determinism under task retry/speculation.)"""
    return F.pmod(F.xxhash64(unique_col), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    unique_col: str,
    aggs: dict[str, Callable[[], Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name → zero-arg builder returning the
    phase-1 aggregate expression; phase 2 combines with SUM (valid for
    sum/count-style aggregates — min/max work too since min of mins is
    min; pass the matching combiner semantics via the same builder).
    """
    salted = df.withColumn("__salt", salt_column(F.col(unique_col), buckets))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[b().alias(f"__p_{name}") for name, b in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )
    return phase2
