"""Skew mitigation operators (SURVEY §4.2 / BASELINE 100 TB design note).

A skewed key funnels one partition through one task; at 100 TB one key
with 1% of the fact table is a multi-TB task that stalls the stage.
Two classic fixes live here, both result-invariant and deterministic:

``salted_agg`` — two-phase aggregation for a skewed GROUP BY key:

    phase 1: groupBy(key, salt) partial-aggregate  (spreads the hot key
             over `buckets` tasks)
    phase 2: groupBy(key) combine the partials

Results are identical to the direct aggregation for any associative
aggregate — and with exact-decimal sums they are *bitwise* identical,
which the driver oracle verifies (plans/relational.py:agg_salted).

``salted_join`` — salted equi-join for a skewed JOIN key (AQE's
skew-join splitting handles *sort-merge* skew after the fact; salting
removes it by construction and also covers shuffle-hash joins):

- the LARGE (skewed) side gets a deterministic salt in [0, buckets);
- the SMALL side is replicated ``buckets``× with an exploded salt
  sequence;
- the join key becomes (key, salt), so the hot key's rows spread over
  ``buckets`` reducers, each joining against its own copy of the small
  side's matching rows.

Each large-side row meets each matching small-side row exactly once (at
its own salt), so the unsalted SQL is the oracle
(plans/features.py:join_salted); the hot-key differential lives in
tests/test_scale_hardening.py. Cost: the small side inflates
``buckets``× — the explicit trade against reducer skew.

``salt_column`` uses a deterministic hash of row-unique columns rather
than rand(): re-runs and speculative task retries must land rows in the
same salt bucket or results become nondeterministic under retry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


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
    salted = df.withColumn(SALT, salt_column(F.col(unique_col), buckets))
    phase1 = salted.groupBy(*keys, SALT).agg(
        *[b().alias(f"__p_{name}") for name, b in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )
    return phase2


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Column,
    *,
    salt_cols: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` (skewed side) to ``small`` on ``on`` with the salt
    folded into the join key. ``salt_cols`` are columns of ``large`` whose
    hash spreads the hot key (use high-cardinality tie-breakers).

    Result-invariant vs the unsalted join ONLY for join types where
    unmatched ``small`` rows are never emitted: the small side is
    replicated once per bucket, so under right/full outer an unmatched
    small row would surface ``buckets`` times. Those types are rejected
    (flip the sides or use AQE skew-join for outer-preserving the small
    side)."""
    normalized = how.replace("_", "").lower()
    if normalized in {"right", "rightouter", "full", "fullouter", "outer", "cross"}:
        raise ValueError(
            f"salted_join: how={how!r} would emit each unmatched small-side "
            "row once per salt bucket; use inner/left/semi/anti, or make "
            "the preserved side the large one"
        )
    l_salted = large.withColumn(
        SALT, F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)).cast("int")
    )
    s_salted = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    cond = on & (l_salted[SALT] == s_salted[SALT])
    return l_salted.join(s_salted, cond, how).drop(SALT)
