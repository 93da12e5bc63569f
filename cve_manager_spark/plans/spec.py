"""QuerySpec — one registered engine query.

Each spec pairs a PySpark DataFrame builder with the ANSI-SQL oracle the
driver runs on DuckDB over the same parquet tables (row-count + schema +
order-insensitive value-hash gate, __spark_entry__.py docstring).

Determinism contract (every spec must satisfy it, or ship ``oracle=None``
for a rows-only check):
- no nondeterministic row picks: every LIMIT is preceded by a total order
  (unique tie-break key);
- no floating-point aggregation: double measures are summed as exact
  DECIMAL and cast back (functions.helpers.dec_sum) so results are
  bitwise-identical across engines AND across cluster runs;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    # Verification-queue priority: the driver hash-checks only a 50-entry
    # prefix of the registry. Specs added while older ones still await
    # their first driver verdict may carry a higher number to queue
    # BEHIND them (registry sorts by (tier, priority), stable on module
    # order); locally they are oracle-checked either way. The round-7
    # reset collapsed every priority back to 0 — tier + module order
    # alone now drives the queue; bump only if a new tranche must yield
    # to an older unverified one that module order would not protect.
    priority: int = 0
