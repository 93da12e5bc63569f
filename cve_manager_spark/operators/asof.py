"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts within the same key (inclusive).

The reference has no such operator (SURVEY §2.5 notes the absence); it's
table stakes for event/feature pipelines ("last click before purchase",
"latest score before date").

Implementation is the union+window formulation, not a per-row lookup:

    tag left/right → unionByName → window last(right_val, ignorenulls)
        over (partition key ORDER BY ts, side) → keep left rows

One shuffle on the key, state linear in partition size — this is the
shape that survives 100 TB, unlike a correlated subquery (per-row probe)
or a range cross-join (quadratic). Ties (equal ts) resolve
right-before-left via the side marker, giving inclusive <= semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Append ``asof_<col>`` columns from the latest right row at-or-before
    each left row's timestamp, per ``on`` key.

    value_cols: right columns to carry (default: all but key/ts).
    tie_break: optional unique right column ordering rows with equal ts
               (last one wins), for fully deterministic output.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
    )
    # align schemas: left gets null right-value cols, right gets null left cols
    for c in value_cols:
        lhs = lhs.withColumn(f"__rv_{c}", F.lit(None).cast(rhs.schema[c].dataType))
    rhs2 = rhs.select(
        on,
        "__ts",
        "__side",
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    )
    for c in lhs.columns:
        if c not in rhs2.columns:
            rhs2 = rhs2.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    unioned = lhs.unionByName(rhs2)

    # (ts, side, tie_break): at equal ts every right row (side 0) precedes
    # the left row (side 1) → inclusive <=; among equal-ts right rows the
    # tie-break orders them so "last one wins" is well-defined.
    order: list[Column] = [F.col("__ts"), F.col("__side")]
    if tie_break is not None and tie_break in unioned.columns:
        order.append(F.col(tie_break))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.last(f"__rv_{c}", ignorenulls=True).over(w))
    keep = [c for c in left.columns] + [f"asof_{c}" for c in value_cols]
    return out.where(F.col("__side") == 1).select(*keep)
