"""Streaming anomaly monitoring: score a live event stream against
frozen reference statistics (the streaming twin of the batch
``anomaly_zscore`` query, plans/features.py).

Production shape: the per-type moments (n, Σv, Σv²) are computed once
over a reference window by the batch pass and FROZEN; the stream is then
scored row-by-row against them. That makes the operator a stream-static
broadcast join plus narrow codegen expressions — no streaming state, no
watermark, append mode — so it runs at any input rate; re-freezing the
stats is a periodic batch job, not a streaming concern. The z arithmetic
is the same exact-integer-moments + identical-IEEE-tree recipe as the
batch query, so batch and stream scores are bitwise identical
(asserted stream(availableNow) == batch in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_stats(events: DataFrame) -> DataFrame:
    """Per-type exact integer moments over a reference (batch) window."""
    v = events.select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("v_milli")
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_milli").alias("s1"),
        F.sum(F.col("v_milli") * F.col("v_milli")).alias("s2"),
    )


def score_zscore(
    events: DataFrame, stats: DataFrame, threshold: float = 1.5
) -> DataFrame:
    """Flag events whose value is > threshold σ from their type's frozen
    mean. Works identically on a batch or streaming ``events`` relation
    (stream-static join: the stats side broadcasts)."""
    v = events.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    j = v.join(F.broadcast(stats), "event_type")
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        F.greatest(F.col("s2").cast("double") / F.col("n") - mean * mean, F.lit(0.0))
    )
    z = (F.col("v_milli").cast("double") - mean) / sd
    return (
        j.withColumn("sd", sd)
        .where((F.col("sd") > 0) & (F.abs(z) > threshold))
        .select(
            "event_id",
            "event_type",
            "v_milli",
            F.floor(z * 1000000.0).cast("long").alias("z_micro"),
        )
    )
