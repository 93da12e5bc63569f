"""Stream-stream interval join (SURVEY §2.7 extension): correlate two
event streams within a bounded time window — the attribution shape
("clicks within the hour before each purchase") every event pipeline
needs.

Structured Streaming requirements encoded here: BOTH sides carry a
watermark and the join condition bounds event time on BOTH ends
(equality key + closed time interval). That pair of constraints is what
lets the engine expire state: a buffered click can be dropped once the
watermark passes click_ts + lookback, so state is O(traffic × lookback),
not unbounded. The same builder runs on batch DataFrames (watermarks
skipped) — one definition, two execution modes, asserted equivalent in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchase(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Each purchase joined to the same user's clicks in the trailing
    ``lookback`` interval (inclusive bounds). Inputs are event streams or
    batch frames with (event_id, ts, user_id, event_type) columns."""
    p = purchases.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = clicks.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {lookback}"))
        & (c.c_ts <= p.p_ts)
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "p_ts", "click_id", "c_ts"
    )


def clicks_attribution_outer(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER variant: every purchase, attributed clicks or not.

    The outer side is the semantics inner joins can't give — "purchases
    with NO preceding click" is the conversion-funnel denominator — and
    in streaming it is watermark-DRIVEN: a purchase's null row can only
    emit once the click watermark passes p_ts, because until then a
    matching click may still arrive. State cost is identical to the
    inner join (both sides buffered for lookback + watermark); the
    difference is purely emission timing, pinned by the differential in
    tests/test_streaming.py: matched rows equal the batch join
    everywhere, null rows appear exactly for purchases the watermark
    has finalized.
    """
    p = purchases.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = clicks.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {lookback}"))
        & (c.c_ts <= p.p_ts)
    )
    return p.join(c, cond, "left_outer").select(
        "purchase_id", "user_id", "p_ts", "click_id", "c_ts"
    )
