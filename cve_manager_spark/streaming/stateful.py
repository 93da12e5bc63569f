"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.7 extension surface).

Built-in windows cover time-bucketed state; this is the escape hatch for
operator state Spark doesn't ship — running per-key aggregates, custom
sessionization, decaying counters. State lives in the state store
(checkpointed, partitioned by key), so it scales with keys/executors and
survives restarts; the pandas batches keep the Python boundary
Arrow-vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n bigint, sum_value double"
STATE_SCHEMA = "n bigint, sum_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user, emitted on every update.

    Batch equivalent: groupBy(user_id).agg(count, sum) — asserted equal in
    tests (single availableNow pass ⇒ final state == batch aggregate).
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sum_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, n_events bigint, dur_us bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"

GAP_US = 1_800_000_000  # 30 minutes, matching the batch sessionize_stats


def closed_sessions(events: DataFrame) -> DataFrame:
    """Gap-based sessionizer emitting CLOSED sessions only.

    A session closes when a later event for the same user arrives more
    than 30 minutes after the session's last event; the still-open
    session stays in the state store (checkpointed, per-key) until a
    future batch closes it. This is the custom-operator form of the
    batch ``sessionize_stats`` plan: within each micro-batch the group's
    rows sort by (ts, event_id) — the same deterministic order the batch
    windows use — so after a single availableNow pass the emitted rows
    equal the batch sessions minus each user's final (open) session.
    Timestamps stay integer microseconds end-to-end.
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        start, last, n = state.get if state.exists else (None, None, 0)
        out_start, out_n, out_dur = [], [], []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        for ts in pdf["ts_us"].tolist():
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > GAP_US:
                out_start.append(start)
                out_n.append(n)
                out_dur.append(last - start)
                start, last, n = ts, ts, 1
            else:
                last = ts
                n += 1
        state.update((start, last, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_start),
                "session_start_us": out_start,
                "n_events": out_n,
                "dur_us": out_dur,
            }
        )

    from pyspark.sql import functions as F

    with_us = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
