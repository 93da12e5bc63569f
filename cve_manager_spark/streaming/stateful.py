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
