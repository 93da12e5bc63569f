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


def _session_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State function for :func:`closed_sessions` — module-level so the
    split-invariance property test (tests/test_properties.py) can drive
    it with a fake GroupState under arbitrary time-ordered micro-batch
    chops."""
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
    update = _session_update

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


BURST_OUTPUT_SCHEMA = (
    "event_type string, minute bigint, cnt bigint, trail bigint, "
    "is_burst boolean"
)
BURST_STATE_SCHEMA = (
    "minutes array<bigint>, counts array<bigint>, emitted_up_to bigint"
)

BURST_FACTOR = 3  # cnt*60 > FACTOR*trail, matching batch events_burst_minutes
BURST_FLOOR = 3  # absolute minimum count, matching the batch plan

_NEVER = -(1 << 62)


def _burst_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State function for :func:`finalized_burst_minutes` — module-level
    so the split-invariance property test (tests/test_properties.py) can
    drive it directly with a fake GroupState under arbitrary micro-batch
    chops, which a real stream never exercises."""
    if state.exists:
        mins, cnts, emitted = state.get
        acc = {int(m): int(c) for m, c in zip(mins, cnts)}
    else:
        acc, emitted = {}, _NEVER
    for pdf in pdfs:
        for m, c in (pdf["ts_us"] // 60_000_000).value_counts().items():
            m = int(m)
            acc[m] = acc.get(m, 0) + int(c)
    mx = max(acc)
    rows = []
    for m in sorted(acc):
        if emitted < m <= mx - 60:
            cnt = acc[m]
            trail = sum(c for mm, c in acc.items() if m - 59 <= mm <= m)
            rows.append(
                (key[0], m, cnt, trail, cnt >= BURST_FLOOR
                 and cnt * 60 > BURST_FACTOR * trail)
            )
            emitted = m
    # prune: the next finalizable minute is > emitted, so only minutes
    # inside its furthest trailing reach (emitted - 59 + 1) still matter
    keep = sorted(m for m in acc if m > emitted - 60)
    state.update((keep, [acc[m] for m in keep], emitted))
    yield pd.DataFrame(
        rows,
        columns=["event_type", "minute", "cnt", "trail", "is_burst"],
    )


def finalized_burst_minutes(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``events_burst_minutes`` capacity
    query: per event type, every FINALIZED minute with its count, its
    trailing-hour sum and the burst verdict (cnt ≥ 3 and cnt·60 >
    3·trail — the identical integer predicate).

    A minute finalizes when an event ≥ 60 minutes newer arrives for the
    same type: from then on its trailing window can no longer grow, so
    the verdict is emit-once-correct (append mode). State per key is the
    trailing ≤ 120 minute→count pairs plus the emission high-water mark
    — bounded by the clock, not the event volume, the same state-sizing
    argument as the built-in watermarked windows. Batch equivalence
    (asserted in tests): one availableNow pass emits exactly the batch
    minute rows at least 60 minutes older than each type's newest
    minute; a hypothesis property pins emissions as invariant under any
    micro-batch split of the input.
    """
    update = _burst_update

    from pyspark.sql import functions as F

    with_us = events.select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    return with_us.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 state-v2 API): streaming ingest dedup
# ---------------------------------------------------------------------------

DEDUP_OUTPUT_SCHEMA = "content_sha string, keep_id bigint"

# One day of processing-time TTL: at ingest scale the digest state would
# otherwise grow monotonically with corpus size; a TTL turns the operator
# into "dedup against the trailing window the state store can hold" —
# the standard trade for infinite streams. Tests use a single
# availableNow pass, well inside any TTL, so the differential is exact.
DEDUP_TTL_MS = 24 * 3600 * 1000


class FirstSeenDedup:
    """StatefulProcessor: emit each content digest's FIRST document only.

    The transformWithState (state v2) face of `dedup_exact`: keyed by
    content digest, a ValueState cell remembers the kept doc_id; later
    arrivals of the same digest emit nothing. Within one micro-batch the
    kept id is min(doc_id) — deterministic under any Arrow chunking of
    the group — so a single availableNow pass over a static corpus
    emits exactly the batch `exact_dedup` keep set. State is per-key in
    the RocksDB state store (transformWithState requires that provider):
    checkpointed, partitioned with the digest shuffle, evicted by TTL —
    the three properties that let the operator run unbounded at ingest
    scale.

    Class is defined WITHOUT the StatefulProcessor base so importing this
    module never hard-depends on the state-v2 API; `streaming_dedup`
    asserts the ABC contract at call time (duck-typed: the executor only
    calls init/handleInputRows/close).
    """

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._seen = handle.getValueState(
            "seen", "keep_id bigint", ttlDurationMs=DEDUP_TTL_MS
        )

    def handleInputRows(self, key, rows, timerValues):
        best = None
        for pdf in rows:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None or m < best else best
        if best is None or self._seen.exists():
            yield pd.DataFrame({"content_sha": [], "keep_id": []})
        else:
            self._seen.update((best,))
            yield pd.DataFrame({"content_sha": [key[0]], "keep_id": [best]})

    def close(self) -> None:
        pass


def streaming_dedup(docs: DataFrame) -> DataFrame:
    """First-seen exact dedup over a document stream.

    ``docs`` needs (doc_id, text); the digest is computed in-plan
    (JVM-side sha256, same expression as operators/dedup.content_digest)
    so the shuffle key exists before the Python boundary and the state
    partitioning follows it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # register the ABC relationship lazily (see class docstring)
    if not issubclass(FirstSeenDedup, StatefulProcessor):
        StatefulProcessor.register(FirstSeenDedup)

    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("content_sha"), F.col("doc_id")
    ).groupBy("content_sha")
    return keyed.transformWithStateInPandas(
        statefulProcessor=FirstSeenDedup(),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )
