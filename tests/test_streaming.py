"""Streaming tests (SURVEY §5.2.5): stream==batch equivalence over the
testdata events via availableNow, plus a rate-source watermark smoke."""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cve_manager_spark.plans.events import window_session, window_tumbling
from cve_manager_spark.sources.testdata import load_table
from cve_manager_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_agg,
    stream_dedup,
    tumbling_agg,
)
from tests.conftest import SF_SMALL


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File streaming sources need a directory, not a bare file."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMALL}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_starts_on_empty_source_dir(spark, tmp_path):
    """A stream must be constructible against a not-yet-populated input
    directory (normal at deploy time): the footer probe falls back to the
    MICROS schema instead of raising (ADVICE r4)."""
    d = tmp_path / "empty_events"
    d.mkdir()
    stream = read_events_stream(spark, str(d))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_stream_tumbling_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    run_to_memory(tumbling_agg(stream), "t_tumble", output_mode="complete")
    got = spark.table("t_tumble")
    want = window_tumbling(spark, SF_SMALL)
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_stream_session_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(session_agg(stream), "t_sess", output_mode="complete")
    got = spark.table("t_sess")
    want = window_session(spark, SF_SMALL)
    cols = ["user_id", "session_start", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_stream_dedup_drops_duplicate_ids(spark, events_dir):
    events = load_table(spark, SF_SMALL, "events")
    # double the input: every event_id appears twice
    doubled = events.unionByName(events)
    stream_like_batch = stream_dedup(doubled)  # batch fallback path
    assert stream_like_batch.count() == events.count()

    stream = read_events_stream(spark, events_dir)
    dd = stream_dedup(stream)
    assert dd.isStreaming
    run_to_memory(dd, "t_dedup")
    assert spark.table("t_dedup").count() == events.count()


def test_rate_source_watermark_smoke(spark):
    """T3 smoke: watermarked windowed agg over the rate source produces
    rows and terminates cleanly."""
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .withColumn("event_type", (F.col("value") % 3).cast("string"))
        .withColumn("ts", F.col("timestamp"))
        .withColumn("value", F.col("value").cast("double"))
    )
    agg = tumbling_agg(rate, window="1 second", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table("t_rate").count() == 0:
            time.sleep(0.5)
        assert spark.table("t_rate").columns == ["win_start", "event_type", "n", "sum_value"]
        assert spark.table("t_rate").count() > 0
    finally:
        q.stop()


def test_stateful_running_totals_equals_batch(spark, events_dir):
    """Custom stateful operator (applyInPandasWithState): after one
    availableNow pass the per-user state equals the batch aggregate."""
    from cve_manager_spark.streaming.stateful import running_user_totals

    stream = read_events_stream(spark, events_dir)
    run_to_memory(running_user_totals(stream), "t_state", output_mode="update")
    got = {
        r["user_id"]: (r["n"], round(r["sum_value"], 6))
        for r in spark.table("t_state").collect()
    }
    batch = load_table(spark, SF_SMALL, "events")
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_foreach_batch_sink_idempotent(spark, events_dir, tmp_path):
    """foreachBatch parquet sink: rows land once; a restarted query with
    the same checkpoint does not duplicate them."""
    from cve_manager_spark.streaming.sinks import foreach_batch_parquet

    out = str(tmp_path / "sinkout")
    stream = read_events_stream(spark, events_dir)
    q = foreach_batch_parquet(stream.select("event_id", "user_id", "value"), out)
    q.awaitTermination()
    n_src = load_table(spark, SF_SMALL, "events").count()
    first = spark.read.option("basePath", out).parquet(out + "/_batch_id=*")
    assert first.count() == n_src

    # restart against the same checkpoint: no new data → no duplication
    q2 = foreach_batch_parquet(read_events_stream(spark, events_dir).select("event_id", "user_id", "value"), out)
    q2.awaitTermination()
    again = spark.read.option("basePath", out).parquet(out + "/_batch_id=*")
    assert again.count() == n_src


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Stream-stream interval join (watermarked both sides, time-bounded
    condition) produces exactly the batch join's rows."""
    from cve_manager_spark.streaming.joins import clicks_before_purchase

    p_stream = read_events_stream(spark, events_dir)
    c_stream = read_events_stream(spark, events_dir)
    joined = clicks_before_purchase(p_stream, c_stream)
    assert joined.isStreaming
    run_to_memory(joined, "t_ssjoin")
    got = spark.table("t_ssjoin")

    ev = load_table(spark, SF_SMALL, "events")
    want = clicks_before_purchase(ev, ev)
    cols = ["purchase_id", "user_id", "p_ts", "click_id", "c_ts"]
    assert got.count() > 0
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_foreach_batch_upsert_equals_batch_keep_newest(spark, tmp_path):
    """Streaming MERGE emulation: after a multi-batch availableNow pass,
    the maintained state is exactly the batch keep-newest-per-user result,
    and a restart against the same checkpoint changes nothing."""
    from cve_manager_spark.streaming.sinks import foreach_batch_upsert, read_upsert_state

    # split events into several files so availableNow delivers >1 batch
    src_dir = str(tmp_path / "events_multi")
    events = load_table(spark, SF_SMALL, "events")
    # read_events_stream expects the testdata layout: bigint NANOS in ts
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "upsert_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_upsert(
            stream, out, key_cols=["user_id"], order_cols=["ts", "event_id"]
        )

    start().awaitTermination()

    got = read_upsert_state(spark, out)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    cols = ["user_id", "event_id", "event_type", "value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    # restart with the same checkpoint: no new files -> state unchanged
    start().awaitTermination()
    assert _sorted_rows(read_upsert_state(spark, out), cols) == _sorted_rows(want, cols)


def test_stream_zscore_monitor_equals_batch(spark, events_dir):
    """Streaming anomaly monitor: frozen reference stats + stream-static
    broadcast join must score identically to the batch pass (append
    mode, no state, no watermark)."""
    from cve_manager_spark.sources.testdata import load_table
    from cve_manager_spark.streaming.monitor import reference_stats, score_zscore

    batch_events = load_table(spark, SF_SMALL, "events")
    stats = reference_stats(batch_events)
    stream = read_events_stream(spark, events_dir)
    scored = score_zscore(stream, stats)
    assert scored.isStreaming
    run_to_memory(scored, "t_zscore", output_mode="append")
    got = spark.table("t_zscore")
    want = score_zscore(batch_events, stats)
    cols = ["event_id", "event_type", "v_milli", "z_micro"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    assert got.count() > 0


def test_stateful_closed_sessions_equal_batch_minus_open(spark, events_dir):
    """Custom stateful sessionizer (applyInPandasWithState, append mode):
    after one availableNow pass the emitted CLOSED sessions equal the
    batch sessionize_stats result minus each user's final session, which
    is still open in the state store."""
    from cve_manager_spark.plans.registry import collect
    from cve_manager_spark.streaming.stateful import closed_sessions

    stream = read_events_stream(spark, events_dir)
    run_to_memory(closed_sessions(stream), "t_sessions", output_mode="append")
    got = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"], r["dur_us"])
        for r in spark.table("t_sessions").collect()
    )

    batch = collect()["sessionize_stats"].build(spark, SF_SMALL)
    w = Window.partitionBy("user_id")
    want = sorted(
        (r["user_id"], r["start_us"], r["n_events"], r["dur_us"])
        for r in batch.join(
            load_table(spark, SF_SMALL, "events")
            .groupBy("user_id")
            .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("__mx")),
            "user_id",
        )
        .withColumn("__last_idx", F.max("session_idx").over(w))
        .where(F.col("session_idx") < F.col("__last_idx"))  # drop open session
        .join(
            # recover each session's start: batch emits (user, idx, n, dur);
            # rebuild start from the raw events via the same gap rule
            _batch_session_starts(spark),
            ["user_id", "session_idx"],
        )
        .select("user_id", "start_us", "n_events", "dur_us")
        .collect()
    )
    assert got == want


def _batch_session_starts(spark):
    """(user_id, session_idx, start_us) from the raw events with the same
    30-minute gap rule the batch and streaming sessionizers share."""
    ev = load_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    new_sess = F.when(gap.isNull() | (gap > 1800000000), F.lit(1)).otherwise(F.lit(0))
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    s = ev.select(
        "user_id",
        us.alias("us"),
        F.sum(new_sess).over(wrun).alias("session_idx"),
    )
    return s.groupBy("user_id", "session_idx").agg(F.min("us").alias("start_us"))


def test_closed_sessions_restart_from_checkpoint_no_dup_no_loss(spark, tmp_path):
    """Kill/restart proof for the stateful sessionizer (VERDICT r4 #8):
    stop the stream at the time midpoint (sessions open in the state
    store), restart from the same checkpoint over the late half, and
    assert the union of both runs' emissions equals a single-pass run —
    boundary-spanning sessions close exactly once (restored state), none
    are lost, none duplicate."""
    from cve_manager_spark.streaming.sinks import foreach_batch_parquet
    from cve_manager_spark.streaming.stateful import closed_sessions

    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    cut = ev.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)").alias("c")
    ).first()["c"]
    us = F.unix_micros(F.col("ts"))

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ev.where(us <= cut).coalesce(1).write.mode("append").parquet(str(src))

    # phase A: early half, then the query terminates (availableNow)
    q = foreach_batch_parquet(closed_sessions(read_events_stream(spark, str(src))), out)
    q.awaitTermination()
    phase_a = spark.read.option("basePath", out).parquet(out + "/_batch_id=*").count()

    # phase B: late half arrives; restart from the SAME checkpoint
    ev.where(us > cut).coalesce(1).write.mode("append").parquet(str(src))
    q2 = foreach_batch_parquet(closed_sessions(read_events_stream(spark, str(src))), out)
    q2.awaitTermination()

    cols = ["user_id", "session_start_us", "n_events", "dur_us"]
    restarted = spark.read.option("basePath", out).parquet(out + "/_batch_id=*")
    got = _sorted_rows(restarted, cols)

    # reference: one uninterrupted pass over the identical source files
    out_ref = str(tmp_path / "out_ref")
    q3 = foreach_batch_parquet(closed_sessions(read_events_stream(spark, str(src))), out_ref)
    q3.awaitTermination()
    want = _sorted_rows(
        spark.read.option("basePath", out_ref).parquet(out_ref + "/_batch_id=*"), cols
    )

    assert got == want
    assert len(got) > phase_a  # phase B closed sessions phase A left open


def test_stateful_burst_minutes_equal_batch_finalized(spark, events_dir):
    """Custom stateful burst monitor (applyInPandasWithState, append
    mode): after one availableNow pass the emitted FINALIZED minutes —
    count, trailing-hour sum, burst verdict — equal the batch per-minute
    relation restricted to minutes at least 60 minutes older than each
    type's newest minute (those still inside the trailing horizon stay
    in the state store)."""
    from cve_manager_spark.streaming.stateful import (
        BURST_FACTOR,
        BURST_FLOOR,
        finalized_burst_minutes,
    )

    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        finalized_burst_minutes(stream), "t_burst", output_mode="append"
    )
    got = _sorted_rows(
        spark.table("t_burst"),
        ["event_type", "minute", "cnt", "trail", "is_burst"],
    )

    ev = load_table(spark, SF_SMALL, "events")
    minute = F.expr("unix_micros(cast(ts as timestamp)) div 60000000")
    m = ev.groupBy("event_type", minute.alias("minute")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("minute").rangeBetween(-59, 0)
    t = m.withColumn("trail", F.sum("cnt").over(w)).withColumn(
        "__mx", F.max("minute").over(Window.partitionBy("event_type"))
    )
    want = _sorted_rows(
        t.where(F.col("minute") <= F.col("__mx") - 60).select(
            "event_type",
            "minute",
            "cnt",
            "trail",
            (
                (F.col("cnt") >= BURST_FLOOR)
                & (F.col("cnt") * 60 > F.col("trail") * BURST_FACTOR)
            ).alias("is_burst"),
        ),
        ["event_type", "minute", "cnt", "trail", "is_burst"],
    )
    assert got == want
    assert len(got) > 0


def test_burst_monitor_restart_from_checkpoint_no_dup_no_loss(spark, tmp_path):
    """Kill/restart proof for the burst monitor: stop the stream at the
    time midpoint (trailing-hour state held per type), restart from the
    same checkpoint over the late half, and assert the union of both
    runs' emissions equals a single uninterrupted pass — minutes whose
    trailing window spans the restart finalize exactly once from
    restored state, none lost, none duplicated."""
    from cve_manager_spark.streaming.sinks import foreach_batch_parquet
    from cve_manager_spark.streaming.stateful import finalized_burst_minutes

    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    cut = ev.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)").alias("c")
    ).first()["c"]
    us = F.unix_micros(F.col("ts"))

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ev.where(us <= cut).coalesce(1).write.mode("append").parquet(str(src))

    q = foreach_batch_parquet(
        finalized_burst_minutes(read_events_stream(spark, str(src))), out
    )
    q.awaitTermination()
    phase_a = spark.read.option("basePath", out).parquet(out + "/_batch_id=*").count()

    ev.where(us > cut).coalesce(1).write.mode("append").parquet(str(src))
    q2 = foreach_batch_parquet(
        finalized_burst_minutes(read_events_stream(spark, str(src))), out
    )
    q2.awaitTermination()

    cols = ["event_type", "minute", "cnt", "trail", "is_burst"]
    got = _sorted_rows(
        spark.read.option("basePath", out).parquet(out + "/_batch_id=*"), cols
    )

    out_ref = str(tmp_path / "out_ref")
    q3 = foreach_batch_parquet(
        finalized_burst_minutes(read_events_stream(spark, str(src))), out_ref
    )
    q3.awaitTermination()
    want = _sorted_rows(
        spark.read.option("basePath", out_ref).parquet(out_ref + "/_batch_id=*"),
        cols,
    )

    assert got == want
    assert len(got) > phase_a  # late half finalized minutes phase A held open


def test_stream_stream_outer_join_nulls_finalize_on_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched rows equal the batch join
    exactly; null rows (purchases with no trailing click) are emitted
    once the watermark passes them — driven here by a far-future
    sentinel event in a second file, so every real purchase finalizes
    inside one availableNow pass (file order = event-time order makes
    the watermark advance between micro-batches)."""
    from cve_manager_spark.streaming.joins import clicks_attribution_outer

    src_dir = str(tmp_path / "events_outer")
    ev_raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_raw.write.parquet(src_dir)
    # sentinel: one far-future non-purchase, non-click event in its own
    # file; written in whatever unit the source dir already uses
    delta = (
        48 * 3600 * 1000 * 1000 * 1000
        if dict(ev_raw.dtypes)["ts"] == "bigint"
        else F.expr("INTERVAL 48 HOURS")
    )
    # Two sentinel files, each carrying a far-future purchase AND click on
    # fresh users (they can't match any real row, or each other). The
    # event-type filters sit BELOW the watermark nodes, so only rows that
    # survive them advance the watermark — a neutral 'view' sentinel would
    # be invisible. Two files because a batch's watermark applies from the
    # next batch on: sentinel2's batch is what evicts (and emits) the
    # purchases adjacent to sentinel1.
    top = ev_raw.orderBy(F.col("ts").desc()).limit(1)
    for i in (1, 2):
        for etype, uid in (("purchase", 999_998), ("click", 999_999)):
            (
                top.withColumn("ts", F.col("ts") + delta * i)
                .withColumn("event_type", F.lit(etype))
                .withColumn("user_id", F.lit(uid).cast("long"))
                .withColumn(
                    "event_id",
                    F.lit(999_999_900 + 10 * i + (1 if etype == "click" else 0)),
                )
                .write.mode("append")
                .parquet(src_dir)
            )

    joined = clicks_attribution_outer(
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
        read_events_stream(spark, src_dir, max_files_per_trigger=1),
    )
    assert joined.isStreaming
    run_to_memory(joined, "t_ssjoin_outer")
    got = spark.table("t_ssjoin_outer")

    ev = load_table(spark, SF_SMALL, "events")
    want = clicks_attribution_outer(ev, ev)
    cols = ["purchase_id", "user_id", "p_ts", "click_id", "c_ts"]

    # sentinels excluded: the batch reference never saw them
    got = got.where(F.col("purchase_id") < 999_999_900)

    # matched rows: identical everywhere (emitted on arrival, no
    # watermark dependence)
    got_m = got.where(F.col("click_id").isNotNull())
    want_m = want.where(F.col("click_id").isNotNull())
    assert _sorted_rows(got_m, cols) == _sorted_rows(want_m, cols)

    # null rows: with the watermark pushed 48h past the real data, every
    # real purchase has finalized — the null sets must match exactly
    got_n = {r["purchase_id"] for r in got.where(F.col("click_id").isNull()).collect()}
    want_n = {r["purchase_id"] for r in want.where(F.col("click_id").isNull()).collect()}
    assert got_n == want_n
    assert got_n, "no null rows emitted at all"


def test_transform_with_state_dedup_equals_batch(spark, tmp_path):
    """transformWithStateInPandas (state v2) first-seen dedup: a single
    availableNow pass over the static documents corpus emits exactly the
    batch exact_dedup keep set (content_sha, keep_id=min doc_id).
    Requires the RocksDB state store provider — set for this query and
    restored after — and the state-v2 Python protocol's protobuf
    dependency (absent in this sandbox: the operator is env-gated the
    same way as the Postgres COPY sink; applyInPandasWithState covers
    the exercised stateful path)."""
    import shutil

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf — "
        "confirmed unsatisfiable in this sandbox (no package installs; "
        "VERDICT r5 #8): the construction-time analysis test below covers "
        "what can run here",
    )

    from cve_manager_spark.operators.dedup import exact_dedup
    from cve_manager_spark.streaming.stateful import streaming_dedup

    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMALL}/documents.parquet", d / "documents.parquet")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).parquet(str(d))
        out = streaming_dedup(stream)
        assert out.isStreaming
        run_to_memory(out, "t_tws_dedup")
        got = spark.table("t_tws_dedup")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    docs = load_table(spark, SF_SMALL, "documents")
    want = exact_dedup(docs).select("content_sha", "keep_id")
    cols = ["content_sha", "keep_id"]
    assert got.count() > 0
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_transform_with_state_dedup_constructs(spark, tmp_path):
    """The state-v2 dedup plan must ANALYZE without the protobuf runtime:
    schema, grouping key and output struct are validated at construction,
    so plumbing regressions surface even where the executor dependency is
    absent."""
    import shutil

    from cve_manager_spark.streaming.stateful import streaming_dedup

    d = tmp_path / "docs_stream_c"
    d.mkdir()
    shutil.copy(f"{SF_SMALL}/documents.parquet", d / "documents.parquet")
    stream = spark.readStream.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).parquet(str(d))
    out = streaming_dedup(stream)
    assert out.isStreaming
    assert dict(out.dtypes) == {"content_sha": "string", "keep_id": "bigint"}


def test_foreach_batch_rollup_equals_batch_cascade(spark, tmp_path):
    """Incrementally maintained day rollup: after a multi-batch
    availableNow pass the snapshot equals the batch rollup_cascade
    result exactly (DECIMAL state makes the merge associative), and a
    restart against the same checkpoint changes nothing."""
    from cve_manager_spark.plans.features import rollup_cascade
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_rollup,
        read_rollup_state,
    )

    src_dir = str(tmp_path / "events_rollup_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "rollup_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_rollup(stream, out)

    start().awaitTermination()
    got = read_rollup_state(spark, out)
    want = rollup_cascade(spark, SF_SMALL)
    cols = ["day", "n_events", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    # replay: no new files -> identical snapshot
    start().awaitTermination()
    assert _sorted_rows(read_rollup_state(spark, out), cols) == _sorted_rows(
        want, cols
    )


def test_foreach_batch_merge_lake_equals_batch_keep_newest(spark, tmp_path):
    """Streaming CDC MERGE into one parquet lake dir: after a multi-batch
    availableNow pass the table equals batch keep-newest-per-user, and a
    restart (replay) against the same checkpoint changes nothing thanks
    to the _last_batch transaction marker."""
    from cve_manager_spark.streaming.sinks import foreach_batch_merge_lake

    src_dir = str(tmp_path / "events_lake_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "lake_table")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_merge_lake(
            stream, out, key_cols=["user_id"], order_cols=["ts", "event_id"]
        )

    start().awaitTermination()
    got = spark.read.parquet(out)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    cols = ["user_id", "event_id", "event_type", "value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    start().awaitTermination()  # replay: marker skips applied batches
    assert _sorted_rows(spark.read.parquet(out), cols) == _sorted_rows(want, cols)


def test_foreach_batch_distinct_rollup_equals_batch_dau(spark, tmp_path):
    """Streaming DAU via the key-set state: after a multi-batch
    availableNow pass the (day, dau) series equals the batch distinct
    count exactly — union+distinct is associative and idempotent, so
    micro-batch chopping cannot change the set — and a replay against
    the same checkpoint changes nothing."""
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_distinct_rollup,
        read_dau_state,
    )

    src_dir = str(tmp_path / "events_dau_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "dau_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_distinct_rollup(stream, out)

    start().awaitTermination()
    got = read_dau_state(spark, out)
    want = (
        events.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    cols = ["day", "dau"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    # replay: no new files -> identical series
    start().awaitTermination()
    assert _sorted_rows(read_dau_state(spark, out), cols) == _sorted_rows(
        want, cols
    )


def test_read_stickiness_state_equals_batch_query(spark, tmp_path):
    """The stickiness reader over the streaming key-set snapshot must
    reproduce the registered batch dau_wau_stickiness query exactly —
    one state, two derived series."""
    from cve_manager_spark.plans.registry import collect
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_distinct_rollup,
        read_stickiness_state,
    )

    src_dir = str(tmp_path / "events_stick_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "stick_state")
    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    foreach_batch_distinct_rollup(stream, out).awaitTermination()

    got = read_stickiness_state(spark, out)
    want = collect()["dau_wau_stickiness"].build(spark, SF_SMALL)
    cols = ["day", "dau", "wau", "stickiness_ppm"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def _hash_state_files(out_dir):
    """md5 of every data file under every _state_v* dir, keyed by
    relative path."""
    import hashlib
    from pathlib import Path

    out = {}
    for f in Path(out_dir).glob("_state_v*/**/*.parquet"):
        out[str(f.relative_to(out_dir))] = hashlib.md5(f.read_bytes()).hexdigest()
    return out


def test_keyset_untouched_day_dirs_byte_identical_across_batches(spark, tmp_path):
    """r6 verdict #6's promised assertion: the log-structured DAU state
    never rewrites an existing version dir — after a later batch lands,
    every previously written state file is byte-identical, and the new
    version dir carries ONLY the days the new batch touched."""
    import shutil
    from pathlib import Path

    from cve_manager_spark.streaming.sinks import foreach_batch_distinct_rollup

    def _drop_single_file(df, tmp_dir: Path, dest: Path) -> None:
        """File streaming sources list files directly under the source
        dir (no recursion): write to a scratch dir, move the part file."""
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_dir))
        shutil.move(str(next(tmp_dir.glob("*.parquet"))), str(dest))

    src_dir = tmp_path / "events_bi_src"
    src_dir.mkdir()
    events = load_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    )
    _drop_single_file(events, tmp_path / "scratch1", src_dir / "f1.parquet")
    out = str(tmp_path / "dau_state_bi")

    def start():
        stream = read_events_stream(spark, str(src_dir), max_files_per_trigger=1)
        return foreach_batch_distinct_rollup(stream, out)

    start().awaitTermination()
    before = _hash_state_files(out)
    assert before

    # a second batch touching exactly one new day
    new_day = "2030-01-01"
    one = spark.createDataFrame(
        [(999999, 4242)], "event_id bigint, user_id bigint"
    ).select(
        "event_id",
        (F.unix_micros(F.to_timestamp(F.lit(f"{new_day} 12:00:00"))) * 1000).alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    _drop_single_file(one, tmp_path / "scratch2", src_dir / "f2.parquet")
    start().awaitTermination()

    after = _hash_state_files(out)
    for rel, h in before.items():
        assert after.get(rel) == h, f"previously written state file changed: {rel}"
    new_files = set(after) - set(before)
    assert new_files
    new_versions = {Path(rel).parts[0] for rel in new_files}
    assert len(new_versions) == 1
    new_days = {Path(rel).parts[1] for rel in new_files}
    assert new_days == {f"day={new_day}"}


def test_keyset_compaction_folds_versions_preserves_series(spark, tmp_path):
    """compact_keyset_state folds all committed versions into one base:
    version dirs collapse to <= 2, the composed DAU series is unchanged,
    a replay after compaction changes nothing, and re-compacting is a
    no-op."""
    from pathlib import Path

    from cve_manager_spark.streaming.sinks import (
        compact_keyset_state,
        foreach_batch_distinct_rollup,
        read_dau_state,
    )

    src_dir = str(tmp_path / "events_cmp_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(4)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "dau_state_cmp")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_distinct_rollup(stream, out)

    start().awaitTermination()
    n_versions = len(list(Path(out).glob("_state_v*")))
    assert n_versions >= 3  # one per micro-batch

    want = _sorted_rows(read_dau_state(spark, out), ["day", "dau"])
    res = compact_keyset_state(spark, out)
    assert res["folded"] == n_versions - 1
    assert len(list(Path(out).glob("_state_v*"))) == 2
    assert _sorted_rows(read_dau_state(spark, out), ["day", "dau"]) == want

    # replay against the same checkpoint: no new files, nothing changes
    start().awaitTermination()
    assert _sorted_rows(read_dau_state(spark, out), ["day", "dau"]) == want

    # idempotent: nothing left to fold
    res2 = compact_keyset_state(spark, out)
    assert res2["folded"] == 0
    assert _sorted_rows(read_dau_state(spark, out), ["day", "dau"]) == want


def test_keyset_flat_legacy_snapshot_raises(spark, tmp_path):
    """A pre-r7 FLAT snapshot dir (parquet files, no day= dirs) must
    fail the compose loudly instead of silently dropping its history
    (ADVICE r7)."""
    import pytest as _pytest

    from cve_manager_spark.streaming.sinks import read_dau_state

    out = tmp_path / "dau_state_flat"
    legacy = spark.createDataFrame(
        [("2024-01-01", 1)], "day string, user_id bigint"
    )
    legacy.coalesce(1).write.parquet(str(out / "_state_v0"))
    with _pytest.raises(ValueError, match="FLAT snapshot"):
        read_dau_state(spark, str(out))


def test_keyset_null_ts_rows_dropped_not_null_partition(spark, tmp_path):
    """Rows whose ts fails to_date are dropped before the state write
    (ADVICE r7): no __HIVE_DEFAULT_PARTITION__ dir appears and the
    composed series carries no NULL day."""
    from pathlib import Path

    from cve_manager_spark.streaming.sinks import (
        foreach_batch_distinct_rollup,
        read_dau_state,
    )

    src_dir = tmp_path / "events_null_src"
    src_dir.mkdir()
    rows = spark.createDataFrame(
        [(1, 1704067200000000000, 10), (2, None, 11), (3, None, 12)],
        "event_id bigint, ts bigint, user_id bigint",
    ).select(
        "event_id", "ts", "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    import shutil

    scratch = tmp_path / "scratch_null"
    rows.coalesce(1).write.parquet(str(scratch))
    shutil.move(str(next(scratch.glob("*.parquet"))), str(src_dir / "f1.parquet"))
    out = str(tmp_path / "dau_state_null")
    stream = read_events_stream(spark, str(src_dir), max_files_per_trigger=1)
    foreach_batch_distinct_rollup(stream, out).awaitTermination()

    assert not list(Path(out).glob("_state_v*/day=__HIVE_DEFAULT_PARTITION__"))
    got = read_dau_state(spark, out)
    assert got.where(F.col("day").isNull()).count() == 0
    assert got.count() == 1  # the one valid-ts day


def test_foreach_batch_merge_lake_committed_survives_concurrent_compaction(
    spark, tmp_path
):
    """committed=True runs the streaming CDC MERGE through the table's
    commit log: versions advance one per applied batch, the final table
    (read via the manifest) equals batch keep-newest, a mid-stream
    COMPACTION through the same log does not corrupt or lose rows —
    the stream's next batch retries against the compacted snapshot —
    and replay is still idempotent via the _last_batch marker."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import foreach_batch_merge_lake

    src_dir = str(tmp_path / "events_lake_src_c")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "lake_table_c")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_merge_lake(
            stream,
            out,
            key_cols=["user_id"],
            order_cols=["ts", "event_id"],
            committed=True,
        )

    start().awaitTermination()
    log = TableLog(out)
    v_after_stream = log.snapshot()[0]
    # 3 source files -> batch 0 bootstraps v0, batches 1..2 merge
    assert v_after_stream >= 2

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    cols = ["user_id", "event_id", "event_type", "value"]
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)

    # a maintenance compaction through the same log (the batch writer in
    # the stream-vs-batch race) — then replay: marker skips all batches,
    # table unchanged, and the compacted snapshot is what readers see
    log.compact(spark, target_rows_per_file=100_000)
    start().awaitTermination()
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)

    # superseded + orphan files reclaim (explicit 0: no writer in
    # flight here); content still identical
    log.vacuum(keep_versions=1, min_age_seconds=0)
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)


def test_foreach_batch_merge_lake_committed_bootstrap_crash_recovery(
    spark, tmp_path
):
    """Crash window between the bootstrap batch's parquet overwrite and
    TableLog.init(): data files exist with no commit log and no
    _last_batch marker. Replay must ADOPT the files into a fresh log
    instead of wedging on merge_upsert's no-commit-log error, and the
    stream must still converge to batch keep-newest."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import foreach_batch_merge_lake

    src_dir = str(tmp_path / "events_lake_src_b")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "lake_table_b")
    # the crashed bootstrap's remnant: keep-newest over a slice of the
    # source, written as plain parquet with NO _commits dir
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    remnant = (
        events.orderBy("event_id")
        .limit(200)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        # the real crashed bootstrap wrote from the STREAM's schema,
        # where ts is a TIMESTAMP (ltz), not the batch reader's ntz
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    remnant.write.mode("overwrite").parquet(out)
    assert not (Path(out) / "_commits").exists()

    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    foreach_batch_merge_lake(
        stream,
        out,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        committed=True,
    ).awaitTermination()

    log = TableLog(out)
    assert log.versions(), "replay did not bootstrap the commit log"
    want = (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    cols = ["user_id", "event_id", "event_type", "value"]
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)


def _seed_vec_batches(spark, tmp_path, n_batches=3, where=None):
    """Write embeddings as ``n_batches`` id-ordered single-file drops
    (ascending ranges, ascending mtimes) so the file source replays
    them as ordered micro-batches."""
    import os
    import shutil

    emb = load_table(spark, SF_SMALL, "embeddings")
    if where is not None:
        emb = emb.where(where)
    ids = sorted(r[0] for r in emb.select("vec_id").collect())
    cuts = [ids[(i + 1) * len(ids) // n_batches] for i in range(n_batches - 1)]
    bounds = [min(ids)] + cuts + [max(ids) + 1]
    src = tmp_path / "vec_src"
    src.mkdir()
    for i in range(n_batches):
        part = emb.where(
            (F.col("vec_id") >= bounds[i]) & (F.col("vec_id") < bounds[i + 1])
        )
        scratch = tmp_path / f"vec_scratch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        dest = src / f"b{i}.parquet"
        shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))
    return emb, str(src)


def _batch_semantic_verdicts(emb, cents):
    """One-shot batch twin: greedy keep-lowest-id over the frozen-cell
    assignment of the WHOLE corpus."""
    from cve_manager_spark.operators.semantic import (
        dup_dominated,
        encode_frozen,
    )

    enc = encode_frozen(emb, cents)
    dropped = dup_dominated(enc, enc)
    return enc.join(
        dropped.withColumn("__d", F.lit(1)), "vec_id", "left"
    ).select(
        "vec_id", F.col("__d").isNotNull().alias("dropped"), "cluster"
    )


def test_foreach_batch_semantic_dedup_equals_batch(spark, tmp_path):
    """Streaming SemDeDup gate: after an id-ordered multi-batch
    availableNow pass, the seen table's per-vector keep/drop verdicts
    equal the one-shot batch computation exactly (the policy is
    non-recursive, so micro-batch chopping cannot change them), and a
    replay against the same checkpoint changes nothing."""
    from cve_manager_spark.operators.semantic import kmeans_fit
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_semantic_dedup,
        read_vectors_stream,
    )

    emb, src = _seed_vec_batches(spark, tmp_path)
    base = emb.where(F.col("vec_id") % 5 != 4)
    _, cents = kmeans_fit(base, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    out = str(tmp_path / "seen_table")

    def start():
        stream = read_vectors_stream(spark, src, max_files_per_trigger=1)
        return foreach_batch_semantic_dedup(stream, out, cents)

    start().awaitTermination()
    got = spark.read.parquet(out)
    want = _batch_semantic_verdicts(emb, cents)
    cols = ["vec_id", "dropped", "cluster"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # seen table is hive-partitioned by cell → the cross join's per-batch
    # read is partition-pruned to the batch's cells
    assert any(Path(out).glob("cluster=*"))

    start().awaitTermination()  # replay: marker skips applied batches
    assert _sorted_rows(spark.read.parquet(out), cols) == _sorted_rows(want, cols)


def test_foreach_batch_semantic_dedup_committed_versions(spark, tmp_path):
    """committed=True: one manifest version per applied batch via the
    blind-append fast path, manifest read equals batch verdicts, and a
    mid-stream maintenance writer through the same log is survived."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.operators.semantic import kmeans_fit
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_semantic_dedup,
        read_vectors_stream,
    )

    emb, src = _seed_vec_batches(spark, tmp_path)
    base = emb.where(F.col("vec_id") % 5 != 4)
    _, cents = kmeans_fit(base, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    out = str(tmp_path / "seen_table_c")

    def start():
        stream = read_vectors_stream(spark, src, max_files_per_trigger=1)
        return foreach_batch_semantic_dedup(stream, out, cents, committed=True)

    start().awaitTermination()
    log = TableLog(out)
    assert log.snapshot()[0] >= 2  # bootstrap v0 + 2 appended batches
    want = _batch_semantic_verdicts(emb, cents)
    cols = ["vec_id", "dropped", "cluster"]
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)

    # maintenance compaction through the same log, then replay: marker
    # skips all batches; content unchanged, reads resolve the manifest
    log.compact(spark, target_rows_per_file=100_000)
    start().awaitTermination()
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)


def test_semantic_gate_committed_tagged_append_crash_recovery(
    spark, tmp_path
):
    """ADVICE r10: the semantic gate's committed append is TAGGED like
    the minhash/phash gates, so a crash between the append commit and
    the marker write does not double-append on replay — the replayed
    batch sees its ``append@b<id>`` tag in the newest commit and skips."""
    import shutil

    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.operators.semantic import kmeans_fit
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_semantic_dedup,
        read_vectors_stream,
    )

    emb, src = _seed_vec_batches(spark, tmp_path)
    base = emb.where(F.col("vec_id") % 5 != 4)
    _, cents = kmeans_fit(base, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    out = str(tmp_path / "seen_table_crash")

    def start():
        stream = read_vectors_stream(spark, src, max_files_per_trigger=1)
        return foreach_batch_semantic_dedup(stream, out, cents, committed=True)

    start().awaitTermination()
    log = TableLog(out)
    v_before, _ = log.snapshot()
    n_before = log.read(spark).count()
    assert log.last_op().startswith("append@b")

    # crash between the last batch's append commit and the marker write:
    # rewind the marker one batch and drop the checkpoint so the source
    # redelivers — the append must be skipped via its tag
    marker = tmp_path / "seen_table_crash_last_batch"
    last_batch = int(marker.read_text())
    marker.write_text(str(last_batch - 1))
    shutil.rmtree(str(tmp_path / "seen_table_crash_checkpoint"))

    start().awaitTermination()
    assert log.snapshot()[0] == v_before  # no new version published
    assert log.read(spark).count() == n_before  # no double-appended rows
    assert int(marker.read_text()) == last_batch

    want = _batch_semantic_verdicts(emb, cents)
    cols = ["vec_id", "dropped", "cluster"]
    assert _sorted_rows(log.read(spark), cols) == _sorted_rows(want, cols)


def test_stream_drift_histogram_equals_batch_spec(spark, tmp_path):
    """Streaming drift monitor == the batch embedding_drift_buckets
    spec bit-for-bit: freeze (mu, v, bounds) and the win-0 reference
    histogram batch-side, stream the win-1 embeddings as id-ordered
    micro-batches, and the composed report equals the registry spec's
    output. A replay against the same checkpoint changes nothing."""
    from cve_manager_spark.operators.semantic import (
        drift_fit,
        drift_projection,
    )
    from cve_manager_spark.plans.semantic import embedding_drift_buckets
    from cve_manager_spark.streaming.monitor import (
        drift_bucket_counts,
        foreach_batch_drift_histogram,
        read_drift_report,
    )
    from cve_manager_spark.streaming.sinks import read_vectors_stream

    emb = load_table(spark, SF_SMALL, "embeddings")
    mu, v = drift_fit(emb)
    b = drift_projection(emb, mu, v).agg(
        F.min("p").alias("lo"), F.max("p").alias("hi")
    ).head()
    pmin, pmax = int(b["lo"]), int(b["hi"])
    ref_hist = drift_bucket_counts(
        emb.where(F.col("vec_id") % 2 == 0), mu, v, pmin, pmax
    )

    _, src = _seed_vec_batches(
        spark, tmp_path, where=F.col("vec_id") % 2 == 1
    )
    out = str(tmp_path / "drift_state")

    def start():
        stream = read_vectors_stream(spark, src, max_files_per_trigger=1)
        return foreach_batch_drift_histogram(
            stream, out, mu, v, pmin, pmax
        )

    start().awaitTermination()
    got = read_drift_report(spark, out, ref_hist)
    want = embedding_drift_buckets(spark, SF_SMALL)
    cols = ["bucket", "n_ref", "n_cur", "ppm_ref", "ppm_cur", "delta_ppm"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    start().awaitTermination()  # replay: snapshots rebuild identically
    got2 = read_drift_report(spark, out, ref_hist)
    assert _sorted_rows(got2, cols) == _sorted_rows(want, cols)


def test_drift_scores_identity_and_shift(spark):
    """A/A report scores ~zero; a synthetic one-bucket mass shift scores
    the hand-computed PSI/TVD exactly."""
    from cve_manager_spark.streaming.monitor import drift_scores

    same = [
        {"delta_ppm": 0, "ppm_ref": 500000, "ppm_cur": 500000},
        {"delta_ppm": 0, "ppm_ref": 500000, "ppm_cur": 500000},
    ]
    s = drift_scores(same)
    assert s == {"tvd_ppm": 0, "psi": 0.0, "n_onesided_buckets": 0}

    import math

    shifted = [
        {"delta_ppm": -200000, "ppm_ref": 500000, "ppm_cur": 300000},
        {"delta_ppm": 200000, "ppm_ref": 500000, "ppm_cur": 700000},
    ]
    s = drift_scores(shifted)
    assert s["tvd_ppm"] == 200000
    want_psi = (0.3 - 0.5) * math.log(0.3 / 0.5) + (0.7 - 0.5) * math.log(
        0.7 / 0.5
    )
    assert abs(s["psi"] - want_psi) < 1e-12
    assert s["n_onesided_buckets"] == 0

    onesided = [
        {"delta_ppm": -500000, "ppm_ref": 500000, "ppm_cur": 0},
        {"delta_ppm": 500000, "ppm_ref": 500000, "ppm_cur": 1000000},
    ]
    s = drift_scores(onesided)
    assert s["n_onesided_buckets"] == 1


def test_foreach_batch_minhash_dedup_equals_batch(spark, tmp_path):
    """Streaming incremental-MinHash gate: after an id-ordered
    multi-batch availableNow pass, the docs-state keep/drop verdicts
    equal the one-shot batch computation (greedy keep-lowest-id over
    band collisions + exact Jaccard >= 0.5), the band state is
    hive-partitioned by key prefix, and replay changes nothing."""
    import os
    import shutil

    from cve_manager_spark.operators.dedup import (
        minhash_dominated,
        minhash_encode,
    )
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_minhash_dedup,
        read_documents_stream,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    bounds = [min(ids)] + cuts + [max(ids) + 1]
    src = tmp_path / "doc_src"
    src.mkdir()
    for i in range(3):
        part = docs.where(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        scratch = tmp_path / f"doc_scratch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        dest = src / f"b{i}.parquet"
        shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))

    out = str(tmp_path / "mh_state")

    def start():
        stream = read_documents_stream(spark, str(src), max_files_per_trigger=1)
        return foreach_batch_minhash_dedup(stream, out)

    start().awaitTermination()
    got = spark.read.parquet(out + "/docs").select("id", "dup")

    sh, keys = minhash_encode(docs)
    dropped = minhash_dominated(keys, sh, keys, sh)
    want = sh.join(
        dropped.withColumn("__d", F.lit(1)), "id", "left"
    ).select("id", F.col("__d").isNotNull().alias("dup"))

    cols = ["id", "dup"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    assert got.count() == sh.count()  # zero-shingle docs excluded alike
    assert any((Path(out) / "bands").glob("kb=*"))  # pruned band index

    start().awaitTermination()  # replay: marker skips applied batches
    got2 = spark.read.parquet(out + "/docs").select("id", "dup")
    assert _sorted_rows(got2, cols) == _sorted_rows(want, cols)


def test_foreach_batch_phash_dedup_equals_batch(spark, tmp_path):
    """Streaming perceptual-hash gate: after an id-ordered multi-batch
    availableNow pass, the docs-state keep/drop verdicts equal the
    one-shot batch computation (greedy keep-lowest-id over 4x16-bit
    band collisions + exact Hamming <= 6), the band index is
    hive-partitioned by value bucket, and replay changes nothing."""
    import os
    import shutil

    from cve_manager_spark.streaming.sinks import (
        foreach_batch_phash_dedup,
        read_documents_stream,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    bounds = [min(ids)] + cuts + [max(ids) + 1]
    src = tmp_path / "doc_src_ph"
    src.mkdir()
    for i in range(3):
        part = docs.where(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        scratch = tmp_path / f"ph_scratch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        dest = src / f"b{i}.parquet"
        shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))

    out = str(tmp_path / "ph_state")

    def start():
        stream = read_documents_stream(spark, str(src), max_files_per_trigger=1)
        return foreach_batch_phash_dedup(stream, out)

    start().awaitTermination()
    got = spark.read.parquet(out + "/docs").select("id", "phash_hex", "dup")

    # batch twin: the dedup_image_phash pair relation, reduced to
    # higher-id-is-dropped verdicts
    from cve_manager_spark.plans.pipeline import (
        _phash_band_candidates,
        _phash_df,
        _phash_hamming,
    )

    ph = _phash_df(spark, SF_SMALL)
    pairs = _phash_band_candidates(ph).where(_phash_hamming() <= 6)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct().withColumn(
        "__d", F.lit(1)
    )
    want = ph.join(dropped, "doc_id", "left").select(
        F.col("doc_id").alias("id"),
        "phash_hex",
        F.col("__d").isNotNull().alias("dup"),
    )
    cols = ["id", "phash_hex", "dup"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    assert any((Path(out) / "bands").glob("vb=*"))

    start().awaitTermination()  # replay
    got2 = spark.read.parquet(out + "/docs").select("id", "phash_hex", "dup")
    assert _sorted_rows(got2, cols) == _sorted_rows(want, cols)


def test_foreach_batch_cms_equals_batch_sketch(spark, tmp_path):
    """Streaming CountMin state == the batch sketch exactly (counter
    addition is associative+commutative, so micro-batch chopping cannot
    change it), and point estimates through the accumulated state match
    the registry countmin_estimate_error spec's estimates key-for-key.
    Replay rebuilds identical state."""
    from cve_manager_spark.plans.sketches import countmin_estimate_error
    from cve_manager_spark.streaming.sinks import (
        cms_estimate,
        foreach_batch_cms,
        read_cms_state,
    )

    src_dir = str(tmp_path / "events_cms_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "cms_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_cms(stream, out)

    start().awaitTermination()
    state = read_cms_state(spark, out)
    assert state.agg(F.sum("c")).head()[0] == events.count() * 4

    keys = events.select(
        F.col("user_id").cast("string").alias("key")
    ).distinct()
    got = cms_estimate(keys, state).select(
        F.col("key").cast("bigint").alias("user_id"), "estimate"
    )
    want = countmin_estimate_error(spark, SF_SMALL).select(
        "user_id", "estimate"
    )
    cols = ["user_id", "estimate"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    # real re-delivery: drop the checkpoint so every batch id replays
    # over the existing snapshots — the `versions < batch_id` merge-base
    # rule must rebuild identical state, not double-count
    pre_replay = _sorted_rows(state, ["r", "b", "c"])  # materialize now:
    # the replay overwrites the snapshot files this lazy plan points at
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    state2 = read_cms_state(spark, out)
    assert _sorted_rows(state2, ["r", "b", "c"]) == pre_replay


def test_foreach_batch_bloom_equals_batch_and_no_false_negatives(
    spark, tmp_path
):
    """Streaming Bloom state == the batch bit set exactly (bit-OR is
    associative, commutative and idempotent), every streamed member
    probes TRUE (no false negatives), and non-member probes reproduce
    the batch bloom_fp_audit's false-positive verdicts bit-for-bit."""
    from cve_manager_spark.streaming.sinks import (
        bloom_might_contain,
        foreach_batch_bloom,
        read_bloom_state,
    )

    src_dir = str(tmp_path / "events_bloom_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "bloom_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_bloom(stream, out)

    start().awaitTermination()
    state = read_bloom_state(spark, out)

    # batch twin: distinct members x k hash fns, distinct bit positions
    from cve_manager_spark.streaming.sinks import _bloom_bit

    members = events.select("user_id").distinct()
    ks = spark.range(0, 3).select(F.col("id").cast("int").alias("k"))
    want_bits = (
        members.crossJoin(F.broadcast(ks))
        .select(_bloom_bit("k", "cast(user_id as string)").alias("b"))
        .distinct()
    )
    assert _sorted_rows(state, ["b"]) == _sorted_rows(want_bits, ["b"])

    # no false negatives: every member probes TRUE
    got = bloom_might_contain(
        members.select(F.col("user_id").cast("string").alias("key")), state
    )
    assert got.where(~F.col("might_contain")).count() == 0

    # replay: idempotent state
    start().awaitTermination()
    assert _sorted_rows(read_bloom_state(spark, out), ["b"]) == _sorted_rows(
        want_bits, ["b"]
    )


def test_foreach_batch_occupancy_equals_batch_audit(spark, tmp_path):
    """Streaming occupancy state == the batch bucket set exactly (set
    union is idempotent+commutative), per-group occupied counts match
    the registry distinct_bucket_occupancy audit, the driver-side
    linear-count estimate is sane (within 30% of exact at these
    occupancies), and replay changes nothing."""
    from cve_manager_spark.plans.sketches import distinct_bucket_occupancy
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_occupancy,
        linear_count_estimate,
        read_occupancy_state,
    )

    src_dir = str(tmp_path / "events_occ_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "occ_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_occupancy(stream, out)

    start().awaitTermination()
    state = read_occupancy_state(spark, out)
    got = state.groupBy(F.col("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("occupied")
    )
    want = distinct_bucket_occupancy(spark, SF_SMALL).select(
        F.col("event_type").alias("g"), "occupied"
    )
    assert _sorted_rows(got, ["g", "occupied"]) == _sorted_rows(
        want, ["g", "occupied"]
    )

    exact = {
        r["g"]: r["exact_distinct"]
        for r in distinct_bucket_occupancy(spark, SF_SMALL)
        .select(F.col("event_type").alias("g"), "exact_distinct")
        .collect()
    }
    est = linear_count_estimate(got.collect())
    for g, e in est["estimates"].items():
        assert abs(e - exact[g]) <= 0.3 * exact[g] + 3, (g, e, exact[g])
    for g in est["saturated"]:
        assert exact[g] > 256  # saturation only under heavy load

    start().awaitTermination()  # replay: idempotent state
    state2 = read_occupancy_state(spark, out)
    assert _sorted_rows(state2, ["g", "b"]) == _sorted_rows(state, ["g", "b"])


def test_minhash_gate_bucketed_state_equals_plain_and_no_state_exchange(
    spark, tmp_path
):
    """docs_bucket_table stores the gate's doc-state bucketed by id:
    verdicts are identical to the plain-parquet run, and the verify
    join consumes the on-disk hash distribution — under a merge-join
    hint only the (small) candidate side exchanges, the state side
    scans bucketed."""
    import os
    import shutil

    from cve_manager_spark.operators.dedup import (
        minhash_dominated,
        minhash_encode,
    )
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_minhash_dedup,
        read_documents_stream,
    )

    db = "mh_gate_test"
    loc = tmp_path / "gate_wh"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    try:
        docs = load_table(spark, SF_SMALL, "documents")
        ids = sorted(r[0] for r in docs.select("doc_id").collect())
        cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
        bounds = [min(ids)] + cuts + [max(ids) + 1]
        src = tmp_path / "doc_src_b"
        src.mkdir()
        for i in range(3):
            part = docs.where(
                (F.col("doc_id") >= bounds[i])
                & (F.col("doc_id") < bounds[i + 1])
            )
            scratch = tmp_path / f"bk_scratch{i}"
            part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
            dest = src / f"b{i}.parquet"
            shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
            os.utime(dest, (1_000_000 + i, 1_000_000 + i))

        out = str(tmp_path / "mh_state_b")
        table = f"{db}.gate_docs"
        stream = read_documents_stream(spark, str(src), max_files_per_trigger=1)
        foreach_batch_minhash_dedup(
            stream, out, docs_bucket_table=table
        ).awaitTermination()

        got = spark.table(table).select("id", "dup")
        sh, keys = minhash_encode(docs)
        dropped = minhash_dominated(keys, sh, keys, sh)
        want = sh.join(
            dropped.withColumn("__d", F.lit(1)), "id", "left"
        ).select("id", F.col("__d").isNotNull().alias("dup"))
        cols = ["id", "dup"]
        assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

        # the verify-join shape: with a merge hint, the bucketed state
        # side needs no Exchange — only the candidate side shuffles
        cand = spark.range(0, 50).select(F.col("id"))
        j = spark.table(table).hint("MERGE").join(cand, "id")
        plan = (
            j.sparkSession._jsparkSession.sessionState()
            .executePlan(
                j._jdf.queryExecution().logical(),
                j._jdf.queryExecution().mode(),
            )
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") == 1  # candidate side only
        assert "Bucketed: true" in plan  # state scan consumes the layout
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_minhash_gate_committed_two_log_crash_recovery(spark, tmp_path):
    """committed=True: both state relations version through their own
    commit log (one manifest per applied batch), verdicts equal the
    batch twin, and the two-log crash window is closed by tagged
    appends — a replay after a simulated crash between the bands and
    docs commits re-applies ONLY the missing half (no double-append)."""
    import json
    import os
    import shutil

    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.operators.dedup import (
        minhash_dominated,
        minhash_encode,
    )
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_minhash_dedup,
        read_documents_stream,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    bounds = [min(ids)] + cuts + [max(ids) + 1]
    src = tmp_path / "doc_src_c"
    src.mkdir()
    for i in range(3):
        part = docs.where(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        scratch = tmp_path / f"c_scratch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        dest = src / f"b{i}.parquet"
        shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))

    out = str(tmp_path / "mh_state_c")

    def start():
        stream = read_documents_stream(spark, str(src), max_files_per_trigger=1)
        return foreach_batch_minhash_dedup(stream, out, committed=True)

    start().awaitTermination()
    dlog = TableLog(out + "/docs")
    blog = TableLog(out + "/bands")
    assert dlog.snapshot()[0] >= 2 and blog.snapshot()[0] >= 2

    sh, keys = minhash_encode(docs)
    dropped = minhash_dominated(keys, sh, keys, sh)
    want = sh.join(
        dropped.withColumn("__d", F.lit(1)), "id", "left"
    ).select("id", F.col("__d").isNotNull().alias("dup"))
    cols = ["id", "dup"]
    assert _sorted_rows(dlog.read(spark).select(*cols), cols) == _sorted_rows(
        want, cols
    )

    # simulate the crash between the two logs' commits on the LAST
    # batch: roll the docs log back one version (as if its append never
    # committed) and delete the marker — the replayed batch must skip
    # the bands append (its tag is already the newest commit) and
    # re-apply only the docs half
    n_docs_rows = dlog.read(spark).count()
    dv, _ = dlog.snapshot()
    bv, _ = blog.snapshot()
    marker = tmp_path / "mh_state_c_last_batch"
    last_batch = int(marker.read_text())
    # drop the newest docs manifest == un-commit the docs append; the
    # marker still shows the PREVIOUS batch (the crash hit mid-batch),
    # and the checkpoint goes too so the source actually redelivers
    (dlog.root / "_commits" / f"v{dv:012d}.json").unlink()
    marker.write_text(str(last_batch - 1))
    shutil.rmtree(str(tmp_path / "mh_state_c_checkpoint"))

    start().awaitTermination()
    assert blog.snapshot()[0] == bv  # bands half skipped via its tag
    assert dlog.snapshot()[0] == dv  # docs half re-applied, same version
    assert dlog.read(spark).count() == n_docs_rows
    assert _sorted_rows(dlog.read(spark).select(*cols), cols) == _sorted_rows(
        want, cols
    )
    assert int(marker.read_text()) == last_batch


def test_foreach_batch_phash_dedup_committed_equals_batch(spark, tmp_path):
    """committed=True on the phash gate: both state relations version
    through their commit logs (manifest per applied batch), manifest
    reads reproduce the batch verdicts, replay changes nothing."""
    import os
    import shutil

    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_phash_dedup,
        read_documents_stream,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    bounds = [min(ids)] + cuts + [max(ids) + 1]
    src = tmp_path / "doc_src_phc"
    src.mkdir()
    for i in range(3):
        part = docs.where(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        scratch = tmp_path / f"phc_scratch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        dest = src / f"b{i}.parquet"
        shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))

    out = str(tmp_path / "ph_state_c")

    def start():
        stream = read_documents_stream(spark, str(src), max_files_per_trigger=1)
        return foreach_batch_phash_dedup(stream, out, committed=True)

    start().awaitTermination()
    dlog = TableLog(out + "/docs")
    assert dlog.snapshot()[0] >= 2
    got = dlog.read(spark).select("id", "phash_hex", "dup")

    from cve_manager_spark.plans.pipeline import (
        _phash_band_candidates,
        _phash_df,
        _phash_hamming,
    )

    ph = _phash_df(spark, SF_SMALL)
    pairs = _phash_band_candidates(ph).where(_phash_hamming() <= 6)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct().withColumn(
        "__d", F.lit(1)
    )
    want = ph.join(dropped, "doc_id", "left").select(
        F.col("doc_id").alias("id"),
        "phash_hex",
        F.col("__d").isNotNull().alias("dup"),
    )
    cols = ["id", "phash_hex", "dup"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    start().awaitTermination()  # replay: markers + tags, no change
    assert _sorted_rows(dlog.read(spark).select(*cols), cols) == _sorted_rows(
        want, cols
    )


def _seed_doc_batches(spark, tmp_path, n_batches=3):
    """Documents as id-ordered single-file drops (the _seed_vec_batches
    pattern over the documents table). The corpus carries no exact text
    dups at sf0.001, so each doc is re-ingested under doc_id+100000 —
    the recrawl shape that guarantees cross-batch digest collisions."""
    import os
    import shutil

    base = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    cuts = [ids[(i + 1) * len(ids) // n_batches] for i in range(n_batches - 1)]
    bounds = [min(ids)] + cuts + [max(ids) + 1]
    src = tmp_path / "doc_src"
    src.mkdir()
    for i in range(n_batches):
        part = docs.where(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        scratch = tmp_path / f"doc_scratch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        dest = src / f"b{i}.parquet"
        shutil.move(str(next(scratch.glob("*.parquet"))), str(dest))
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))
    return docs, str(src)


def test_foreach_batch_digest_dedup_equals_batch_and_committed_crash(
    spark, tmp_path
):
    """The exact-digest gate as a thin _gated_dedup_sink config: after
    an id-ordered availableNow pass the state table's verdicts equal
    the one-shot batch greedy keep-lowest-id per digest, the state is
    hive-partitioned by digest prefix (the cross join's pruning key),
    replay is a no-op, and committed mode survives the marker-rewind
    crash via its tagged append."""
    import shutil

    from pyspark.sql import Window

    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_digest_dedup,
        read_documents_stream,
    )

    docs, src = _seed_doc_batches(spark, tmp_path)
    w = Window.partitionBy(F.md5("text"))
    want_df = docs.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") > F.min("doc_id").over(w)).alias("dup"),
    )
    cols = ["id", "dup"]
    want = _sorted_rows(want_df, cols)
    assert any(r[1] for r in want), "corpus has no exact dups — test is vacuous"

    out = str(tmp_path / "digest_state")

    def start(committed=False, o=out):
        stream = read_documents_stream(spark, src, max_files_per_trigger=1)
        return foreach_batch_digest_dedup(stream, o, committed=committed)

    start().awaitTermination()
    got = spark.read.parquet(out)
    assert _sorted_rows(got.select(*cols), cols) == want
    assert any(Path(out).glob("db=*"))  # prefix-partitioned state

    start().awaitTermination()  # replay: marker skips applied batches
    assert _sorted_rows(spark.read.parquet(out).select(*cols), cols) == want

    # committed mode: one manifest per applied batch; a crash between
    # the last append commit and the marker write must not double-append
    outc = str(tmp_path / "digest_state_c")
    start(committed=True, o=outc).awaitTermination()
    log = TableLog(outc)
    v_before, _ = log.snapshot()
    assert v_before >= 2 and log.last_op().startswith("append@b")
    assert _sorted_rows(log.read(spark).select(*cols), cols) == want

    marker = tmp_path / "digest_state_c_last_batch"
    last_batch = int(marker.read_text())
    marker.write_text(str(last_batch - 1))
    shutil.rmtree(str(tmp_path / "digest_state_c_checkpoint"))
    start(committed=True, o=outc).awaitTermination()
    assert log.snapshot()[0] == v_before  # tag-skipped, no new version
    assert _sorted_rows(log.read(spark).select(*cols), cols) == want
    assert int(marker.read_text()) == last_batch


def test_foreach_batch_quantile_hist_equals_batch_sketch(spark, tmp_path):
    """Streaming log2-bucket quantile state == the batch sketch exactly
    (counter addition is associative+commutative, so micro-batch
    chopping cannot change the histogram), and the quantile estimates
    through the accumulated state match the registry
    logbucket_quantile_error spec's estimates group-for-group. Replay
    rebuilds identical state."""
    from cve_manager_spark.plans.sketches import logbucket_quantile_error
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_quantile_hist,
        quantile_hist_estimate,
        read_quantile_hist_state,
    )

    src_dir = str(tmp_path / "events_qhist_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "qhist_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_quantile_hist(stream, out)

    start().awaitTermination()
    state = read_quantile_hist_state(spark, out)
    assert state.agg(F.sum("c")).head()[0] == events.count()

    got = quantile_hist_estimate(state).select(
        F.col("g").alias("event_type"), "p50_est", "p90_est", "p99_est"
    )
    want = logbucket_quantile_error(spark, SF_SMALL).select(
        "event_type", "p50_est", "p90_est", "p99_est"
    )
    cols = ["event_type", "p50_est", "p90_est", "p99_est"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)

    # real re-delivery (not a no-op restart): drop the checkpoint so
    # every batch id replays over the existing snapshots
    pre_replay = _sorted_rows(state, ["g", "b", "c"])  # materialize now:
    # the replay overwrites the snapshot files this lazy plan points at
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    state2 = read_quantile_hist_state(spark, out)
    assert _sorted_rows(state2, ["g", "b", "c"]) == pre_replay


def test_vacuum_snapshot_state_keeps_reads_and_resume_intact(spark, tmp_path):
    """Sketch-state retention (the commit-log manifest-retention
    counterpart): after vacuuming all but the newest snapshot, reads
    see the identical state, and a LATER micro-batch still merges from
    the surviving newest predecessor — the stream resumes across the
    vacuum with nothing lost."""
    from cve_manager_spark.streaming.sinks import (
        _list_state_versions,
        foreach_batch_quantile_hist,
        read_quantile_hist_state,
        vacuum_snapshot_state,
    )

    src_dir = str(tmp_path / "events_vac_src")
    events = load_table(spark, SF_SMALL, "events")
    stamped = events.withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    )
    first = stamped.where(F.col("event_id") % 4 != 0)
    later = stamped.where(F.col("event_id") % 4 == 0)
    first.repartition(3).write.parquet(src_dir)
    out = str(tmp_path / "qhist_state_vac")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_quantile_hist(stream, out)

    start().awaitTermination()
    assert len(_list_state_versions(spark, out)) >= 2
    before = _sorted_rows(read_quantile_hist_state(spark, out), ["g", "b", "c"])

    with pytest.raises(ValueError):
        # keep_last=1 would delete the re-delivery merge base
        vacuum_snapshot_state(spark, out, keep_last=1)

    report = vacuum_snapshot_state(spark, out, keep_last=2)
    assert report["dropped"] >= 1
    assert len(_list_state_versions(spark, out)) == 2
    after = _sorted_rows(read_quantile_hist_state(spark, out), ["g", "b", "c"])
    assert after == before  # snapshots are self-contained

    # the stream resumes: a later batch merges from the survivor
    later.repartition(1).write.mode("append").parquet(src_dir)
    start().awaitTermination()
    state = read_quantile_hist_state(spark, out)
    assert state.agg(F.sum("c")).head()[0] == events.count()


def test_foreach_batch_kmv_equals_batch_sketch(spark, tmp_path):
    """Streaming KMV state == the batch sketch exactly (merge = k
    smallest of the union — idempotent and commutative, so micro-batch
    chopping cannot change it), and distinct-count estimates through
    the accumulated state match the registry kmv_set_ops_error spec's
    per-set estimates. Replay rebuilds identical state."""
    from cve_manager_spark.plans.sketches import kmv_set_ops_error
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_kmv,
        kmv_estimate,
        read_kmv_state,
    )

    src_dir = str(tmp_path / "events_kmv_src")
    events = load_table(spark, SF_SMALL, "events").where(
        F.col("event_type").isin("click", "view")
    )
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "kmv_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_kmv(stream, out)

    start().awaitTermination()
    state = read_kmv_state(spark, out)
    est = {r["g"]: r["estimate"] for r in kmv_estimate(state).collect()}
    want = kmv_set_ops_error(spark, SF_SMALL).head()
    assert est["click"] == want["est_a"]
    assert est["view"] == want["est_b"]

    # real re-delivery (not a no-op restart): drop the checkpoint so
    # every batch id replays over the existing snapshots
    pre_replay = _sorted_rows(state, ["g", "h"])  # materialize now: the
    # replay overwrites the snapshot files this lazy plan points at
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    state2 = read_kmv_state(spark, out)
    assert _sorted_rows(state2, ["g", "h"]) == pre_replay


def test_foreach_batch_join_view_equals_batch_recompute(spark, tmp_path):
    """The incrementally maintained JOIN view must equal the batch
    recompute facts ⋈ latest-dim after a stream of CDC upserts, while
    each later version dir rewrites ONLY the buckets its delta touches
    (never the whole view), out-of-order-safe (an older update cannot
    clobber a newer row), and replay-idempotent."""
    from cve_manager_spark.streaming.sinks import (
        _list_day_dirs,
        _list_state_versions,
        foreach_batch_join_view,
        read_join_view,
    )

    cust = load_table(spark, SF_SMALL, "customer")
    # CDC chunks with disjoint update key sets and a total per-key order
    c1 = cust.withColumn("upd_ts", F.lit(1).cast("long"))
    c2 = (
        cust.where(F.col("c_custkey") % 5 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
        .withColumn("upd_ts", F.lit(2).cast("long"))
    )
    c3 = (
        cust.where((F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 5 != 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + 7777.0)
        .withColumn("upd_ts", F.lit(3).cast("long"))
    )
    src = str(tmp_path / "dim_cdc_src")
    c1.repartition(1).write.parquet(src)
    c2.repartition(1).write.mode("append").parquet(src)
    c3.repartition(1).write.mode("append").parquet(src)

    out = str(tmp_path / "join_view")
    facts_path = f"{SF_SMALL}/orders.parquet"

    def start():
        stream = (
            spark.readStream.schema(c1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return foreach_batch_join_view(
            stream, out, facts_path, "o_custkey", "c_custkey", "upd_ts",
            n_buckets=64,
        )

    start().awaitTermination()

    # batch recompute: latest dim row per key, inner join onto facts
    dim_all = c1.unionByName(c2).unionByName(c3)
    w = Window.partitionBy("c_custkey").orderBy(F.col("upd_ts").desc())
    dim_final = (
        dim_all.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    facts = spark.read.parquet(facts_path)
    want_df = facts.join(dim_final, facts.o_custkey == dim_final.c_custkey)
    view = read_join_view(spark, out)
    cols = sorted(view.columns)
    assert sorted(want_df.columns) == cols
    want = _sorted_rows(want_df, cols)
    assert _sorted_rows(view, cols) == want

    # surgical rewrites: later versions hold only their touched buckets
    versions = _list_state_versions(spark, out)
    assert len(versions) == 3
    later_buckets = [
        _list_day_dirs(spark, f"{out}/_state_v{v}", "kb")
        for v in versions[1:]
    ]
    n_delta_keys = [c2.count(), c3.count()]
    for dirs, nk in zip(sorted(later_buckets, key=len, reverse=True),
                        sorted(n_delta_keys, reverse=True)):
        assert 0 < len(dirs) <= min(nk, 64)
        assert len(dirs) < 64  # never the whole view

    # replay: drop the checkpoint so every batch re-delivers; the
    # order-aware merge makes each a no-op against equal-or-newer state
    pre_replay = want
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    assert _sorted_rows(read_join_view(spark, out), cols) == pre_replay


def test_apply_facts_changes_closes_the_cdf_ivm_loop(spark, tmp_path):
    """Two-sided IVM: after the dim-side stream builds the join view,
    facts-side commits (merge_upsert + delete) flow through the
    commit log's CDF into the view — which must then equal the batch
    recompute of CURRENT facts ⋈ latest dim. Re-applying the same
    changeset is a no-op (idempotent delta algebra)."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import (
        apply_facts_changes,
        foreach_batch_join_view,
        read_join_view,
    )

    cust = load_table(spark, SF_SMALL, "customer")
    dim = cust.withColumn("upd_ts", F.lit(1).cast("long"))
    src = str(tmp_path / "dim_src_cdf")
    dim.repartition(1).write.parquet(src)

    # commit-logged facts table
    fdir = str(tmp_path / "facts_log")
    load_table(spark, SF_SMALL, "orders").write.parquet(fdir)
    log = TableLog(fdir)
    log.init()
    v0 = log.latest_version()

    out = str(tmp_path / "join_view_cdf")
    stream = (
        spark.readStream.schema(dim.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    foreach_batch_join_view(
        stream, out, fdir, "o_custkey", "c_custkey", "upd_ts", n_buckets=64
    ).awaitTermination()

    # facts-side commits: reprice some orders, drop others
    upd = (
        log.read(spark)
        .where(F.col("o_orderkey") % 11 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
    )
    log.merge_upsert(spark, upd, ["o_orderkey"])
    log.delete_where(spark, "o_orderkey % 13 = 0")
    v2 = log.latest_version()

    changes = log.changes(spark, v0, v2, key_cols=["o_orderkey"])
    report = apply_facts_changes(
        spark, out, changes, dim, "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=64,
    )
    assert report["version"] is not None
    assert 0 < report["touched_buckets"] <= 64

    want_df = log.read(spark).join(
        dim, F.col("o_custkey") == F.col("c_custkey")
    )
    view = read_join_view(spark, out)
    cols = sorted(view.columns)
    assert sorted(want_df.columns) == cols
    want = _sorted_rows(want_df, cols)
    assert _sorted_rows(view, cols) == want

    # idempotent: re-applying the same changeset changes nothing
    apply_facts_changes(
        spark, out, changes, dim, "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=64,
    )
    assert _sorted_rows(read_join_view(spark, out), cols) == want


def test_foreach_batch_heavy_hitters_guarantees_hold(spark, tmp_path):
    """Misra-Gries state: at most k counters; every key with true count
    > N/(k+1) is retained; every counter is a LOWER bound whose
    undercount obeys (N - sum(counters))/(k+1) — the guarantees that
    survive any micro-batch chopping (the summary itself is
    order-dependent, so bounds, not equality, are the contract).
    Replay rebuilds identical state (the decrement rule is a
    deterministic set operation)."""
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_heavy_hitters,
        heavy_hitters_report,
        read_heavy_hitters_state,
    )

    k = 8
    src_dir = str(tmp_path / "events_mg_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "mg_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_heavy_hitters(stream, out, k=k)

    start().awaitTermination()
    state = read_heavy_hitters_state(spark, out)
    rows = state.collect()
    assert 0 < len(rows) <= k
    n_total = rows[0]["n_total"]
    assert n_total == events.count()
    sum_c = sum(r["c"] for r in rows)

    exact = {
        str(r["user_id"]): r["n"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    in_state = {r["key"]: r["c"] for r in rows}
    # containment: every key above the N/(k+1) frequency threshold kept
    for key, n in exact.items():
        if n * (k + 1) > n_total:
            assert key in in_state, (key, n)
    # lower bound + undercount bound, per retained key
    for key, c in in_state.items():
        assert c <= exact[key]
        assert (exact[key] - c) * (k + 1) <= n_total - sum_c

    # the report carries the same bound
    rep = {r["key"]: r for r in heavy_hitters_report(state, k=k).collect()}
    for key, r in rep.items():
        assert exact[key] - r["estimate"] <= r["max_undercount"] + (k + 1)

    # replay: deterministic decrement rule rebuilds identical state
    pre_replay = sorted((r["key"], r["c"], r["n_total"]) for r in rows)
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    state2 = read_heavy_hitters_state(spark, out)
    assert sorted(
        (r["key"], r["c"], r["n_total"]) for r in state2.collect()
    ) == pre_replay


def _cdf_tail_fixture(spark, tmp_path, tag: str):
    """Commit-logged orders table + dim parquet + a view bootstrapped
    from the v0 snapshot, cursor pinned at v0 — the starting state for
    every stream_cdf_tail scenario."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import apply_facts_changes

    fdir = str(tmp_path / f"facts_log_{tag}")
    load_table(spark, SF_SMALL, "orders").write.parquet(fdir)
    log = TableLog(fdir)
    log.init()
    dim = load_table(spark, SF_SMALL, "customer")
    dim_path = str(tmp_path / f"dim_{tag}")
    dim.repartition(1).write.parquet(dim_path)
    out = str(tmp_path / f"jv_{tag}")
    cursor = str(tmp_path / f"cursor_{tag}.json")
    seed = log.read(spark, version=0).select(
        "*",
        F.lit("insert").alias("_change_type"),
        F.lit(1).cast("long").alias("_change_count"),
    )
    apply_facts_changes(
        spark, out, seed, dim, "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    )
    return log, dim, dim_path, out, cursor


def _cdf_view_matches_batch(spark, log, dim, out):
    from cve_manager_spark.streaming.sinks import read_join_view

    want_df = log.read(spark).join(
        dim, F.col("o_custkey") == F.col("c_custkey")
    )
    view = read_join_view(spark, out)
    cols = sorted(view.columns)
    assert sorted(want_df.columns) == cols
    assert _sorted_rows(view, cols) == _sorted_rows(want_df, cols)


def test_stream_cdf_tail_drains_backlog_version_by_version(
    spark, tmp_path
):
    """The self-driving CDC loop: three facts-side commits back up
    behind the cursor; one availableNow run of the tail consumer
    drains them version-by-version (one view version per commit — the
    per-span ack granularity), after which the view equals the batch
    recompute and a second run is a no-op."""
    from cve_manager_spark.streaming.sinks import (
        _list_state_versions,
        stream_cdf_tail,
    )

    log, dim, dim_path, out, cursor = _cdf_tail_fixture(
        spark, tmp_path, "drain"
    )
    # pin the cursor at v0 (latest-mode init would skip the backlog)
    res = log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"], start_version=0
    )
    assert res is None  # nothing committed past v0 yet

    upd = (
        log.read(spark)
        .where(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 9.0)
    )
    log.merge_upsert(spark, upd, ["o_orderkey"])
    log.delete_where(spark, "o_orderkey % 5 = 0")
    fresh = log.read(spark).where(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        *[c for c in log.read(spark).columns if c != "o_orderkey"],
    )
    log.append(spark, fresh)

    before = set(_list_state_versions(spark, out))
    stream_cdf_tail(
        spark, str(log.root), cursor, out, dim_path,
        "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32, max_versions_per_step=1,
    ).awaitTermination()
    after = set(_list_state_versions(spark, out))
    assert len(after - before) == 3  # one view version per commit
    _cdf_view_matches_batch(spark, log, dim, out)

    # drained: a second run sees no backlog and writes nothing
    stream_cdf_tail(
        spark, str(log.root), cursor, out, dim_path,
        "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    ).awaitTermination()
    assert set(_list_state_versions(spark, out)) == after
    _cdf_view_matches_batch(spark, log, dim, out)


def test_stream_cdf_tail_crash_before_ack_replays_exactly_once(
    spark, tmp_path
):
    """At-least-once delivery through the cursor, exactly-once effect
    through the idempotent applier: a consumer that applied a span but
    crashed before acking leaves the cursor behind; the tail consumer
    re-delivers and re-applies that span, and the view still equals
    the batch recompute."""
    from cve_manager_spark.streaming.sinks import (
        apply_facts_changes,
        stream_cdf_tail,
    )

    log, dim, dim_path, out, cursor = _cdf_tail_fixture(
        spark, tmp_path, "crash"
    )
    log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"], start_version=0
    )
    log.delete_where(spark, "o_orderkey % 4 = 1")

    # simulate the crash: consume + apply, but never ack
    changes, _ack = log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"]
    )
    apply_facts_changes(
        spark, out, changes, dim, "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    )
    # the restarted consumer re-delivers the un-acked span
    stream_cdf_tail(
        spark, str(log.root), cursor, out, dim_path,
        "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    ).awaitTermination()
    _cdf_view_matches_batch(spark, log, dim, out)
    assert log.consume_changes(spark, cursor) is None  # now acked


def test_stream_cdf_tail_fails_loudly_past_vacuum_retention(
    spark, tmp_path
):
    """A cursor older than the vacuum window must FAIL the streaming
    query, never silently skip the reclaimed versions — the standard
    CDC-retention trade surfaced as a query error."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from cve_manager_spark.streaming.sinks import stream_cdf_tail

    log, dim, dim_path, out, cursor = _cdf_tail_fixture(
        spark, tmp_path, "vac"
    )
    log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"], start_version=0
    )
    log.delete_where(spark, "o_orderkey % 6 = 2")
    log.delete_where(spark, "o_orderkey % 6 = 3")
    log.vacuum(keep_versions=1, min_age_seconds=0)

    q = stream_cdf_tail(
        spark, str(log.root), cursor, out, dim_path,
        "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()


def _ss_fixture(spark, tmp_path, tag: str, n_fact_chunks=3, n_dim_chunks=3):
    """Fact-event and dim-CDC source dirs chopped into files (one file
    per micro-batch under maxFilesPerTrigger=1), plus the expected
    batch recompute: facts ⋈ newest-dim-per-key."""
    facts = spark.range(0, 300).select(
        F.col("id").alias("f_id"),
        (F.col("id") % 40).alias("f_cust"),
        (F.col("id") * 3).alias("f_val"),
    )
    # two updates for most keys, interleaved order, distinct upd_ts
    dim = spark.range(0, 40).select(
        F.col("id").alias("d_cust"),
        F.concat(F.lit("seg-old-"), F.col("id")).alias("d_seg"),
        (F.col("id") + 100).alias("upd_ts"),
    ).unionByName(
        spark.range(0, 30).select(
            F.col("id").alias("d_cust"),
            F.concat(F.lit("seg-new-"), F.col("id")).alias("d_seg"),
            (F.col("id") + 1000).alias("upd_ts"),
        )
    )
    fsrc = str(tmp_path / f"ss_facts_{tag}")
    dsrc = str(tmp_path / f"ss_dim_{tag}")
    facts.repartition(n_fact_chunks).write.parquet(fsrc)
    dim.repartition(n_dim_chunks).write.parquet(dsrc)
    want = facts.join(
        dim.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("d_cust").orderBy(F.col("upd_ts").desc())
            ),
        ).where("__rn = 1").drop("__rn"),
        F.col("f_cust") == F.col("d_cust"),
    )
    return facts, dim, fsrc, dsrc, want


def _ss_start(spark, fsrc, dsrc, out, facts_schema, dim_schema, **kw):
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_ss_dim,
        foreach_batch_ss_facts,
    )

    qf = foreach_batch_ss_facts(
        spark.readStream.schema(facts_schema)
        .option("maxFilesPerTrigger", 1).parquet(fsrc),
        out, "f_id", "f_cust", "d_cust", n_buckets=8,
    )
    qd = foreach_batch_ss_dim(
        spark.readStream.schema(dim_schema)
        .option("maxFilesPerTrigger", 1).parquet(dsrc),
        out, "f_cust", "d_cust", "upd_ts", n_buckets=8, **kw,
    )
    return qf, qd


def test_two_stream_join_converges_under_concurrent_delivery(
    spark, tmp_path
):
    """Fact stream ⋈ dim stream: both availableNow queries run
    CONCURRENTLY, their micro-batches interleaving on the shared
    state lock in whatever order the scheduler picks — and the drained
    view equals the batch recompute facts ⋈ newest-dim. Replaying both
    streams from scratch (checkpoints wiped, states kept) changes
    nothing: fact inserts dedupe by id, dim updates lose ties to the
    state (true MERGE)."""
    from cve_manager_spark.streaming.sinks import read_stream_stream_join

    facts, dim, fsrc, dsrc, want = _ss_fixture(spark, tmp_path, "conc")
    out = str(tmp_path / "ss_out_conc")
    qf, qd = _ss_start(spark, fsrc, dsrc, out, facts.schema, dim.schema)
    qf.awaitTermination()
    qd.awaitTermination()

    view = read_stream_stream_join(spark, out)
    cols = sorted(view.columns)
    assert sorted(want.columns) == cols
    want_rows = _sorted_rows(want, cols)
    assert _sorted_rows(view, cols) == want_rows

    shutil.rmtree(f"{out}/_checkpoint_facts")
    shutil.rmtree(f"{out}/_checkpoint_dim")
    qf, qd = _ss_start(spark, fsrc, dsrc, out, facts.schema, dim.schema)
    qf.awaitTermination()
    qd.awaitTermination()
    assert _sorted_rows(read_stream_stream_join(spark, out), cols) == want_rows


def test_two_stream_join_converges_whichever_side_arrives_first(
    spark, tmp_path
):
    """Order independence at the extremes: dim fully drained before any
    fact (facts join state on arrival) and facts fully drained before
    any dim (facts wait in state; the dim delta back-joins them) both
    converge to the same batch recompute."""
    from cve_manager_spark.streaming.sinks import read_stream_stream_join

    for order in ("dim_first", "facts_first"):
        facts, dim, fsrc, dsrc, want = _ss_fixture(spark, tmp_path, order)
        out = str(tmp_path / f"ss_out_{order}")
        first, second = (
            ("dim", "facts") if order == "dim_first" else ("facts", "dim")
        )
        from cve_manager_spark.streaming.sinks import (
            foreach_batch_ss_dim,
            foreach_batch_ss_facts,
        )

        def start(side):
            if side == "facts":
                return foreach_batch_ss_facts(
                    spark.readStream.schema(facts.schema)
                    .option("maxFilesPerTrigger", 1).parquet(fsrc),
                    out, "f_id", "f_cust", "d_cust", n_buckets=8,
                )
            return foreach_batch_ss_dim(
                spark.readStream.schema(dim.schema)
                .option("maxFilesPerTrigger", 1).parquet(dsrc),
                out, "f_cust", "d_cust", "upd_ts", n_buckets=8,
            )

        start(first).awaitTermination()
        start(second).awaitTermination()
        view = read_stream_stream_join(spark, out)
        cols = sorted(view.columns)
        assert _sorted_rows(view, cols) == _sorted_rows(want, cols), order


def test_two_stream_join_replay_repairs_lost_view_write(spark, tmp_path):
    """r13 (ADVICE medium): each two-stream batch performs two
    non-atomic writes (state, then view). The r12 code detected
    replays with data-level filters on the STATE, so a crash between
    the writes made the re-delivered batch a no-op — state already
    applied — and the view permanently missed that batch's rows
    (facts side) or kept stale dim images plus a watermark persisted
    ahead of writes it never reflected (dim side). This test forges
    exactly those crash states by hand (state version written, view
    untouched) and asserts the replay REPAIRS the view on both
    sides."""
    from cve_manager_spark.streaming.sinks import (
        _STATE_PREFIX,
        _list_state_versions,
        _ss_kb,
        foreach_batch_ss_dim,
        foreach_batch_ss_facts,
        read_stream_stream_join,
    )

    out = str(tmp_path / "ss_crash")
    NB = 4
    facts1 = spark.range(0, 40).select(
        F.col("id").alias("f_id"),
        (F.col("id") % 8).alias("f_cust"),
        (F.col("id") * 2).alias("f_val"),
    )
    dim1 = spark.range(0, 8).select(
        F.col("id").alias("d_cust"),
        F.concat(F.lit("old-"), F.col("id")).alias("d_seg"),
        (F.col("id") + 10).alias("upd_ts"),
    )
    fsrc = str(tmp_path / "crash_fsrc")
    dsrc = str(tmp_path / "crash_dsrc")
    facts1.coalesce(1).write.parquet(fsrc)
    dim1.coalesce(1).write.parquet(dsrc)

    def run_facts():
        foreach_batch_ss_facts(
            spark.readStream.schema(facts1.schema).parquet(fsrc),
            out, "f_id", "f_cust", "d_cust", n_buckets=NB,
        ).awaitTermination()

    def run_dim():
        foreach_batch_ss_dim(
            spark.readStream.schema(dim1.schema).parquet(dsrc),
            out, "f_cust", "d_cust", "upd_ts", n_buckets=NB,
        ).awaitTermination()

    run_dim()
    run_facts()
    cols = None

    # ---- facts side: state write survived the crash, view write lost
    facts2 = spark.range(100, 120).select(
        F.col("id").alias("f_id"),
        (F.col("id") % 8).alias("f_cust"),
        (F.col("id") * 2).alias("f_val"),
    )
    fv = _list_state_versions(spark, f"{out}/facts_state")
    facts2.withColumn("kb", _ss_kb("f_cust", NB)).write.partitionBy(
        "kb"
    ).parquet(f"{out}/facts_state/{_STATE_PREFIX}{fv[-1] + 1}")
    # (view deliberately NOT extended — the crash point)
    facts2.coalesce(1).write.mode("append").parquet(fsrc)
    shutil.rmtree(f"{out}/_checkpoint_facts")
    run_facts()  # replay: state no-op, view gap must be filled
    view = read_stream_stream_join(spark, out)
    want = facts1.unionByName(facts2).join(
        dim1, F.col("f_cust") == F.col("d_cust")
    )
    cols = sorted(view.columns)
    assert _sorted_rows(view, cols) == _sorted_rows(want, cols)

    # ---- dim side: merged state write survived, view + watermark lost
    dim2 = spark.range(0, 8).select(
        F.col("id").alias("d_cust"),
        F.concat(F.lit("new-"), F.col("id")).alias("d_seg"),
        (F.col("id") + 100).alias("upd_ts"),
    )
    dv = _list_state_versions(spark, f"{out}/dim_state")
    # every key updated → the merged touched-bucket content IS dim2
    dim2.withColumn("kb", _ss_kb("d_cust", NB)).write.partitionBy(
        "kb"
    ).parquet(f"{out}/dim_state/{_STATE_PREFIX}{dv[-1] + 1}")
    # (view NOT rebuilt, watermark NOT advanced — the crash point)
    dim2.coalesce(1).write.mode("append").parquet(dsrc)
    shutil.rmtree(f"{out}/_checkpoint_dim")
    run_dim()  # replay: strictly-newer delta empty; stale keys rebuilt
    view = read_stream_stream_join(spark, out)
    want2 = facts1.unionByName(facts2).join(
        dim2, F.col("f_cust") == F.col("d_cust")
    )
    assert _sorted_rows(view, cols) == _sorted_rows(want2, cols)

    # fully-applied replay stays a no-op: no new view version dir
    nv = len(_list_state_versions(spark, f"{out}/view"))
    shutil.rmtree(f"{out}/_checkpoint_dim")
    run_dim()
    shutil.rmtree(f"{out}/_checkpoint_facts")
    run_facts()
    assert len(_list_state_versions(spark, f"{out}/view")) == nv
    assert _sorted_rows(
        read_stream_stream_join(spark, out), cols
    ) == _sorted_rows(want2, cols)


def test_two_stream_join_watermark_bounds_dim_reordering(spark, tmp_path):
    """Watermark-bounded reordering: an out-of-order dim update WITHIN
    the delay applies (and rewrites the joined view rows); one trailing
    the high-watermark by MORE than the delay is dropped even though it
    is newest for its own key — the late-data-drop contract, CDC
    edition."""
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_ss_dim,
        foreach_batch_ss_facts,
        read_stream_stream_join,
    )

    facts = spark.createDataFrame(
        [(1, 10, 5), (2, 11, 7), (3, 12, 9)],
        "f_id long, f_cust long, f_val long",
    )
    fsrc = str(tmp_path / "wm_facts")
    facts.repartition(1).write.parquet(fsrc)
    out = str(tmp_path / "wm_out")
    foreach_batch_ss_facts(
        spark.readStream.schema(facts.schema).parquet(fsrc),
        out, "f_id", "f_cust", "d_cust", n_buckets=4,
    ).awaitTermination()

    dsrc = str(tmp_path / "wm_dim")
    dim_schema = "d_cust long, d_seg string, upd_ts long"

    def dim_batch(rows, tag):
        d = spark.createDataFrame(rows, dim_schema)
        d.repartition(1).write.mode("append").parquet(dsrc)
        foreach_batch_ss_dim(
            spark.readStream.schema(d.schema).parquet(dsrc),
            out, "f_cust", "d_cust", "upd_ts",
            n_buckets=4, watermark_delay=100,
        ).awaitTermination()

    # t=1000 for key 10 and 12: hw becomes 1000
    dim_batch([(10, "a@1000", 1000), (12, "c@1000", 1000)], "b1")
    # out-of-order but within delay (>= 900): applies to key 11
    dim_batch([(11, "b@950", 950)], "b2")
    # ancient update for key 12 (t=800 < 1000-100): dropped though
    # it is an update its key would otherwise take... (older ts —
    # MERGE would drop it anyway), so use a NEW key 13: dropped too
    dim_batch([(13, "d@800", 800)], "b3")

    view = read_stream_stream_join(spark, out)
    got = {(r["f_id"], r["d_seg"]) for r in view.collect()}
    assert got == {(1, "a@1000"), (2, "b@950"), (3, "c@1000")}
    # and the within-delay but OLDER-than-state update for key 10 is
    # a MERGE no-op (ties/older lose to the state)
    dim_batch([(10, "a@999-stale", 999)], "b4")
    got = {
        (r["f_id"], r["d_seg"])
        for r in read_stream_stream_join(spark, out).collect()
    }
    assert got == {(1, "a@1000"), (2, "b@950"), (3, "c@1000")}


def test_foreach_batch_bottomk_sample_equals_batch(spark, tmp_path):
    """Streaming bottom-k sample state == the batch bottom-k over the
    whole table (merge = bottom-k of the union — idempotent and
    commutative, so chopping cannot change the sample), state is ≤ k
    rows with payload attached, replay rebuilds identical state, and
    vacuum keeps the resume invariant."""
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_bottomk_sample,
        read_bottomk_sample_state,
        vacuum_snapshot_state,
    )

    k = 32
    src_dir = str(tmp_path / "events_bk_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
        )
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "bk_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_bottomk_sample(stream, out, k=k)

    start().awaitTermination()
    state = read_bottomk_sample_state(spark, out)
    rows = state.collect()
    assert len(rows) == min(k, events.count())

    want = {
        (r["d"], r["id"], r["event_type"], r["value"])
        for r in events.select(
            F.md5(F.expr("cast(event_id as string)")).alias("d"),
            F.expr("cast(event_id as string)").alias("id"),
            "event_type",
            "value",
        )
        .orderBy("d")
        .limit(k)
        .collect()
    }
    got = {(r["d"], r["id"], r["event_type"], r["value"]) for r in rows}
    assert got == want

    pre_replay = sorted(got)
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    state2 = read_bottomk_sample_state(spark, out)
    assert sorted(
        (r["d"], r["id"], r["event_type"], r["value"])
        for r in state2.collect()
    ) == pre_replay

    # retention: only the trailing keep_last snapshots survive, reads
    # and a further replayed run still work
    rep = vacuum_snapshot_state(spark, out, keep_last=2)
    assert rep["dropped"] >= 0
    state3 = read_bottomk_sample_state(spark, out)
    assert sorted(
        (r["d"], r["id"], r["event_type"], r["value"])
        for r in state3.collect()
    ) == pre_replay


def test_foreach_batch_bottomk_stratified_equals_batch(spark, tmp_path):
    """Stratified bottom-k state (the eighth sketch state) == the
    registered batch face over the whole table: per-group k-smallest
    md5 with payload, merge law = per-group bottom-k of the union, so
    chopping cannot shift any stratum's sample; every group seen holds
    ≤ k rows; replay rebuilds identical state; vacuum keeps the resume
    invariant."""
    from cve_manager_spark.plans.registry import collect
    from cve_manager_spark.streaming.sinks import (
        foreach_batch_bottomk_stratified,
        read_bottomk_stratified_state,
        vacuum_snapshot_state,
    )

    k = 16
    src_dir = str(tmp_path / "events_bks_src")
    events = load_table(spark, SF_SMALL, "events")
    (
        events.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
        )
        .repartition(3)
        .write.parquet(src_dir)
    )
    out = str(tmp_path / "bks_state")

    def start():
        stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
        return foreach_batch_bottomk_stratified(stream, out, k=k)

    start().awaitTermination()
    state = read_bottomk_stratified_state(spark, out)
    rows = {
        (r["grp"], r["d"], r["id"], r["value"]) for r in state.collect()
    }
    per_group = {}
    for grp, *_ in rows:
        per_group[grp] = per_group.get(grp, 0) + 1
    assert set(per_group) == {
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    }
    assert all(c <= k for c in per_group.values())

    # == the oracle-paired batch face (same strata, same rows)
    face = collect()["sample_bottomk_stratified"].build(spark, SF_SMALL)
    want = {
        (r["event_type"], r["d"], r["id"], r["value"])
        for r in face.collect()
    }
    assert rows == want

    # replay-idempotent + vacuum-compatible
    shutil.rmtree(f"{out}/_checkpoint")
    start().awaitTermination()
    assert {
        (r["grp"], r["d"], r["id"], r["value"])
        for r in read_bottomk_stratified_state(spark, out).collect()
    } == want
    vacuum_snapshot_state(spark, out, keep_last=2)
    assert {
        (r["grp"], r["d"], r["id"], r["value"])
        for r in read_bottomk_stratified_state(spark, out).collect()
    } == want


def test_compact_two_stream_state_preserves_view_and_keeps_applying(
    spark, tmp_path
):
    """State compaction for the two-stream join: folding the facts
    union state and both overlays must leave the composed view
    byte-for-row identical, shrink every state dir to ≤ 2 versions,
    and later dim batches must keep applying correctly on top of the
    folded base."""
    from cve_manager_spark.streaming.sinks import (
        _list_state_versions,
        compact_two_stream_state,
        foreach_batch_ss_dim,
        read_stream_stream_join,
    )

    facts, dim, fsrc, dsrc, want = _ss_fixture(
        spark, tmp_path, "cmp", n_fact_chunks=4, n_dim_chunks=4
    )
    out = str(tmp_path / "ss_out_cmp")
    qf, qd = _ss_start(spark, fsrc, dsrc, out, facts.schema, dim.schema)
    qf.awaitTermination()
    qd.awaitTermination()

    view = read_stream_stream_join(spark, out)
    cols = sorted(view.columns)
    before = _sorted_rows(view, cols)
    assert len(_list_state_versions(spark, f"{out}/facts_state")) >= 3

    rep = compact_two_stream_state(spark, out)
    assert rep["facts_state"]["folded"] >= 2
    for sub in ("facts_state", "dim_state", "view"):
        assert len(_list_state_versions(spark, f"{out}/{sub}")) <= 2
    assert _sorted_rows(read_stream_stream_join(spark, out), cols) == before

    # a post-compaction dim update still rewrites the folded view
    late = spark.createDataFrame(
        [(0, "seg-late-0", 99, 0, "x", 9999)],
        dim.schema,
    ) if False else dim.where(F.col("d_cust") == 0).limit(1).select(
        "d_cust",
        F.lit("seg-late-0").alias("d_seg"),
        F.lit(9999).cast("long").alias("upd_ts"),
    )
    late.repartition(1).write.mode("append").parquet(dsrc)
    foreach_batch_ss_dim(
        spark.readStream.schema(late.schema).parquet(dsrc),
        out, "f_cust", "d_cust", "upd_ts", n_buckets=8,
    ).awaitTermination()
    got = read_stream_stream_join(spark, out)
    segs = {r["d_seg"] for r in got.where(F.col("f_cust") == 0).collect()}
    assert segs == {"seg-late-0"}
    n_k0 = want.where(F.col("f_cust") == 0).count()
    assert got.where(F.col("f_cust") == 0).count() == n_k0


def test_sync_join_view_drains_both_logs_to_batch_recompute(
    spark, tmp_path
):
    """Two-LOG IVM: facts and dim are both ordinary commit-logged
    tables; after interleaved commits on each (reprice + purge + ingest
    on facts, segment rewrite + customer erasure on dim), ONE
    sync_join_view call brings the view to facts ⋈ dim at the two
    heads — deleted dim keys take their facts out, updated ones carry
    new images. A repeated sync is a no-op, and a crash before ack
    re-delivers into the idempotent applier without double effect."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import (
        apply_dim_changes,
        bootstrap_join_view,
        read_join_view,
        sync_join_view,
    )

    fdir = str(tmp_path / "tl_facts")
    ddir = str(tmp_path / "tl_dim")
    load_table(spark, SF_SMALL, "orders").write.parquet(fdir)
    load_table(spark, SF_SMALL, "customer").write.parquet(ddir)
    flog, dlog = TableLog(fdir), TableLog(ddir)
    flog.init()
    dlog.init()

    out = str(tmp_path / "tl_view")
    fcur = str(tmp_path / "fcur.json")
    dcur = str(tmp_path / "dcur.json")
    bootstrap_join_view(
        spark, out, flog, dlog, fcur, dcur,
        "o_orderkey", "o_custkey", "c_custkey", n_buckets=32,
    )

    # interleaved commits on BOTH logs
    upd = (
        flog.read(spark)
        .where(F.col("o_orderkey") % 9 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    )
    flog.merge_upsert(spark, upd, ["o_orderkey"])
    dseg = (
        dlog.read(spark)
        .where(F.col("c_custkey") % 4 == 0)
        .withColumn("c_mktsegment", F.lit("REWRITTEN"))
    )
    dlog.merge_upsert(spark, dseg, ["c_custkey"])
    flog.delete_where(spark, "o_orderkey % 7 = 0")
    dlog.delete_where(spark, "c_custkey % 11 = 0")  # erasure: orders drop

    rep = sync_join_view(
        spark, out, flog, dlog, fcur, dcur,
        "o_orderkey", "o_custkey", "c_custkey", n_buckets=32,
    )
    assert rep["dim_spans"] >= 1 and rep["facts_spans"] >= 1

    def expect():
        return flog.read(spark).join(
            dlog.read(spark), F.col("o_custkey") == F.col("c_custkey")
        )

    view = read_join_view(spark, out)
    cols = sorted(view.columns)
    want = _sorted_rows(expect(), cols)
    assert _sorted_rows(view, cols) == want

    # no-op on a second sync
    rep2 = sync_join_view(
        spark, out, flog, dlog, fcur, dcur,
        "o_orderkey", "o_custkey", "c_custkey", n_buckets=32,
    )
    assert rep2 == {"dim_spans": 0, "facts_spans": 0}

    # crash-before-ack: apply a dim span manually, never ack, re-sync
    dlog.merge_upsert(
        spark,
        dlog.read(spark)
        .where(F.col("c_custkey") % 5 == 1)
        .withColumn("c_mktsegment", F.lit("AGAIN")),
        ["c_custkey"],
    )
    ch, _ack = dlog.consume_changes(spark, dcur, key_cols=["c_custkey"])
    apply_dim_changes(
        spark, out, ch, flog.read(spark),
        "o_custkey", "c_custkey", n_buckets=32,
    )
    sync_join_view(
        spark, out, flog, dlog, fcur, dcur,
        "o_orderkey", "o_custkey", "c_custkey", n_buckets=32,
    )
    assert _sorted_rows(read_join_view(spark, out), cols) == _sorted_rows(
        expect(), cols
    )


def test_bootstrap_pin_survives_interleaved_commit(spark, tmp_path):
    """r13 (ADVICE medium): a commit landing between bootstrap's
    snapshot() and its cursor park used to leave NO cursor file —
    consume_changes only persisted the pin in the nothing-to-consume
    branch, and bootstrap drops the (changes, ack) return — so the
    next sync initialized the cursor to the by-then head and the
    in-between commits were silently skipped: the view diverged from
    facts ⋈ dim permanently. The pin is now persisted unconditionally
    BEFORE any changes are returned. This test forges the race by
    landing a dim commit inside the bootstrap's snapshot call, then
    asserts the cursor pins the bootstrapped version and ONE sync
    folds the interleaved commit into the view."""
    import json as _json

    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.streaming.sinks import (
        bootstrap_join_view,
        read_join_view,
        sync_join_view,
    )

    fdir = str(tmp_path / "race_facts")
    ddir = str(tmp_path / "race_dim")
    load_table(spark, SF_SMALL, "orders").write.parquet(fdir)
    load_table(spark, SF_SMALL, "customer").write.parquet(ddir)
    flog, dlog = TableLog(fdir), TableLog(ddir)
    flog.init()
    dlog.init()

    # land a dim commit the instant bootstrap takes its dim snapshot —
    # i.e. between the snapshot and the cursor park
    orig_snapshot = dlog.snapshot
    state = {"injected": False}

    def racy_snapshot(version=None):
        res = orig_snapshot(version)
        if not state["injected"]:
            state["injected"] = True
            upd = (
                dlog.read(spark)
                .where(F.col("c_custkey") % 3 == 0)
                .withColumn("c_mktsegment", F.lit("RACED"))
            )
            dlog.merge_upsert(spark, upd, ["c_custkey"])
        return res

    dlog.snapshot = racy_snapshot
    out = str(tmp_path / "race_view")
    fcur = str(tmp_path / "race_fcur.json")
    dcur = str(tmp_path / "race_dcur.json")
    try:
        pins = bootstrap_join_view(
            spark, out, flog, dlog, fcur, dcur,
            "o_orderkey", "o_custkey", "c_custkey", n_buckets=32,
        )
    finally:
        dlog.snapshot = orig_snapshot
    assert state["injected"]
    # the cursor EXISTS and records the bootstrapped version, even
    # though commits were pending at park time
    with open(dcur) as f:
        assert int(_json.load(f)["version"]) == pins["dim_version"]
    assert dlog.latest_version() == pins["dim_version"] + 1

    rep = sync_join_view(
        spark, out, flog, dlog, fcur, dcur,
        "o_orderkey", "o_custkey", "c_custkey", n_buckets=32,
    )
    assert rep["dim_spans"] == 1  # the interleaved commit, not skipped
    view = read_join_view(spark, out)
    cols = sorted(view.columns)
    want = flog.read(spark).join(
        dlog.read(spark), F.col("o_custkey") == F.col("c_custkey")
    )
    assert _sorted_rows(view, cols) == _sorted_rows(want, cols)
    assert (
        view.where(F.col("c_mktsegment") == "RACED").count()
        == want.where(F.col("c_mktsegment") == "RACED").count()
        > 0
    )


def test_stream_cdf_tail_follows_live_writers_in_processing_mode(
    spark, tmp_path
):
    """Continuous mode: the tail consumer runs under a processingTime
    trigger while a writer keeps committing — each new commit is
    consumed within a few polls (cursor reaches head), and when the
    writer stops, the view equals the batch recompute. The availableNow
    tests prove drain semantics; this proves FOLLOW semantics."""
    import json as _json
    import time

    from cve_manager_spark.streaming.sinks import stream_cdf_tail

    log, dim, dim_path, out, cursor = _cdf_tail_fixture(
        spark, tmp_path, "live"
    )
    log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"], start_version=0
    )
    q = stream_cdf_tail(
        spark, str(log.root), cursor, out, dim_path,
        "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32, trigger_available_now=False,
        processing_interval="1 second",
    )
    try:
        log.delete_where(spark, "o_orderkey % 4 = 1")
        time.sleep(1.0)
        upd = (
            log.read(spark)
            .where(F.col("o_orderkey") % 6 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
        )
        log.merge_upsert(spark, upd, ["o_orderkey"])
        head = log.latest_version()
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                cur = _json.loads(Path(cursor).read_text())["version"]
            except (OSError, ValueError):
                cur = -1
            if cur >= head:
                break
            time.sleep(0.5)
        assert cur >= head, f"consumer never caught up ({cur} < {head})"
    finally:
        q.stop()
    _cdf_view_matches_batch(spark, log, dim, out)


def test_stream_cdf_tail_across_mor_delete(spark, tmp_path):
    """The self-driving CDC loop consumes a merge-on-read delete the
    same as a COW one: the DV-only commit (no file entered or left
    the manifest) surfaces as keyed deletes, the streaming tail
    applies them to the join view, and the view equals the batch
    recompute of the DV-applied snapshot."""
    from cve_manager_spark.streaming.sinks import stream_cdf_tail

    log, dim, dim_path, out, cursor = _cdf_tail_fixture(
        spark, tmp_path, "mor"
    )
    assert log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"], start_version=0
    ) is None
    files0 = log.snapshot()[1]
    log.delete_where_mor(spark, "o_orderkey % 4 = 1")
    assert log.snapshot()[1] == files0  # genuinely DV-only
    stream_cdf_tail(
        spark, str(log.root), cursor, out, dim_path,
        "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    ).awaitTermination()
    _cdf_view_matches_batch(spark, log, dim, out)


def test_two_stream_sink_batches_free_their_pinned_delta_blocks(
    spark, tmp_path
):
    """r14 optimization contract: each micro-batch's pinned delta
    (localCheckpoint) is unpersisted when the batch's writes complete —
    a long-running stream must not accrete one pinned block set per
    batch until a driver GC. The view still converges (the pins are
    scope-local by design)."""
    from cve_manager_spark.functions.blocks import persistent_rdd_ids
    from cve_manager_spark.streaming.sinks import read_stream_stream_join

    facts, dim, fsrc, dsrc, want = _ss_fixture(spark, tmp_path, "noleak")
    out = str(tmp_path / "ss_out_noleak")
    before = persistent_rdd_ids(spark)
    qf, qd = _ss_start(spark, fsrc, dsrc, out, facts.schema, dim.schema)
    qf.awaitTermination()
    qd.awaitTermination()
    leaked = persistent_rdd_ids(spark) - before
    assert leaked == set(), leaked
    view = read_stream_stream_join(spark, out)
    cols = sorted(view.columns)
    assert _sorted_rows(view, cols) == _sorted_rows(want, cols)
