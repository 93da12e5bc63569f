"""Streaming operators over an events stream (SURVEY §2.7 T1–T4).

The batch twins live in ``plans/events.py`` — same expressions, same
aggregation logic; these wrappers add the streaming concerns: watermarks
(bounded state, late-data drop), output modes, and stateful dedup. The
equivalence "stream(availableNow) == batch" is asserted in
tests/test_streaming.py, which is the property that matters at scale:
one definition of correctness for both execution modes.

State sizing at 100 TB/day: tumbling windows keep |keys|×|open windows|
rows of state; the watermark bounds open windows, and session windows
additionally merge on arrival — both are incremental, no reprocessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import dec_sum

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based events stream (parquet dir); schema must be explicit for
    readStream. The events parquet has shipped with ts as TIMESTAMP(NANOS)
    in some generations (arrives as bigint nanos under nanosAsLong) and
    TIMESTAMP(MICROS) in others — a hardcoded unit silently shifts every
    timestamp 1000×, so probe the footer via a batch read (driver-side
    metadata only) and convert exactly like the batch loader does.

    ``tune`` runs first so the probe itself sees NANOS as long rather
    than failing with [PARQUET_TYPE_ILLEGAL]; an empty or not-yet-
    populated source dir (normal at stream start) falls back to the
    MICROS schema, matching what any later-arriving files of that
    generation will carry (ADVICE r4)."""
    from pyspark.errors import AnalysisException

    from cve_manager_spark.session import tune

    tune(spark)
    try:
        probed = {
            f.name: f.dataType.simpleString() for f in spark.read.parquet(path).schema
        }
        ts_is_nanos_long = probed.get("ts") == "bigint"
    except AnalysisException:
        ts_is_nanos_long = False
    reader = spark.readStream.schema(
        "event_id bigint, ts {}, user_id bigint, "
        "event_type string, value double, props string".format(
            "bigint" if ts_is_nanos_long else "timestamp"
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    # Watermarks require TIMESTAMP (not NTZ): keep the instant type; under
    # the engine's UTC session it collects identically to the batch NTZ.
    if ts_is_nanos_long:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """T1+T3: watermarked tumbling-window aggregate. Late rows beyond the
    watermark are dropped instead of reopening closed windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """T2: session windows (gap-based), watermarked when streaming."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def stream_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """T4: stateful dedup. Streaming keeps only first-seen keys within the
    watermark horizon (bounded state); batch falls back to
    dropDuplicates on the same keys."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain a stream into an in-memory table with availableNow (process
    everything currently available, then stop). Test/demo harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
