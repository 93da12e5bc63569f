"""Streaming sinks (SURVEY §2.7 / pyspark guide exactly-once pattern).

``foreach_batch_parquet`` gives an idempotent parquet sink: each
micro-batch overwrites its own ``_batch_id=<n>`` partition, so a replayed
batch (failure/restart re-delivery) rewrites the same partition instead
of duplicating rows — exactly-once *effect* on top of at-least-once
delivery. The same shape carries any transactional target (JDBC upsert
by batch id, Delta MERGE) by swapping the writer body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_parquet(stream_df: DataFrame, out_dir: str, trigger_available_now: bool = True):
    """Write a stream to parquet partitioned by micro-batch id,
    idempotently. Returns the started StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{out_dir}/_batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", f"{out_dir}/_checkpoint"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
