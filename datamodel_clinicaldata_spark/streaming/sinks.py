"""Streaming sinks — the ``foreachBatch`` production pattern.

``writeStream.foreachBatch`` is how a stream reaches sinks the streaming
engine has no native writer for (partitioned parquet with dynamic
overwrite, upserts into a keyed table, multi-sink fan-out): each
micro-batch arrives as a BATCH DataFrame plus a monotonically increasing
``batch_id``, and the function body uses the full batch API. Exactly-once
comes from idempotence: the checkpoint replays a batch after a crash with
the SAME batch_id, so the body must make re-running batch N harmless —
here by routing every write through a deterministic per-batch directory
(overwriting a half-written attempt instead of appending beside it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_stream_partitioned_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_cols: list[str],
    available_now: bool = True,
):
    """Stream → date/key-partitioned parquet via idempotent foreachBatch.

    Each micro-batch writes ``out_dir/batch_id=N/<partition dirs>/`` with
    mode=overwrite: a replayed batch N simply rewrites its own directory
    (exactly-once through idempotence), readers see the union via
    ``spark.read.parquet(out_dir)`` with ``batch_id`` as one more
    partition column to prune on. Partitioning columns come from the
    caller (date first, per SCALING.md layout doctrine)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def with_event_date(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The standard partition column: event date derived from the event
    timestamp (time-first layout — SCALING.md Storage layout)."""
    return df.withColumn("event_date", F.col(ts_col).cast("date"))
