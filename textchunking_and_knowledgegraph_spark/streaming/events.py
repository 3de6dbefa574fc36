"""Structured-streaming variants of the batch operators (stretch scope).

The reference is strictly batch (SURVEY.md 2.10); the north rule too. These
exist for the incremental-ingest story: the same chunk/triple flow consumed
as a ``Trigger.AvailableNow`` file stream, plus a windowed event aggregation
with watermarking (the canonical late-data pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count+sum per event_type. On a stream, the watermark
    bounds state; on a batch DataFrame the same code degenerates to a
    groupBy -- used by tests to prove stream/batch parity."""
    # parquet TIMESTAMP_NTZ -> TIMESTAMP (session tz is pinned UTC); event-time
    # watermarks require an instant type
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_events_available_now(
    spark: SparkSession, events_path: str, checkpoint_dir: str, out_table: str = "stream_counts"
) -> DataFrame:
    """Read the events parquet as an AvailableNow file stream, aggregate, sink
    to an in-memory table, and block until done. Returns the result table.
    ``events_path`` may be a directory or a single parquet file (file
    streams require a directory source, so a file is read via its parent
    with a glob filter)."""
    import os

    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.parquet(events_path)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)
