"""Stateful sessionization: applyInPandasWithState stream vs declarative
batch definition -- closed sessions must agree exactly."""

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

_BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    # user 1: two sessions (gap 3600s > 1800); user 2: one session
    rows = [
        (1, _BASE, 10.0),
        (1, _BASE + dt.timedelta(seconds=60), 5.0),
        (1, _BASE + dt.timedelta(seconds=5000), 7.0),   # closes session 1
        (1, _BASE + dt.timedelta(seconds=5060), 3.0),
        (2, _BASE, 1.0),
        (2, _BASE + dt.timedelta(seconds=600), 2.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_batch_sessionize(spark):
    got = {
        (r.user_id, r.n_events, r.sum_value)
        for r in sessionize_batch(_events(spark), gap_seconds=1800).collect()
    }
    assert got == {(1, 2, 15.0), (1, 2, 10.0), (2, 2, 3.0)}


def test_stream_sessionize_closed_sessions(spark):
    """AvailableNow single-batch run: only sessions closed BY a later event
    are emitted (open sessions await the processing-time timeout -- absent
    in a terminated AvailableNow run). user 1's first session qualifies."""
    events_dir = tempfile.mkdtemp(prefix="sess_in_")
    ckpt = tempfile.mkdtemp(prefix="sess_ck_")
    try:
        _events(spark).write.mode("overwrite").parquet(events_dir)
        schema = spark.read.parquet(events_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (
            sessionize_stream(stream, gap_seconds=1800, idle_timeout=False)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("sessions")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.n_events, r.sum_value)
            for r in spark.table("sessions").collect()
        }
        assert got == {(1, 2, 15.0)}
        # the closed session matches the batch definition exactly
        batch = sessionize_batch(_events(spark), gap_seconds=1800)
        b = batch.filter(
            (F.col("user_id") == 1) & (F.col("sum_value") == 15.0)
        ).collect()[0]
        s = spark.table("sessions").collect()[0]
        assert (s.session_start, s.session_end) == (b.session_start, b.session_end)
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
