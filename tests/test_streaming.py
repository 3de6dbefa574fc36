"""Streaming/batch parity: AvailableNow file stream over events == batch agg."""

import os
import tempfile

from textchunking_and_knowledgegraph_spark.streaming.events import (
    stream_events_available_now,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_stream_batch_parity(spark, tmp_path):
    # the file stream source requires a directory input
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    os.symlink(EVENTS, events_dir / "events.parquet")
    batch = windowed_event_counts(spark.read.parquet(EVENTS))
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()
    }
    with tempfile.TemporaryDirectory() as ckpt:
        streamed = stream_events_available_now(spark, str(events_dir), ckpt, out_table="t_counts")
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in streamed.collect()
        }
    assert got == expected
    assert len(got) > 0
