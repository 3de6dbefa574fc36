"""Continuous KG construction: Structured Streaming source batches MERGEd
into the persisted graph.

The reference's closest flow is the interactive add-content loop
(`AddContent/Update_Content.py:24-59` -- a human re-runs the pipeline per
new book). Streaming re-expression: a file stream watches the source
directory; every micro-batch runs the SAME fused build_triples plan and
MERGEs its triples into the persisted graph via the incremental
``add_content`` plan (only affected repo buckets rewritten).

Exactly-once story: the streaming checkpoint tracks consumed source files,
and the MERGE itself is an idempotent anti-join on (subj, pred, obj, sha)
-- a replayed batch inserts nothing, so recovery after a crash between
"batch consumed" and "graph committed" converges to the same graph.

``Trigger.AvailableNow`` drains existing files and stops (the batch-refresh
mode); omit it for a long-running continuous ingest on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.add_content import add_content
from ..plans.materialize import materialize_graph
from ..plans.pipeline import build_triples
from ..sources.io import SOURCE_SCHEMA


def stream_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg=None,
    path_glob: str | None = None,
):
    """Drain all currently-available source files into the graph at
    ``output_dir``; returns after the stream finishes (AvailableNow).

    ``checkpoint_dir`` holds BOTH the streaming offsets (consumed files)
    and the per-bucket commit manifests -- one resume root.
    """
    reader = spark.readStream.schema(SOURCE_SCHEMA)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(source_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Completed-bootstrap marker = the vertices _SUCCESS file:
        # materialize writes edges first and vertices last, and Spark
        # commits _SUCCESS only when the vertex write finishes -- a bare
        # isdir() check is true DURING a vertex write (partial part-files),
        # so a crash there would send the replayed batch down add_content
        # against an unreadable table and wedge the stream. Re-running
        # materialize is safe: the manifest checkpoint skips committed
        # buckets.
        bootstrapped = os.path.exists(
            os.path.join(output_dir, "vertices", "_SUCCESS")
        )
        if bootstrapped:
            add_content(
                spark, output_dir, batch_df,
                checkpoint_dir=os.path.join(checkpoint_dir, "manifest"),
                cfg=cfg,
            )
        else:
            materialize_graph(
                build_triples(spark, batch_df, cfg), output_dir,
                checkpoint_dir=os.path.join(checkpoint_dir, "manifest"),
                spark=spark,
            )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "offsets"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
