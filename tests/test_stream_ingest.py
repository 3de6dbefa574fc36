"""Continuous KG ingest: a file stream of source batches MERGEd into the
persisted graph must converge to the one-shot batch build, and draining
again with no new files must change nothing (exactly-once)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.plans.materialize import materialize_graph
from textchunking_and_knowledgegraph_spark.plans.pipeline import build_triples
from textchunking_and_knowledgegraph_spark.sources.synthetic import corpus_df
from textchunking_and_knowledgegraph_spark.streaming.ingest import (
    stream_ingest_available_now,
)


def _edge_set(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "edges"))
    return {tuple(r) for r in df.select("subj", "pred", "obj", "sha").collect()}


def test_stream_ingest_converges_to_batch_build(spark):
    src, _ = corpus_df(spark)
    base = tempfile.mkdtemp(prefix="tckg_ingest_")
    src_dir = os.path.join(base, "incoming")
    out = os.path.join(base, "graph")
    ckpt = os.path.join(base, "ckpt")
    full_out = os.path.join(base, "full")
    try:
        # two source-file batches landing in the watched directory
        half = F.pmod(F.xxhash64("path"), F.lit(2))
        src.filter(half == 0).coalesce(1).write.parquet(src_dir)
        src.filter(half == 1).coalesce(1).write.mode("append").parquet(src_dir)

        stream_ingest_available_now(spark, src_dir, out, ckpt)
        materialize_graph(build_triples(spark, src), full_out, spark=spark)
        assert _edge_set(spark, out) == _edge_set(spark, full_out)

        # drain again: offsets consumed, MERGE idempotent -> no change
        before = _edge_set(spark, out)
        stream_ingest_available_now(spark, src_dir, out, ckpt)
        assert _edge_set(spark, out) == before
    finally:
        shutil.rmtree(base, ignore_errors=True)
