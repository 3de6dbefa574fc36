"""Incremental add-content (`AddContent/Update_Content.py:24-59` analog):
appending a second batch to a persisted graph yields exactly the same edge
and vertex sets as building everything in one shot, and touches only the
buckets the new batch hashes into."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.plans.add_content import add_content
from textchunking_and_knowledgegraph_spark.plans.materialize import materialize_graph
from textchunking_and_knowledgegraph_spark.plans.pipeline import build_triples
from textchunking_and_knowledgegraph_spark.sources.synthetic import corpus_df


def _edge_set(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "edges"))
    return {tuple(r) for r in df.select("subj", "pred", "obj", "sha").collect()}


def _vertex_set(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "vertices"))
    return {tuple(r) for r in df.select("name", "type").collect()}


def test_add_content_equals_one_shot(spark):
    src, _ = corpus_df(spark)
    half = F.pmod(F.xxhash64("path"), F.lit(2))
    first, second = src.filter(half == 0), src.filter(half == 1)
    assert first.count() > 0 and second.count() > 0

    base = tempfile.mkdtemp(prefix="tckg_addc_")
    full_out = os.path.join(base, "full")
    inc_out = os.path.join(base, "inc")
    try:
        materialize_graph(build_triples(spark, src), full_out, spark=spark)
        materialize_graph(build_triples(spark, first), inc_out, spark=spark)
        stats = add_content(spark, inc_out, second)

        assert stats["new_edges"] > 0
        assert _edge_set(spark, inc_out) == _edge_set(spark, full_out)
        assert _vertex_set(spark, inc_out) == _vertex_set(spark, full_out)
        # incremental run must not touch buckets the new batch doesn't hash to
        n_buckets_touched = len(stats["affected_buckets"])
        assert 0 < n_buckets_touched <= 16
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_add_content_idempotent(spark):
    """Re-adding already-present content inserts nothing (MERGE semantics)."""
    src, _ = corpus_df(spark)
    base = tempfile.mkdtemp(prefix="tckg_addc_idem_")
    out = os.path.join(base, "g")
    try:
        materialize_graph(build_triples(spark, src), out, spark=spark)
        before = _edge_set(spark, out)
        stats = add_content(spark, out, src)
        assert stats["new_edges"] == 0
        assert _edge_set(spark, out) == before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_add_content_adopts_persisted_bucketing(spark):
    """A graph written with n_buckets=8 updated by an add_content called
    with a mismatched default must still MERGE correctly (bucketing is
    read from the graph's metadata, not trusted from the caller)."""
    src, _ = corpus_df(spark)
    half = F.pmod(F.xxhash64("path"), F.lit(2))
    base = tempfile.mkdtemp(prefix="tckg_addc_meta_")
    out = os.path.join(base, "g")
    full_out = os.path.join(base, "full")
    try:
        materialize_graph(build_triples(spark, src.filter(half == 0)), out,
                          spark=spark, n_buckets=8)
        stats = add_content(spark, out, src.filter(half == 1), n_buckets=16)
        assert stats["new_edges"] > 0
        assert max(stats["affected_buckets"]) < 8  # adopted the stored 8
        materialize_graph(build_triples(spark, src), full_out, spark=spark,
                          n_buckets=8)
        assert _edge_set(spark, out) == _edge_set(spark, full_out)
    finally:
        shutil.rmtree(base, ignore_errors=True)
