"""Checkpoint-based resume (north rule): a killed materialization restarts
at the first un-committed bucket and the final output is identical to an
uninterrupted run."""

import json
import os
import shutil
import tempfile

from textchunking_and_knowledgegraph_spark.plans.materialize import (
    committed_buckets,
    materialize_graph,
)
from textchunking_and_knowledgegraph_spark.plans.pipeline import build_triples
from textchunking_and_knowledgegraph_spark.sources.synthetic import corpus_df


def _edge_set(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "edges"))
    return {tuple(r) for r in df.select("subj", "pred", "obj", "sha").collect()}


def test_resume_after_partial_failure(spark):
    src, _ = corpus_df(spark)
    triples = build_triples(spark, src)

    base = tempfile.mkdtemp(prefix="tckg_resume_")
    full_out = os.path.join(base, "full")
    part_out = os.path.join(base, "partial")
    ckpt = os.path.join(base, "ckpt")
    try:
        stats_full = materialize_graph(triples, full_out, checkpoint_dir=None, spark=spark)
        want = _edge_set(spark, full_out)

        # run 1 with checkpointing -> then simulate a crash that lost the
        # last half of the buckets (data AND manifests)
        stats1 = materialize_graph(triples, part_out, checkpoint_dir=ckpt, spark=spark)
        assert stats1["skipped_buckets"] == []
        done = sorted(committed_buckets(ckpt))
        assert len(done) == 16
        for b in done[8:]:
            os.remove(os.path.join(ckpt, f"bucket_{b}.json"))
            shutil.rmtree(os.path.join(part_out, "edges", f"repo_bucket={b}"),
                          ignore_errors=True)

        # resume: only the 8 lost buckets are rewritten
        stats2 = materialize_graph(triples, part_out, checkpoint_dir=ckpt, spark=spark)
        assert stats2["skipped_buckets"] == done[:8]
        assert stats2["edges"] == stats_full["edges"]
        assert _edge_set(spark, part_out) == want

        # manifests carry per-partition lineage/metrics
        with open(os.path.join(ckpt, f"bucket_{done[0]}.json")) as f:
            m = json.load(f)
        assert {"bucket", "rows", "sha_count", "docs", "t_ms"} <= set(m)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_rerun_into_same_dir_drops_stale_buckets(spark):
    """A re-materialize over a SHRUNK corpus must not leave stale edges in
    buckets the new data no longer hashes into (dynamic-overwrite gap)."""
    src, _ = corpus_df(spark)
    triples = build_triples(spark, src)
    base = tempfile.mkdtemp(prefix="tckg_stale_")
    out = os.path.join(base, "g")
    try:
        materialize_graph(triples, out, spark=spark)
        full = _edge_set(spark, out)

        # shrink to one repo; its triples occupy fewer buckets
        one_repo = triples.filter("repo = 'org/repo1'")
        materialize_graph(one_repo, out, spark=spark)
        got = _edge_set(spark, out)
        want = {t for t in full} & {
            tuple(r) for r in one_repo.select("subj", "pred", "obj", "sha").collect()
        }
        assert got == want  # nothing stale from the earlier, larger run
    finally:
        shutil.rmtree(base, ignore_errors=True)
