"""The fused single-pass extractor must be plan-for-plan equivalent to the
unfused two-branch pipeline: identical triple sets (all columns), identical
chunk-id referential integrity. The fused path is the production hot path
(one Arrow crossing per doc); the unfused path is the readable spec."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.chunker import chunk_documents
from textchunking_and_knowledgegraph_spark.operators.extract import (
    doc_facts,
    extract_all_triples,
    triples_from_facts,
)
from textchunking_and_knowledgegraph_spark.plans.pipeline import prepared_source
from textchunking_and_knowledgegraph_spark.sources.synthetic import corpus_df


def _rows(df):
    cols = ["subj", "pred", "obj", "subj_type", "obj_type", "repo", "path",
            "commit", "sha", "chunk_id"]
    return {tuple(r) for r in df.select(*cols).collect()}


def test_fused_equals_unfused(spark):
    raw, _ = corpus_df(spark)
    src = prepared_source(spark, raw)
    unfused = extract_all_triples(src, chunk_documents(src))
    fused = triples_from_facts(doc_facts(src))
    assert _rows(fused) == _rows(unfused)


def test_fused_span_counts_match_chunk_table(spark):
    raw, _ = corpus_df(spark)
    src = prepared_source(spark, raw)
    n_chunks = chunk_documents(src).count()
    n_spans = doc_facts(src).select(F.explode("spans")).count()
    assert n_spans == n_chunks
