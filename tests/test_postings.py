"""Inverted-index posting table (S10, `ES_Importer/es_importer.py:18-51`
analog): build, materialize partitioned by term bucket, point lookup with
partition pruning, index statistics."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.postings import (
    build_postings,
    doc_frequencies,
    term_lookup,
    write_postings,
)
from textchunking_and_knowledgegraph_spark.sources.io import TableIO


def _docs(spark):
    rows = [
        {"doc_id": 1, "text": "Spark reads the spark table"},
        {"doc_id": 2, "text": "a vector window"},
        {"doc_id": 3, "text": "spark, again; spark!"},
    ]
    return spark.createDataFrame(rows)


def test_build_postings_tf(spark):
    p = {(r.term, r.doc_id): r.tf for r in build_postings(_docs(spark)).collect()}
    assert p[("spark", 1)] == 2  # case-folded: "Spark" + "spark"
    assert p[("spark", 3)] == 2  # punctuation split
    assert p[("vector", 2)] == 1
    assert ("", 1) not in p and ("", 2) not in p


def test_doc_frequencies(spark):
    df = {r.term: (r.df, r.cf) for r in
          doc_frequencies(build_postings(_docs(spark))).collect()}
    assert df["spark"] == (2, 4)   # 2 docs, 4 occurrences
    assert df["vector"] == (1, 1)


def test_write_and_term_lookup_prunes(spark):
    base = tempfile.mkdtemp(prefix="tckg_post_")
    try:
        io = TableIO(base=base)
        write_postings(build_postings(_docs(spark)), io, n_term_buckets=8)
        # partitioned layout on disk
        parts = [d for d in os.listdir(os.path.join(base, "postings"))
                 if d.startswith("term_bucket=")]
        assert parts

        hits = term_lookup(spark, io, "spark", n_term_buckets=8)
        got = {(r.doc_id, r.tf) for r in hits.collect()}
        assert got == {(1, 2), (3, 2)}
        # the bucket predicate must reach the scan as a partition filter
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "term_bucket" in plan
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_tfidf_search_ranks_rare_term_docs_first(spark):
    from textchunking_and_knowledgegraph_spark.operators.postings import tfidf_search

    rows = [
        {"doc_id": 1, "text": "spark spark spark common"},   # high tf on rare term
        {"doc_id": 2, "text": "spark common common"},        # one rare hit
        {"doc_id": 3, "text": "common common common"},       # only the common term
        {"doc_id": 4, "text": "nothing relevant here"},      # no match
    ]
    postings = build_postings(spark.createDataFrame(rows))
    out = tfidf_search(postings, ["spark", "common"], k=3).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1                    # tf=3 on the rarer term wins
    assert set(ids) == {1, 2, 3}          # doc 4 never matches
    assert out[0].n_terms_matched == 2
    # rare term must outweigh the ubiquitous one: doc 2 (1x spark + 2x common)
    # beats doc 3 (3x common)
    assert ids.index(2) < ids.index(3)


def test_tfidf_search_deterministic_tiebreak(spark):
    from textchunking_and_knowledgegraph_spark.operators.postings import tfidf_search

    rows = [{"doc_id": i, "text": "same text"} for i in (5, 3, 9)]
    postings = build_postings(spark.createDataFrame(rows))
    out = tfidf_search(postings, ["same"], k=3).collect()
    assert [r.doc_id for r in out] == [3, 5, 9]  # equal scores -> id asc
