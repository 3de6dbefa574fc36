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


def test_write_postings_empty_corpus(spark):
    """An empty corpus must produce an empty index plus a zeros stats
    sidecar, not an UNABLE_TO_INFER_SCHEMA crash on the stats read-back of
    a part-file-less directory (regression: the write-time stats aggregate
    reads the just-written table with its schema supplied explicitly)."""
    from textchunking_and_knowledgegraph_spark.operators.postings import (
        index_stats,
    )

    base = tempfile.mkdtemp(prefix="tckg_post_empty_")
    try:
        io = TableIO(base=base)
        empty = _docs(spark).filter(F.lit(False))
        write_postings(build_postings(empty), io, n_term_buckets=8)
        stats = index_stats(io)
        assert stats["n_docs"] == 0 and stats["n_postings"] == 0
        assert term_lookup(spark, io, "spark", n_term_buckets=8).count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


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
    out = tfidf_search(postings, ["spark", "common"], n_docs=4, k=3).collect()
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
    out = tfidf_search(postings, ["same"], n_docs=3, k=3).collect()
    assert [r.doc_id for r in out] == [3, 5, 9]  # equal scores -> id asc


def test_tfidf_search_requires_n_docs(spark):
    """The per-query plan must never contain a full posting-table
    distinct-count pass -- n_docs comes from the write-time sidecar."""
    import pytest

    from textchunking_and_knowledgegraph_spark.operators.postings import tfidf_search

    postings = build_postings(_docs(spark))
    with pytest.raises(ValueError, match="n_docs"):
        tfidf_search(postings, ["spark"], n_docs=None)  # type: ignore[arg-type]


def test_index_stats_sidecar(spark):
    from textchunking_and_knowledgegraph_spark.operators.postings import index_stats

    base = tempfile.mkdtemp(prefix="tckg_poststat_")
    try:
        io = TableIO(base=base)
        write_postings(build_postings(_docs(spark)), io, n_term_buckets=8)
        stats = index_stats(io)
        assert stats["n_docs"] == 3
        assert stats["n_terms"] > 0 and stats["n_postings"] >= stats["n_terms"]
        assert stats["n_term_buckets"] == 8
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# CJK tokenization (the reference's corpus is Chinese: ik_max_word analog,
# `ES_Importer/es_importer.py:23-27`; round-2 gap -- a latin-only split
# produced ZERO postings for pure-zh documents)
# ---------------------------------------------------------------------------

def _zh_docs(spark):
    rows = [
        {"doc_id": 1, "text": "函数的概念与性质"},          # pure zh
        {"doc_id": 2, "text": "第三章介绍函数"},            # pure zh, shares 函数
        {"doc_id": 3, "text": "spark 处理函数 table"},      # mixed latin + zh
        {"doc_id": 4, "text": "只"},                        # single CJK char
        {"doc_id": 5, "text": "plain english only"},
    ]
    return spark.createDataFrame(rows)


def test_cjk_documents_produce_postings(spark):
    p = {(r.term, r.doc_id): r.tf for r in build_postings(_zh_docs(spark)).collect()}
    # char bigrams from doc 1: 函数 数的 的概 概念 念与 与性 性质
    assert p[("函数", 1)] == 1
    assert p[("概念", 1)] == 1
    # the shared term retrieves both zh docs -- the reference's first query
    assert ("函数", 2) in p
    # mixed doc: latin runs AND cjk bigrams, CJK breaks a latin run
    assert ("spark", 3) in p and ("table", 3) in p and ("函数", 3) in p
    # single-char run emits itself (ik 单字 behavior)
    assert ("只", 4) in p
    # no empty terms
    assert not any(t == "" for (t, _) in p)


def test_cjk_term_retrieves_document(spark):
    from textchunking_and_knowledgegraph_spark.operators.postings import tfidf_search

    postings = build_postings(_zh_docs(spark))
    hits = tfidf_search(postings, ["函数"], n_docs=5, k=5).collect()
    assert {r.doc_id for r in hits} == {1, 2, 3}


def test_cjk_tokenizer_matches_duckdb_oracle(spark):
    """The q35 DuckDB oracle mirrors the tokenizer 1:1; the driver's
    testdata carries no CJK text, so the zh arm of that mirror is pinned
    HERE against the same SQL over a zh fixture."""
    import duckdb

    pdf = _zh_docs(spark).toPandas()  # noqa: F841 (registered by name below)
    sql = r"""
        SELECT t AS term, doc_id, COUNT(*) AS tf
        FROM (
          SELECT doc_id, unnest(list_concat(
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                        tk -> tk <> ''),
            flatten(list_transform(regexp_extract_all(text, '[一-鿿]+'),
              r -> CASE WHEN length(r) = 1 THEN [r]
                   ELSE list_transform(range(1, length(r)),
                                       i -> substring(r, i, 2)) END))
          )) AS t
          FROM pdf
        )
        GROUP BY 1, 2
    """
    oracle = {
        (t, d): tf for t, d, tf in duckdb.sql(sql).fetchall()
    }
    got = {(r.term, r.doc_id): r.tf for r in build_postings(_zh_docs(spark)).collect()}
    assert got == oracle


def test_fuzzy_terms_and_search(spark):
    """ES fuzzy_search analog: a typo'd probe expands to edit-distance-1
    index terms and still retrieves the documents."""
    from textchunking_and_knowledgegraph_spark.operators.postings import (
        fuzzy_search,
        fuzzy_terms,
    )

    postings = build_postings(_docs(spark))
    cand = {r.term for r in fuzzy_terms(postings, "spak", max_dist=1).collect()}
    assert cand == {"spark"}
    hits = fuzzy_search(postings, "spak", n_docs=3, k=5).collect()
    assert {r.doc_id for r in hits} == {1, 3}
    # no expansion -> empty result, no crash
    assert fuzzy_search(postings, "zzzzzzz", n_docs=3).count() == 0


def test_index_lifecycle(spark):
    """ES index lifecycle parity (`es_importer.py:33-38,75-76`): has_index /
    has_data / delete_index over the materialized posting table."""
    from textchunking_and_knowledgegraph_spark.operators.postings import (
        delete_index,
        has_data,
        has_index,
        write_postings,
    )

    base = tempfile.mkdtemp(prefix="tckg_post_life_")
    try:
        io = TableIO(base=base)
        assert not has_index(io)
        assert not has_data(spark, io)
        assert delete_index(io) is False  # absent -> no-op, not an error

        write_postings(build_postings(_docs(spark)), io, n_term_buckets=8)
        assert has_index(io)
        assert has_data(spark, io)

        assert delete_index(io) is True
        assert not has_index(io)
        assert not has_data(spark, io)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_has_data_false_on_empty_index(spark):
    """An existing-but-empty index has an index and no data (the seam the
    reference's create-if-missing loop distinguishes)."""
    from textchunking_and_knowledgegraph_spark.operators.postings import (
        has_data,
        has_index,
        write_postings,
    )

    base = tempfile.mkdtemp(prefix="tckg_post_hd_")
    try:
        io = TableIO(base=base)
        write_postings(
            build_postings(_docs(spark).filter(F.lit(False))), io, n_term_buckets=8
        )
        assert has_index(io)
        assert not has_data(spark, io)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_fuzzy_search_no_driver_collect(spark):
    """The fuzzy expansion must stay a DataFrame end-to-end: fuzzy_search's
    plan is built without a single .collect() (probed by monkeypatching)."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from textchunking_and_knowledgegraph_spark.operators.postings import (
        build_postings,
        fuzzy_search,
    )

    postings = build_postings(_docs(spark))
    with mock.patch.object(
        DataFrame, "collect", side_effect=AssertionError("driver collect in fuzzy_search")
    ):
        df = fuzzy_search(postings, "spak", n_docs=3, k=5)
    rows = df.collect()
    assert {r.doc_id for r in rows} == {1, 3}


def test_fuzzy_search_batch(spark):
    """Batched fuzzy retrieval: per-probe top-k, one dictionary scan. A
    probe with no neighborhood contributes no rows; results per probe match
    the single-probe path."""
    from textchunking_and_knowledgegraph_spark.operators.postings import (
        build_postings,
        fuzzy_search,
        fuzzy_search_batch,
    )

    postings = build_postings(_docs(spark))
    probes = spark.createDataFrame(
        [("spak",), ("vektor",), ("zzzzzzz",)], "probe string"
    )
    batch = fuzzy_search_batch(postings, probes, n_docs=3, k=5).collect()
    by_probe = {}
    for r in batch:
        by_probe.setdefault(r.probe, []).append((r.doc_id, r.score, r.n_terms_matched))
    assert "zzzzzzz" not in by_probe
    for probe in ("spak", "vektor"):
        single = [
            (r.doc_id, r.score, r.n_terms_matched)
            for r in fuzzy_search(postings, probe, n_docs=3, k=5).collect()
        ]
        assert sorted(by_probe.get(probe, [])) == sorted(single)
