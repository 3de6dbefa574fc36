"""Inverted-index (posting table) build + sink -- the S10 ES index-build
analog.

Reference: `ES_Importer/es_importer.py:18-31` creates an index with an
ik_max_word-analyzed text mapping; `:40-51` bulk-imports section rows into
it. The distributed re-expression: tokenize JVM-side (lower + regex split,
no Python), explode to postings, aggregate term frequencies, and
materialize partitioned by a term hash bucket so point term lookups prune
partitions -- the moral equivalent of ES routing a term to its shard.

At 10^12-doc scale the posting build is one scan + one shuffle on
(term, doc_id); term skew (stopwords) is bounded because the groupBy
partially aggregates map-side before the exchange.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import TableIO

TOKEN_PATTERN = "[^a-z0-9]+"
CJK_RUN = "[一-鿿]+"


def tokenize(text_col: Column, token_pattern: str = TOKEN_PATTERN) -> Column:
    """array<string> of index terms: latin/digit runs + CJK char bigrams.

    Deterministic stand-in for the reference's ik_max_word analyzer
    (`ES_Importer/es_importer.py:23-27` -- a *Chinese* analyzer over a
    Chinese-textbook corpus): CJK has no whitespace word boundaries, so each
    CJK run emits its character bigrams (单字 run of length 1 emits itself)
    -- the core recall behavior of CJK analyzers -- while latin/digit text
    lowercases and splits on non-alphanumeric runs. Pure column algebra
    (split/regexp_extract_all/transform/substr), stays in whole-stage
    codegen; a pure-zh document now produces postings (round-2 gap: the
    latin-only split returned zero terms for the reference's own corpus).
    """
    latin = F.filter(
        F.split(F.lower(text_col), token_pattern), lambda t: t != ""
    )
    runs = F.regexp_extract_all(text_col, F.lit(CJK_RUN), 0)
    grams = F.flatten(
        F.transform(
            runs,
            lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(r) - 1),
                    lambda i: r.substr(i, F.lit(2)),
                )
            ),
        )
    )
    return F.concat(latin, grams)


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """(term, doc_id, tf): one posting row per distinct term per document.

    One scan, one explode of the ``tokenize`` term array; the only shuffle
    is the (term, doc_id) aggregation, which combines map-side.
    """
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(F.col(text_col), token_pattern)).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(postings: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency per term --
    the index statistics ES exposes per shard."""
    return postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def write_postings(
    postings: DataFrame,
    io: TableIO,
    name: str = "postings",
    n_term_buckets: int = 64,
    files_per_bucket: int = 4,
) -> None:
    """Materialize the inverted index partitioned by term hash bucket
    (`es_importer.py:40-51` bulk import analog). A term lookup reads exactly
    one partition directory; ``n_term_buckets`` sizes partitions for the
    target corpus (hundreds+ at 100 TB).

    Write partitioning salts the bucket with a term hash so a bucket is
    never a single task/file -- the stopword bucket holds a huge share of
    all postings, and one-task-per-bucket is a multi-TB straggler at the
    target scale (same fix as the edge-table materialize)."""
    bucketed = postings.withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"),
    )
    salt = F.pmod(F.xxhash64("term", "doc_id"), F.lit(files_per_bucket))
    io.write(
        bucketed.repartition(
            n_term_buckets * files_per_bucket, F.col("term_bucket"), salt
        ),
        name,
        partition_cols=["term_bucket"],
    )
    # index-stats sidecar (the ES index-stats analog): n_docs is needed by
    # every tfidf_search idf computation -- computing it per query would be
    # a full distinct-count pass over the posting table (a 100 TB scan in
    # the per-query plan). One aggregation at WRITE time, amortized over
    # every search. Aggregate over the JUST-WRITTEN table, not the input
    # DataFrame: `postings` is usually an uncached lineage ending in the
    # tokenize/explode/groupBy pipeline, and re-executing it here would
    # re-scan + re-tokenize the whole corpus a second time; the read-back
    # costs one column-pruned pass over the compact written index instead.
    spark = postings.sparkSession
    if io.fmt == "iceberg":
        written = io.read(spark, name)
    else:
        # supply the schema explicitly: an empty corpus writes a directory
        # with no part files, and schema inference on it would fail with
        # UNABLE_TO_INFER_SCHEMA -- with the schema given, the read-back is
        # simply an empty index and the stats payload records zeros
        written = spark.read.schema(bucketed.schema).parquet(io._path(name))
    stats = written.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("term").alias("n_terms"),
        F.count("*").alias("n_postings"),
    ).first()
    payload = {
        "n_docs": int(stats["n_docs"]),
        "n_terms": int(stats["n_terms"]),
        "n_postings": int(stats["n_postings"]),
        "n_term_buckets": n_term_buckets,
    }
    if io.fmt != "iceberg":
        # persist the written schema (doc_id's type follows the corpus, so
        # it is not static): readers supply it instead of inferring, which
        # keeps an EMPTY index readable -- a zero-posting corpus writes a
        # partitioned directory with no part files, and schema inference
        # on that fails with UNABLE_TO_INFER_SCHEMA
        payload["schema"] = json.loads(bucketed.schema.json())
    if io.fmt == "iceberg":
        # iceberg has no directory to drop a file into -- carry the stats as
        # table properties (the canonical iceberg metadata channel)
        props = ", ".join(
            f"'index_stats.{k_}' = '{v}'" for k_, v in payload.items()
        )
        spark.sql(f"ALTER TABLE {io._path(name)} SET TBLPROPERTIES ({props})")
    else:
        with open(os.path.join(io._path(name), "_index_stats.json"), "w") as f:
            json.dump(payload, f)


def index_stats(
    io: TableIO, name: str = "postings", spark: SparkSession | None = None
) -> dict:
    """Read the write-time stats (n_docs/n_terms/n_postings): the JSON
    sidecar for parquet, table properties for iceberg (``spark`` required
    there)."""
    if io.fmt == "iceberg":
        if spark is None:
            raise ValueError("index_stats on an iceberg table needs spark")
        rows = spark.sql(f"SHOW TBLPROPERTIES {io._path(name)}").collect()
        props = {r["key"]: r["value"] for r in rows}
        return {
            k_.removeprefix("index_stats."): int(v)
            for k_, v in props.items()
            if k_.startswith("index_stats.")
        }
    with open(os.path.join(io._path(name), "_index_stats.json")) as f:
        return json.load(f)


def tfidf_search(
    postings: DataFrame,
    query_terms: list[str] | DataFrame,
    *,
    n_docs: int,
    k: int = 10,
) -> DataFrame:
    """Scored OR-match retrieval over the posting table -- the analog of the
    reference's ES `match` search (`es_importer.py:53-60` returns ranked
    hits): score(doc) = sum over matched query terms of tf * idf, with the
    BM25-style idf ln(1 + (N - df + 0.5) / (df + 0.5)).

    ``n_docs`` is REQUIRED and keyword-only (so a legacy positional ``k``
    can never silently bind to it): take it from the ``index_stats``
    sidecar ``write_postings`` maintains (or a cached corpus count). A
    default that ran ``distinct().count()`` here would put a full
    posting-table pass in every per-query plan -- a 100 TB scan per search
    at the target scale.

    Plan shape: the query-term list broadcasts (tiny), per-term document
    frequencies come from one partial-aggregated pass restricted to the
    query terms, and the final ranking is a global top-k (orderBy+limit --
    Spark runs it as per-partition top-k + driver merge, no full sort).
    Returns (doc_id, score, n_terms_matched) ranked best-first.
    """
    if not isinstance(n_docs, int) or n_docs <= 0:
        raise ValueError(
            "tfidf_search requires n_docs > 0 (read it from the "
            "index_stats sidecar written by write_postings)"
        )
    spark = postings.sparkSession
    if isinstance(query_terms, DataFrame):
        # distributed term set (e.g. fuzzy_terms output): stays on the
        # executors end-to-end -- no driver round-trip -- and still
        # broadcasts (an edit-distance neighborhood is bounded-size)
        terms_df = query_terms.select("term").distinct()
    else:
        # dedupe: a repeated query term would double-count tf in the join
        terms_df = spark.createDataFrame(
            [(t,) for t in dict.fromkeys(query_terms)], "term string"
        )
    dfreq = (
        postings.join(F.broadcast(terms_df), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    matched = (
        postings.join(F.broadcast(terms_df), "term")
        .join(F.broadcast(dfreq), "term")
        .withColumn("w", F.col("tf") * idf)
    )
    return (
        matched.groupBy("doc_id")
        .agg(
            F.round(F.sum("w"), 6).alias("score"),
            F.countDistinct("term").alias("n_terms_matched"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def fuzzy_terms(
    postings: DataFrame, probe: str | DataFrame, max_dist: int = 1
) -> DataFrame:
    """ES fuzzy-search candidate expansion (`ES_Importer/es_importer.py:62-73`
    runs fuzziness=1 over the indexed content): distinct index terms within
    levenshtein ``max_dist`` of ``probe``.

    Plan shape: the distinct-term dictionary aggregates map-side (terms are
    a tiny fraction of postings), a JVM length prefilter bounds the
    levenshtein evaluations (|len(term) - len(probe)| <= max_dist -- edit
    distance can never beat the length gap), and the survivors are a
    broadcast-size candidate set for the posting join.

    ``probe`` may be a DataFrame with a ``probe`` column (batch expansion):
    the probe set broadcasts against the term dictionary with the same
    length band + levenshtein gate, returning (probe, term) pairs -- one
    dictionary scan no matter how many probes."""
    terms = postings.select("term").distinct()
    if isinstance(probe, DataFrame):
        probes = probe.select("probe").distinct()
        return (
            terms.join(
                F.broadcast(probes),
                (F.abs(F.length("term") - F.length("probe")) <= max_dist)
                & (F.levenshtein(F.col("term"), F.col("probe")) <= max_dist),
            )
            .select("probe", "term")
        )
    return (
        terms
        .filter(F.abs(F.length("term") - F.lit(len(probe))) <= max_dist)
        .filter(F.levenshtein(F.col("term"), F.lit(probe)) <= max_dist)
    )


def fuzzy_search(
    postings: DataFrame,
    probe: str,
    *,
    n_docs: int,
    k: int = 10,
    max_dist: int = 1,
) -> DataFrame:
    """Fuzzy retrieval over the posting table: expand ``probe`` to its
    edit-distance neighborhood in the term dictionary, then score the
    matched postings with the same tf-idf ranking as ``tfidf_search``.
    The expansion stays a DataFrame end-to-end (broadcast into the posting
    join) -- no driver collect; an empty neighborhood yields an empty,
    correctly-typed result through the same plan."""
    return tfidf_search(
        postings, fuzzy_terms(postings, probe, max_dist), n_docs=n_docs, k=k
    )


def fuzzy_search_batch(
    postings: DataFrame,
    probes: DataFrame,
    *,
    n_docs: int,
    k: int = 10,
    max_dist: int = 1,
) -> DataFrame:
    """Batched fuzzy retrieval: ``probes`` is a DataFrame with a ``probe``
    column; returns per-probe ranked hits (probe, doc_id, score,
    n_terms_matched), top-k per probe. One term-dictionary scan and one
    posting join serve EVERY probe -- the per-query composition would scan
    the dictionary once per probe.

    Idf uses per-term document frequency exactly as ``tfidf_search``; the
    per-probe top-k runs as a rank-limited window (WindowGroupLimit:
    per-partition top-k before the shuffle, no global sort)."""
    if not isinstance(n_docs, int) or n_docs <= 0:
        raise ValueError("fuzzy_search_batch requires n_docs > 0")
    cand = fuzzy_terms(postings, probes, max_dist)  # (probe, term)
    term_set = cand.select("term").distinct()
    dfreq = (
        postings.join(F.broadcast(term_set), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    matched = (
        postings.join(F.broadcast(cand), "term")
        .join(F.broadcast(dfreq), "term")
        .withColumn("w", F.col("tf") * idf)
    )
    scored = matched.groupBy("probe", "doc_id").agg(
        F.round(F.sum("w"), 6).alias("score"),
        F.countDistinct("term").alias("n_terms_matched"),
    )
    w = Window.partitionBy("probe").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def read_index(
    spark: SparkSession, io: TableIO, name: str = "postings"
) -> DataFrame:
    """Open the materialized index. For parquet, the schema persisted by
    ``write_postings`` is supplied explicitly when present — no footer
    inference, and an empty index (zero-posting corpus: a partitioned dir
    with no part files) stays readable instead of failing inference."""
    if io.fmt == "iceberg":
        return io.read(spark, name)
    stats_path = os.path.join(io._path(name), "_index_stats.json")
    if os.path.exists(stats_path):
        from pyspark.sql import types as T

        with open(stats_path) as f:
            ddl = json.load(f).get("schema")
        if ddl:
            schema = T.StructType.fromJson(ddl)
            return spark.read.schema(schema).parquet(io._path(name))
    return io.read(spark, name)


def has_index(io: TableIO, name: str = "postings", spark: SparkSession | None = None) -> bool:
    """Index-existence probe (`ES_Importer/es_importer.py:33-35`
    ``has_index`` wraps ``indices.exists``): does the materialized posting
    table exist? Parquet: the table directory is present (the writer always
    leaves the ``_index_stats.json`` sidecar or partition dirs). Iceberg:
    catalog lookup -- no data scan either way."""
    if io.fmt == "iceberg":
        if spark is None:
            raise ValueError("has_index on an iceberg table needs spark")
        return spark.catalog.tableExists(io._path(name))
    return os.path.isdir(io._path(name))


def has_data(spark: SparkSession, io: TableIO, name: str = "postings") -> bool:
    """Non-empty probe (`es_importer.py:37-38` ``has_data`` checks
    ``count > 0``). Prefer the ``index_stats`` sidecar (no scan at all);
    fall back to an existence-bounded LIMIT 1 -- never a full count."""
    if not has_index(io, name, spark=spark):
        return False
    try:
        stats = index_stats(io, name, spark=spark)
        if "n_postings" in stats:
            return stats["n_postings"] > 0
    except (OSError, ValueError, json.JSONDecodeError):
        pass
    return read_index(spark, io, name).limit(1).count() > 0


def delete_index(io: TableIO, name: str = "postings", spark: SparkSession | None = None) -> bool:
    """Index teardown (`es_importer.py:75-76` ``delete_index``): drop the
    materialized posting table (+ its stats sidecar). Returns True if
    something was deleted, False if the index did not exist (the reference
    raises NotFoundError there; a bool is the composable form for the
    create-if-missing loops that call this)."""
    if io.fmt == "iceberg":
        if spark is None:
            raise ValueError("delete_index on an iceberg table needs spark")
        if not spark.catalog.tableExists(io._path(name)):
            return False
        spark.sql(f"DROP TABLE {io._path(name)}")
        return True
    path = io._path(name)
    if not os.path.isdir(path):
        return False
    import shutil

    shutil.rmtree(path)
    return True


def term_lookup(
    spark: SparkSession,
    io: TableIO,
    term: str,
    name: str = "postings",
    n_term_buckets: int = 64,
) -> DataFrame:
    """Point lookup against the materialized index: the term_bucket equality
    predicate (constant-folded from the same xxhash64 the writer used) prunes
    to one partition directory before the term filter."""
    probe = F.pmod(F.xxhash64(F.lit(term)), F.lit(n_term_buckets)).cast("int")
    return (
        read_index(spark, io, name)
        .filter((F.col("term_bucket") == probe) & (F.col("term") == term))
        .drop("term_bucket")
    )
