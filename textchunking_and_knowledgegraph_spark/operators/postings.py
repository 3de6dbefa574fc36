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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import TableIO

TOKEN_PATTERN = "[^a-z0-9]+"


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """(term, doc_id, tf): one posting row per distinct term per document.

    Tokenization is the deterministic stand-in for the reference's
    ik_max_word analyzer (`es_importer.py:23-27`): lowercase + split on
    non-alphanumeric runs. Stays in whole-stage codegen; the only shuffle is
    the (term, doc_id) aggregation, which combines map-side.
    """
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), token_pattern)).alias("term"),
        )
        .filter(F.col("term") != "")
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


def tfidf_search(
    postings: DataFrame,
    query_terms: list[str],
    k: int = 10,
    n_docs: int | None = None,
) -> DataFrame:
    """Scored OR-match retrieval over the posting table -- the analog of the
    reference's ES `match` search (`es_importer.py:53-60` returns ranked
    hits): score(doc) = sum over matched query terms of tf * idf, with the
    BM25-style idf ln(1 + (N - df + 0.5) / (df + 0.5)).

    Plan shape: the query-term list broadcasts (tiny), per-term document
    frequencies come from one partial-aggregated pass restricted to the
    query terms, and the final ranking is a global top-k (orderBy+limit --
    Spark runs it as per-partition top-k + driver merge, no full sort).
    Returns (doc_id, score, n_terms_matched) ranked best-first.
    """
    spark = postings.sparkSession
    # dedupe: a repeated query term would double-count tf in the join
    terms_df = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(query_terms)], "term string"
    )
    if n_docs is None:
        n_docs = postings.select("doc_id").distinct().count()
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
        io.read(spark, name)
        .filter((F.col("term_bucket") == probe) & (F.col("term") == term))
        .drop("term_bucket")
    )
