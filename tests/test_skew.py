"""Skew handling (SURVEY.md §7.4.1): a mega-repo must not serialize the
chunking stage. Salted repartition spreads the hot repo across partitions;
the full pipeline still produces correct results on the skewed corpus."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.plans.pipeline import (
    PipelineConfig,
    build_triples,
)
from textchunking_and_knowledgegraph_spark.sources.io import salted_repartition


def _skewed_source(spark, n_hot=400, n_cold_repos=20):
    """One mega-repo with n_hot files; n_cold_repos repos with 2 files each."""
    hot = spark.range(n_hot).select(
        F.lit("mega-repo").alias("repo"),
        F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(F.lit("import os\ndef f"), F.col("id").cast("string"),
                 F.lit("():\n    return os.name\n")).alias("content"),
    )
    cold = spark.range(n_cold_repos * 2).select(
        F.concat(F.lit("repo-"), (F.col("id") % n_cold_repos).cast("string")).alias("repo"),
        F.concat(F.lit("lib/g"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
        F.lit("c1").alias("commit"),
        F.lit("python").alias("lang"),
        F.lit("def g():\n    return 1\n").alias("content"),
    )
    return hot.unionByName(cold)


def test_salted_repartition_balances_mega_repo(spark):
    src = _skewed_source(spark)
    n_parts = 8
    parted = salted_repartition(src, n_parts, salt_buckets=16)
    sizes = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    total = sum(counts)
    assert total == 440
    # without salting, repo-hash partitioning puts all 400 hot files in ONE
    # partition; with salting no partition may hold more than ~2x the mean
    assert max(counts) <= 2 * (total / n_parts), counts


def test_unsalted_repo_partitioning_is_skewed(spark):
    """Sanity: the problem is real -- repo-only partitioning concentrates
    the mega-repo in a single partition."""
    src = _skewed_source(spark)
    parted = src.repartition(8, F.col("repo"))
    counts = [
        r["count"]
        for r in parted.withColumn("pid", F.spark_partition_id()).groupBy("pid").count().collect()
    ]
    assert max(counts) >= 400  # the hot repo landed in one partition


def test_pipeline_on_skewed_corpus(spark):
    """End-to-end on the skewed corpus with salting enabled: correct triple
    counts (each python file emits an imports + defines + contains triple)."""
    src = _skewed_source(spark)
    cfg = PipelineConfig(salt_partitions=8)
    triples = build_triples(spark, src, cfg)
    by_pred = {r.pred: r.cnt for r in triples.groupBy("pred").agg(F.count("*").alias("cnt")).collect()}
    assert by_pred["imports"] == 400  # hot files import os; cold files none
    assert by_pred["defines"] == 440
    assert by_pred["contains_chunk"] == 440
