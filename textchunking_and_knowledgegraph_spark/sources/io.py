"""Table IO seam + source-table scan.

The north rule targets an Iceberg source-code table at 10^12-file scale
(``BASELINE.json:6``). The sandbox has no Iceberg runtime jar, so ``TableIO``
is a thin seam: ``format='iceberg'`` on a real cluster (catalog tables),
``format='parquet'`` locally with identical partitioning semantics --
``bucket(repo)`` is emulated as a ``pmod(xxhash64(repo), n_buckets)`` column.

Source table shape (input_hint, ``BASELINE.json:15``):
    (repo: string, path: string, commit: string, lang: string, content: string)

Per-row invariant: ``sha = sha2(content, 256)`` is computed at scan time on the
*raw* content (before any normalization) and carried through every downstream
table so lineage can assert sha256 equality against the source
(``BASELINE.json:6,15``).

Reference anchors: whole-file scan `Parser/MD_section_parser.py:26-27`,
CSV sinks `Parser/TextBook_LumberChunker.py:479-484` (S3-S7 in SURVEY.md 2.1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("sha", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("ord", T.IntegerType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("parent_title", T.StringType(), True),
        T.StructField("section_title", T.StringType(), True),
        T.StructField("is_root", T.BooleanType(), False),
        T.StructField("section_kind", T.StringType(), False),
        T.StructField("char_start", T.LongType(), False),
        T.StructField("char_len", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), True),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("chunk_id", T.StringType(), True),
    ]
)


@dataclass
class TableIO:
    """Format seam: parquet in the sandbox, iceberg on a cluster.

    ``base`` is a directory (parquet) or a catalog namespace (iceberg).
    """

    base: str
    fmt: str = "parquet"  # or "iceberg"
    n_repo_buckets: int = 64

    def _path(self, name: str) -> str:
        if self.fmt == "iceberg":
            return f"{self.base}.{name}"
        return os.path.join(self.base, name)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.table(self._path(name))
        return spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, partition_cols: list[str] | None = None, mode: str = "overwrite") -> None:
        if self.fmt == "iceberg":
            w = df.writeTo(self._path(name))
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        writer = df.write.mode(mode)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(self._path(name))

    def with_repo_bucket(self, df: DataFrame) -> DataFrame:
        """Emulation of Iceberg ``bucket(repo)`` partitioning: stable hash
        bucket column usable as a parquet partition key."""
        return df.withColumn(
            "repo_bucket", F.pmod(F.xxhash64(F.col("repo")), F.lit(self.n_repo_buckets)).cast("int")
        )


def with_sha(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-row invariant column: sha256 of the raw content (BASELINE.json:15).

    Computed JVM-side with the built-in ``sha2`` -- no Python in the loop.
    """
    return df.withColumn("sha", F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256))


def with_doc_id(df: DataFrame) -> DataFrame:
    """Stable document identity: xxhash64 of (repo, path, commit) as hex.

    Deterministic across runs/partitionings (unlike monotonically_increasing_id),
    which the checkpoint-resume protocol depends on.
    """
    return df.withColumn(
        "doc_id",
        F.lower(F.hex(F.xxhash64(F.col("repo"), F.col("path"), F.col("commit")))),
    )


def scan_source(
    spark: SparkSession,
    source: str | DataFrame,
    langs: list[str] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Scan the source table, push down lang filter + column pruning, attach
    sha + doc_id.

    On a cluster ``source`` is an Iceberg table name; locally a parquet path
    or an in-memory DataFrame (tests). The lang filter is declared *before*
    any UDF so Catalyst pushes it into the file scan (PushedFilters).
    """
    if isinstance(source, DataFrame):
        df = source
    elif fmt == "iceberg":
        df = spark.read.table(source)
    else:
        df = spark.read.parquet(source)
    df = df.select("repo", "path", "commit", "lang", "content")
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    return with_doc_id(with_sha(df))


def estimate_input_splits(df: DataFrame) -> int:
    """Cheap input-split estimate without a plan->RDD conversion (a
    ``df.rdd.getNumPartitions()`` probe forces an RDD translation on the
    driver and discards AQE re-optimization of the probed plan). A
    file-backed source reports its file count. That underestimates splits
    for multi-row-group files, which only means the caller salts a source
    Spark could already parallelize (one extra small shuffle); at scale a
    100 TB input has far more files than cores, so the guard is a no-op
    there. In-memory sources (createDataFrame fixtures) report 1, so small
    test sources always get the parallelism bump.

    Contract note: the estimate reflects the SCAN only -- it cannot see a
    coalesce()/repartition() the caller applied on top of the scan, so a
    deliberately-laid-out FEW-FILE input still gets the small-source salt
    bump in prepared_source (a layout/perf effect, never a correctness
    one). Callers who need an exact partition layout preserved should set
    ``PipelineConfig.salt_partitions`` explicitly rather than pre-shaping
    the input DataFrame."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1
    return max(1, len(files))


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Skew-aware repartition before the chunking stage (SURVEY.md 4.2).

    Mega-repos hold most rows; partitioning by repo alone would put one repo's
    10^9 files in one task. Salting by a path-hash bucket spreads a hot repo
    over ``salt_buckets`` partitions while keeping co-location for downstream
    per-repo work approximately intact. The skew is in UDF *compute*, so AQE
    (which only fixes join/shuffle skew) can't do this for us.
    """
    return df.repartition(
        num_partitions,
        F.col("repo"),
        F.pmod(F.xxhash64(F.col("path")), F.lit(salt_buckets)),
    )
