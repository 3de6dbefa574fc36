"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k -- the query side broadcasts (queries are
few), the corpus streams, similarity is computed JVM-side with higher-order
array functions (zip_with/aggregate), ranking is a window top-k. Exact, no
Python in the loop.

Scale path: SRP (sign-LSH) bucketed variant -- corpus pre-bucketed once by
random-hyperplane signs; a query probes only its own bucket plus the
``n_probe`` nearest buckets by hamming distance on the bucket id (IVF-style
probing). Candidates per query drop from N to ~N * n_probe / 2^n_planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine_expr, with_sign_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """[query_id, vec_id, cosine, rank<=k]; excludes self-matches.
    Deterministic tie-break (cosine desc, vec_id asc)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("c_emb"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    n_probe: int = 8,
) -> DataFrame:
    """Bucketed ANN: exact cosine within the probed buckets only.

    Probing: a query with bucket b scans buckets whose id differs from b in
    <= log2(n_probe) bits (hamming-ball probe). With n_planes=8 / n_probe=8
    a query touches ~3.5% of the corpus in expectation."""
    c = with_sign_bucket(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("c_emb")),
        "c_emb", dim=dim, n_planes=n_planes,
    ).withColumnRenamed("bucket", "c_bucket")
    q = with_sign_bucket(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(emb_col).alias("q_emb")),
        "q_emb", dim=dim, n_planes=n_planes,
    ).withColumnRenamed("bucket", "q_bucket")

    # hamming-ball probe: bucket ids within bit-distance radius
    import math

    radius = max(0, int(math.log2(max(1, n_probe))) // 1)
    joined = (
        c.join(F.broadcast(q), F.lit(True))
        .filter(
            F.bit_count(
                F.col("c_bucket").bitwiseXOR(F.col("q_bucket")).cast("long")
            ) <= F.lit(radius)
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
