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

from .dedup import cosine_expr, with_sign_buckets


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
    n_planes: int = 8,
    n_probe: int = 8,
    n_tables: int = 2,
) -> DataFrame:
    """Bucketed ANN: exact cosine within the probed buckets only.

    Two recall levers, both candidate-bounded:

    * hamming-ball probing -- each query row is EXPLODED into every bucket
      id within bit-distance radius = log2(n_probe) of its own bucket
      (sum of C(n_planes, 0..radius) probe rows), then equi-joined
      ``c_bucket == probe_bucket``. Candidates are pruned BY THE JOIN,
      before any per-pair work -- a hash join on bucket keys, never a
      nested-loop scan of the corpus per query (the round-1 version
      filtered a broadcast cross join, touching all N x Q pairs).
    * multi-table LSH (``n_tables`` independent plane sets) -- a neighbor
      split from its query by one table's random cut is caught by another.

    Measured on the near-uniform synthetic fixture embeddings (the hard
    case for LSH): recall@5 vs brute force ~0.5-0.6 at n_tables=1,
    ~0.7-0.8 at the default n_tables=2 (tests/test_textfns.py pins the
    floor); clustered real-world embeddings fare much better."""
    c = with_sign_buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("c_emb")),
        "c_emb", n_planes=n_planes, n_tables=n_tables,
    ).withColumnRenamed("bucket", "c_bucket")
    q = with_sign_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(emb_col).alias("q_emb")),
        "q_emb", n_planes=n_planes, n_tables=n_tables,
    ).withColumnRenamed("bucket", "q_bucket")

    import math

    radius = max(0, int(math.log2(max(1, n_probe))))
    # XOR masks with <= radius bits set, precomputed driver-side (tiny:
    # sum C(n_planes, 0..radius); 93 for n_planes=8, radius=3)
    masks = [m for m in range(1 << n_planes) if bin(m).count("1") <= radius]
    probes = q.withColumn(
        "probe_bucket",
        F.explode(
            F.array(*[F.col("q_bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ),
    )
    joined = (
        c.join(
            F.broadcast(probes),
            (F.col("c_bucket") == F.col("probe_bucket"))
            & (c.table_id == probes.table_id),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])  # tables overlap on candidates
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
