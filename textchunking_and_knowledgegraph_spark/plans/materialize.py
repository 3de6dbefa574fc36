"""Graph materialization: vertex/edge tables, per-partition commit manifest,
lineage/metrics sink, checkpoint-based resume.

Scale-out of the reference's persistence layer (`StoreToNeo4j/Neo4j_functions.py:14-31`
per-row MERGE over bolt; `ES_Importer/es_importer.py:40-51` bulk import), with the
north rule's operational requirements (`BASELINE.json:6,14`):

- edges partitioned by ``repo_bucket`` (Iceberg ``bucket(repo)`` emulated as
  ``pmod(xxhash64(repo), NB)`` -- identical data layout, parquet locally).
- **checkpoint-based resume**: each bucket commits independently; a manifest
  JSON per bucket records (rows, docs, sha_count, t_ms). A killed run
  restarts at the first un-committed bucket -- committed buckets are
  skipped, and per-bucket writes are deterministic so the final output is
  identical to an uninterrupted run.
- **MERGE semantics** (J10): dropDuplicates on the canonical key before
  write -- the distributed equivalent of Cypher MERGE's anti-join insert.
- **lineage**: edges carry (repo, path, commit, sha); the manifest stores
  per-partition row counts + distinct sha counts as the metrics side-channel.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_KEY = ["subj", "pred", "obj", "sha"]


def _manifest_path(checkpoint_dir: str, name: str) -> str:
    return os.path.join(checkpoint_dir, f"{name}.json")


def committed_buckets(checkpoint_dir: str | None) -> set[int]:
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return set()
    out = set()
    for fn in os.listdir(checkpoint_dir):
        if fn.startswith("bucket_") and fn.endswith(".json"):
            out.add(int(fn[len("bucket_"):-len(".json")]))
    return out


def _commit(checkpoint_dir: str, name: str, payload: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = _manifest_path(checkpoint_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _manifest_path(checkpoint_dir, name))  # atomic commit


def materialize_graph(
    triples: DataFrame,
    output_dir: str,
    checkpoint_dir: str | None = None,
    spark: SparkSession | None = None,
    n_buckets: int = 16,
) -> dict:
    """Write edge table (bucketed by repo hash, resumable) + vertex table.

    Returns summary stats {'edges': int, 'vertices': int, 'skipped_buckets': [...]}.

    On a real cluster this maps 1:1 onto Iceberg ``overwritePartitions``
    snapshots; the manifest emulation keeps identical semantics without the
    runtime jar (SURVEY.md 7.0).
    """
    edges = (
        triples.dropDuplicates(EDGE_KEY)
        .withColumn("repo_bucket", F.pmod(F.xxhash64("repo"), F.lit(n_buckets)).cast("int"))
        .persist()
    )
    try:
        done = committed_buckets(checkpoint_dir)
        skipped = sorted(done)
        total_rows = 0
        edge_dir = os.path.join(output_dir, "edges")
        for b in range(n_buckets):
            if b in done:
                # resume: already committed -- count it but do no work
                with open(_manifest_path(checkpoint_dir, f"bucket_{b}")) as f:
                    total_rows += json.load(f)["rows"]
                continue
            t0 = time.time()
            part = edges.filter(F.col("repo_bucket") == b).drop("repo_bucket")
            # deterministic layout: sort within partition by subj for
            # downstream point-join locality (SURVEY.md 4.3)
            part = part.sortWithinPartitions("subj")
            bucket_path = os.path.join(edge_dir, f"repo_bucket={b}")
            part.write.mode("overwrite").parquet(bucket_path)
            stats_row = part.agg(
                F.count("*").alias("rows"),
                F.countDistinct("sha").alias("sha_count"),
                F.countDistinct("path").alias("docs"),
            ).collect()[0]
            total_rows += stats_row["rows"]
            if checkpoint_dir:
                _commit(
                    checkpoint_dir,
                    f"bucket_{b}",
                    {
                        "bucket": b,
                        "rows": stats_row["rows"],
                        "sha_count": stats_row["sha_count"],
                        "docs": stats_row["docs"],
                        "t_ms": int((time.time() - t0) * 1000),
                    },
                )

        from .pipeline import build_vertices

        vertices = build_vertices(edges.drop("repo_bucket"))
        vdir = os.path.join(output_dir, "vertices")
        vertices.write.mode("overwrite").parquet(vdir)
        n_vertices = (
            (spark or triples.sparkSession).read.parquet(vdir).count()
        )
        if checkpoint_dir:
            _commit(checkpoint_dir, "vertices", {"rows": n_vertices})
        return {"edges": total_rows, "vertices": n_vertices, "skipped_buckets": skipped}
    finally:
        edges.unpersist()
