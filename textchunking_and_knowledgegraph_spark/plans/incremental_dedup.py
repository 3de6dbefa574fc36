"""Incremental corpus curation: dedup NEW documents against a persisted
store -- the ``--add-content`` analog for training-data curation. At 100 TB
the corpus grows in batches; recomputing dedup over everything per batch is
O(corpus) per ingest, while this flow is O(new batch) signature work plus
candidate joins against the (compact) signature store.

Store layout under ``<store>/``:
  dedup_decisions/      (id, keeper, keep)      every document ever seen
  sigs/                 (id, sig array<long>)   minhash strategy only
  exact_keeper/         (sha, keeper)           exact strategy only
  _dedup_params.json    strategy + minhash parameters (validated on add)

Semantics -- first-seen-wins, the standard streaming-curation contract:
  * existing decisions are IMMUTABLE: a new document can join an existing
    cluster (keep=False, keeper = that cluster's keeper) but never changes
    which old document is kept;
  * a new document near-dup of TWO existing clusters joins the one with the
    smaller keeper; the old clusters are NOT merged (a batch recompute
    would merge them -- an accepted, tested divergence of incremental
    curation);
  * new-new clusters among unmatched documents elect their min id, exactly
    as the batch path does.

Scale shape of ``add_documents`` (minhash): signatures run over the NEW
batch only (Arrow UDF); candidate generation is an equi-join of the new
band keys against old+new band keys with the same oversized-bucket star cap
as the batch operator; the signature prefilter keeps Python off all but
near-threshold pairs; exact verification reads OLD text selectively -- a
join of the surviving candidate ids back into the caller-supplied prior
corpus, never a full old-corpus pass. ``old_corpus`` must be CUMULATIVE
(every earlier batch, not just the initial one) -- a coverage guard raises
if any candidate endpoint lacks text rather than silently keeping a true
near-duplicate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_decisions,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_near_dups,
    sig_prefiltered_verify,
    signatures_with_collapse,
)
from ..operators.linking import banded

_PARAMS = "_dedup_params.json"


def _write_params(store: str, params: dict) -> None:
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, _PARAMS), "w") as f:
        json.dump(params, f)


def read_params(store: str) -> dict:
    with open(os.path.join(store, _PARAMS)) as f:
        return json.load(f)


def _exact_decisions(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(decisions [id, keeper, keep], keeper map [sha, keeper])."""
    d = exact_dedup(corpus, "id", "text")
    keepers = d.filter("keep").select(F.col("sha"), F.col("id").alias("keeper"))
    decisions = d.join(keepers, "sha").select("id", "keeper", "keep")
    return decisions, keepers


def write_dedup_store(
    spark: SparkSession,
    corpus: DataFrame,
    store: str,
    strategy: str = "minhash",
    threshold: float = 0.7,
    n_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
) -> dict:
    """Full dedup of ``corpus`` (id, text) + persist the incremental store.
    Returns counting stats. The decisions parquet is the curation output;
    the sigs / exact_keeper tables are what ``add_documents`` joins new
    batches against."""
    if strategy == "exact":
        decisions, keepers = _exact_decisions(corpus)
        keepers.write.mode("overwrite").parquet(f"{store}/exact_keeper")
    elif strategy == "minhash":
        # ONE signature pass (collapse-aware, checkpointed) serves both the
        # persisted store and the pair computation -- recomputing inside
        # minhash_near_dups would double the dominant UDF cost and hold two
        # checkpointed signature copies at peak
        sigs = signatures_with_collapse(corpus, "id", "text", n_perm)
        sigs.select("id", "sig").write.mode("overwrite").parquet(f"{store}/sigs")
        pairs = minhash_near_dups(
            corpus, "id", "text", threshold=threshold, n_perm=n_perm,
            bands=bands, max_bucket=max_bucket, precomputed_sigs=sigs,
        )
        decisions = dedup_decisions(corpus, pairs, id_col="id")
    else:
        raise ValueError(f"unsupported incremental strategy {strategy!r}")
    decisions.write.mode("overwrite").parquet(f"{store}/dedup_decisions")
    _write_params(store, {
        "strategy": strategy, "threshold": threshold,
        "n_perm": n_perm, "bands": bands, "max_bucket": max_bucket,
    })
    decisions = spark.read.parquet(f"{store}/dedup_decisions")
    n = decisions.count()
    kept = decisions.filter("keep").count()
    return {"strategy": strategy, "docs": n, "kept": kept,
            "duplicates_dropped": n - kept, "store": store}


def _new_minhash_edges(
    spark: SparkSession,
    store: str,
    new_corpus: DataFrame,
    old_corpus: DataFrame,
    p: dict,
) -> tuple[DataFrame, DataFrame]:
    """(edges, new_sigs): verified near-dup edges touching the new batch --
    (new-new) pairs and (new-old) pairs with old endpoints already mapped
    to their cluster keeper, columns (src, dst) -- plus the new batch's
    checkpointed signature table so the caller appends it to the store
    without a second UDF pass."""
    n_perm, bands = p["n_perm"], p["bands"]
    rows = n_perm // bands
    threshold, max_bucket = p["threshold"], p["max_bucket"]

    new_sigs = signatures_with_collapse(new_corpus, "id", "text", n_perm)
    old_sigs = spark.read.parquet(f"{store}/sigs").withColumn("is_new", F.lit(False))
    all_sigs = new_sigs.select("id", "sig").withColumn(
        "is_new", F.lit(True)
    ).unionByName(old_sigs)

    bd = banded(all_sigs, bands, rows).select("id", "is_new", "band_id", "band_hash")
    # same candidate machinery as the batch operator (ONE implementation,
    # operators/dedup.py), restricted to pairs touching the new batch
    pairs = lsh_candidate_pairs(bd, max_bucket, left_col="is_new").localCheckpoint(
        eager=True
    )

    # guard BEFORE the text join silently drops anything: old candidate
    # endpoints must be covered by old_corpus -- callers must pass the
    # CUMULATIVE prior corpus (every earlier batch), not just the initial
    # one, or true near-dups of earlier increments would be kept
    texts = new_corpus.select("id", "text").unionByName(
        old_corpus.select("id", "text")
    )
    cand_ids = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id"))
    ).distinct()
    missing = cand_ids.join(texts.select("id"), "id", "left_anti")
    n_missing = missing.limit(1).count()
    if n_missing:
        sample = [r.id for r in missing.limit(5).collect()]
        raise ValueError(
            "old_corpus does not cover every previously added batch: "
            f"candidate endpoints without text, e.g. {sample}. Pass the "
            "cumulative prior corpus (all earlier batches) as old_corpus."
        )

    # signature prefilter (JVM) + exact verify (operators/dedup.py shared
    # tail); old text enters only through the candidate-id join
    sig_text = all_sigs.select("id", "sig").join(texts, "id")
    verified = sig_prefiltered_verify(
        pairs, sig_text, n_perm, threshold
    ).select("id_a", "id_b")

    # map OLD endpoints to their cluster keeper (old decisions immutable)
    old_map = spark.read.parquet(f"{store}/dedup_decisions").select(
        F.col("id").alias("old_id"), F.col("keeper").alias("old_keeper")
    )
    e = (
        verified.join(old_map.withColumnRenamed("old_id", "id_a"), "id_a", "left")
        .withColumn("src", F.coalesce("old_keeper", "id_a"))
        .drop("old_keeper")
        .join(old_map.withColumnRenamed("old_id", "id_b"), "id_b", "left")
        .withColumn("dst", F.coalesce("old_keeper", "id_b"))
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return e, new_sigs


def write_embedding_store(
    spark: SparkSession,
    corpus: DataFrame,
    store: str,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 2,
    max_bucket: int = 200,
) -> dict:
    """Embedding-cosine near-dup curation of ``corpus`` (id, embedding)
    with a persisted incremental store. SRP buckets are deterministic
    (fixed hyperplane seeds), so the persisted (id, table_id, bucket) rows
    stay joinable against any later batch bucketed with the same params.
    Candidates go through the SAME cap/star machinery as the text paths
    (lsh_candidate_pairs); verification is exact JVM cosine."""
    from ..operators.dedup import cosine_expr, with_sign_buckets

    base = corpus.select("id", F.col("embedding").alias("emb"))
    bucketed = with_sign_buckets(base, "emb", n_planes, n_tables).localCheckpoint(
        eager=True
    )
    bucketed.select("id", "table_id", "bucket").write.mode("overwrite").parquet(
        f"{store}/emb_buckets"
    )
    bd = bucketed.select(
        "id", F.col("table_id").alias("band_id"), F.col("bucket").alias("band_hash")
    )
    pairs = lsh_candidate_pairs(bd, max_bucket)
    embs = base
    verified = (
        pairs.join(embs.select(F.col("id").alias("id_a"),
                               F.col("emb").alias("emb_a")), "id_a")
        .join(embs.select(F.col("id").alias("id_b"),
                          F.col("emb").alias("emb_b")), "id_b")
        .filter(cosine_expr(F.col("emb_a"), F.col("emb_b")) >= threshold)
        .select("id_a", "id_b")
    )
    decisions = dedup_decisions(base, verified, id_col="id")
    decisions.write.mode("overwrite").parquet(f"{store}/dedup_decisions")
    _write_params(store, {
        "strategy": "embedding", "threshold": threshold,
        "n_planes": n_planes, "n_tables": n_tables, "max_bucket": max_bucket,
    })
    decisions = spark.read.parquet(f"{store}/dedup_decisions")
    n = decisions.count()
    kept = decisions.filter("keep").count()
    return {"strategy": "embedding", "docs": n, "kept": kept,
            "duplicates_dropped": n - kept, "store": store}


def add_embeddings(
    spark: SparkSession,
    store: str,
    new_corpus: DataFrame,
    old_corpus: DataFrame,
) -> dict:
    """Incrementally curate new (id, embedding) rows against an embedding
    store: bucket the NEW batch only (same deterministic hyperplanes),
    candidates from an equi-join of new buckets against old+new buckets,
    exact cosine verification with OLD embeddings read selectively from
    the caller-supplied CUMULATIVE prior corpus (coverage-guarded), then
    the shared first-seen-wins cluster assignment."""
    from ..operators.dedup import cosine_expr, with_sign_buckets

    p = read_params(store)
    if p["strategy"] != "embedding":
        raise ValueError(f"store strategy is {p['strategy']!r}, not embedding")
    new = new_corpus.select("id", F.col("embedding").alias("emb"))
    old = old_corpus.select("id", F.col("embedding").alias("emb"))

    new_bd = with_sign_buckets(
        new, "emb", p["n_planes"], p["n_tables"]
    ).select("id", "table_id", "bucket").localCheckpoint(eager=True)
    old_bd = spark.read.parquet(f"{store}/emb_buckets").withColumn(
        "is_new", F.lit(False)
    )
    bd = (
        new_bd.withColumn("is_new", F.lit(True))
        .unionByName(old_bd)
        .select(
            "id", "is_new",
            F.col("table_id").alias("band_id"),
            F.col("bucket").alias("band_hash"),
        )
    )
    pairs = lsh_candidate_pairs(bd, p["max_bucket"], left_col="is_new").localCheckpoint(
        eager=True
    )

    embs = new.unionByName(old)
    cand_ids = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id"))
    ).distinct()
    missing = cand_ids.join(embs.select("id"), "id", "left_anti")
    if missing.limit(1).count():
        sample = [r.id for r in missing.limit(5).collect()]
        raise ValueError(
            "old_corpus does not cover every previously added batch: "
            f"candidate endpoints without embeddings, e.g. {sample}. Pass "
            "the cumulative prior corpus as old_corpus."
        )
    verified = (
        pairs.join(embs.select(F.col("id").alias("id_a"),
                               F.col("emb").alias("emb_a")), "id_a")
        .join(embs.select(F.col("id").alias("id_b"),
                          F.col("emb").alias("emb_b")), "id_b")
        .filter(cosine_expr(F.col("emb_a"), F.col("emb_b")) >= p["threshold"])
        .select("id_a", "id_b")
    )
    old_map = spark.read.parquet(f"{store}/dedup_decisions").select(
        F.col("id").alias("old_id"), F.col("keeper").alias("old_keeper")
    )
    edges = (
        verified.join(old_map.withColumnRenamed("old_id", "id_a"), "id_a", "left")
        .withColumn("src", F.coalesce("old_keeper", "id_a"))
        .drop("old_keeper")
        .join(old_map.withColumnRenamed("old_id", "id_b"), "id_b", "left")
        .withColumn("dst", F.coalesce("old_keeper", "id_b"))
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    decisions_new = _first_seen_decisions(spark, store, new.select("id"), edges)
    new_bd.write.mode("append").parquet(f"{store}/emb_buckets")
    decisions_new.write.mode("append").parquet(f"{store}/dedup_decisions")
    n = decisions_new.count()
    kept = decisions_new.filter("keep").count()
    return {"strategy": "embedding", "new_docs": n, "new_kept": kept,
            "new_duplicates_dropped": n - kept, "store": store}


def _first_seen_decisions(
    spark: SparkSession,
    store: str,
    new_ids: DataFrame,
    edges: DataFrame,
) -> DataFrame:
    """First-seen-wins cluster assignment shared by every near-dup
    strategy: CC over the verified edge graph (old endpoints arrive
    pre-mapped to their keeper), then per component the min OLD keeper
    wins if any member is one, else the component min; untouched new docs
    keep themselves. Returns checkpointed (id, keeper, keep) for the new
    batch only."""
    from ..operators.canonicalize import connected_components

    # eager: edges feed isEmpty AND both sides of the CC symmetrizing
    # union -- without the barrier the whole candidate+verify pipeline
    # (band joins + verify UDF) re-executes per consumer
    edges = edges.localCheckpoint(eager=True)
    if edges.isEmpty():
        return new_ids.select(
            "id", F.col("id").alias("keeper"), F.lit(True).alias("keep")
        ).localCheckpoint(eager=True)
    old_keepers = (
        spark.read.parquet(f"{store}/dedup_decisions")
        .filter("keep")
        .select(F.col("id").alias("kid"))
    )
    comp = connected_components(edges)  # (id, component)
    old_in_comp = (
        comp.join(old_keepers, comp.id == old_keepers.kid)
        .groupBy("component")
        .agg(F.min("kid").alias("old_keeper"))
    )
    comp_keeper = (
        comp.groupBy("component")
        .agg(F.min("id").alias("comp_min"))
        .join(old_in_comp, "component", "left")
        .select(
            "component", F.coalesce("old_keeper", "comp_min").alias("ckeeper")
        )
    )
    labeled = comp.join(comp_keeper, "component").select(
        F.col("id"), F.col("ckeeper")
    )
    return (
        new_ids.join(labeled, "id", "left")
        .select(
            "id",
            F.coalesce("ckeeper", F.col("id")).alias("keeper"),
            (F.coalesce("ckeeper", F.col("id")) == F.col("id")).alias("keep"),
        )
        .localCheckpoint(eager=True)
    )


def add_documents(
    spark: SparkSession,
    store: str,
    new_corpus: DataFrame,
    old_corpus: DataFrame | None = None,
) -> dict:
    """Incrementally curate ``new_corpus`` (id, text) against the store.
    Appends the new decisions (and new signatures / sha keepers) to the
    store and returns stats. ``old_corpus`` is required for the minhash
    strategy (exact verification reads old text selectively)."""
    p = read_params(store)

    if p["strategy"] == "exact":
        new = new_corpus.select(
            "id", F.sha2(F.coalesce("text", F.lit("")), 256).alias("sha")
        ).localCheckpoint(eager=True)
        old_map = spark.read.parquet(f"{store}/exact_keeper")
        hit = new.join(old_map, "sha").select(
            "id", "keeper", F.lit(False).alias("keep")
        )
        miss = new.join(old_map, "sha", "left_anti")
        # eager: the append below writes INTO the exact_keeper dir this
        # plan reads (the left_anti scan) -- materialize before writing
        miss_groups = (
            miss.groupBy("sha").agg(F.min("id").alias("keeper"))
            .localCheckpoint(eager=True)
        )
        miss_dec = miss.join(miss_groups, "sha").select(
            "id", "keeper", (F.col("id") == F.col("keeper")).alias("keep")
        )
        decisions_new = hit.unionByName(miss_dec).localCheckpoint(eager=True)
        miss_groups.select("sha", "keeper").write.mode("append").parquet(
            f"{store}/exact_keeper"
        )
    elif p["strategy"] == "minhash":
        if old_corpus is None:
            raise ValueError(
                "minhash add_documents needs old_corpus (selective text "
                "reads for candidate verification)"
            )
        edges, new_sigs = _new_minhash_edges(spark, store, new_corpus, old_corpus, p)
        decisions_new = _first_seen_decisions(
            spark, store, new_corpus.select("id"), edges
        )
        new_sigs.select("id", "sig").write.mode("append").parquet(f"{store}/sigs")
    else:
        raise ValueError(f"unsupported incremental strategy {p['strategy']!r}")

    decisions_new.write.mode("append").parquet(f"{store}/dedup_decisions")
    n = decisions_new.count()
    kept = decisions_new.filter("keep").count()
    return {
        "strategy": p["strategy"],
        "new_docs": n,
        "new_kept": kept,
        "new_duplicates_dropped": n - kept,
        "store": store,
    }
