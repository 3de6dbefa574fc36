"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing excludes session startup; each query is executed to completion with a
noop sink (no driver collect). Set SPARK_GRAFT_CPUS=8 vs 32 on the same input
for the two-cluster-size scaling protocol (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _run(df) -> int:
    """Execute fully (all partitions, no result transfer to driver)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from pyspark.sql import functions as F

    from textchunking_and_knowledgegraph_spark.job import docs_as_source
    from textchunking_and_knowledgegraph_spark.operators.ann import brute_force_topk
    from textchunking_and_knowledgegraph_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dups,
        simhash_near_dups,
    )
    from textchunking_and_knowledgegraph_spark.plans.pipeline import (
        build_triples,
        build_vertices,
    )
    from textchunking_and_knowledgegraph_spark.session import build_session

    spark = build_session(app_name="tckg-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def t(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    docs = t("documents")
    source = docs_as_source(spark, f"{sf_dir}/documents.parquet")

    def q_kg_triples():
        return build_triples(spark, source)

    def q_kg_vertices():
        return build_vertices(build_triples(spark, source))

    def q_exact_dedup():
        return exact_dedup(docs, "doc_id", "text")

    def q_minhash_dedup():
        return minhash_near_dups(docs, threshold=0.5)

    def q_simhash_dedup():
        return simhash_near_dups(docs, max_hamming=3)

    def q_ann_topk():
        emb = t("embeddings")
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return brute_force_topk(emb, queries, k=5)

    def q_star_revenue():
        li, orders, cust = t("lineitem"), t("orders"), t("customer")
        rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.sum(rev).alias("revenue_cents"), F.count("*").alias("n_lines"))
        )

    def q_pricing_summary():
        return (
            t("lineitem")
            .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_cents"),
                F.count("*").alias("count_order"),
            )
        )

    def q_event_hourly():
        return (
            t("events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
        )

    def q_sessionize():
        from textchunking_and_knowledgegraph_spark.streaming.sessionize import (
            sessionize_batch,
        )

        return sessionize_batch(t("events"), gap_seconds=3600)

    benches = {
        "kg_triples": q_kg_triples,
        "kg_vertices": q_kg_vertices,
        "exact_dedup": q_exact_dedup,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "ann_topk": q_ann_topk,
        "star_revenue": q_star_revenue,
        "pricing_summary": q_pricing_summary,
        "event_hourly": q_event_hourly,
        "sessionize": q_sessionize,
    }

    # warm the JVM + parquet footers + the Python worker pool once (excluded
    # from the timed window). The UDF warm-up must be FULL-width: a limit(1)
    # pass spawns 1-2 workers, and the first timed pandas-UDF query then
    # pays the remaining ~30 worker spawns (10-25 s one-time on this box).
    @F.pandas_udf("int")
    def _noop_udf(s: pd.Series) -> pd.Series:
        return s.str.len().fillna(0).astype("int32")

    docs.select(_noop_udf(F.col("text"))).write.format("noop").mode("overwrite").save()
    t("lineitem").limit(1).count()

    # best-of-2: this (virtualized) box swings 30%+ between neighboring
    # minutes; a single pass records the noise, the per-query minimum over
    # two interleaved passes records the engine
    timings: dict[str, float] = {}
    for _ in range(2):
        for name, fn in benches.items():
            t0 = time.time()
            _run(fn())
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    n_docs = docs.count()
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "docs": n_docs,
                "docs_per_sec_kg": round(n_docs / timings["kg_triples"], 1)
                if timings["kg_triples"]
                else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    main()
