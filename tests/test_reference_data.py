"""Parity anchors on the reference's OWN shipped data (read as data only;
skip when the reference checkout is absent).

- `Entity Data/mat_knowledge.csv`: the real 2,358-term math vocabulary the
  reference feeds its Dify retrieval dataset — exercises MinHash-LSH
  linking at realistic dictionary size with real near-dup families.
- `Entity Data/edukg_instance_info.csv`: the real exported triple table
  (subject, type, relation, object, type; 22k rows) — exercises the graph
  operators on the reference's actual KG.
"""

import csv
import os

import pytest

from pyspark.sql import functions as F

MAT = "/root/reference/Entity Data/mat_knowledge.csv"
EDUKG = "/root/reference/Entity Data/edukg_instance_info.csv"

needs_mat = pytest.mark.skipif(not os.path.exists(MAT), reason="reference data absent")
needs_edukg = pytest.mark.skipif(not os.path.exists(EDUKG), reason="reference data absent")


@needs_mat
def test_link_entities_on_real_vocabulary(spark):
    from textchunking_and_knowledgegraph_spark.operators.linking import link_entities

    with open(MAT, encoding="utf-8") as f:
        terms = [r[0] for r in csv.reader(f)][1:]
    assert len(terms) > 2000
    dictionary = spark.createDataFrame([(t,) for t in terms], "entity string")

    mentions = spark.createDataFrame(
        [
            ("集合的含义与表示",),   # exact member of the vocabulary
            ("集合含义与表示",),     # 的-dropped near-dup
            ("判断元素能否构成集合",),  # exact
        ],
        "mention string",
    )
    links = {r.mention: r.entity for r in link_entities(mentions, dictionary).collect()}
    assert links["集合的含义与表示"] == "集合的含义与表示"
    assert links["判断元素能否构成集合"] == "判断元素能否构成集合"
    assert links["集合含义与表示"] == "集合的含义与表示"


def _real_edges(spark):
    df = (
        spark.read.option("header", True).csv(EDUKG)
        .select(
            F.col("subject_name").alias("subj"),
            F.col("relation_type").alias("pred"),
            F.col("object_name").alias("obj"),
            F.col("subject_type").alias("subj_type"),
            F.col("object_type").alias("obj_type"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )
    return df


@needs_edukg
def test_graph_ops_on_real_kg(spark):
    from textchunking_and_knowledgegraph_spark.operators.graph import (
        distinct_entity_count,
        neighbors,
        random_walk,
    )

    edges = _real_edges(spark)
    n_edges = edges.count()
    assert n_edges > 10_000  # 22k raw rows, ~13k distinct triples

    # A4: distinct entity count over the real KG
    n_entities = distinct_entity_count(edges)
    assert 1_000 < n_entities < n_edges * 2

    # J7: neighbors of a real hub node via the real 相关于 relation
    hub = (
        edges.filter(F.col("pred") == "相关于")
        .groupBy("subj").count().orderBy(F.desc("count"), F.asc("subj"))
        .first()["subj"]
    )
    out = neighbors(edges, hub, rels=["相关于"], limit=10).collect()
    assert 0 < len(out) <= 10

    # J11: deterministic random walks over the real graph
    seeds = spark.createDataFrame([(hub,)], "seed_node string")
    w1 = sorted(r.walk for r in random_walk(edges, seeds, walk_len=3, n_walks=4).collect())
    w2 = sorted(r.walk for r in random_walk(edges, seeds, walk_len=3, n_walks=4).collect())
    assert w1 == w2 and len(w1) == 4
    assert all(w.split("->")[0] == hub for w in w1)


@needs_mat
def test_canonicalization_on_real_vocabulary(spark):
    """Connected-components canonicalization at realistic vocabulary size:
    the real math vocabulary holds genuine 的-variant families (e.g.
    三角形面积公式 / 三角形的面积公式) that must collapse to one canonical
    representative, while unrelated terms stay distinct."""
    from textchunking_and_knowledgegraph_spark.operators.canonicalize import (
        alias_components,
        normalization_alias_edges,
    )

    with open(MAT, encoding="utf-8") as f:
        terms = sorted({r[0] for r in csv.reader(f)} - {"subject"})  # drop header
    names = spark.createDataFrame([(t,) for t in terms], "name string")
    edges = normalization_alias_edges(names)
    mapping = {
        r.name: r.canonical
        for r in alias_components(edges, alias_col="src", canonical_col="dst").collect()
    }
    canon = lambda t: mapping.get(t, t)
    assert canon("三角形面积公式") == canon("三角形的面积公式")
    assert canon("函数的概念") != canon("等差数列")
