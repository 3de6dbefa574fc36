"""Connected-components tests: chains, cliques, singletons, determinism
(SURVEY.md 5.3)."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.canonicalize import (
    canonicalize_triples,
    connected_components,
    normalization_alias_edges,
)


def _cc(spark, pairs):
    edges = spark.createDataFrame([{"src": a, "dst": b} for a, b in pairs])
    return {r.id: r.component for r in connected_components(edges).collect()}


def test_cc_chain(spark):
    comp = _cc(spark, [("b", "c"), ("c", "d"), ("d", "e"), ("a", "b")])
    assert set(comp.values()) == {"a"}


def test_cc_two_components(spark):
    comp = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    assert comp["a"] == comp["b"] == "a"
    assert comp["x"] == comp["y"] == comp["z"] == "x"


def test_cc_clique_and_selfloop(spark):
    comp = _cc(spark, [("p", "q"), ("q", "r"), ("p", "r"), ("s", "s")])
    assert comp["p"] == comp["q"] == comp["r"] == "p"
    # pure self-loop vertices are filtered (a != b); 's' absent
    assert "s" not in comp


def test_cc_long_chain_converges(spark):
    # chain of 30 -> needs several min-propagation rounds
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(30)]
    comp = _cc(spark, pairs)
    assert set(comp.values()) == {"n00"}
    assert len(comp) == 31


def test_normalization_alias_edges(spark):
    names = spark.createDataFrame(
        [{"name": n} for n in ["函数的概念", "函数概念", "函数 概念", "集合"]]
    )
    edges = {(r.src, r.dst) for r in normalization_alias_edges(names).collect()}
    # all three 函数概念 variants collapse to the min name; 集合 untouched
    assert edges == {("函数概念", "函数 概念"), ("函数的概念", "函数 概念")}


def test_canonicalize_triples_maps_endpoints(spark):
    triples = spark.createDataFrame(
        [
            {"subj": "函数的概念", "pred": "上位", "obj": "幂函数", "subj_type": "section",
             "obj_type": "section", "repo": "r", "path": "p", "commit": "c", "sha": "s",
             "chunk_id": None},
            {"subj": "函数概念", "pred": "文本块", "obj": "d:0", "subj_type": "section",
             "obj_type": "chunk", "repo": "r", "path": "p", "commit": "c", "sha": "s",
             "chunk_id": "d:0"},
        ]
    )
    out = canonicalize_triples(triples).collect()
    subs = {r.subj for r in out}
    assert len(subs) == 1  # both surface forms map to one representative
    # chunk object untouched
    tb = [r for r in out if r.pred == "文本块"][0]
    assert tb.obj == "d:0"


def test_merge_dedup_deterministic_and_partitioning_invariant(spark):
    """merge_dedup must pick the SAME surviving row (struct-min over the
    non-key columns, nulls first) under any partitioning -- the property
    dropDuplicates lacked, and the one the split-lineage hash oracles
    depend on."""
    from textchunking_and_knowledgegraph_spark.operators.canonicalize import (
        merge_dedup,
    )

    cols = ["subj", "pred", "obj", "subj_type", "obj_type",
            "repo", "path", "commit", "sha", "chunk_id"]
    rows = [
        # same (subj,pred,obj,sha) key, three attribute variants incl. a
        # NULL that must win (nulls first) and a tie-break on chunk_id
        ("a", "p", "b", None, "t2", "r", "x", "c1", "s1", "k9"),
        ("a", "p", "b", "t1", "t2", "r", "x", "c1", "s1", "k1"),
        ("a", "p", "b", None, "t2", "r", "x", "c1", "s1", "k2"),
        ("z", "p", "b", "t", "t", "r", "y", "c1", "s2", None),
    ]
    schema = ", ".join(f"{c} string" for c in cols)

    def run(n_parts):
        df = spark.createDataFrame(rows, schema).repartition(n_parts)
        return sorted(tuple(r) for r in merge_dedup(df, cols).collect())

    first = run(1)
    assert run(7) == first and run(32) == first
    keyed = {r[0]: r for r in first}
    # nulls-first struct-min: the NULL subj_type variant wins, and among
    # the two NULL rows the smaller chunk_id breaks the tie
    assert keyed["a"][3] is None and keyed["a"][9] == "k2"
    assert len(first) == 2
