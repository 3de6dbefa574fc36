"""The fused single-pass extractor must be plan-for-plan equivalent to the
unfused two-branch pipeline: identical triple sets (all columns), identical
chunk-id referential integrity. The fused path is the production hot path
(one Arrow crossing per doc); the unfused path is the readable spec."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.chunker import chunk_documents
from textchunking_and_knowledgegraph_spark.operators.extract import (
    doc_facts,
    extract_all_triples,
    triples_from_facts,
)
from textchunking_and_knowledgegraph_spark.plans.pipeline import prepared_source
from textchunking_and_knowledgegraph_spark.sources.synthetic import corpus_df


def _rows(df):
    cols = ["subj", "pred", "obj", "subj_type", "obj_type", "repo", "path",
            "commit", "sha", "chunk_id"]
    return {tuple(r) for r in df.select(*cols).collect()}


def test_fused_equals_unfused(spark):
    raw, _ = corpus_df(spark)
    src = prepared_source(spark, raw)
    unfused = extract_all_triples(src, chunk_documents(src))
    fused = triples_from_facts(doc_facts(src))
    assert _rows(fused) == _rows(unfused)


def test_fused_span_counts_match_chunk_table(spark):
    raw, _ = corpus_df(spark)
    src = prepared_source(spark, raw)
    n_chunks = chunk_documents(src).count()
    n_spans = doc_facts(src).select(F.explode("spans")).count()
    assert n_spans == n_chunks


def test_rust_and_c_extractors_edge_cases():
    """Pure-Python extractor checks beyond the fixture shapes: generic impl
    blocks, visibility-scoped items, include variants, and the C function
    heuristic's keyword gate (control-flow headers must not become defines)."""
    from textchunking_and_knowledgegraph_spark.operators.extract import (
        _extract_c,
        _extract_rust,
    )

    rs = "\n".join(
        [
            "use std::collections::HashMap;",
            "pub(crate) struct Store<T> {}",
            "impl<T> Iterator for Store<T> {",
            "    fn next(&mut self) -> Option<T> { None }",
            "}",
            "pub async fn fetch(url: &str) {}",
        ]
    )
    got = {(s, p, o) for s, p, o, _, _ in _extract_rust("a.rs", rs)}
    assert ("a.rs", "imports", "std::collections::HashMap") in got
    assert ("a.rs", "defines", "Store") in got
    assert ("Store", "implements", "Iterator") in got
    assert ("a.rs", "defines", "fetch") in got
    assert ("a.rs", "defines", "next") in got  # method fns are still defines

    c = "\n".join(
        [
            "#include <stdio.h>",
            '# include "lib/util.h"',
            "struct pair { int a; int b; };",
            "class Codec : public BaseNode {",
            "};",
            "static int add_two(int x) {",
            "    if (x > 0) {",
            "        while (x--) {}",
            "    }",
            "    return x + 2;",
            "}",
        ]
    )
    got = {(s, p, o) for s, p, o, _, _ in _extract_c("b.cc", c)}
    assert ("b.cc", "imports", "stdio.h") in got
    assert ("b.cc", "imports", "lib/util.h") in got
    assert ("b.cc", "defines", "pair") in got
    assert ("b.cc", "defines", "Codec") in got
    assert ("Codec", "inherits", "BaseNode") in got
    assert ("b.cc", "defines", "add_two") in got
    defines = {o for s, p, o in got if p == "defines"}
    assert "if" not in defines and "while" not in defines


def test_cpp_rust_extractor_common_shapes():
    """Shapes the first-cut regexes silently dropped: C++ multiple
    inheritance / `final` / templated bases, and Rust `const fn` — each must
    still emit its defines (and first-base inherits) triple."""
    from textchunking_and_knowledgegraph_spark.operators.extract import (
        _extract_c,
        _extract_rust,
    )

    c = "\n".join(
        [
            "class Multi : public B, public C {",
            "};",
            "struct Fin final : E {",
            "};",
            "class Tmpl : public Base<int, char>, private Mix {",
            "};",
            "class Fwd;",  # forward declaration: no body, no defines triple
            "class V : virtual public VB {",
            "};",
        ]
    )
    got = {(s, p, o) for s, p, o, _, _ in _extract_c("m.cc", c)}
    assert ("m.cc", "defines", "Multi") in got
    assert ("Multi", "inherits", "B") in got
    assert ("Fin", "inherits", "E") in got
    assert ("Tmpl", "inherits", "Base") in got
    assert ("V", "inherits", "VB") in got
    assert ("m.cc", "defines", "Fwd") not in got

    rs = "pub const fn f(x: u32) -> u32 { x }\nconst fn g() -> i32 { 0 }"
    got_rs = {(s, p, o) for s, p, o, _, _ in _extract_rust("c.rs", rs)}
    assert ("c.rs", "defines", "f") in got_rs
    assert ("c.rs", "defines", "g") in got_rs
