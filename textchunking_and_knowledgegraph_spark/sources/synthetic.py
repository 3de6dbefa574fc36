"""Deterministic synthetic corpus + golden triples (the P/R oracle).

Generates the FIXTURES.md section-1 ``source_files`` table at small scale with
*constructively known* ground-truth triples: the generator records, while
emitting each document, exactly which (subj, pred, obj) triples the frozen
engine semantics must produce. No external data; fixed seed; pure stdlib.

Row archetypes (FIXTURES.md):
  1. markdown textbook docs modeled on `/root/reference/test/test.md`
     (CJK prose, #/##/### heading tree, $latex$, <table>, ![](img),
     练习 exercise sections, full-width punctuation)
  2. code files (python/javascript/java/go/rust/c++) with known
     imports/defines/calls/inherits
  3. plain-text prose with closed-vocabulary SVO sentences
  + edge cases: empty content, whitespace-only, giant single line.

Skew: repo 'mega-repo' holds ~50% of rows (SURVEY.md 7.4 skew test).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

from .io import SOURCE_SCHEMA

Triple = tuple[str, str, str]

_CJK_WORDS = [
    "函数", "集合", "概念", "性质", "定义域", "值域", "单调性", "奇偶性",
    "幂函数", "对应关系", "实数", "区间", "映射", "图象", "表示法", "解析式",
]
_NAMES = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi"]
_OBJECTS = ["team", "pipeline", "cluster", "dataset", "service", "module", "index", "cache"]
_VERBS = [("manages", "manages"), ("uses", "uses"), ("contains", "contains"), ("includes", "includes")]


def _commit(seed_text: str) -> str:
    return hashlib.sha1(seed_text.encode()).hexdigest()


def _cjk_sentences(rng: random.Random, n: int, doc_tag: str) -> str:
    """CJK prose sentences; total length tuned so sections exercise the
    SMALL/OK/LARGE chunk policy branches. No Latin SVO patterns can occur."""
    parts = []
    for i in range(n):
        words = [rng.choice(_CJK_WORDS) for _ in range(rng.randint(8, 25))]
        sent = "".join(words) + f"{doc_tag}{i}"
        if rng.random() < 0.15:
            sent += f"设$x_{i} \\in R$"
        parts.append(sent + rng.choice(["。", "！", "？"]))
    # occasional atomic blocks
    if rng.random() < 0.4:
        parts.append(f"<table><tr><td>{doc_tag}</td></tr></table>")
    if rng.random() < 0.4:
        parts.append(f"![fig{doc_tag}](img/{doc_tag}.jpg)")
    return "\n".join(parts)


def _markdown_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    """One textbook-style markdown doc + its golden structural triples
    (hierarchy only -- 文本块 objects are engine-assigned chunk ids, asserted
    separately via coverage invariants, SURVEY.md 5.3)."""
    tag = f"D{idx}"
    chapter = f"第{idx}章 {rng.choice(_CJK_WORDS)}与{rng.choice(_CJK_WORDS)}{tag}"
    lines = [f"# {chapter}"]
    goldens: list[Triple] = []
    # chapter direct content -> (chapter 同位 chapter)
    if rng.random() < 0.8:
        lines.append(_cjk_sentences(rng, rng.randint(3, 30), tag + "r"))
        goldens.append((chapter, "同位", chapter))
    n_sections = rng.randint(2, 4)
    for s in range(1, n_sections + 1):
        is_exercise = rng.random() < 0.2
        sec = (f"习题{idx}.{s}{tag}" if is_exercise
               else f"{idx}.{s} {rng.choice(_CJK_WORDS)}{tag}")
        lines.append(f"## {sec}")
        lines.append(_cjk_sentences(rng, rng.randint(4, 40), f"{tag}s{s}"))
        goldens.append((chapter, "上位", sec))
        for sub in range(rng.randint(0, 2)):
            subsec = f"{idx}.{s}.{sub + 1} {rng.choice(_CJK_WORDS)}{tag}"
            lines.append(f"### {subsec}")
            lines.append(_cjk_sentences(rng, rng.randint(3, 25), f"{tag}s{s}u{sub}"))
            goldens.append((sec, "上位", subsec))
    return "\n".join(lines), goldens


def _python_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    path = f"pkg/mod_{idx}.py"
    mods = rng.sample(["os", "json", "sys", "math", "collections.abc", "pkg.util"], k=3)
    cls = f"Handler{idx}"
    base = f"Base{idx % 5}"
    helper = f"helper_{idx}"
    mainf = f"run_{idx}"
    lines = [f"import {mods[0]}", f"import {mods[1]}", f"from {mods[2]} import thing", ""]
    lines += [
        f"class {cls}({base}):",
        "    pass",
        "",
        f"def {helper}(x):",
        "    return x + 1",
        "",
        f"def {mainf}(data):",
        f"    y = {helper}(data)",
        "    return y",
    ]
    goldens = [
        (path, "imports", mods[0]), (path, "imports", mods[1]), (path, "imports", mods[2]),
        (path, "defines", cls), (cls, "inherits", base),
        (path, "defines", helper), (path, "defines", mainf),
        (mainf, "calls", helper),
    ]
    return "\n".join(lines), goldens, path


def _js_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    path = f"web/app_{idx}.js"
    mods = rng.sample(["react", "lodash", "express", "./util", "./store"], k=2)
    cls, base, fn = f"View{idx}", f"Component{idx % 3}", f"render{idx}"
    lines = [
        f"import x from '{mods[0]}';",
        f"const y = require('{mods[1]}');",
        f"class {cls} extends {base} {{}}",
        f"function {fn}(props) {{ return null; }}",
    ]
    goldens = [
        (path, "imports", mods[0]), (path, "imports", mods[1]),
        (path, "defines", cls), (cls, "inherits", base),
        (path, "defines", fn),
    ]
    return "\n".join(lines), goldens, path


def _java_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    path = f"src/main/java/App{idx}.java"
    pkg = rng.choice(["java.util.List", "java.io.File", "org.acme.Core"])
    cls, base, meth = f"App{idx}", f"Service{idx % 3}", f"process{idx}"
    lines = [
        f"import {pkg};",
        f"class {cls} extends {base} {{",
        f"    public int {meth}(int x) {{ return x; }}",
        "}",
    ]
    goldens = [
        (path, "imports", pkg),
        (path, "defines", cls), (cls, "inherits", base),
        (path, "defines", meth),
    ]
    return "\n".join(lines), goldens, path


def _go_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    path = f"svc/main_{idx}.go"
    mods = rng.sample(["fmt", "strings", "net/http", "encoding/json"], k=2)
    fn, typ = f"Serve{idx}", f"Config{idx}"
    lines = [
        "package main",
        "import (",
        f'    "{mods[0]}"',
        f'    "{mods[1]}"',
        ")",
        f"type {typ} struct {{}}",
        f"func {fn}(w int) {{}}",
    ]
    goldens = [
        (path, "imports", mods[0]), (path, "imports", mods[1]),
        (path, "defines", typ), (path, "defines", fn),
    ]
    return "\n".join(lines), goldens, path


def _rust_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    path = f"crates/lib_{idx}.rs"
    mods = rng.sample(["std::fmt", "std::io", "serde::Serialize", "crate::util"], k=2)
    typ, trait, fn = f"Engine{idx}", f"Runner{idx % 3}", f"start_{idx}"
    lines = [
        f"use {mods[0]};",
        f"use {mods[1]};",
        f"pub struct {typ} {{}}",
        f"pub trait {trait} {{}}",
        f"impl {trait} for {typ} {{}}",
        f"pub fn {fn}(n: u32) -> u32 {{ n }}",
    ]
    goldens = [
        (path, "imports", mods[0]), (path, "imports", mods[1]),
        (path, "defines", typ), (path, "defines", trait),
        (typ, "implements", trait),
        (path, "defines", fn),
    ]
    return "\n".join(lines), goldens, path


def _cpp_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    path = f"native/core_{idx}.cc"
    hdrs = rng.sample(["vector", "string", "core/api.h", "util.h"], k=2)
    cls, base, fn = f"Codec{idx}", f"Node{idx % 3}", f"encode_{idx}"
    lines = [
        f"#include <{hdrs[0]}>",
        f'#include "{hdrs[1]}"',
        f"class {cls} : public {base} {{",
        "};",
        f"int {fn}(int x) {{ return x; }}",
    ]
    goldens = [
        (path, "imports", hdrs[0]), (path, "imports", hdrs[1]),
        (path, "defines", cls), (cls, "inherits", base),
        (path, "defines", fn),
    ]
    return "\n".join(lines), goldens, path


def _prose_doc(rng: random.Random, idx: int) -> tuple[str, list[Triple]]:
    sents, goldens = [], []
    for _ in range(rng.randint(3, 8)):
        subj = rng.choice(_NAMES)
        verb, pred = rng.choice(_VERBS)
        obj = rng.choice(_OBJECTS)
        sents.append(f"{subj} {verb} the {obj}.")
        goldens.append((subj, pred, obj))
    return " ".join(sents), goldens


def synthesize_corpus(
    n_markdown: int = 20,
    n_code: int = 20,
    n_prose: int = 10,
    seed: int = 42,
    mega_repo_share: float = 0.5,
) -> tuple[list[dict], list[Triple]]:
    """Returns (source rows, golden triples). Deterministic in ``seed``."""
    rng = random.Random(seed)
    rows: list[dict] = []
    goldens: list[Triple] = []
    repos = [f"org/repo{i}" for i in range(8)] + ["org/mega-repo"]

    def _repo() -> str:
        return "org/mega-repo" if rng.random() < mega_repo_share else rng.choice(repos[:-1])

    for i in range(n_markdown):
        content, g = _markdown_doc(rng, i)
        path = f"books/chapter_{i}.md"
        rows.append({"repo": _repo(), "path": path, "commit": _commit(f"md{i}"),
                     "lang": "markdown", "content": content})
        goldens.extend(g)

    code_makers = [_python_doc, _js_doc, _java_doc, _go_doc, _rust_doc, _cpp_doc]
    code_langs = ["python", "javascript", "java", "go", "rust", "cpp"]
    for i in range(n_code):
        k = i % len(code_makers)
        content, g, path = code_makers[k](rng, i)
        rows.append({"repo": _repo(), "path": path, "commit": _commit(f"code{i}"),
                     "lang": code_langs[k], "content": content})
        goldens.extend(g)

    for i in range(n_prose):
        content, g = _prose_doc(rng, i)
        rows.append({"repo": _repo(), "path": f"notes/note_{i}.txt",
                     "commit": _commit(f"txt{i}"), "lang": "text", "content": content})
        goldens.extend(g)

    # edge cases (no golden triples expected)
    rows.append({"repo": "org/repo0", "path": "empty.txt", "commit": _commit("e"),
                 "lang": "text", "content": ""})
    rows.append({"repo": "org/repo0", "path": "ws.txt", "commit": _commit("w"),
                 "lang": "text", "content": "   \n\t  \n"})
    rows.append({"repo": "org/mega-repo", "path": "giant.txt", "commit": _commit("g"),
                 "lang": "text", "content": "噪" * 12000})
    # TOC doc: must be skipped entirely (F8)
    rows.append({"repo": "org/repo1", "path": "books/toc.md", "commit": _commit("t"),
                 "lang": "markdown", "content": "# 目录\n第一章 函数\n第二章 集合"})
    return rows, sorted(set(goldens))


def corpus_df(spark: SparkSession, **kwargs) -> tuple[DataFrame, list[Triple]]:
    rows, goldens = synthesize_corpus(**kwargs)
    return spark.createDataFrame(rows, schema=SOURCE_SCHEMA), goldens


# ---------------------------------------------------------------------------
# Entity dictionary + aliases (linking / canonicalization fixtures)
# ---------------------------------------------------------------------------

# The hierarchy tree mirrors the reference's dictionary CSV shape
# (`EntityLinking/Entity_Linking.py:46-64`): each ROW is a root-to-node
# lineage *path* (consecutive non-null cells of one CSV row), and 下位 edges
# pair CONSECUTIVE cells within a row -- never level-N x level-N+1 across
# rows. root -> [children]; children of children listed separately.
_DICT_TREE: dict[str, list[str]] = {
    "集合与函数": [
        "函数的概念", "集合的表示", "幂函数", "函数的单调性", "函数的奇偶性",
        "二次函数", "指数函数", "对数函数", "三角函数",
    ],
    "数列": ["数列的概念", "等差数列", "等比数列"],
    "向量与复数": ["平面向量", "复数的概念"],
    "微积分": ["导数的概念", "定积分"],
    "概率统计": ["概率的基本性质", "随机抽样", "统计图表", "线性回归"],
    # third level: deeper lineage rows (paths of length 3)
    "函数的概念": ["函数的定义域", "函数的值域"],
    "等差数列": ["等差数列的通项公式"],
    "概率的基本性质": ["古典概型"],
}


def synthesize_entity_dictionary(seed: int = 42) -> tuple[list[dict], list[dict]]:
    """(entities, aliases): near-duplicate families modeled on the reference
    vocabularies (`Entity Data/mat_knowledge.csv` families like 函数的概念 /
    函数概念 / 函数的概念与表示, FIXTURES.md section 2-3).

    Every entity row carries its root-to-self hierarchy ``path`` (the
    reference's per-row consecutive non-null CSV cells,
    `EntityLinking/Entity_Linking.py:46-64`); ``level = len(path)``. The
    ``seed`` parameter is kept for call-site compatibility -- the tree is
    fully deterministic."""
    del seed  # structure is deterministic; param kept for API stability
    roots = [r for r in _DICT_TREE if all(r not in kids for kids in _DICT_TREE.values())]
    entities, aliases = [], []
    eid = 0

    def _add(term: str, path: list[str]) -> None:
        nonlocal eid
        entities.append({
            "entity_id": eid, "entity": term, "domain": "数学实体",
            "level": len(path), "path": list(path),
        })
        variants = {term.replace("的", ""), term + "与表示",
                    term[:-1] if len(term) > 3 else term}
        for v in variants:
            if v and v != term:
                aliases.append({"alias": v, "entity_id": eid})
        eid += 1
        for child in _DICT_TREE.get(term, []):
            _add(child, [*path, child])

    for root in roots:
        _add(root, [root])
    # latin/code symbols for the code corpus (flat: single-cell paths)
    for term in ["DataFrame", "SparkSession", "HashMap", "ArrayList", "Goroutine"]:
        entities.append({"entity_id": eid, "entity": term,
                         "domain": "code_symbol", "level": 1, "path": [term]})
        aliases.append({"alias": term.lower(), "entity_id": eid})
        eid += 1
    return entities, aliases
