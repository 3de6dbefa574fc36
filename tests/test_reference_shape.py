"""Golden triples on a reference-shaped document.

The reference's own test document (`/root/reference/test/test.md`) is a PRC
math-textbook chapter: `#` chapter heading, `##`/`###` nested sections,
练习/复习题 exercise sections, `$$...$$` formulas, `<table>` blocks and
image lines. This fixture reproduces that structural GRAMMAR (not the
content) and pins the intended tree->triples semantics of
`Parser/TextBook_LumberChunker.py:381-461`:

  root section S:      (S 同位 S)       + (S 文本块 chunk) per chunk
  nested C, parent P:  (P 上位 C)       + (C 文本块 chunk) per chunk
  练习-style titles    -> section_kind='question' (node-classification rule)

Expected hierarchy triples are derived independently here from the fixture's
declared (level, title) list -- NOT by running the engine -- and compared at
P/R >= 0.95 (exact equality expected; the budget absorbs nothing because
every section body is < 800 chars = exactly one chunk)."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.chunker import chunk_documents
from textchunking_and_knowledgegraph_spark.plans.pipeline import build_triples, prepared_source

# (level, title, body_sentences) -- bodies < 800 chars => exactly 1 chunk each
_SECTIONS = [
    (1, "第三章 函数的概念与性质", "本章研究函数的一般概念。我们将讨论定义域、值域与对应关系。"),
    (2, "3.1 函数的概念", "设A、B是非空的实数集。如果按照某种确定的对应关系f，对于集合A中的任意一个数x，"
        "在集合B中都有唯一确定的数y和它对应，那么就称f为从集合A到集合B的一个函数。"
        "$$y = f(x), x \\in A$$ 其中x叫做自变量。"),
    (3, "3.1.1 函数的定义域", "定义域是自变量x的取值范围。求定义域时需要考虑分母不为零。"
        "偶次根式被开方数非负。"),
    (3, "练习", "求下列函数的定义域。判断下列对应关系是否为函数。"),
    (2, "3.2 函数的基本性质", "本节讨论单调性与奇偶性。<table><tr><td>性质。表格</td></tr></table>"
        "上述表格总结了常见函数的性质。"),
    (3, "3.2.1 单调性与最大（小）值", "设函数f(x)的定义域为I。如果对于任意x1、x2，当x1<x2时都有"
        "f(x1)<f(x2)，那么就说f(x)在区间D上单调递增。"),
    (3, "复习题", "证明函数f(x)=x^2在区间(0,+∞)上单调递增。![图3-1](images/fig31.png) 画出函数图象。"),
]


def _fixture_markdown() -> str:
    lines = []
    for level, title, body in _SECTIONS:
        lines.append("#" * level + " " + title)
        lines.append(body)
    return "\n".join(lines)


# T1 normalization applies to titles too -- same table the reference builds
# with str.maketrans (`Parser/md_paper_parser.py:192-198`)
_T1 = str.maketrans("．（），", ".(),")


def _expected_hier() -> set[tuple[str, str, str]]:
    """Independent tree walk over the declared structure (stack semantics of
    `MD_section_parser.py:25-50`), not a call into the engine."""
    want = set()
    stack: list[tuple[str, int]] = []
    for level, raw_title, _body in _SECTIONS:
        title = raw_title.translate(_T1)
        while stack and stack[-1][1] >= level:
            stack.pop()
        parent = stack[-1][0] if stack else None
        stack.append((title, level))
        if parent is None:
            want.add((title, "同位", title))
        else:
            want.add((parent, "上位", title))
    return want


def _source(spark):
    return spark.createDataFrame(
        [("textbooks", "math/ch3.md", "c0ffee", "markdown", _fixture_markdown())],
        "repo string, path string, commit string, lang string, content string",
    )


def test_reference_shape_hier_pr(spark):
    triples = build_triples(spark, _source(spark))
    got = {
        (r.subj, r.pred, r.obj)
        for r in triples.filter(F.col("pred").isin("同位", "上位")).collect()
    }
    want = _expected_hier()
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision >= 0.95, f"precision={precision:.3f} extra={sorted(got - want)}"
    assert recall >= 0.95, f"recall={recall:.3f} missing={sorted(want - got)}"


def test_reference_shape_textblock_per_section(spark):
    """Every section (< 800 chars) yields exactly one 文本块 edge, subjects
    match section titles."""
    triples = build_triples(spark, _source(spark))
    tb = triples.filter(F.col("pred") == "文本块").select("subj").collect()
    got_subjects = sorted(r.subj for r in tb)
    assert got_subjects == sorted(t.translate(_T1) for _l, t, _b in _SECTIONS)


def test_reference_shape_chunk_properties(spark):
    chunks = chunk_documents(prepared_source(spark, _source(spark))).collect()
    by_title = {c.section_title: c for c in chunks}
    # question-classification rule (练习/复习题)
    assert by_title["练习"].section_kind == "question"
    assert by_title["复习题"].section_kind == "question"
    assert by_title["3.1 函数的概念"].section_kind == "knowledge"
    # protected blocks survive chunking intact (T8)
    assert "$$y = f(x), x \\in A$$" in by_title["3.1 函数的概念"].text
    assert "<table><tr><td>性质。表格</td></tr></table>" in by_title["3.2 函数的基本性质"].text
    # length policy: every chunk within the hard cap
    assert all(1 <= len(c.text) <= 1000 for c in chunks)
