"""T10 numeral parsing + T11 TOC extraction
(`PDF_to_MD/LLM_correction.py:267-322` semantics)."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.functions.textfns import cjk_numeral_to_int
from textchunking_and_knowledgegraph_spark.operators.toc import _cn_to_int, extract_toc

_CASES = {
    "一": 1, "二": 2, "九": 9, "十": 10, "十一": 11, "十三": 13, "二十": 20,
    "二十三": 23, "九十九": 99, "7": 7, "42": 42, "foo": 0, "": 0,
    # mixed ASCII/CJK forms must agree between the column expr and the twin
    "2十3": 23, "2十": 20, "十5": 15,
    # full-width digits (第１２章 in CJK PDFs)
    "１２": 12, "１十": 10,
}


def test_cjk_numeral_column_expr(spark):
    df = spark.createDataFrame([(s,) for s in _CASES], "s string")
    got = {r.s: r.n for r in df.select("s", cjk_numeral_to_int(F.col("s")).alias("n")).collect()}
    assert got == _CASES


def test_python_twin_matches_column_expr():
    for s, want in _CASES.items():
        assert _cn_to_int(s) == want, s


_BOOK = (
    "前言\n目录\n"
    "# 第一章 集合\n1.1 集合的概念\n1.2 集合的运算\n"
    "# 第二章 函数\n2.1 函数的概念\n"
    "# 第十一章 概率\n11.1 古典概型\n"
    "# 第一章 集合\n"          # numbering decreases -> body begins
    "正文从这里开始，不属于目录。\n" * 40
)


def test_extract_toc_structure(spark):
    df = spark.createDataFrame([("b1", _BOOK)], "doc_id string, content string")
    rows = sorted(extract_toc(df).collect(), key=lambda r: r.ord)
    chapters = [(r.chapter_no, r.chapter_title) for r in rows if r.section is None]
    assert chapters == [
        (1, "# 第一章 集合"), (2, "# 第二章 函数"), (11, "# 第十一章 概率")
    ]
    sections = [(r.chapter_no, r.section) for r in rows if r.section is not None]
    assert (1, "1.1 集合的概念") in sections and (11, "11.1 古典概型") in sections
    assert len(rows) == 3 + 4  # 3 chapter rows + 4 section rows, nothing cut
    # nothing after the numbering restart leaked in
    assert not any("正文" in (r.section or "") for r in rows)


def test_extract_toc_gates_jvm_side(spark):
    """Docs without 目录 never reach the Python stage (filter before UDF)."""
    df = spark.createDataFrame(
        [("a", "no toc here at all"), ("b1", _BOOK)], "doc_id string, content string"
    )
    out = extract_toc(df)
    assert {r.doc_id for r in out.collect()} == {"b1"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the contains(目录) predicate sits below MapInPandas
    assert plan.index("MapInPandas") < plan.index("目录")
