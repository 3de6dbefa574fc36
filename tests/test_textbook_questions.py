"""Textbook exercise extraction (F4/T7/F6/A8 -- the distributed
`Chunking_TextBook_Questions.py` semantics) over the chunk table."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.textbook_questions import (
    questions_per_chapter,
    textbook_questions,
)
from textchunking_and_knowledgegraph_spark.plans.pipeline import build_chunks

_BOOK = """# 第一章 集合
集合是数学的基本概念。本节介绍集合的表示方法与基本关系。
## 练习
1．求下列集合的并集。
(1) A={1,2} (2) B={2,3}
2．判断下列说法是否正确。
集合的元素具有互异性。
## 1.2 集合的运算
交集与并集满足交换律。运算法则需要熟练掌握。
## 复习题
3．设集合A与B，证明德摩根定律。
A. 正确 B. 错误
"""


def _chunks(spark):
    src = spark.createDataFrame(
        [("books", "math/b1.md", "c1", "markdown", _BOOK)],
        "repo string, path string, commit string, lang string, content string",
    )
    return build_chunks(spark, src)


def test_exercise_filter_and_split(spark):
    qs = textbook_questions(_chunks(spark)).collect()
    # only 练习/复习题 sections contribute; 3 numbered questions total
    assert {q.section_title for q in qs} == {"练习", "复习题"}
    assert len(qs) == 3
    assert any("并集" in q.question_text for q in qs)
    assert any("德摩根" in q.question_text for q in qs)


def test_stem_body_split(spark):
    qs = {(-q.q_ord, q.section_title): q for q in textbook_questions(_chunks(spark)).collect()}
    by_text = {q.question_text[:6]: q for q in qs.values()}
    # question 1 has (1)/(2) sub-parts: stem excludes them, body starts there
    q1 = next(q for q in qs.values() if "并集" in q.question_text)
    assert "(1)" not in q1.question_text
    assert q1.question.startswith("(1)")
    # question 2 has no option lines: stem == body
    q2 = next(q for q in qs.values() if "互异性" in q.question)
    assert q2.question_text == q2.question


def test_per_chapter_accumulation(spark):
    agg = questions_per_chapter(textbook_questions(_chunks(spark))).collect()
    assert len(agg) == 1
    assert agg[0].chapter == "第一章 集合"
    assert agg[0].n_questions == 3
