"""Paper pipeline: question segmentation, 【答案】/【解析】 extraction,
source-tag extraction, sub-question split, type classification, vocabulary
containment join (SURVEY.md §2 T4-T7/F5-F6/J3/J5)."""

from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.operators.paper import (
    parse_papers,
    question_knowledge_edges,
    vocabulary_matches,
)
from textchunking_and_knowledgegraph_spark.plans.pipeline import prepared_source

_PAPER = """# 【2019年全国卷I】完形填空

Read the following passage and choose the best answer.

## 1. The author went to the store because he wanted to buy some food.
A. apples B. books C. pens D. cars
【答案】A
【解析】本题考查细节理解。从第一段可知作者去商店买吃的。

# 第二部分 阅读理解

## 2. What is the main idea of the passage?
A. Travel B. Science C. History D. Art
【答案】B
【解析】主旨大意题。文章讨论科学发现。

# 三、非选择简答部分

## 3. 阅读下列材料，回答问题。
### 分析函数的单调性并证明。
### 求函数的定义域。
【答案】见解析
【解析】本题考查函数的单调性与定义域。
"""


def _source(spark):
    return spark.createDataFrame(
        [("papers", "exam/2019.md", "beef01", "markdown", _PAPER)],
        "repo string, path string, commit string, lang string, content string",
    )


def _questions(spark):
    return parse_papers(prepared_source(spark, _source(spark)))


def test_question_count_and_split(spark):
    qs = _questions(spark).collect()
    # q1, q2, and q3 split into two sub-questions = 4 rows
    assert len(qs) == 4
    subs = [q.question for q in qs if q.q_index >= 2]
    assert any("单调性" in s for s in subs)
    assert any("定义域" in s for s in subs)


def test_answer_analysis_extraction(spark):
    qs = {q.q_index: q for q in _questions(spark).collect()}
    assert qs[0].answer == "A"
    assert "细节理解" in qs[0].analysis
    assert qs[1].answer == "B"
    assert qs[2].answer == "见解析"


def test_source_tag_and_type(spark):
    qs = sorted(_questions(spark).collect(), key=lambda q: q.q_index)
    assert qs[0].source_tag == "2019年全国卷I"
    assert qs[0].question_type == "完形填空"
    assert qs[1].question_type == "阅读理解"
    assert qs[2].question_type == "非选择题" and not qs[2].is_choice


def test_vocabulary_matches_and_edges(spark):
    qs = _questions(spark)
    vocab = ["函数的单调性", "定义域", "细节理解", "主旨大意"]
    m = vocabulary_matches(qs, vocab, text_col="analysis")
    got = {(r.q_index, r.term) for r in m.collect()}
    assert (0, "细节理解") in got
    assert (1, "主旨大意") in got
    # both sub-questions of q3 share the analysis mentioning both terms
    assert (2, "函数的单调性") in got and (2, "定义域") in got
    edges = question_knowledge_edges(qs, m)
    assert edges.filter(F.col("pred") == "考查").count() == len(got)
    assert edges.select("subj_type").distinct().collect()[0].subj_type == "question"


_GEO_PAPER = """# 【2020年地理模拟】一、选择题

1. 下列关于季风气候的说法正确的是？
A. 冬季多雨 B. 夏季多雨 C. 全年干旱 D. 全年多雨
【答案】B
【解析】本题考查季风气候的特点。

2. 河流侵蚀作用最强的河段是？
A. 上游 B. 中游 C. 下游 D. 入海口
【答案】A
【解析】本题考查河流侵蚀作用。

# 二、综合题

## 3. 分析图中区域的地形特征。
【答案】以山地为主
【解析】本题考查地形判读。
"""


def test_geo_grammar_numbered_questions(spark):
    """GEO-style parts: numbered questions directly under the # header (no
    ## anchors) are segmented with per-question answers."""
    from textchunking_and_knowledgegraph_spark.operators.paper import parse_papers
    from textchunking_and_knowledgegraph_spark.plans.pipeline import prepared_source

    src = spark.createDataFrame(
        [("papers", "exam/geo.md", "feed02", "markdown", _GEO_PAPER)],
        "repo string, path string, commit string, lang string, content string",
    )
    qs = sorted(parse_papers(prepared_source(spark, src)).collect(),
                key=lambda q: q.q_index)
    assert len(qs) == 3
    assert qs[0].answer == "B" and "季风" in qs[0].analysis
    assert qs[1].answer == "A"
    assert qs[2].answer == "以山地为主"
    assert qs[0].source_tag == "2020年地理模拟"
    assert qs[0].is_choice and not qs[2].is_choice


def test_analysis_stays_with_its_question(spark):
    """Regression: an earlier question WITHOUT 【解析】 must not steal the
    next question's analysis (positional-zip bug, round-1 ADVICE)."""
    doc = (
        "# 第一部分\n"
        "## 1. 第一题，无解析。\n【答案】A\n"
        "## 2. 第二题，有解析。\n【答案】B\n【解析】这是第二题的解析。\n"
    )
    from textchunking_and_knowledgegraph_spark.operators.paper import parse_papers
    from textchunking_and_knowledgegraph_spark.plans.pipeline import prepared_source

    src = spark.createDataFrame(
        [("p", "x.md", "c", "markdown", doc)],
        "repo string, path string, commit string, lang string, content string",
    )
    rows = sorted(parse_papers(prepared_source(spark, src)).collect(),
                  key=lambda r: r.q_index)
    assert len(rows) == 2
    assert rows[0].answer == "A" and rows[0].analysis is None
    assert rows[1].answer == "B" and "第二题的解析" in rows[1].analysis


def test_paper_path_applies_ocr_repairs(spark):
    """The paper pipeline (unlike the book path) must fuse CJK text split
    across newlines and respace dots before parsing (T2/T3)."""
    doc = (
        "# 第一部分\n"
        "## 1. 下面的材料被OCR折\n行了，请阅读。\n【答案】A\n"
        "【解析】这个解析也被折\n行处理。\n"
    )
    from textchunking_and_knowledgegraph_spark.operators.paper import parse_papers
    from textchunking_and_knowledgegraph_spark.plans.pipeline import (
        prepared_paper_source,
    )

    src = spark.createDataFrame(
        [("p", "x.md", "c", "markdown", doc)],
        "repo string, path string, commit string, lang string, content string",
    )
    rows = parse_papers(prepared_paper_source(spark, src)).collect()
    assert len(rows) == 1
    # the mid-word newline is fused away in both question and analysis
    assert "折行了" in rows[0].question and "折\n行" not in rows[0].question
    assert "折行处理" in rows[0].analysis


def test_paper_path_drops_image_lines(spark):
    """F10: markdown image-only lines vanish before parsing (paper path)."""
    doc = (
        "# 第一部分\n"
        "## 1. 看图回答。\n![fig](img/1.png)\n选项如下。\n【答案】B\n"
    )
    from textchunking_and_knowledgegraph_spark.operators.paper import parse_papers
    from textchunking_and_knowledgegraph_spark.plans.pipeline import (
        prepared_paper_source,
    )

    src = spark.createDataFrame(
        [("p", "x.md", "c", "markdown", doc)],
        "repo string, path string, commit string, lang string, content string",
    )
    rows = parse_papers(prepared_paper_source(spark, src)).collect()
    assert len(rows) == 1 and "![fig]" not in rows[0].question
    assert "选项如下" in rows[0].question


def test_paper_path_strips_publisher_noise(spark):
    """F9: a publisher heading must not reach the parser, where it would
    overwrite the part header that carries question-type keywords."""
    doc = (
        "# 阅读理解部分\n"
        "# 人民教育出版社\n"
        "## 1. 阅读下文回答。\n【答案】C\n"
    )
    from textchunking_and_knowledgegraph_spark.operators.paper import parse_papers
    from textchunking_and_knowledgegraph_spark.plans.pipeline import (
        prepared_paper_source,
    )

    src = spark.createDataFrame(
        [("p", "x.md", "c", "markdown", doc)],
        "repo string, path string, commit string, lang string, content string",
    )
    rows = parse_papers(prepared_paper_source(spark, src)).collect()
    assert len(rows) == 1
    # the part header survived the publisher line -> type classified 阅读理解
    assert rows[0].question_type == "阅读理解"
