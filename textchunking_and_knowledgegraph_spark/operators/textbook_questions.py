"""Textbook exercise-question extraction -- the distributed form of
`Parser/Chunking_TextBook_Questions.py:20-117`:

  F4  exercise-node filter (练习/复习题/复习与提高 in the section title)
  T1  full->half-width translate + dot respacing on the exercise body
  T7  numbered question split  re.split(r'\\d+\\.\\s*')
  F6  stem/body split at the first option line ((1)/(2)/A. /B. ...)
  A8  per-chapter accumulation -> groupBy(doc, chapter)

Everything is column algebra over the chunk table -- the chunker already
classified sections (``section_kind='question'``, same keyword rule), so
this operator is filter -> normalize -> split -> posexplode -> stem/body
split, all JVM-side. No UDF. The reference's BFS over the node tree is the
``parent_title`` lineage the chunk table already carries."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# F6/stem-split markers: sub-part labels or choice options open the body.
# The chunk table holds sentence-packed text (newlines normalized), so the
# split is at the FIRST marker occurrence, not the reference's line scan --
# same boundary on the same content.
_OPTION_MARK = r"\(1\)|\(2\)|\(3\)|\(4\)|[ABCD]\. "


def textbook_questions(chunks: DataFrame) -> DataFrame:
    """chunk table -> [doc_id, chapter, section_title, q_ord, question_text,
    question] one row per numbered exercise question."""
    ex = chunks.filter(F.col("section_kind") == "question")

    # T1 + dot respacing (the reference's translate + '.'->'. ' pass)
    body = F.regexp_replace(
        F.regexp_replace(F.translate(F.col("text"), "．（）", ".()"), r"\.", ". "),
        r"\.  ", ". ",
    )
    # T7: split on numbered markers; first fragment is preamble (dropped when
    # blank, kept as question 0 otherwise -- reference keeps non-empty splits)
    split = F.split(body, r"\d+[\.、]\s*")
    exploded = (
        ex.select(
            "doc_id",
            F.coalesce("parent_title", "section_title").alias("chapter"),
            "section_title",
            F.posexplode(split).alias("q_ord", "question_raw"),
        )
        .filter(F.length(F.trim("question_raw")) > 0)
    )

    # F6: stem = text before the first option/sub-part marker; body = rest.
    # When no marker exists, stem == body (reference behavior).
    with_opt = exploded.withColumn(
        "opt_idx", F.regexp_instr("question_raw", F.lit(_OPTION_MARK))
    )
    stem = F.when(
        F.col("opt_idx") > 1, F.expr("substring(question_raw, 1, opt_idx - 1)")
    ).otherwise(F.col("question_raw"))
    qbody = F.when(
        F.col("opt_idx") > 0, F.expr("substring(question_raw, opt_idx)")
    ).otherwise(F.col("question_raw"))
    return with_opt.select(
        "doc_id", "chapter", "section_title", "q_ord",
        F.trim(stem).alias("question_text"),
        F.trim(qbody).alias("question"),
    )


def questions_per_chapter(questions: DataFrame) -> DataFrame:
    """A8: per-chapter accumulation -- question counts + collected list."""
    return questions.groupBy("doc_id", "chapter").agg(
        F.count("*").alias("n_questions"),
        F.sort_array(F.collect_list(F.struct("q_ord", "question"))).alias("questions"),
    )
