"""Paper/exam-question parsing -- the distributed form of the reference's
paper pipeline (`Parser/md_paper_parser.py`), with every per-row LLM call
replaced by the deterministic regex segmentation the reference itself
applies client-side:

  T4  question split on headings         `md_paper_parser.py:42,200`
  T5  Q/A block extraction 【答案】       `md_paper_parser.py:262-264,336-339`
  T6  source-tag extraction 【…2019…】    `md_paper_parser.py:63-64`
  T7  sub-question split (###/numbered)  `md_paper_parser.py:244-246,269-272`
  F5  choice-vs-written predicate        `md_paper_parser.py:210-212,258-260`
  F6  option-line predicate (A./B./C.)   `md_paper_parser.py:343-348`
  J3  vocabulary containment extraction  `md_paper_parser.py:491-497`
  J5  question-type classification       `md_paper_parser.py:464-489`

One ``mapInPandas`` pass per document emits the typed question table (the
reference's pandas CSV with a stringified dict column becomes a proper
StructType); the J3/J5 joins stay JVM-side column algebra so the dictionary
broadcast + argmax re-rank mirror the linking plan shape."""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUESTION_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("q_index", T.IntegerType(), False),
        T.StructField("question_text", T.StringType(), True),
        T.StructField("question", T.StringType(), True),
        T.StructField("answer", T.StringType(), True),
        T.StructField("analysis", T.StringType(), True),
        T.StructField("source_tag", T.StringType(), True),
        T.StructField("question_type", T.StringType(), False),
        T.StructField("is_choice", T.BooleanType(), False),
    ]
)

# T5: the exact anchors the reference compiles with re.S
_Q_RE = re.compile(r"##\s*(.*?)【答案】", re.S)
_ANS_RE = re.compile(r"【答案】(.*?)(?=##|$)", re.S)
_ANALYSIS_RE = re.compile(r"【解析】(.*?)(?=##|【|$)", re.S)
# T6: source tag = 【...yyyy...】 within the first 100 chars
_SRC_RE = re.compile(r"【([^】]*\d{4}[^】]*)】")
# F6: option lines A. / B. / C. / D
_OPTION_RE = re.compile(r"(?m)^\s*[ABCD][\.、]\s")
# T7: sub-question split on '### ' or numbered '1.' markers
_SUBQ_RE = re.compile(r"(?m)^###\s+|\n(?=\d+[\.、]\s)")

# J5: label keywords -> question type (the deterministic stand-in for the
# 4-label char-TF-IDF argmax at `md_paper_parser.py:464-489`; keyword
# containment is the exact-match fast path of that cosine argmax)
_TYPE_RULES = [
    ("完形填空", "完形填空"),
    ("七选五", "阅读理解七选五"),
    ("阅读理解", "阅读理解"),
    ("语法填空", "语法填空"),
]


def _classify(part_header: str, block: str) -> tuple[str, bool]:
    for kw, label in _TYPE_RULES:
        if kw in part_header or kw in block[:200]:
            return label, False
    is_choice = bool(_OPTION_RE.search(block))
    return ("选择题" if is_choice else "非选择题"), is_choice


def _parse_doc(row: dict) -> Iterator[dict]:
    content = row["content"] or ""
    # T4: split at level-1/2 heading boundaries only -- `###` sub-question
    # markers stay inside their parent question block. (The reference splits
    # at every `\n#` and reassembles per-part via `'#' in sec[:25]`
    # predicates; keeping sub-questions attached is the same grammar without
    # the reassembly pass.)
    sections = [s for s in re.split(r"(?=\n##?\s)", "\n" + content.strip()) if s.strip()]
    q_index = 0
    part_header = ""   # most recent level-1 heading: carries type keywords
    source_tag = None  # most recent 【...yyyy...】 tag (T6)
    for sec in sections:
        first_line = sec.strip().splitlines()[0]
        if re.match(r"^#\s", sec.strip()):
            part_header = first_line
            src = _SRC_RE.search(sec[:100])
            if src:
                source_tag = src.group(1)
            if "【答案】" not in sec:
                continue
            # GEO-grammar part (`md_paper_parser.py:166-317`): questions are
            # numbered directly under the `# 一、...` header, no ## anchors.
            # Rewrite each numbered block into the ## form and fall through.
            body_text = sec.strip().split("\n", 1)[1] if "\n" in sec.strip() else ""
            pieces = re.split(r"\n(?=\d+[\.、]\s)", body_text)
            sec = "\n".join("## " + p.strip() for p in pieces if p.strip())
        # Parse each question from ITS OWN block slice (text between
        # consecutive ## anchors): zipping three parallel findall lists
        # misassigns a later question's 【解析】 to an earlier answerless one.
        blocks = [
            b for b in re.split(r"(?m)(?=^##\s)", sec)
            if b.lstrip().startswith("##")
        ]
        for block in blocks:
            qm = _Q_RE.search(block)
            if not qm:
                continue  # no 【答案】 in this block -> not a question
            q = qm.group(1)
            am = _ANS_RE.search(block)
            answer = am.group(1).strip() if am else None
            anm = _ANALYSIS_RE.search(block)
            analysis = anm.group(1).strip() if anm else None
            # the inline 【解析】 partitioned out of this block's own answer
            # takes precedence (it is provably from this question)
            if answer and "【解析】" in answer:
                answer, _, inline = answer.partition("【解析】")
                answer = answer.strip()
                analysis = inline.strip() or analysis or None
            qtype, is_choice = _classify(part_header, q)
            # T7: body = text before the first sub-question marker
            parts = _SUBQ_RE.split(q)
            body = parts[0].strip()
            subs = [p.strip() for p in parts[1:] if p.strip()] or [body]
            for sub in subs:
                yield {
                    "repo": row["repo"], "path": row["path"],
                    "commit": row["commit"], "sha": row["sha"],
                    "doc_id": row["doc_id"], "q_index": q_index,
                    "question_text": body,
                    "question": sub,
                    "answer": answer,
                    "analysis": analysis,
                    "source_tag": source_tag,
                    "question_type": qtype,
                    "is_choice": is_choice,
                }
                q_index += 1


def parse_papers(source: DataFrame) -> DataFrame:
    """source table (+sha, doc_id, paper-normalized content) -> question
    table. One Arrow pass per doc; embarrassingly parallel."""
    cols = ["repo", "path", "commit", "sha", "doc_id", "content"]
    field_names = [f.name for f in QUESTION_SCHEMA.fields]

    def _map_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf[cols].to_dict("records"):
                out.extend(_parse_doc(row))
            yield pd.DataFrame(out, columns=field_names)

    return source.select(*cols).mapInPandas(_map_batches, schema=QUESTION_SCHEMA)


def vocabulary_matches(
    df: DataFrame,
    vocabulary: list[str],
    text_col: str = "analysis",
    id_cols: tuple[str, ...] = ("doc_id", "q_index"),
) -> DataFrame:
    """J3: find all controlled vocabulary terms occurring in a text column.

    Broadcast nested-loop containment join (explode the tiny vocabulary,
    `contains` theta-join) -- the scale-out of
    ``re.findall('|'.join(map(re.escape, knowledge)))`` at
    `md_paper_parser.py:491-497`. Stays JVM-side; no UDF."""
    spark = df.sparkSession
    vocab = spark.createDataFrame([(v,) for v in vocabulary], "term string")
    return (
        df.join(
            F.broadcast(vocab), F.col(text_col).contains(F.col("term")), "inner"
        )
        .select(*id_cols, "term")
        .dropDuplicates([*id_cols, "term"])
    )


def question_knowledge_edges(questions: DataFrame, matches: DataFrame) -> DataFrame:
    """G4: question -> knowledge edges from the vocabulary matches, in the
    canonical triple shape."""
    return (
        questions.join(matches, ["doc_id", "q_index"])
        .select(
            F.concat_ws(":", "doc_id", F.col("q_index").cast("string")).alias("subj"),
            F.lit("考查").alias("pred"),
            F.col("term").alias("obj"),
            F.lit("question").alias("subj_type"),
            F.lit("entity").alias("obj_type"),
            "repo", "path", "commit", "sha",
            F.lit(None).cast("string").alias("chunk_id"),
        )
        .dropDuplicates(["subj", "pred", "obj", "sha"])
    )
