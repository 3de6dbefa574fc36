"""Deterministic markdown/text normalizer -- pure column expressions.

Replaces the reference's LLM "correction" workflow (`PDF_to_MD/LLM_correction.py:38-55`,
prompt: "fix md syntax, change nothing else") with the deterministic subset the
reference itself applies in code:

  T1  full->half-width punctuation translate   `Parser/md_paper_parser.py:192-198`
  T2  dot-spacing normalize                     `Parser/md_paper_parser.py:190-191`
  T3  newline de-hyphenation / CJK line fusing  `Parser/md_paper_parser.py:52-59`
  F9  publisher-noise line drop                 `PDF_to_MD/LLM_correction.py:136-137`
  F10 image-line drop (paper path only)         `PDF_to_MD/LLM_correction.py:392-394`

All built-in ``pyspark.sql.functions`` -- stays inside whole-stage codegen,
no Python. The sha invariant is computed on the *raw* content before this
runs (sources/io.py), so normalization never breaks sha equality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# T1: the exact translation table the reference builds with str.maketrans
# (`Parser/md_paper_parser.py:192-198`): ．→. （→( ）→) ，→,
_FULLWIDTH_SRC = "．（），"  # ．（），
_HALFWIDTH_DST = ".(),"


def translate_fullwidth(col: Column) -> Column:
    """T1: full->half-width punctuation translate (exact reference table)."""
    return F.translate(col, _FULLWIDTH_SRC, _HALFWIDTH_DST)


def normalize_punct(col: Column) -> Column:
    """T1 + T2: full->half-width translate, then '.'->'. ' respacing with
    double-space collapse (the reference does replace('.', '. ') then
    replace('.  ', '. ')). PAPER path only -- dot respacing would corrupt
    numbered headings (1.1 -> 1. 1) in the book path, and the reference
    applies it only in `md_paper_parser.py`."""
    c = translate_fullwidth(col)
    c = F.regexp_replace(c, r"\.", ". ")
    c = F.regexp_replace(c, r"\.  ", ". ")
    return c


def dehyphenate(col: Column) -> Column:
    """T3: join alphabetic linebreaks with a space; fuse CJK text split
    across newlines (the OCR artifact repairs at `md_paper_parser.py:52-59`)."""
    c = F.regexp_replace(col, r"([a-zA-Z,;])\n([a-zA-Z])", r"$1 $2")
    # CJK char + newline + CJK char -> fuse without space
    c = F.regexp_replace(c, r"([一-鿿])\n([一-鿿])", r"$1$2")
    return c


def drop_publisher_noise(col: Column) -> Column:
    """F9: remove `# 人民教育出版社`-style publisher heading lines."""
    return F.regexp_replace(col, r"(?m)^#+\s*人民教育出版社.*\n?", "")


def drop_image_lines(col: Column) -> Column:
    """F10: remove markdown image-only lines (paper pipeline)."""
    return F.regexp_replace(col, r"(?m)^!\[[^\]]*\]\([^)]*\)\s*$\n?", "")


def normalize_markdown(col: Column) -> Column:
    """Book-path normalizer applied before parsing+chunking: publisher noise
    drop + T1 width translate. Identity-preserving in spirit (the
    reference's correction prompt: "fix md syntax, change nothing else");
    notably NO dot respacing and NO newline de-hyphenation/CJK fusing --
    both are paper-path repairs (`md_paper_parser.py:52-59,190-198`), and
    CJK line-fusing would merge a CJK-ending heading with its body line,
    destroying the section tree (caught by tests/test_reference_shape.py)."""
    return translate_fullwidth(drop_publisher_noise(col))


def normalize_paper(col: Column) -> Column:
    """Paper-path normalizer: T1 + T2 + T3, mirroring
    `Parser/md_paper_parser.py:52-59,190-198`."""
    return normalize_punct(dehyphenate(col))


def cjk_only(col: Column) -> Column:
    """T13: strip everything but CJK chars (retry-key extraction at
    `Parser/md_paper_parser.py:398-400`)."""
    return F.regexp_replace(col, r"[^一-鿿　-〿＀-￯]", "")
