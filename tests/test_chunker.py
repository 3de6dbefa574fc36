"""Chunker unit tests: length-policy invariants, block protection, tree parse.

Contract (frozen, /root/reference/Parser/TextBook_LumberChunker.py:318-325 +
README.md:3): chunks <= 1000 chars; non-final chunks >= 600; protected
blocks never sentence-split; reassembly == source (overlap=0).
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from textchunking_and_knowledgegraph_spark.operators.chunker import (
    HARD_MAX,
    MIN_LEN,
    chunk_documents,
    chunk_text,
    pack_chunks,
    parse_sections,
    protect_blocks,
    restore_blocks,
    split_sentences,
)
from textchunking_and_knowledgegraph_spark.sources.io import scan_source
from textchunking_and_knowledgegraph_spark.sources.synthetic import corpus_df


def test_pack_length_policy():
    sents = ["x" * 50 + "."] * 40  # 40 sentences of 51 chars
    chunks = pack_chunks(sents)
    assert all(len(c) <= HARD_MAX for c in chunks)
    assert all(len(c) >= MIN_LEN for c in chunks[:-1])


def test_pack_small_absorb():
    # a small buffer followed by a medium sentence must be absorbed, not
    # emitted undersized (queue-absorb semantics)
    chunks = pack_chunks(["a" * 100, "b" * 750])
    assert len(chunks) == 1
    assert len(chunks[0]) == 851


def test_pack_giant_sentence_hard_split():
    chunks = pack_chunks(["g" * 5000])
    assert all(len(c) <= HARD_MAX for c in chunks)
    assert sum(len(c) for c in chunks) == 5000


def test_pack_overlap():
    chunks = pack_chunks(["s" * 100 + "."] * 30, overlap=50)
    assert len(chunks) >= 2
    for a, b in zip(chunks, chunks[1:]):
        assert b.startswith(a[-50:])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abc词 ", min_size=1, max_size=300), max_size=40))
def test_pack_policy_property(sents):
    chunks = pack_chunks([s for s in sents if s.strip()])
    assert all(len(c) <= HARD_MAX for c in chunks)
    assert all(len(c) >= MIN_LEN for c in chunks[:-1])


def test_protect_restore_roundtrip():
    text = "句子一。<table><tr><td>x.y!z</td></tr></table>句子二。$$a. b$$末尾！![img](a.png)"
    prot, saved = protect_blocks(text)
    assert "<table>" not in prot and "$$" not in prot and "![" not in prot
    assert restore_blocks(prot, saved) == text


def test_blocks_never_split():
    table = "<table><tr><td>" + "内. 容! " * 30 + "</td></tr></table>"
    text = ("前文句子。" * 20) + table + ("后文句子。" * 20)
    chunks = chunk_text(text)
    joined = "".join(chunks)
    assert table in joined
    # the table appears intact inside exactly one chunk
    assert sum(1 for c in chunks if table in c) == 1


def test_reassembly_superset():
    text = "\n".join("数据句子编号%d。" % i for i in range(200))
    chunks = chunk_text(text)
    # overlap=0: every sentence appears exactly once, in order
    joined = " ".join(chunks)
    for i in range(200):
        assert ("数据句子编号%d。" % i) in joined


def test_split_sentences_cjk_latin():
    s = split_sentences("你好。世界！Latin one. Latin two? 分号；结尾")
    assert s == ["你好。", "世界！", "Latin one.", "Latin two?", "分号；", "结尾"]


def test_parse_sections_tree():
    md = "# 第一章\n导语。\n## 1.1 概念\n内容甲。\n### 1.1.1 细节\n内容乙。\n## 1.2 性质\n内容丙。"
    secs = parse_sections(md, "f.md")
    assert [(s.title, s.level, s.parent_title, s.is_root) for s in secs] == [
        ("第一章", 1, None, True),
        ("1.1 概念", 2, "第一章", False),
        ("1.1.1 细节", 3, "1.1 概念", False),
        ("1.2 性质", 2, "第一章", False),
    ]
    assert secs[0].lines == ["导语。"]


def test_parse_sections_question_kind():
    md = "# 第一章\n## 习题1.1\n做题。\n## 1.2 概念\n学习。"
    secs = parse_sections(md, "f")
    kinds = {s.title: s.kind for s in secs}
    assert kinds["习题1.1"] == "question"
    assert kinds["1.2 概念"] == "knowledge"


def test_chunk_documents_spark(spark):
    src, _ = corpus_df(spark)
    chunks = chunk_documents(scan_source(spark, src)).cache()
    pdf = chunks.toPandas()
    assert len(pdf) > 0
    assert (pdf["char_len"] <= HARD_MAX).all()
    assert (pdf["char_len"] == pdf["text"].str.len()).all()
    # TOC doc skipped entirely (F8)
    assert not pdf["path"].eq("books/toc.md").any()
    # empty / whitespace docs emit nothing
    assert not pdf["path"].isin(["empty.txt", "ws.txt"]).any()
    # ord is dense per doc
    for _, g in pdf.groupby("doc_id"):
        assert sorted(g["ord"]) == list(range(len(g)))
    # sha invariant: every chunk row carries a 64-hex sha
    assert pdf["sha"].str.match(re.compile(r"^[0-9a-f]{64}$")).all()
    # giant single line hard-split into <=1000 pieces covering all 12000 chars
    giant = pdf[pdf["path"] == "giant.txt"]
    assert giant["char_len"].sum() == 12000
