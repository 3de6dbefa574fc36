"""Execute the reference's OWN LumberChunker and pin our chunker against it.

`Parser/TextBook_LumberChunker.py:25-66` is run IN-PROCESS on the reference's
own test document with its two non-deterministic seams stubbed determinstically
(no reference code is modified or copied -- the module is imported from the
read-only checkout and the seams are injected via sys.modules / instance
attributes):

- the DeepSeek classify call (`_classify_node`, :291-309) -> the engine's
  heading-keyword heuristic (the same `_QUESTION_TITLE_RE` our chunker uses),
- spaCy sentence segmentation (`_split_sentences_general`, :326-343) -> the
  engine's deterministic `split_sentences` (the documented T9 replacement),
- `self.book_tree` (:28) is aliased to the constructor's `BookTree` (the
  reference never assigns the lowercase name -- executing verbatim raises
  AttributeError).

What this pins (ws-insensitive canon = strip ALL whitespace; the reference
joins sentences with "\\n", our packer with " "):

1. The reference EXECUTES and its output obeys the shared length ceiling.
2. Boundary equality where the two designs coincide: a standalone knowledge
   node in the reference's 'OK' band (600..800 chars) is emitted verbatim by
   the reference (`_chunk_all_nodes` OK path) and must appear as exactly one
   of our chunks. test.md has exactly one such node.
3. Whole-chunk agreement count: 7 of the reference's 27 chunks are
   byte-identical (mod whitespace) to one of ours. Any drift in our
   absorption/split order changes this number and fails the pin.
4. NO-CONTENT-LOSS dominance: our stream covers 671/672 source sentences
   (one straddles a hard-split boundary); the reference's own execution
   covers only 220/672 -- its iteration caps (`max_iterations`), the `break`s
   in `_process_child_chapters` (:171-189) and the end-of-walk queue drops
   lose the rest. The divergence is therefore a deliberate correction, not
   drift; these exact counts are pinned so either side changing is loud.
"""

import os
import queue
import re
import sys
import types

import pytest

from textchunking_and_knowledgegraph_spark.operators.chunker import (
    _QUESTION_TITLE_RE,
    chunk_text,
    parse_sections,
    split_sentences,
)

_REF = "/root/reference"
_TEST_MD = os.path.join(_REF, "test/test.md")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_TEST_MD), reason="reference checkout not present"
)


def _canon(s: str) -> str:
    return re.sub(r"\s+", "", s)


def _run_reference_chunker():
    """Import and execute the reference LumberChunker with deterministic
    stubs; returns (flattened [(section_title, chunk_text)], md roots)."""
    saved_modules = {
        k: sys.modules.get(k)
        for k in ("spacy", "openai", "Config", "Config.Settings",
                  "EntityLinking", "EntityLinking.Entity_Linking",
                  "Parser", "Parser.MD_section_parser",
                  "Parser.TextBook_LumberChunker")
    }
    sys.path.insert(0, _REF)
    try:
        # spaCy -> the engine's deterministic splitter
        class _Sent:
            def __init__(self, t):
                self.text = t

        class _Nlp:
            def __call__(self, text):
                return types.SimpleNamespace(
                    sents=[_Sent(s) for s in split_sentences(text)]
                )

        spacy = types.ModuleType("spacy")
        spacy.load = lambda name: _Nlp()
        sys.modules["spacy"] = spacy

        # DeepSeek classify -> heading-keyword heuristic (shared regex)
        class _Completions:
            def create(self, model=None, messages=None, stream=False):
                prompt = messages[-1]["content"]
                m = re.search("你觉得“(.*)“这是个知识点的标题吗", prompt, re.DOTALL)
                title = m.group(1) if m else ""
                verdict = "0" if _QUESTION_TITLE_RE.search(title) else "1"
                msg = types.SimpleNamespace(content=verdict)
                return types.SimpleNamespace(
                    choices=[types.SimpleNamespace(message=msg)]
                )

        class _OpenAI:
            def __init__(self, api_key=None, base_url=None):
                self.chat = types.SimpleNamespace(completions=_Completions())

        openai = types.ModuleType("openai")
        openai.OpenAI = _OpenAI
        sys.modules["openai"] = openai

        setting = types.SimpleNamespace(
            Designer={"DEEPSEEK": {"API": "stub"},
                      "Storage": {"Parser": {"Chunked_book": "/tmp"}}},
            USER={"subject": "Math"},
        )
        cfg = types.ModuleType("Config")
        cfg_settings = types.ModuleType("Config.Settings")
        cfg_settings.setting = setting
        cfg_settings.settings = setting
        sys.modules["Config"] = cfg
        sys.modules["Config.Settings"] = cfg_settings

        el = types.ModuleType("EntityLinking")
        el_mod = types.ModuleType("EntityLinking.Entity_Linking")
        el_mod.Linking = object
        sys.modules["EntityLinking"] = el
        sys.modules["EntityLinking.Entity_Linking"] = el_mod

        for k in ("Parser", "Parser.MD_section_parser",
                  "Parser.TextBook_LumberChunker"):
            sys.modules.pop(k, None)
        from Parser.MD_section_parser import MD_parser
        from Parser.TextBook_LumberChunker import LumberChunker

        roots = MD_parser(_TEST_MD).parse_markdown_to_linked_lists()
        lc = LumberChunker(roots, "test.md")
        lc.book_tree = lc.BookTree  # reference bug: lowercase never assigned
        chunked = lc.lumberchunker()

        flat: list[tuple[str, str]] = []

        def _walk(d):
            for node, items in d.items():
                for it in items:
                    if isinstance(it, dict):
                        _walk(it)
                    else:
                        flat.append((node.title, it))

        for chap_struct in chunked:
            for ch1, v in chap_struct.items():
                for sec, lst in v["sections"].items():
                    for d in lst:
                        if isinstance(d, dict):
                            _walk(d)
                        else:
                            flat.append((sec.title, d))
                for c in v["content"]:
                    flat.append((ch1.title, c))
        return flat, roots
    finally:
        sys.path.remove(_REF)
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _our_chunks(text: str) -> list[tuple[str, str]]:
    out = []
    for sec in parse_sections(text, "test.md"):
        body = "\n".join(sec.lines)
        if body.strip():
            out += [(sec.title, c) for c in chunk_text(body)]
    return out


def test_reference_execution_pins_chunker():
    with open(_TEST_MD, encoding="utf-8") as f:
        text = f.read()
    ref, roots = _run_reference_chunker()
    ours = _our_chunks(text)

    # 1. the reference executes; shared hard ceiling holds on both streams
    assert len(ref) == 27 and len(ours) == 89
    assert max(len(c) for _, c in ref) <= 1000
    assert max(len(c) for _, c in ours) <= 1000

    # 2. standalone-comparable class: knowledge nodes in the 'OK' band are
    # emitted verbatim by the reference and must boundary-match ours 1:1
    ok_nodes = []

    def _collect(n):
        if not _QUESTION_TITLE_RE.search(n.title) and 600 <= len(n.content) <= 800:
            ok_nodes.append(n)
        for c in n.children:
            _collect(c)

    for r in roots:
        _collect(r)
    assert len(ok_nodes) == 1  # test.md fixture shape
    ours_canon = {_canon(c) for _, c in ours}
    for n in ok_nodes:
        assert _canon(n.content) in ours_canon, n.title

    # 3. whole-chunk agreement where the walks coincide
    agree = sum(1 for _, c in ref if _canon(c) in ours_canon)
    assert agree == 7

    # 4. no-content-loss dominance, both sides pinned exactly
    src_sents = set()
    for sec in parse_sections(text, "test.md"):
        for s in split_sentences("\n".join(sec.lines)):
            src_sents.add(_canon(s))
    blob_ours = "\x00".join(_canon(c) for _, c in ours)
    blob_ref = "\x00".join(_canon(c) for _, c in ref)
    assert len(src_sents) == 672
    assert sum(1 for s in src_sents if s in blob_ours) == 671
    assert sum(1 for s in src_sents if s in blob_ref) == 220


def _run_reference_paper_parser(md_path: str):
    """Import and execute the reference GENERAL_parser
    (`Parser/md_paper_parser.py:319-410`) with deterministic stubs. Seams
    injected (no reference code modified): Config/openai/requests/jieba/
    sklearn module stubs; EntityLinking raises (the reference already
    catches that and records None); the LLM-backfill iterrows loop is
    skipped by a DataFrame subclass -- executing it verbatim crashes on the
    reference's own `row['knowledges']` KeyError (the column is named
    'entity'), and it only backfills LLM output anyway."""
    import pandas as pd

    saved = {
        k: sys.modules.get(k)
        for k in ("requests", "jieba", "sklearn", "sklearn.feature_extraction",
                  "sklearn.feature_extraction.text", "sklearn.metrics",
                  "sklearn.metrics.pairwise", "openai", "Config",
                  "Config.Settings", "EntityLinking",
                  "EntityLinking.Entity_Linking", "Parser",
                  "Parser.md_paper_parser")
    }
    sys.path.insert(0, _REF)
    try:
        for name in ("requests", "jieba"):
            sys.modules[name] = types.ModuleType(name)
        sk = types.ModuleType("sklearn")
        fe = types.ModuleType("sklearn.feature_extraction")
        fet = types.ModuleType("sklearn.feature_extraction.text")
        fet.TfidfVectorizer = object
        mets = types.ModuleType("sklearn.metrics")
        mpp = types.ModuleType("sklearn.metrics.pairwise")
        mpp.cosine_similarity = lambda *a, **k: None
        sys.modules.update({
            "sklearn": sk, "sklearn.feature_extraction": fe,
            "sklearn.feature_extraction.text": fet,
            "sklearn.metrics": mets, "sklearn.metrics.pairwise": mpp,
        })
        openai = types.ModuleType("openai")
        openai.OpenAI = lambda **k: None
        sys.modules["openai"] = openai
        setting = types.SimpleNamespace(
            Designer={
                "DIFY": {"DIFY_USER": "u", "DIFY_URL": "http://stub",
                         "DIFY_ENG_Paper_Parser_API": "k",
                         "DIFY_GEO_Paper_Parser_API": "k"},
                "DEEPSEEK": {"API": "k"},
                "Storage": {"Parser": {"Chunked_paper": "/tmp/tckg_refpaper_out"}},
            },
            USER={"subject": "Math"},
        )
        cfg = types.ModuleType("Config")
        cs = types.ModuleType("Config.Settings")
        cs.setting = cs.settings = setting
        sys.modules["Config"] = cfg
        sys.modules["Config.Settings"] = cs

        el = types.ModuleType("EntityLinking")
        elm = types.ModuleType("EntityLinking.Entity_Linking")

        class _Linking:
            def link_question_with_entity(self, q):
                raise RuntimeError("no LLM in tests")

        elm.Linking = _Linking()
        sys.modules["EntityLinking"] = el
        sys.modules["EntityLinking.Entity_Linking"] = elm

        sys.modules.pop("Parser.md_paper_parser", None)
        import Parser.md_paper_parser as M

        class _DF(pd.DataFrame):
            def iterrows(self):
                return iter(())

            def to_csv(self, *a, **k):
                pass

        old_pd = M.pd
        M.pd = types.SimpleNamespace(DataFrame=_DF)
        try:
            df = M.PaperParser(md_path, "t.pdf").GENERAL_parser()
        finally:
            M.pd = old_pd
        return list(zip(df["question_text"], df["questions"], df["analysis"]))
    finally:
        sys.path.remove(_REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _pcanon(s: str) -> str:
    """Paper-parity canon: strip whitespace AND fold the fullwidth comma --
    our paper-path T1 translate is a deliberate SUPERSET of the reference's
    3-char table (`md_paper_parser.py:325-330` maps only ．（）; ours also
    folds ，), so comparisons fold it on both sides."""
    return _canon(s).replace("，", ",")


def test_reference_paper_parser_execution_pins_paper_operator(spark, tmp_path):
    """Run the reference's GENERAL_parser on the driver's own exam-paper
    fixture and pin our paper operator against that execution, question by
    question. The two intended divergences are part of the pin: (a) our T7
    explodes the subjective question's ### sub-questions into one row each
    (the reference keeps the block whole), so ref yields 2 questions and
    ours 3 rows per paper; (b) the reference's 【答案】..## capture keeps
    the 【解析】 block and any trailing heading inside 'analysis' -- our T5
    splits answer/analysis apart, so ours must embed in the ref capture."""
    import __spark_entry__ as entrymod

    papers = entrymod._paper_source(spark).collect()
    ours_all = entrymod.paper_questions(spark, "unused").toPandas()

    checked = 0
    for row in papers:
        md = tmp_path / (row.path.replace("/", "_") + ".md")
        md.write_text(row.content, encoding="utf-8")
        ref = _run_reference_paper_parser(str(md))
        ours = ours_all[ours_all["path"] == row.path].sort_values("q_index")
        assert len(ref) == 2 and len(ours) == 3  # T7 explode accounts for +1

        # choice question: the reference's stem (lines before the option
        # line) is a prefix of our question row, the option body its suffix
        r_text, r_body, r_ana = ref[0]
        o = ours.iloc[0]
        assert _pcanon(o["question_text"]).startswith(_pcanon(r_text))
        assert _pcanon(r_body) in _pcanon(o["question_text"])
        assert _pcanon(r_ana).startswith(_pcanon(o["answer"]))
        assert _pcanon(o["analysis"]) in _pcanon(r_ana)

        # subjective question: both our sub-question rows share the ref's
        # stem, and their texts are contained in the ref's ### body block
        r_text, r_body, r_ana = ref[1]
        for o in (ours.iloc[1], ours.iloc[2]):
            assert _pcanon(o["question_text"]) == _pcanon(r_text)
            assert _pcanon(o["question"]) in _pcanon(r_body)
            assert _pcanon(r_ana).startswith(_pcanon(o["answer"]))
            assert _pcanon(o["analysis"]) in _pcanon(r_ana)
        checked += 1
    assert checked == 8


def _run_reference_textbook_questions(md_path: str):
    """Import and execute the reference's exercise-question chunker
    (`Parser/Chunking_TextBook_Questions.py:20-117`) with deterministic
    stubs: Config/requests module stubs, EntityLinking returning a constant
    (raising would trigger the reference's `continue`, which drops EVERY
    question), and the per-section Dify LLM call patched to a constant
    answer/analysis pair (only the SPLITS are under test)."""
    saved = {
        k: sys.modules.get(k)
        for k in ("requests", "Config", "Config.Settings", "EntityLinking",
                  "EntityLinking.Entity_Linking", "Parser",
                  "Parser.MD_section_parser",
                  "Parser.Chunking_TextBook_Questions")
    }
    sys.path.insert(0, _REF)
    try:
        sys.modules["requests"] = types.ModuleType("requests")
        setting = types.SimpleNamespace(
            Designer={
                "DIFY": {"DIFY_TextBook_Question_Answer": "k",
                         "DIFY_USER": "u", "DIFY_URL": "http://stub"},
                "Storage": {"Parser": {"Chunked_book": "/tmp/tckg_reftbq_out"}},
            },
            USER={"subject": "Math"},
        )
        cfg = types.ModuleType("Config")
        cs = types.ModuleType("Config.Settings")
        cs.setting = cs.settings = setting
        sys.modules["Config"] = cfg
        sys.modules["Config.Settings"] = cs
        el = types.ModuleType("EntityLinking")
        elm = types.ModuleType("EntityLinking.Entity_Linking")

        class _Linking:
            def link_question_with_entity(self, q):
                return "stub-entity"

        elm.Linking = _Linking()
        sys.modules["EntityLinking"] = el
        sys.modules["EntityLinking.Entity_Linking"] = elm

        for k in ("Parser", "Parser.MD_section_parser",
                  "Parser.Chunking_TextBook_Questions"):
            sys.modules.pop(k, None)
        from Parser.Chunking_TextBook_Questions import TextBookQuestion
        from Parser.MD_section_parser import MD_parser

        roots = MD_parser(md_path).parse_markdown_to_linked_lists()
        tb = TextBookQuestion(roots, "b.pdf")
        tb.Dify_structuring = lambda section: ("A", "ok")
        df = tb.Question_Chunking()
        return list(zip(df["Question_text"], df["Question"]))
    finally:
        sys.path.remove(_REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


_TB_BOOK = (
    "# 第一章 集合\n集合是数学的基本概念。本节介绍集合的表示方法。\n"
    "## 练习\n1．求下列集合的并集。\n(1) A={1,2} (2) B={2,3}\n"
    "2．判断下列说法是否正确。\n集合的元素具有互异性。\n"
    "## 1.2 集合的运算\n交集与并集满足交换律。\n"
    "## 复习题\n3．证明德摩根定律。\nA. 正确 B. 错误\n"
)


def test_reference_textbook_questions_execution_pins_operator(spark, tmp_path):
    """Execute the reference question chunker on the driver's textbook
    fixture and pin our textbook_questions operator against it. The
    reference's own execution keeps only the LAST question node per chapter
    (its `df_list.append` sits outside the node loop) plus an empty
    preamble row -- so it emits 1 real question where the document has 3;
    ours emits all 3. The surviving question must match ours exactly
    (ws-canon stem and option body)."""
    from textchunking_and_knowledgegraph_spark.operators.textbook_questions import (
        textbook_questions,
    )
    from textchunking_and_knowledgegraph_spark.plans.pipeline import build_chunks

    md = tmp_path / "book.md"
    md.write_text(_TB_BOOK, encoding="utf-8")
    ref = _run_reference_textbook_questions(str(md))
    ref_real = [(t, b) for t, b in ref if _canon(t)]
    # last-node-only + empty-preamble behavior of the reference, pinned
    assert len(ref) == 2 and len(ref_real) == 1

    src = spark.createDataFrame(
        [("books", "math/b1.md", "c1", "markdown", _TB_BOOK)],
        "repo string, path string, commit string, lang string, content string",
    )
    ours = textbook_questions(build_chunks(spark, src)).toPandas()
    assert len(ours) == 3  # no content loss: both exercise sections kept

    r_text, r_body = ref_real[0]
    match = ours[ours["question_text"].map(_canon) == _canon(r_text)]
    assert len(match) == 1
    assert _canon(match.iloc[0]["question"]) == _canon(r_body)
