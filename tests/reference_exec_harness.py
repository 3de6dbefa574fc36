"""Subprocess harness that imports and executes the UNTRUSTED reference
checkout (/root/reference) with deterministic seams stubbed.

Security boundary (tests/test_reference_execution.py): the reference's
top-level module code used to run IN the pytest process with its
privileges and interpreter state -- a supply-chain exposure on every suite
run. This harness is only ever launched as `python -I <harness> <repo>
<mode> ...` in a separate, resource-limited (CPU/address-space/timeout)
process with a minimal environment, so import-time side effects are
confined to a disposable interpreter; the parent additionally pins a
sha256 of every reference file executed, so the recorded behavioral
numbers can never silently drift to a different reference source.

Stdout protocol: one JSON object. Modes:
  chunker              -> {"chunks": [[title, text]...], "nodes": [[title, content]...]}
  paper <md_path>      -> {"rows": [[question_text, questions, analysis]...]}
  textbook <md_path>   -> {"rows": [[Question_text, Question]...]}

No reference code is modified or copied -- modules are imported from the
read-only checkout and the non-deterministic seams (DeepSeek / Dify HTTP,
spaCy) are injected via sys.modules / instance attributes, exactly as
documented per function below.
"""

from __future__ import annotations

import json
import re
import sys
import types

_REF = "/root/reference"


def _run_reference_chunker(test_md: str):
    """Execute the reference LumberChunker (`Parser/TextBook_LumberChunker.py
    :25-66`) with deterministic stubs; returns (flattened
    [(section_title, chunk_text)], [(title, content)] for every tree node).

    Seams injected: the DeepSeek classify call (:291-309) -> the engine's
    heading-keyword heuristic; spaCy segmentation (:326-343) -> the
    engine's deterministic split_sentences; `self.book_tree` (:28) aliased
    to the constructor's `BookTree` (the reference never assigns the
    lowercase name -- executing verbatim raises AttributeError)."""
    from textchunking_and_knowledgegraph_spark.operators.chunker import (
        _QUESTION_TITLE_RE,
        split_sentences,
    )

    sys.path.insert(0, _REF)

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
    cfg_settings.setting = cfg_settings.settings = setting
    sys.modules["Config"] = cfg
    sys.modules["Config.Settings"] = cfg_settings

    el = types.ModuleType("EntityLinking")
    el_mod = types.ModuleType("EntityLinking.Entity_Linking")
    el_mod.Linking = object
    sys.modules["EntityLinking"] = el
    sys.modules["EntityLinking.Entity_Linking"] = el_mod

    from Parser.MD_section_parser import MD_parser
    from Parser.TextBook_LumberChunker import LumberChunker

    roots = MD_parser(test_md).parse_markdown_to_linked_lists()
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

    nodes: list[tuple[str, str]] = []

    def _collect(n):
        nodes.append((n.title, n.content))
        for c in n.children:
            _collect(c)

    for r in roots:
        _collect(r)
    return flat, nodes


def _run_reference_paper_parser(md_path: str):
    """Execute the reference GENERAL_parser (`Parser/md_paper_parser.py
    :319-410`) with deterministic stubs. Seams injected: Config/openai/
    requests/jieba/sklearn module stubs; EntityLinking raises (the
    reference already catches that and records None); the LLM-backfill
    iterrows loop is skipped by a DataFrame subclass -- executing it
    verbatim crashes on the reference's own `row['knowledges']` KeyError
    (the column is named 'entity'), and it only backfills LLM output."""
    import pandas as pd

    sys.path.insert(0, _REF)
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

    import Parser.md_paper_parser as M

    class _DF(pd.DataFrame):
        def iterrows(self):
            return iter(())

        def to_csv(self, *a, **k):
            pass

    M.pd = types.SimpleNamespace(DataFrame=_DF)
    df = M.PaperParser(md_path, "t.pdf").GENERAL_parser()
    return list(zip(df["question_text"], df["questions"], df["analysis"]))


def _run_reference_textbook_questions(md_path: str):
    """Execute the reference's exercise-question chunker
    (`Parser/Chunking_TextBook_Questions.py:20-117`) with deterministic
    stubs: Config/requests module stubs, EntityLinking returning a constant
    (raising would trigger the reference's `continue`, which drops EVERY
    question), and the per-section Dify LLM call patched to a constant
    answer/analysis pair (only the SPLITS are under test)."""
    sys.path.insert(0, _REF)
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

    from Parser.Chunking_TextBook_Questions import TextBookQuestion
    from Parser.MD_section_parser import MD_parser

    roots = MD_parser(md_path).parse_markdown_to_linked_lists()
    tb = TextBookQuestion(roots, "b.pdf")
    tb.Dify_structuring = lambda section: ("A", "ok")
    df = tb.Question_Chunking()
    return list(zip(df["Question_text"], df["Question"]))


def main(argv: list[str]) -> int:
    repo, mode = argv[0], argv[1]
    sys.path.insert(0, repo)  # the engine package (for the chunker seams)
    if mode == "chunker":
        chunks, nodes = _run_reference_chunker(argv[2])
        out = {"chunks": chunks, "nodes": nodes}
    elif mode == "paper":
        out = {"rows": _run_reference_paper_parser(argv[2])}
    elif mode == "textbook":
        out = {"rows": _run_reference_textbook_questions(argv[2])}
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    json.dump(out, sys.stdout, ensure_ascii=False)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
