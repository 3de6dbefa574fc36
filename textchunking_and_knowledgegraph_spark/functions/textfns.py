"""Text-analysis column functions for training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen) -- each is
also expressible in ANSI SQL so the DuckDB oracle can verify it 1:1:

  token_count       whitespace tokenization count
  token_estimate    BPE-ish size estimate (latin chars/4 + CJK chars)
  language_id       n-gram/script heuristic (CJK ratio)
  quality metrics   punct ratio, stopword ratio, mean word length
  fingerprint       md5 of whitespace-normalized lowercase text
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CJK_RANGE = r"[一-鿿]"

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "be", "this", "that", "are", "was", "from",
]


def token_count(col: Column) -> Column:
    """Whitespace token count (regexp_count of non-space runs)."""
    return F.regexp_count(col, F.lit(r"\S+")).alias("token_count")


def token_estimate(col: Column) -> Column:
    """BPE-ish token estimate: ceil(latin_chars / 4) + cjk_chars (each CJK
    char is ~1 token in most BPE vocabularies)."""
    cjk = F.regexp_count(col, F.lit(_CJK_RANGE))
    latin = F.length(col) - cjk
    return (F.ceil(latin / F.lit(4.0)) + cjk).cast("long")


def cjk_ratio(col: Column) -> Column:
    return F.when(F.length(col) > 0, F.regexp_count(col, F.lit(_CJK_RANGE)) / F.length(col)).otherwise(F.lit(0.0))


def language_id(col: Column) -> Column:
    """Deterministic script heuristic: zh if >30% CJK chars, else en if any
    latin letters, else 'unknown'."""
    return (
        F.when(cjk_ratio(col) > 0.3, F.lit("zh"))
        .when(F.regexp_count(col, F.lit("[A-Za-z]")) > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def punct_ratio(col: Column) -> Column:
    return F.when(
        F.length(col) > 0,
        F.regexp_count(col, F.lit(r"[\.,;:!\?\(\)\[\]\{\}\"'`]")) / F.length(col),
    ).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    total = F.size(toks)
    return F.when(total > 0, stop / total).otherwise(F.lit(0.0))


_ZH_FUNC_CHARS = "的了是在和就不都也很到要去说着对与被把让从"


def stopword_ratio_zh(col: Column) -> Column:
    """CJK counterpart of stopword_ratio: zh text has no whitespace tokens,
    so the natural-language signal is function-CHAR density -- occurrences
    of high-frequency grammatical characters over all CJK characters.
    Natural prose lands ~0.1-0.25; keyword lists and tables land near 0."""
    func = F.regexp_count(col, F.lit(f"[{_ZH_FUNC_CHARS}]"))
    cjk = F.regexp_count(col, F.lit(_CJK_RANGE))
    return F.when(cjk > 0, func / cjk).otherwise(F.lit(0.0))


def mean_word_len(col: Column) -> Column:
    n = F.regexp_count(col, F.lit(r"\S+"))
    chars = F.length(F.regexp_replace(col, r"\s+", ""))
    return F.when(n > 0, chars / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme punct ratio, very
    short docs, and stopword-free (likely non-natural) text. Weights frozen.

    Language-aware naturalness signal: zh text (per ``language_id``) has no
    whitespace tokens, so the English stopword ratio scored ALL Chinese
    prose as non-natural (round-2 finding: the reference's entire corpus is
    Chinese) -- the zh branch uses function-CHAR density
    (``stopword_ratio_zh``) instead. Both branches stay SQL-expressible
    (mirrored in the q23 DuckDB oracle)."""
    length_ok = F.when(F.length(col) >= 200, F.lit(1.0)).otherwise(F.length(col) / F.lit(200.0))
    punct_ok = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(col) * 5)
    stop_sig = F.when(
        language_id(col) == "zh", stopword_ratio_zh(col)
    ).otherwise(stopword_ratio(col))
    stop_ok = F.least(F.lit(1.0), stop_sig * 4)
    return F.round(length_ok * 0.4 + punct_ok * 0.3 + stop_ok * 0.3, 6)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of lowercase whitespace-collapsed text --
    the cheap exact-dup key (rolling-hash stand-in, deterministic)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


# ---------------------------------------------------------------------------
# training-data curation: PII scrubbing + repetition quality signals
# (standard large-corpus filters; pure column algebra, no UDF)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# final char class keeps trailing sentence punctuation OUT of the match
_URL_RE = r"https?://[^\s<>\"]*[^\s<>\".,;!?)]"
# Deliberately conservative: an international +CC form, a parenthesized
# area code, a 3-3-4 three-group number, or a 3-4 local pair gated on an
# explicit phone context (tel/call/phone/电话). Plain n-n numeric ranges
# (years 2019-2020, pages 100-200, asymmetric 100-2000) do NOT match —
# looser patterns (including an ungated 3-4 pair) were observed corrupting
# ordinary numeric ranges in textbook-style corpora.
_PHONE_RE = (
    r"(?<![0-9])(?:"
    r"\+[0-9]{1,3}[\s\-][0-9]{3,4}[\s\-][0-9]{3,4}"
    r"|\([0-9]{2,4}\)[\s\-]?[0-9]{3,4}[\s\-]?[0-9]{3,4}"
    r"|[0-9]{3}[\s\-][0-9]{3}[\s\-][0-9]{4}"
    r"|(?<=(?i:tel|call|phone|电话)[\s:：.\-]{1,3})[0-9]{3}[\s\-][0-9]{4}"
    r")(?![0-9])"
)
_IP_RE = r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])"


def _scrub_stages(col: Column) -> tuple[Column, Column, Column, Column]:
    """The precedence chain shared by scrub and audit: URLs first so their
    host/path digits are never re-matched as phone/IP fragments."""
    after_url = F.regexp_replace(col, _URL_RE, "<URL>")
    after_email = F.regexp_replace(after_url, _EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, _IP_RE, "<IP>")
    after_phone = F.regexp_replace(after_ip, _PHONE_RE, "<PHONE>")
    return after_url, after_email, after_ip, after_phone


def scrub_pii(col: Column) -> Column:
    """Replace emails, URLs, phone-like numbers, and IPv4 addresses with
    typed placeholders -- the standard pre-training scrub pass. Regex chain
    stays in codegen."""
    return _scrub_stages(col)[3]


def pii_counts(col: Column) -> Column:
    """struct(emails, urls, phones, ips) -- the audit metric that decides
    whether a document is scrubbable or droppable. Counts are taken on the
    SAME progressive scrub chain scrub_pii applies (a URL's digits must not
    also count as a phone), and null text counts as zeros (a NULL count
    would make threshold filters drop the row from BOTH sides)."""
    c = F.coalesce(col, F.lit(""))
    after_url, after_email, after_ip, _ = _scrub_stages(c)
    return F.struct(
        F.regexp_count(after_url, F.lit(_EMAIL_RE)).alias("emails"),
        F.regexp_count(c, F.lit(_URL_RE)).alias("urls"),
        F.regexp_count(after_ip, F.lit(_PHONE_RE)).alias("phones"),
        F.regexp_count(after_email, F.lit(_IP_RE)).alias("ips"),
    )


def dup_line_fraction(col: Column) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier line
    (Gopher-style repetition signal: boilerplate/template pages score high).
    Higher-order array functions only -- no shuffle, no UDF."""
    lines = F.filter(F.split(col, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n = F.size(lines)
    distinct_n = F.size(F.array_distinct(lines))
    return F.when(n > 0, (n - distinct_n) / n).otherwise(F.lit(0.0))


def top_bigram_fraction(col: Column) -> Column:
    """Fraction of all word-bigram occurrences taken by the single most
    frequent bigram (Gopher repetition rule: high = looping/generated text).

    Column algebra: bigram i = tokens[i] ++ tokens[i+1] via a
    transform/sequence index lambda, then the max per-bigram count via
    transform + size(filter) over the distinct bigrams -- O(d*n) per
    document (d = distinct bigrams), bounded by truncating to the first
    513 tokens = 512 bigrams (the signal saturates long before)."""
    toks = F.slice(F.filter(F.split(F.lower(col), r"\s+"),
                            lambda x: F.length(x) > 0), 1, 513)
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    counts = F.transform(
        F.array_distinct(bigrams),
        lambda g: F.size(F.filter(bigrams, lambda x: x == g)),
    )
    return F.when(
        n >= 2,
        F.array_max(counts) / F.size(bigrams),
    ).otherwise(F.lit(0.0))


def cjk_numeral_to_int(col: Column) -> Column:
    """T10 (`PDF_to_MD/LLM_correction.py:271-280,343-346`): Chinese numeral ->
    int. The reference maps 一..十三 with an ``int()`` fallback; this covers
    the general 1-99 grammar (X十Y) plus ASCII digits, returning 0 for
    anything unparseable (the reference's behavior). Pure column algebra:
    digit translate + one regexp — stays in codegen, no UDF. Full-width
    digits (第１２章, common in CJK PDFs) translate too."""
    t = F.translate(
        F.trim(col),
        "零一二三四五六七八九０１２３４５６７８９",
        "01234567890123456789",
    )
    tens = F.regexp_extract(t, "^([0-9])?十([0-9])?$", 1)
    units = F.regexp_extract(t, "^([0-9])?十([0-9])?$", 2)
    with_ten = F.when(
        t.rlike("^[0-9]?十[0-9]?$"),
        F.when(tens == "", F.lit(1)).otherwise(tens.cast("int")) * 10
        + F.when(units == "", F.lit(0)).otherwise(units.cast("int")),
    )
    plain = F.when(t.rlike("^[0-9]+$"), t.cast("int"))
    return F.coalesce(with_ten, plain, F.lit(0))
