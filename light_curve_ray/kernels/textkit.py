"""Deterministic text kernels: HTML -> text, url -> domain, tokenization,
language ID, quality scoring, fingerprinting.

The north star's per-row invariant is *byte-identical extracted text per url*
across heterogeneous workers (BASELINE.json ``input_hint``), so everything
here is pure Python / stdlib — no locale, libc or third-party parser
dependence.  The same functions are called by the distributed actor-pool
stage (stages/extract.py) and by the single-process oracle in tests, which is
how byte-identity is verified (SURVEY §5 "oracle tests").
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# ---------------------------------------------------------------- extraction

_SKIP_CONTENT = {"script", "style", "noscript", "template", "head"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "aside", "blockquote", "pre", "hr", "form", "title",
}


class _TextExtractor(HTMLParser):
    """Collects visible text; skips script/style/head subtrees; decodes
    entities via convert_charrefs (stdlib, deterministic)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


def extract_text_parser(html: bytes | str) -> str:
    """HTML bytes -> canonical visible text via the stdlib HTMLParser.

    Canonical form: entity-decoded visible text with all whitespace runs
    collapsed to single spaces (``" ".join(text.split())``) — a single
    deterministic normal form so outputs are byte-identical regardless of
    which worker parses the page.  Malformed HTML never raises: the stdlib
    parser is lenient and any residual error yields the raw-text fallback.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    p = _TextExtractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        return " ".join(re.sub(r"<[^>]*>", " ", raw).split())
    return " ".join("".join(p.chunks).split())


# compiled once at import; the fast path's whole state
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SKIP_RE = re.compile(
    r"<(script|style|noscript|template|head)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text(html: bytes | str) -> str:
    """HTML bytes -> canonical visible text (the engine's default kernel).

    Compiled-regex pipeline: strip comments -> strip
    script/style/noscript/template/head subtrees -> strip remaining tags
    -> decode entities (html.unescape; AFTER tag-strip, so literal
    ``&lt;tag&gt;`` text survives as ``<tag>`` exactly like the parser's
    convert_charrefs) -> collapse whitespace.  ~6x faster than the stdlib
    HTMLParser and byte-identical to it on well-formed pages
    (tests/test_textkit.py pins equality across the synthetic corpus);
    pathological nesting (e.g. ``</script>`` inside a string literal) can
    diverge — both kernels stay deterministic, and ``extract_text_parser``
    remains available where parser fidelity matters.
    """
    import html as _html

    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = html
    s = _COMMENT_RE.sub(" ", raw)
    s = _SKIP_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    return " ".join(_html.unescape(s).split())


# ---------------------------------------------------------------- url parsing

# ONE pattern shared by three implementations: this Python kernel, the
# vectorized pyarrow pc.extract_regex in stages/project.py, and the DuckDB
# regexp_extract in the oracle SQL (pipelines/queries.py) — so url -> domain
# is bit-identical across the engine, the stage, and the correctness oracle.
# Named group: pyarrow's extract_regex requires named groups; DuckDB's
# regexp_extract addresses it positionally as group 1; Python re by name.
URL_DOMAIN_PATTERN = r"^(?:[^:/?#]+://)?(?P<domain>[^/?#:]+)"
_URL_DOMAIN_RE = re.compile(URL_DOMAIN_PATTERN)


def url_domain(url: str) -> str:
    """scheme://host[:port]/path -> lowercased host ('' when unparseable)."""
    if not url:
        return ""
    m = _URL_DOMAIN_RE.match(url)
    return m.group(1).lower() if m else ""


# ---------------------------------------------------------------- tokenizing

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def token_count_bpe(text: str) -> int:
    """BPE-ish token count: word-or-punctuation regex matches."""
    return len(_WORD_RE.findall(text))


# ---------------------------------------------------------------- language id

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "es": {"el", "la", "los", "las", "de", "que", "es", "en", "un", "una"},
    "fr": {"le", "la", "les", "des", "est", "et", "un", "une", "dans", "pour"},
}


def lang_id(text: str) -> str:
    """Deterministic n-gram/stopword language heuristic.

    Script ranges first (CJK -> ja/zh by kana presence, Cyrillic -> ru), then
    stopword-hit argmax over {en,de,es,fr}; ties and no-hits -> 'und'.
    """
    if not text:
        return "und"
    sample = text[:4000]
    n_cyr = n_cjk = n_kana = 0
    for ch in sample:
        o = ord(ch)
        if 0x0400 <= o <= 0x04FF:
            n_cyr += 1
        elif 0x4E00 <= o <= 0x9FFF:
            n_cjk += 1
        elif 0x3040 <= o <= 0x30FF:
            n_kana += 1
    n_alpha = sum(ch.isalpha() for ch in sample) or 1
    if (n_cjk + n_kana) / n_alpha > 0.3:
        return "ja" if n_kana > 0 else "zh"
    if n_cyr / n_alpha > 0.3:
        return "ru"
    words = [w for w in sample.lower().split() if w]
    scores = {
        lang: sum(w in sw for w in words) for lang, sw in _STOPWORDS.items()
    }
    best = max(scores, key=lambda k: (scores[k], k))
    if scores[best] == 0:
        return "und"
    ranked = sorted(scores.values(), reverse=True)
    if len(ranked) > 1 and ranked[0] == ranked[1]:
        return "und"
    return best


# ---------------------------------------------------------------- quality

_STOP_EN = _STOPWORDS["en"]


def quality_scores(text: str) -> dict:
    """Deterministic quality metrics (length / punctuation / stopword /
    digit / caps ratios + mean word length)."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    if n_chars == 0:
        return {
            "n_chars": 0, "n_words": 0, "mean_word_len": 0.0,
            "punct_ratio": 0.0, "digit_ratio": 0.0, "upper_ratio": 0.0,
            "stopword_ratio": 0.0,
        }
    n_punct = sum(not ch.isalnum() and not ch.isspace() for ch in text)
    n_digit = sum(ch.isdigit() for ch in text)
    n_upper = sum(ch.isupper() for ch in text)
    n_stop = sum(w.lower() in _STOP_EN for w in words)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "punct_ratio": n_punct / n_chars,
        "digit_ratio": n_digit / n_chars,
        "upper_ratio": n_upper / n_chars,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
    }


# ---------------------------------------------------------------- fingerprint

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    """64-bit FNV-1a hash (public-domain algorithm; deterministic across
    platforms, unlike Python's salted ``hash``).

    NOTE: pure-Python per-byte loop — fine for short keys (urls, tokens);
    document-scale payloads use ``fingerprint`` (stdlib blake2b, C speed,
    equally deterministic) instead: per-byte Python on multi-KB docs made
    exact dedup hash-bound in round 1."""
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def blake64(data: bytes) -> int:
    """Deterministic 64-bit digest of arbitrary-length bytes via stdlib
    blake2b (C implementation — ~GB/s vs ~MB/s for the Python FNV loop)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8).digest(), "big")


def fingerprint(text: str) -> int:
    """Document fingerprint: 64-bit blake2b of whitespace-normalized text."""
    return blake64(" ".join(text.split()).encode("utf-8"))


REPETITION_COLUMNS = (
    "n_lines", "dup_line_frac", "dup_line_char_frac",
    "top_2gram_char_frac", "dup_3gram_char_frac",
)


def repetition_signals(text: str) -> dict:
    """Gopher-style per-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the classic LLM corpus
    repetition filters), with exact SQL-mirrorable definitions:

    - ``n_lines``: non-blank lines (split on \\n, TRIM-empty dropped).
    - ``dup_line_frac``: 1 - distinct_lines / n_lines (0 when no lines).
    - ``dup_line_char_frac``: characters in lines occurring more than
      once (all occurrences, untrimmed lengths) / characters in all
      lines.
    - ``top_2gram_char_frac``: occurrences x characters of the most
      frequent word 2-gram / LENGTH(text); ties resolve to the
      lexicographically smallest gram (grams joined with one space —
      whitespace-split words, same as the text_stats word contract).
    - ``dup_3gram_char_frac``: sum over word-3-grams occurring more than
      once of occurrences x gram characters / LENGTH(text) (a
      deliberately simple overlap-agnostic form of Gopher's duplicated
      n-gram character fraction; both engines compute THIS definition).

    Integer counts + one final divide per signal — no transcendentals,
    bit-deterministic against the DuckDB oracle."""
    from collections import Counter

    lines = [ln for ln in text.split("\n") if ln.strip()]
    n_lines = len(lines)
    out = {"n_lines": n_lines, "dup_line_frac": 0.0,
           "dup_line_char_frac": 0.0, "top_2gram_char_frac": 0.0,
           "dup_3gram_char_frac": 0.0}
    if n_lines:
        lc = Counter(lines)
        out["dup_line_frac"] = 1.0 - len(lc) / n_lines
        total = sum(len(ln) for ln in lines)
        if total:
            dup = sum(len(ln) * c for ln, c in lc.items() if c > 1)
            out["dup_line_char_frac"] = dup / total
    n_chars = len(text)
    words = text.split()
    if n_chars and len(words) >= 2:
        c2 = Counter(" ".join(words[i:i + 2])
                     for i in range(len(words) - 1))
        top_gram, top_n = min(
            ((g, c) for g, c in c2.items()),
            key=lambda gc: (-gc[1], gc[0]))
        out["top_2gram_char_frac"] = top_n * len(top_gram) / n_chars
    if n_chars and len(words) >= 3:
        c3 = Counter(" ".join(words[i:i + 3])
                     for i in range(len(words) - 2))
        dup3 = sum(c * len(g) for g, c in c3.items() if c > 1)
        out["dup_3gram_char_frac"] = dup3 / n_chars
    return out


# PII redaction pattern table — ordered: each stage counts matches on the
# CURRENT text then replaces, so an email's digits can never double-count
# as a phone.  All three patterns are RE2-safe (no lookaround/backrefs):
# Arrow's count_substring_regex / replace_substring_regex AND DuckDB's
# regexp_* both compile RE2, so the oracle runs the IDENTICAL automaton
# and parity is exact, not approximate.  Replacement tokens contain <>
# which no pattern can re-match.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii(text_arr):
    """Vectorized PII scrub over a pyarrow string array: returns
    (redacted_array, {name: int64 count_array}).  Pure Arrow compute —
    two RE2 kernel passes per pattern, zero Python-level row loops."""
    import pyarrow.compute as pc

    counts = {}
    cur = text_arr
    for name, pat, tok in PII_PATTERNS:
        counts[name] = pc.count_substring_regex(cur, pattern=pat)
        cur = pc.replace_substring_regex(cur, pattern=pat,
                                         replacement=tok)
    return cur, counts


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (insert/delete/substitute) over UTF-8
    BYTES — DuckDB's ``levenshtein()`` is byte-based ('é' counts as two
    units), and the similarity-join oracle demands the identical
    metric.  Standard two-row DP with the inner row vectorized: the
    sequential insert chain cur[j] = min(base[j], cur[j-1]+1) unrolls
    to a running minimum, cur[j] = j + min_{k<=j}(base[k]-k).  Inputs
    are the banded candidate minority (short strings), never the
    corpus."""
    import numpy as np

    if a == b:
        return 0
    ab = a.encode("utf-8")
    bbuf = b.encode("utf-8")
    if not ab:
        return len(bbuf)
    if not bbuf:
        return len(ab)
    bb = np.frombuffer(bbuf, dtype=np.uint8)
    m = len(bb)
    j_idx = np.arange(m + 1, dtype=np.int64)
    prev = j_idx.copy()
    base = np.empty(m + 1, dtype=np.int64)
    for i, ca in enumerate(ab):
        base[0] = i + 1
        np.minimum(prev[1:] + 1,
                   prev[:-1] + (bb != np.uint8(ca)),
                   out=base[1:])
        prev = np.minimum.accumulate(base - j_idx) + j_idx
    return int(prev[-1])


# --------------------------------------------------------------- soundex

_SOUNDEX_CODE = {}
for _grp, _dig in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
    for _ch in _grp:
        _SOUNDEX_CODE[_ch] = _dig


def soundex(word: str) -> str:
    """American Soundex (Russell & Odell; the classic phonetic blocking
    key of record-linkage systems): first letter + three digits, with
    the standard rules — adjacent same-code letters collapse, h/w are
    transparent separators (same-code letters AROUND an h/w still
    collapse), vowels (a e i o u y) break runs, the first letter's own
    code is skipped but still collapses a following same-code letter.
    Non-alpha characters are stripped; empty input -> ''."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = [w[0].upper()]
    prev = _SOUNDEX_CODE.get(w[0], "")
    for c in w[1:]:
        code = _SOUNDEX_CODE.get(c, "")
        if c in "hw":
            continue            # transparent: prev survives
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        prev = code             # vowels reset prev to ""
    return "".join(out) + "0" * (4 - len(out))


def soundex_array(words) -> list:
    """Vectorized-enough soundex over an iterable of strings."""
    return [soundex(w) for w in words]
