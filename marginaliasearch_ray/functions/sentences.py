"""Sentence extraction rule chain — the reference's language-processing
sentence layer ported rule-for-rule.

Reference parity map (code/functions/language-processing/java/nu/
marginalia/language/):

- ``flatten_unicode``        — encoding/UnicodeNormalization.java
  FlattenAllLatin (the ``en`` maximal-latin algorithm), table-for-table:
  curly quotes -> '"', every accent row, Þ/þ -> "th", ß -> "ss",
  non-ASCII characters matching no table row are DROPPED, plain-ASCII
  fast path returns the string unchanged.  The table strings contain
  COMBINING marks (x̂, y̨, n̈, ą̊ are two-codepoint literals), so bare
  combining codepoints hit their row exactly as Java's indexOf does.
- ``split_segment_sep``      — sentence/SentenceSegmentSplitter.java
  splitSegment: europeanWordBreaks tokenization, COMMA/SPACE separator
  bits (separator text blank -> SPACE else COMMA), the
  isDiscardedByTokenizer drop pass (separators re-packed by kept index),
  the <>/'/trailing-dot post-passes (each testing the ORIGINAL token),
  and the maxLength (250-word) truncation.
- ``preclean``               — sentence/SentencePreCleaner.java: blank
  drop, the ``sentenceCount++ > MAX`` input cap quirk, and the
  ``( -|- |\\|)`` re-split of sentences containing '-' or '|'.
- ``normalize_spaces`` / ``strip_possessive`` — SentenceExtractor.java
  statics.
- ``detect_sentences``       — STAND-IN (documented deviation): the
  reference runs OpenNLP's SentenceDetectorME (a binary maximum-entropy
  model, out of sandbox scope; its own fallback when the model throws is
  ``split(text, '.')``).  This stand-in splits after a ``[.!?]+`` run
  followed by whitespace — deterministic, rule-based, and feeding the
  exact downstream chain above.
- ``extract_sentences_from_string`` — SentenceExtractor.java
  extractSentencesFromString: 50k char truncation, space normalization,
  detect -> preclean -> 500-sentence cap, then per sentence the
  natural-language branch (POS tags via functions/pos.py, lowercase +
  stripPossessive, porter stems, isCapitalized / isAllCaps bitsets,
  includeInStemming from the stemmer's ``!(IN TO CC DT)`` pattern) or
  the non-language branch for ``nonLanguage`` html tags (CODE): zero
  tags, identity "stems", all-include.
- ``Sentence``               — model/DocumentSentence.java: the
  separator bitset semantics (set = SPACE), nextCommaPos
  (``nextClearBit``), constructWordFromSpan (junk-char trim),
  constructStemmedWordFromSpan (includeInStemming filter + joiner
  normalization), per-word stop flags.

Pure per-string computation; callers drive it per tagged frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .pos import EN_INCLUSION_PATTERN, tag_en_sentence
from .stem import porter_stem as _porter_stem_raw

# per-process stem memo: stemming runs once per TOKEN now (the sentence
# model stems every word), so cache per surface form; vocabulary-bounded
# with a clear-on-overflow guard against adversarial token streams
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 500_000


def porter_stem(word: str):
    hit = _STEM_CACHE.get(word)
    if hit is None:
        if len(_STEM_CACHE) >= _STEM_CACHE_MAX:
            _STEM_CACHE.clear()
        hit = _STEM_CACHE[word] = _porter_stem_raw(word)
    return hit

MAX_SENTENCE_LENGTH = 250  # SentenceExtractor.java:50
MAX_SENTENCE_COUNT = 500   # SentenceExtractor.java:51

SEP_COMMA = 0
SEP_SPACE = 1

# ---------------------------------------------------------------------------
# FlattenAllLatin (UnicodeNormalization.java), exact tables
# ---------------------------------------------------------------------------

_FLATTEN_TABLES: tuple[tuple[str, str], ...] = (
    ("“”", '"'),
    ("áâàȁăåäāǟãąą̊ḁẚⱥ", "a"),
    ("ḃḅḇƀɓ", "b"),
    ("ćĉčçḉċƈȼ", "c"),
    ("ɗḓďḋḍḏḑđðɖḏ", "d"),
    ("éêèȅěëēẽĕęėẹȇḕḗḙḛḝɇ", "e"),
    ("ḟƒ", "f"),
    ("ǵĝǧğġģɠḡǥ", "g"),
    ("ĥȟḧḣḥẖḩḫħⱨ", "h"),
    ("iıíîìȉïḯīĩįịḭ", "i"),
    ("ĵǰɉ", "j"),
    ("ḱǩķḳḵƙⱪ", "k"),
    ("ĺłḽľļḷḹḻƚɫⱡ", "l"),
    ("ḿṁṃ", "m"),
    ("ŋńǹñṋňṅṇṉŉn̈ņ", "n"),
    ("óőôòȍŏȯȱöȫōṓṑõṍṏȭøǿǫǭọȏơ", "o"),
    ("ṕṗƥᵽ", "p"),
    ("ꝗ", "q"),
    ("ŕȑřŗṙṛṝṟɍɽ", "r"),
    ("śṥŝšṧşșṡṣṩ", "s"),
    ("ťṱẗţțŧṫṭṯⱦ", "t"),
    ("úùûŭưűüūṻųůũṹụṳṵṷʉ", "u"),
    ("ṽṿʋỽ", "v"),
    ("ẃŵẁẅẘẇẉⱳ", "w"),
    ("x̂ẍẋ", "x"),
    ("ƴýŷỳÿȳỹẙẏy̨ɏỿ", "y"),
    ("źẑžżẓẕƶȥ", "z"),
    ("Þþ", "th"),
    ("ß", "ss"),
)

# one membership dict, preserving first-table-wins order like the Java
# if/else-if chain (a codepoint can appear in only one table anyway,
# except 'x' which appears in its own table — same output either way)
_FLATTEN_MAP: dict[str, str] = {}
for _tbl, _rep in _FLATTEN_TABLES:
    for _ch in _tbl:
        _FLATTEN_MAP.setdefault(_ch, _rep)


def flatten_unicode(s: str) -> str:
    """FlattenAllLatin.flattenUnicode: ASCII passthrough appended as-is,
    table rows replaced, any other non-ASCII codepoint dropped."""
    if s.isascii():
        return s
    out: list[str] = []
    for ch in s:
        rep = _FLATTEN_MAP.get(ch)
        if rep is not None:
            out.append(rep)
        elif ord(ch) < 128:
            out.append(ch)
        # else: dropped
    return "".join(out)


# ---------------------------------------------------------------------------
# splitSegment with separators (SentenceSegmentSplitter.java)
# ---------------------------------------------------------------------------


def split_segment_sep(
    segment: str, max_length: int = MAX_SENTENCE_LENGTH
) -> tuple[list[str], list[int]]:
    """-> (words, separators) where separators[i] is SEP_SPACE/SEP_COMMA
    for the break AFTER word i.  Token output is byte-identical to the
    legacy ``keywords.split_segment`` (equivalence-tested); this variant
    adds the separator bits and the per-sentence word cap."""
    from .keywords import _WORD_BREAK, _is_discarded

    flat = flatten_unicode(segment)
    words: list[str] = []
    seps: list[int] = []
    i = 0
    n = len(flat)
    while i <= n:
        m = _WORD_BREAK.search(flat, i)
        if not m:
            words.append(flat[i:])
            seps.append(SEP_SPACE)
            break
        if i != m.start():
            words.append(flat[i:m.start()])
            space = flat[m.start():m.end()]
            seps.append(SEP_SPACE if space.strip() == "" else SEP_COMMA)
        if m.end() == i:  # defensive: alternatives are all >= 1 char
            i += 1
        else:
            i = m.end()

    kept: list[str] = []
    kept_seps: list[int] = []
    for w, s in zip(words, seps):
        if _is_discarded(w):
            continue
        kept_seps.append(s)
        kept.append(w)

    for idx, part in enumerate(kept):
        # post-passes test the ORIGINAL token and overwrite the slot —
        # they deliberately do NOT compose (SentenceSegmentSplitter.java)
        out = part
        if part.startswith("<") and part.endswith(">") and len(part) > 2:
            out = part[1:-1]
        if part.startswith("'") and len(part) > 1:
            out = part[1:]
        if part.endswith("'") and len(part) > 1:
            out = part[:-1]
        p = part
        while p.endswith("."):
            p = p[:-1]
            out = p
        kept[idx] = out

    if max_length is not None and len(kept) > max_length:
        del kept[max_length:]
        del kept_seps[max_length:]
    return kept, kept_seps


# ---------------------------------------------------------------------------
# sentence detection + precleaning
# ---------------------------------------------------------------------------

import re

_SENT_BOUNDARY = re.compile(r"[.!?]+[\s]")
# non-capturing: Java Pattern.split never emits delimiters, but
# Python re.split DOES emit capturing groups
_PRECLEAN_SPLIT = re.compile(r" -|- |\|")

# Common English abbreviations that end in a period WITHOUT ending a
# sentence — the Punkt-style suppression list (public knowledge; the
# reference's OpenNLP SentenceDetectorME learns these statistically
# from its binary model, which cannot ship here).  Lowercased, no
# trailing dot.  Single capital letters (initials, "J. R. R. Tolkien")
# and internal-dot tokens ("e.g", "i.e", "u.s") are suppressed by
# shape, not by list.
_ABBREVIATIONS = frozenset(
    (
        "mr", "mrs", "ms", "dr", "prof", "rev", "hon", "st", "jr", "sr",
        "messrs", "mmes", "capt", "sgt", "col", "gen", "lt", "cmdr",
        "adm", "maj", "sen", "rep", "gov", "pres", "supt", "det",
        "vs", "etc", "al", "ca", "cf", "cp", "approx", "appt", "apt",
        "dept", "est", "min", "max", "misc", "no", "nos", "vol", "vols",
        "pp", "pg", "fig", "figs", "eq", "eqs", "sec", "secs", "ch",
        "chs", "ed", "eds", "trans", "univ", "assn", "bros", "inc",
        "ltd", "co", "corp", "mt", "mts", "ft", "ave", "blvd", "rd",
        "hwy", "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep",
        "sept", "oct", "nov", "dec", "mon", "tue", "tues", "wed", "thu",
        "thur", "thurs", "fri", "sat", "sun",
    )
)


def _suppress_boundary(text: str, dot_pos: int) -> bool:
    """True when the ``.`` at ``dot_pos`` ends an abbreviation rather
    than a sentence: the preceding token is a known abbreviation, a
    single-letter initial, or an internal-dot token (``e.g`` / ``U.S``)."""
    i = dot_pos
    while i > 0 and not text[i - 1].isspace():
        i -= 1
    tok = text[i:dot_pos]
    if not tok:
        return False
    if "." in tok:
        # e.g / i.e / U.S / a.m — but NOT "example.com" (a sentence can
        # legitimately end with a hostname): only short (<= 2 char)
        # final segments read as letter-dotted abbreviations
        if len(tok.rsplit(".", 1)[-1]) <= 2:
            return True
    if len(tok) == 1 and tok.isalpha() and tok.isupper():
        return True  # single-letter initial
    return tok.lower().lstrip("([\"'“‘") in _ABBREVIATIONS


def detect_sentences(text: str) -> list[str]:
    """Rule-based stand-in for OpenNLP SentenceDetectorME (see module
    docstring): a boundary after every ``[.!?]+`` run followed by
    whitespace, EXCEPT after a single ``.`` whose preceding token is an
    abbreviation / initial / internal-dot token (the Punkt-style
    suppression the binary ME model learns statistically).  The
    terminator stays with the left sentence, the whitespace is
    consumed; ``!``/``?`` and multi-dot runs always split."""
    out: list[str] = []
    start = 0
    for m in _SENT_BOUNDARY.finditer(text):
        if m.group(0)[:-1] == "." and _suppress_boundary(text, m.start()):
            continue
        out.append(text[start:m.end() - 1])
        start = m.end()
    if start < len(text):
        out.append(text[start:])
    return out


def preclean(sentences: list[str]) -> list[str]:
    """SentencePreCleaner.clean, quirks preserved: the counter counts
    non-blank INPUT sentences and breaks only once it EXCEEDS the cap
    (the post-split list may exceed it; the caller re-caps)."""
    count = 0
    out: list[str] = []
    for s in sentences:
        if not s.strip():
            continue
        count += 1
        if count - 1 > MAX_SENTENCE_COUNT:  # Java: sentenceCount++ > MAX
            break
        if "-" in s or "|" in s:
            out.extend(_PRECLEAN_SPLIT.split(s))
        else:
            out.append(s)
    return out


def normalize_spaces(s: str) -> str:
    return s.replace("\t", " ").replace("\n", " ")


def strip_possessive(s: str) -> str:
    if s.endswith("'"):
        return s[:-1]
    if s.endswith("'s") or s.endswith("'S"):
        return s[:-2]
    return s


# ---------------------------------------------------------------------------
# the sentence model (DocumentSentence.java)
# ---------------------------------------------------------------------------

_JUNK_EDGE = "\"'_*"


@dataclass
class Sentence:
    """DocumentSentence: parallel per-word arrays + bitsets."""

    words_lc: list[str]
    stemmed: list[str]
    pos_tags: list[int]
    seps: list[int]                 # SEP_SPACE / SEP_COMMA, per word
    html_tags: frozenset = frozenset()
    is_capitalized: list[bool] = field(default_factory=list)
    is_all_caps: list[bool] = field(default_factory=list)
    include_in_stemming: list[bool] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.words_lc)

    def next_comma_pos(self, pos: int) -> int:
        """separators.nextClearBit(pos): first index >= pos whose
        separator is COMMA, else the sentence length."""
        for j in range(pos, len(self.seps)):
            if self.seps[j] == SEP_COMMA:
                return j
        return len(self.seps)

    def construct_word_from_span(self, span: tuple) -> str:
        start, end = span
        if end - start == 1:
            return _trim_junk(self.words_lc[start])
        return _trim_junk("_".join(self.words_lc[start:end]))

    def construct_stemmed_word_from_span(self, span: tuple) -> str:
        start, end = span
        if end - start > 1:
            parts = [
                _normalize_joiner(self.stemmed[i])
                for i in range(start, end)
                if self.include_in_stemming[i]
            ]
            return "_".join(parts)
        if self.include_in_stemming[start]:
            return _normalize_joiner(self.stemmed[start])
        return ""


def _trim_junk(s: str) -> str:
    start, end = 0, len(s)
    while start < end and s[start] in _JUNK_EDGE:
        start += 1
    while end > start and s[end - 1] in _JUNK_EDGE:
        end -= 1
    return s[start:end] if (start > 0 or end < len(s)) else s


def _normalize_joiner(s: str) -> str:
    return s.replace("+", "_").replace(".", "_").replace("-", "_")


def _is_all_upper(s: str) -> bool:
    """StringUtils.isAllUpperCase: non-empty and every char an UPPERCASE
    LETTER (digits/punctuation fail)."""
    return bool(s) and all(c.isupper() for c in s)


# ---------------------------------------------------------------------------
# extractSentencesFromString (SentenceExtractor.java)
# ---------------------------------------------------------------------------

# html tags whose text is not natural language (HtmlTag.nonLanguage):
# only CODE among the included tags
NON_LANGUAGE_TAGS = frozenset((3,))  # T_CODE ordinal in functions/keywords.py


def make_sentence(
    tokens: list[str], seps: list[int], html_tags: frozenset = frozenset(),
    natural: bool = True,
) -> Sentence:
    """One DocumentSentence from pre-split tokens (the per-sentence body
    of extractSentencesFromString, both branches)."""
    n = len(tokens)
    if natural:
        pos_tags = tag_en_sentence(tokens)
        include = EN_INCLUSION_PATTERN.match_tag_pattern(pos_tags)
        words_lc = []
        stemmed = []
        is_cap = []
        is_all = []
        for t in tokens:
            is_cap.append(bool(t) and t[0].isupper())
            is_all.append(_is_all_upper(t))
            lc = strip_possessive(t.lower())
            words_lc.append(t if lc == t else lc)
            try:
                stemmed.append(porter_stem(t))
            except Exception:  # noqa: BLE001 — Java catches to "NN"
                stemmed.append("NN")
        return Sentence(
            words_lc, stemmed, pos_tags, list(seps), html_tags,
            is_cap, is_all, include,
        )
    words_lc = []
    is_cap = []
    is_all = []
    for t in tokens:
        is_cap.append(bool(t) and t[0].isupper())
        is_all.append(_is_all_upper(t))
        words_lc.append(t if t.islower() or not t else t.lower())
    return Sentence(
        words_lc, list(words_lc), [0] * n, list(seps), html_tags,
        is_cap, is_all, [True] * n,
    )


def _token_count(segment: str, cap: int) -> int:
    """len(split_segment_sep(segment, cap)[0]) without building the
    lists: same flatten + word-break scan + discard gate + cap, no
    post-passes (they rewrite tokens, never add or drop them) —
    equivalence pinned in tests/test_pos.py."""
    from .keywords import _WORD_BREAK, _is_discarded

    flat = flatten_unicode(segment)
    cnt = 0
    i = 0
    n = len(flat)
    while i <= n:
        m = _WORD_BREAK.search(flat, i)
        if not m:
            if not _is_discarded(flat[i:]):
                cnt += 1
            break
        if i != m.start():
            if not _is_discarded(flat[i:m.start()]):
                cnt += 1
                if cnt >= cap:
                    return cap
        if m.end() == i:
            i += 1
        else:
            i = m.end()
    return min(cnt, cap)


def sentence_token_counts(texts) -> tuple[int, int]:
    """``dld.totalNumWords() / numSentences()`` without tags or stems
    (token counts depend on neither) — the light path for the
    converter's length gate and the asl metadata nibble
    (DocumentLengthLogic.java:17-31).  ``texts`` iterates the document's
    tagged strings; every extracted sentence counts, including
    zero-token ones (DocumentLanguageData counts sentence OBJECTS)."""
    total = 0
    nsent = 0
    for text in texts:
        if len(text) > 50_000:
            text = text[:50_000]
        text = normalize_spaces(text)
        sents = preclean(detect_sentences(text))
        if len(sents) > MAX_SENTENCE_COUNT:
            sents = sents[:MAX_SENTENCE_COUNT]
        for s in sents:
            nsent += 1
            total += _token_count(s, MAX_SENTENCE_LENGTH)
    return total, nsent


def extract_sentences_from_string(
    text: str, html_tags: frozenset = frozenset()
) -> list[Sentence]:
    """extractSentencesFromString: truncate 50k chars, normalize spaces,
    detect + preclean + cap, split each sentence (250-word cap), build
    the natural-language or non-language Sentence."""
    if len(text) > 50_000:
        text = text[:50_000]
    text = normalize_spaces(text)
    sentences = preclean(detect_sentences(text))
    if len(sentences) > MAX_SENTENCE_COUNT:
        sentences = sentences[:MAX_SENTENCE_COUNT]
    natural = not (html_tags & NON_LANGUAGE_TAGS)
    out: list[Sentence] = []
    for sent in sentences:
        tokens, seps = split_segment_sep(sent, MAX_SENTENCE_LENGTH)
        out.append(make_sentence(tokens, seps, html_tags, natural))
    return out
