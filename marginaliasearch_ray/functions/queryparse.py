"""Search-query parsing — the reference's query-service front end.

Faithful re-expression of QueryParser
(functions/search-query/.../query_parser/QueryParser.java) and the spec
assembly in QueryFactory.createQuery (QueryFactory.java:46-260):
tokenization (quotes, parens, ``-``, ``?``, escape handling), the
transform chain (literal trimming, quote joining, negation, priority,
special operators, parenthesized advice, site: normalization), and the
fold into a search specification (include/exclude/advice/priority terms,
phrase constraints, site: domain, year/size/rank/quality limits,
query strategy, search set).

Deviations (documented):
- ``flattenUnicode`` (language-specific unicode flattening) is NFKC;
  the fixture queries are ASCII so the choice is unobservable here.
- QueryExpansion (ngram segmentation against the term-frequency dict +
  stemmed-pair coherence constraints) requires the OpenNLP language
  models, stubbed by declaration like SentenceExtractor; the compiled
  query is the plain term list.
- site: domain-id lookups (DbDomainQueries) have no DB here; the spec
  carries the domain string itself.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

# WordPatterns.java:6-9
MIN_WORD_LENGTH = 1
MAX_WORD_LENGTH = 64
WORD_TOKEN_JOINER = "_"

_NOISE_RE = re.compile(r"[,\s]")
_WS_RE = re.compile(r"\s+")


def _has_more_than_n(s: str, c: str, maxn: int) -> bool:
    """WordPatterns.hasMoreThanN (java:41-49): true when c occurs more
    than maxn times before the final position."""
    idx = 0
    for _ in range(maxn + 1):
        idx = s.find(c, idx + 1)
        if idx < 0 or idx >= len(s) - 1:
            return False
    return True


def is_not_junk_word(word: str) -> bool:
    """WordPatterns.isNotJunkWord (java:13-39)."""
    if not word.strip():
        return False
    if _has_more_than_n(word, "-", 4):
        return False
    if _has_more_than_n(word, "+", 2):
        return False
    if word.startswith("-") or word.endswith("-"):
        return False
    digits = 0
    for ch in word:
        if ch.isdigit():
            digits += 1
        if digits > 16:
            return False
    return True


def is_stop_word(s: str) -> bool:
    """WordPatterns.isStopWord (java:53-59): stopword exclusion moved to
    the index; only the junk filter remains."""
    return not is_not_junk_word(s)


def is_discarded_by_tokenizer(word: str) -> bool:
    """WordPatterns.isDiscardedByTokenizer (java:66-78)."""
    if not word.strip():
        return True
    if len(word) >= MAX_WORD_LENGTH:
        return True
    return all(c in "/*-" for c in word)


def trim_phrase_stop_words(parts: list[str]) -> list[str]:
    """SearchPhraseConstraint.trimStopWords (api/.../SearchPhraseConstraint
    .java:57-79, pinned by SearchPhraseConstraintTest): tokenizer-discarded
    tokens are removed outright, stop words become "" placeholders (a
    wildcard position in the adjacency check), and leading/trailing
    placeholders are trimmed."""
    ret: list[str] = []
    for term in parts:
        if is_discarded_by_tokenizer(term):
            continue
        ret.append("" if is_stop_word(term) else term)
    while ret and ret[0] == "":
        ret.pop(0)
    while ret and ret[-1] == "":
        ret.pop()
    return ret


# ---------------------------------------------------------------------------
# tokens: (kind, str, display)
# ---------------------------------------------------------------------------

LPAREN = "lparen"
RPAREN = "rparen"
QUOT = "quot"
MINUS = "minus"
QMARK = "qmark"
LITERAL = "literal"
QUOT_TERM = "quot_term"
EXCLUDE = "exclude"
EXCLUDE_PHRASE = "exclude_phrase"
PRIORITY = "priority"
ADVICE = "advice"
QUALITY = "quality"
YEAR = "year"
SIZE = "size"
RANK = "rank"
QS = "qs"
SET_TERM = "set"
LANG = "lang"
NEAR = "near"


@dataclass
class Tok:
    kind: str
    s: str = ""
    display: str = ""
    limit: tuple[str, int] | None = None  # ('=', v) / ('<', v) / ('>', v)


def _trim_escape(s: str) -> str:
    """QueryParser.trimEscape (java:104-123)."""
    if "\\" not in s:
        return s
    out = []
    j = 0
    while j < len(s):
        c = s[j]
        if c == "\\":
            if j + 1 < len(s):
                out.append(s[j + 1])
                j += 1
        else:
            out.append(c)
        j += 1
    return "".join(out)


def tokenize_query(raw: str) -> list[Tok]:
    """QueryParser.tokenizeQuery (java:33-102)."""
    query = unicodedata.normalize("NFKC", raw)
    query = _NOISE_RE.sub(" ", query)
    tokens: list[Tok] = []
    paren_depth = 0
    i = 0
    n = len(query)
    while i < n:
        chr_ = query[i]
        if chr_ == "(":
            paren_depth += 1
            tokens.append(Tok(LPAREN, "(", "("))
        elif chr_ == ")":
            paren_depth -= 1
            tokens.append(Tok(RPAREN, ")", ")"))
        elif chr_ == '"':
            end = query.find('"', i + 1)
            if end == -1:
                end = n
            inner = query[i + 1 : end].lower()
            tokens.append(Tok(QUOT, inner, '"' + inner + '"'))  # Quot.displayStr
            i = end
        elif chr_ == "-":
            tokens.append(Tok(MINUS, "-", "-"))
        elif chr_ == "?":
            tokens.append(Tok(QMARK, "?", "?"))
        elif not chr_.isspace():
            # scan to the end of the term, honoring escapes and the
            # trailing-rparen special case (java:73-91)
            end = i + 1
            prev_c = ""
            c = ""
            while end < n:
                prev_c, c = c, query[end]
                if prev_c == "\\":
                    end += 1
                    continue
                if c == " ":
                    break
                if c == ")" and prev_c != "(" and paren_depth > 0:
                    break
                end += 1
            display = query[i:end]
            tokens.append(Tok(LITERAL, _trim_escape(display.lower()), display))
            i = end - 1
        i += 1
    return tokens


def _trim_literals(t: Tok) -> Tok | None:
    """QueryParser.trimLiterals (java:146-181): returns None to drop."""
    if t.kind != LITERAL:
        return t
    s = t.s
    if not s.strip():
        return t
    if s and s[-1] in ":.,!?$'":
        s = s[:-1]
    if s.endswith("'s"):
        s = s[:-2]
    if s.endswith("()"):
        s = s[:-2]
    while s.startswith("$") or s.startswith("_"):
        s = s[1:]
    if not s.strip():
        return None
    return Tok(LITERAL, s, t.display)


_QUALITY_RE = re.compile(r"q[=><]\d+$")
_YEAR_RE = re.compile(r"year[=><]\d{4}$")
_SIZE_RE = re.compile(r"size[=><]\d+$")
_RANK_RE = re.compile(r"rank[=><]\d+$")
_ADVICE_PREFIXES = (
    "site:", "format:", "file:", "tld:", "ip:", "as:", "asn:", "generator:",
)


def _parse_limit(s: str) -> tuple[str, int]:
    """QueryParser.parseSpecificationLimit (java:262-275)."""
    return (s[0], int(s[1:]))


def _special_op(t: Tok) -> Tok:
    """QueryParser.handleSpecialOperations (java:218-259)."""
    if t.kind != LITERAL:
        return t
    s = t.s
    if s.startswith("q") and _QUALITY_RE.fullmatch(s):
        return Tok(QUALITY, s, s, _parse_limit(s[1:]))
    if s.startswith("near:"):
        return Tok(NEAR, s[5:], s)
    if s.startswith("lang:"):
        return Tok(LANG, s[5:], s)
    if s.startswith("set:"):
        return Tok(SET_TERM, s[4:], s)
    if s.startswith("year") and _YEAR_RE.fullmatch(s):
        return Tok(YEAR, s, s, _parse_limit(s[4:]))
    if s.startswith("size") and _SIZE_RE.fullmatch(s):
        return Tok(SIZE, s, s, _parse_limit(s[4:]))
    if s.startswith("rank") and _RANK_RE.fullmatch(s):
        return Tok(RANK, s, s, _parse_limit(s[4:]))
    if s.startswith("qs="):
        return Tok(QS, s[3:], s)
    if s.startswith(_ADVICE_PREFIXES):
        return Tok(ADVICE, s, t.display)
    return t


def parse_query_tokens(raw: str) -> list[Tok]:
    """QueryParser.parse (java:15-29): the full transform chain."""
    toks = tokenize_query(raw)

    # transformEach trimLiterals
    toks = [x for x in (_trim_literals(t) for t in toks) if x is not None]

    # transformEach handleQuoteTokens
    toks = [
        Tok(QUOT_TERM, _WS_RE.sub(WORD_TOKEN_JOINER, t.s), t.display)
        if t.kind == QUOT
        else t
        for t in toks
    ]

    # transformEachPair createNegatedTerms
    out: list[Tok] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        tn = toks[i + 1] if i + 1 < len(toks) else None
        if t.kind == MINUS and tn is not None and tn.kind in (LITERAL, ADVICE):
            out.append(Tok(EXCLUDE, tn.s, "-" + tn.display))
            i += 2
            continue
        if t.kind == MINUS and tn is not None and tn.kind == QUOT_TERM:
            out.append(Tok(EXCLUDE_PHRASE, tn.s, "-" + tn.display))
            i += 2
            continue
        out.append(t)
        i += 1
    toks = out

    # transformEachPair createPriorityTerms
    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        tn = toks[i + 1] if i + 1 < len(toks) else None
        if t.kind == QMARK and tn is not None and tn.kind in (
            LITERAL, ADVICE, QUOT_TERM,
        ):
            out.append(Tok(PRIORITY, tn.s, "?" + tn.display))
            i += 2
            continue
        out.append(t)
        i += 1
    toks = out

    # transformEach handleSpecialOperations
    toks = [_special_op(t) for t in toks]

    # scanAndTransform LParen..RParen: handleAdvisoryTerms (java:277-287)
    out = []
    in_paren = False
    for t in toks:
        if t.kind == LPAREN:
            in_paren = True
            continue
        if t.kind == RPAREN:
            in_paren = False
            continue
        if in_paren and t.kind == LITERAL:
            out.append(Tok(ADVICE, t.s, "(" + t.display + ")"))
        else:
            out.append(t)
    toks = out

    # normalizeDomainName (java:125-136): literal site: terms lowercase —
    # a no-op after handleSpecialOperations made them advice terms, kept
    # for parity with the reference chain
    toks = [
        Tok(LITERAL, t.s.lower(), t.display)
        if t.kind == LITERAL and t.s.startswith("site:")
        else t
        for t in toks
    ]
    return toks


# ---------------------------------------------------------------------------
# QueryFactory.createQuery spec assembly
# ---------------------------------------------------------------------------

MAX_QUERY_TOKENS = 12  # QueryFactory.java:64
MAX_QUERY_WORDS = 32  # QueryFactory.java:253

_QS_STRATEGIES = {
    "RF_TITLE": "REQUIRE_FIELD_TITLE",
    "RF_SUBJECT": "REQUIRE_FIELD_SUBJECT",
    "RF_SITE": "REQUIRE_FIELD_SITE",
    "RF_URL": "REQUIRE_FIELD_URL",
    "RF_DOMAIN": "REQUIRE_FIELD_DOMAIN",
    "SENTENCE": "SENTENCE",
    "TOPIC": "TOPIC",
}


@dataclass
class ParsedQuery:
    human_query: str
    include: list[str] = field(default_factory=list)
    exclude: list[str] = field(default_factory=list)
    require: list[str] = field(default_factory=list)  # advice terms
    priority: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)  # mandatory
    domain: str = ""
    quality: str = ""  # '' or e.g. '<5'
    year: str = ""
    size: str = ""
    rank: str = ""
    strategy: str = "AUTO"
    search_set: str = ""
    problems: list[str] = field(default_factory=list)


def _count_words(toks: list[Tok]) -> int:
    """QueryFactory.countWords (java:255-261)."""
    return sum(1 + t.s.count("_") for t in toks)


def _analyze(problems: list[str], s: str, display: str) -> None:
    """QueryFactory.analyzeSearchTerm (java:264-274)."""
    if len(s) < MIN_WORD_LENGTH:
        problems.append(f'Search term "{display}" too short')
    if "_" not in s and len(s) >= MAX_WORD_LENGTH:
        problems.append(f'Search term "{display}" too long')


def _limit_str(limit: tuple[str, int] | None) -> str:
    return f"{limit[0]}{limit[1]}" if limit else ""


def parse_query(raw: str) -> ParsedQuery:
    """QueryFactory.createQuery (java:46-260) minus the DB/expansion
    dependencies — the token fold into a SearchSpecification."""
    pq = ParsedQuery(human_query=raw)
    if len(raw) > 1000:
        pq.problems.append("Query too long")
        return pq

    toks = parse_query_tokens(raw)
    if len(toks) >= MAX_QUERY_TOKENS or _count_words(toks) > MAX_QUERY_WORDS:
        pq.problems.append("Your search query is too long")
        toks = []

    for t in toks:
        if t.kind == QUOT_TERM:
            _analyze(pq.problems, t.s, t.display)
            parts = [p for p in t.s.split("_") if p]
            parts = [
                p[:-2] if p.endswith("'s") and len(p) > 2 else p for p in parts
            ]
            searchable = [
                p
                for p in parts
                if not is_stop_word(p) and not is_discarded_by_tokenizer(p)
            ]
            if len(parts) > 1:
                pq.phrases.append(trim_phrase_stop_words(parts))
                pq.include.extend(searchable)
                pq.priority.append(t.s)
            elif searchable:
                pq.include.append(searchable[0])
        elif t.kind == LITERAL:
            _analyze(pq.problems, t.s, t.display)
            pq.include.append(t.s)
        elif t.kind == EXCLUDE:
            pq.exclude.append(t.s)
        elif t.kind == EXCLUDE_PHRASE:
            pq.exclude.extend(p for p in t.s.split("_") if p)
        elif t.kind == PRIORITY:
            pq.priority.append(t.s)
        elif t.kind == ADVICE:
            if t.s.startswith("site:*."):
                pq.domain = t.s[len("site:*.") :]
                pq.require.append("site:" + pq.domain)
            elif t.s.startswith("site:"):
                pq.domain = t.s[len("site:") :]
                if len(toks) == 1:
                    pq.require.append("site:" + pq.domain)
            else:
                pq.require.append(t.s)
        elif t.kind == YEAR:
            pq.year = _limit_str(t.limit)
        elif t.kind == SIZE:
            pq.size = _limit_str(t.limit)
        elif t.kind == RANK:
            pq.rank = _limit_str(t.limit)
        elif t.kind == QUALITY:
            pq.quality = _limit_str(t.limit)
        elif t.kind == QS:
            pq.strategy = _QS_STRATEGIES.get(t.s.upper(), "AUTO")
        elif t.kind == SET_TERM:
            pq.search_set = t.s.upper()
        # LANG / NEAR: no-op (QueryFactory.java:176-178)
    # SearchQuery.promoteNonRankingTerms (SearchQuery.java:221-227): with
    # no ranking terms, advice terms become the ranking terms.  The site:
    # dummy term stays in ``require`` here — this engine's site-only
    # enumeration runs through the source-column filter (the observable
    # equivalent of ranking by the constant dummy term), so only PLAIN
    # advice terms promote.
    plain_require = [t for t in pq.require if not t.startswith("site:")]
    if not pq.include and plain_require:
        pq.include.extend(plain_require)
        pq.require = [t for t in pq.require if t.startswith("site:")]
    return pq
