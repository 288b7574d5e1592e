"""Query expansion — QWordGraph variants and the greedy path renderer.

Faithful re-expression of the search-query service's expansion layer:

- ``QWord`` / ``QWordGraph`` — functions/search-query/.../query_parser/
  model/QWord.java:5-65, QWordGraph.java:16-278: a DAG of query words
  between beg/end sentinels, with variant insertion (same-span parallel
  edges), original-word iteration, forward/reverse reachability and the
  partial-order topological sort (SetMembershipComparator, TimSort on
  ord-ascending input — Python's sorted() IS TimSort, so the permutation
  matches).
- ``list_paths`` — QWordGraphPathLister.java:14-70 (MAX_PATHS=16, junk
  "stopwords" excluded from paths).
- ``render`` — QWordPathsRenderer.java:9-187: the greedy common-word
  factoring into an infix ``a ( b | c ) d`` expression.  DOCUMENTED
  DEVIATION: where the upstream breaks commonality ties through HashMap
  iteration order (its own test suite tags the affected case @flaky),
  we break ties by smallest word ordinal — which reproduces the
  upstream's expected strings on every test vector it pins.
- expansion strategies — QueryExpansion.java:50-243: joinDashes,
  splitWordNum (DEAD CODE upstream: ``matcher.matches()`` full-matches
  a 2-char pattern and then splits on a dash the word cannot contain —
  reproduced faithfully), joinTerms (term-frequency-dict coherence
  check + alpha⨯numeric joins), nounPluralFormsEN, categoryKeywords,
  joinerVariants ("vs" bridging), ngramAll, createSegments (ngram
  lexicon segmentation) and listFullConstraints.
- ``NgramLexicon`` — segmentation/NgramLexicon.java:21-213 +
  HasherGroup.java:8-61: rolling ordered hash (rotl1 ^
  hashNearlyASCII) over stemmed parts, sliding-window segment search;
  built from multi-word page titles like NgramExtractorMain.java:19-155
  (trailing parenthetical/``list of ``/punctuation cleanup, <=64 chars).

Data dependencies are injected: the term-frequency dict is a callable
(stem -> count; TermFrequencyDict.getTermFreqStemmed), the lexicon a
plain hash->count mapping, noun variants a word->list mapping (upstream
ships a 1M-entry noun_list.csv resource; callers supply their own —
the driver query derives everything from the corpus).

Stemming uses the repo-wide Porter implementation (ca.rmen's
PorterStemmer upstream is the same classic algorithm).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import cmp_to_key
from typing import Callable, Iterable, Mapping

from .hashing import hash_nearly_ascii
from .keywords import is_stop_word
from .stem import porter_stem

_BEG_MARKER = " ^ "
_END_MARKER = " $ "
_BEG_ORD = -(1 << 31)
_END_ORD = (1 << 31) - 1

MAX_PATHS = 16  # QWordGraphPathLister.java:18


@dataclass(frozen=True)
class QWord:
    """QWord.java:5-65 — identity is the ordinal."""

    ord: int
    variant: bool
    stemmed: str
    word: str
    original: str

    def is_beg(self) -> bool:
        return self.word == _BEG_MARKER

    def is_end(self) -> bool:
        return self.word == _END_MARKER

    def is_original(self) -> bool:
        return not self.variant

    def __eq__(self, other) -> bool:
        return isinstance(other, QWord) and self.ord == other.ord

    def __hash__(self) -> int:
        return hash(self.ord)


def _beg() -> QWord:
    return QWord(_BEG_ORD, False, _BEG_MARKER, _BEG_MARKER, _BEG_MARKER)


def _end() -> QWord:
    return QWord(_END_ORD, False, _END_MARKER, _END_MARKER, _END_MARKER)


class QWordGraph:
    """QWordGraph.java:16-278."""

    def __init__(self, words: Iterable[str]):
        self._links: list[tuple[QWord, QWord]] = []
        self._from_to: dict[int, list[QWord]] = {}
        self._to_from: dict[int, list[QWord]] = {}
        self._word_id = 0

        prev = _beg()
        for s in words:
            w = QWord(self._word_id, False, porter_stem(s), s, s)
            self._word_id += 1
            self.add_link(prev, w)
            prev = w
        self.add_link(prev, _end())

    def add_link(self, frm: QWord, to: QWord) -> None:
        self._links.append((frm, to))
        self._from_to.setdefault(frm.ord, []).append(to)
        self._to_from.setdefault(to.ord, []).append(frm)

    def add_variant(self, original: QWord, word: str) -> None:
        # java:45-56 — skip if a sibling already carries this surface
        if any(w.word == word for w in self.get_variants(original)):
            return
        new = QWord(self._word_id, True, porter_stem(word), word, original.original)
        self._word_id += 1
        for prev in self.get_prev(original):
            self.add_link(prev, new)
        for nxt in self.get_next(original):
            self.add_link(new, nxt)

    def add_variant_for_span(self, first: QWord, last: QWord, word: str) -> None:
        new = QWord(self._word_id, True, porter_stem(word), word, first.original)
        self._word_id += 1
        for prev in self.get_prev(first):
            self.add_link(prev, new)
        for nxt in self.get_next(last):
            self.add_link(new, nxt)

    def get_variants(self, original: QWord) -> list[QWord]:
        prev_next = {
            n.ord for p in self.get_prev(original) for n in self.get_next(p)
        }
        out = []
        seen = set()
        for nxt in self.get_next(original):
            for p in self.get_prev(nxt):
                if p.ord in prev_next and p.ord not in seen:
                    seen.add(p.ord)
                    out.append(p)
        return out

    def get_next(self, w: QWord) -> list[QWord]:
        return self._from_to.get(w.ord, [])

    def get_next_original(self, w: QWord) -> list[QWord]:
        return [n for n in self.get_next(w) if n.is_original()]

    def get_prev(self, w: QWord) -> list[QWord]:
        return self._to_from.get(w.ord, [])

    def get_prev_original(self, w: QWord) -> list[QWord]:
        return [p for p in self.get_prev(w) if p.is_original()]

    def nodes(self) -> list[QWord]:
        seen: dict[int, QWord] = {}
        for a, b in self._links:
            seen.setdefault(a.ord, a)
            seen.setdefault(b.ord, b)
        return [seen[k] for k in sorted(seen)]

    def node(self, word: str) -> QWord:
        for n in self.nodes():
            if n.word == word:
                return n
        raise KeyError(word)

    def __iter__(self):
        # java:249-277 — walk the ORIGINAL spine from beg
        pos = _beg()
        while True:
            nxt = self.get_next_original(pos)[0]
            if nxt.is_end():
                return
            pos = nxt
            yield pos

    def forward_reachability(self) -> dict[QWord, set[QWord]]:
        ret: dict[QWord, set[QWord]] = {}
        edge: set[QWord] = {_beg()}
        visited: set[QWord] = set()
        while edge:
            nxt: set[QWord] = set()
            for w in edge:
                for n in self.get_next(w):
                    s = ret.setdefault(n, set())
                    s.add(w)
                    s.update(ret.get(w, set()))
                    nxt.add(n)
            nxt -= visited
            visited |= nxt
            edge = nxt
        return ret

    def reverse_reachability(self) -> dict[QWord, set[QWord]]:
        ret: dict[QWord, set[QWord]] = {}
        edge: set[QWord] = {_end()}
        visited: set[QWord] = set()
        while edge:
            prv: set[QWord] = set()
            for w in edge:
                for p in self.get_prev(w):
                    s = ret.setdefault(p, set())
                    s.add(w)
                    s.update(ret.get(w, set()))
                    prv.add(p)
            prv -= visited
            visited |= prv
            edge = prv
        return ret

    def reachability(self) -> "ReachabilityData":
        fwd = self.forward_reachability()
        rev = self.reverse_reachability()
        nodes = self.nodes()

        def cmp(a: QWord, b: QWord) -> int:
            a_after_b = b in fwd.get(a, set())
            b_after_a = a in fwd.get(b, set())
            return (1 if a_after_b else 0) - (1 if b_after_a else 0)

        nodes.sort(key=cmp_to_key(cmp))
        order = {n: i for i, n in enumerate(nodes)}
        return ReachabilityData(nodes, order, fwd, rev)

    def compile_to_query(self) -> str:
        return render(self)


@dataclass
class ReachabilityData:
    sorted_nodes: list[QWord]
    sort_order: dict[QWord, int]
    forward: dict[QWord, set[QWord]]
    reverse: dict[QWord, set[QWord]]

    def topo_key(self, w: QWord) -> tuple[int, int]:
        return (self.sort_order[w], w.ord)


# ---------------------------------------------------------------------------
# Path listing (QWordGraphPathLister.java)
# ---------------------------------------------------------------------------


def list_paths(graph: QWordGraph) -> list[frozenset[QWord]]:
    """All beg→end paths as node sets, junk words excluded, capped at
    MAX_PATHS; deduplicated (upstream returns a Set)."""
    acc: list[frozenset[QWord]] = []
    seen: set[frozenset[QWord]] = set()
    stack: list[QWord] = []

    def walk(start: QWord) -> None:
        if len(seen) >= MAX_PATHS:
            return
        stop = is_stop_word(start.word)
        if not stop:
            stack.append(start)
        if start.is_end():
            nodes = frozenset(
                w for w in stack if not (w.is_beg() or w.is_end())
            )
            if nodes not in seen:
                seen.add(nodes)
                acc.append(nodes)
        else:
            for nxt in graph.get_next(start):
                walk(nxt)
        if not stop:
            stack.pop()

    walk(_beg())
    return acc


# ---------------------------------------------------------------------------
# Rendering (QWordPathsRenderer.java)
# ---------------------------------------------------------------------------


def _is_token_allowed(s: str) -> bool:
    return s not in ("(", ")")


def _node_commonality(paths: list[frozenset[QWord]]) -> dict[QWord, int]:
    c: dict[QWord, int] = {}
    for p in paths:
        for w in p:
            c[w] = c.get(w, 0) + 1
    return c


def _most_common(paths: list[frozenset[QWord]]) -> QWord:
    # DEVIATION (documented): ties by smallest ord; upstream is HashMap
    # iteration order (flagged @flaky in its own tests).
    c = _node_commonality(paths)
    return max(c.items(), key=lambda kv: (kv[1], -kv[0].ord))[0]


def _render_paths(
    paths_in: Iterable[frozenset[QWord]], reach: ReachabilityData
) -> str:
    paths = []
    pset = set()
    for p in paths_in:
        if p and p not in pset:
            pset.add(p)
            paths.append(p)

    if len(paths) == 1:
        words = sorted(paths[0], key=reach.topo_key)
        return " ".join(w.word for w in words if _is_token_allowed(w.word))

    commonality = _node_commonality(paths)
    common_to_all = [w for w, v in commonality.items() if v == len(paths)]
    not_common = {w for w, v in commonality.items() if v != len(paths)}

    parts: list[str] = []

    if common_to_all:
        common_to_all.sort(key=reach.topo_key)

        divergent_rendered = ""
        divergent_pos = None
        if not_common:
            non_overlapping = []
            has_empty_projection = False
            for p in paths:
                np = frozenset(w for w in p if w in not_common)
                if not np:
                    has_empty_projection = True
                    continue
                non_overlapping.append(np)
            if non_overlapping:
                inner = _render_paths(non_overlapping, reach)
                divergent_rendered = (
                    "( " + inner + " | )" if has_empty_projection else inner
                )
                divergent_pos = min(reach.sort_order[w] for w in not_common)

        divergent_emitted = divergent_rendered == ""
        for w in common_to_all:
            if (
                not divergent_emitted
                and reach.sort_order[w] >= divergent_pos
            ):
                parts.append(divergent_rendered)
                divergent_emitted = True
            parts.append(w.word)
        if not divergent_emitted:
            parts.append(divergent_rendered)
    elif len(commonality) > 1:
        by_common: list[tuple[QWord, list[frozenset[QWord]]]] = []
        remaining = list(paths)
        while remaining:
            mc = _most_common(remaining)
            bucket: list[frozenset[QWord]] = []
            still = []
            for p in remaining:
                if mc in p:
                    bucket.append(frozenset(w for w in p if w != mc))
                else:
                    still.append(p)
            by_common.append((mc, bucket))
            remaining = still
        by_common.sort(key=lambda kv: reach.topo_key(kv[0]))
        branches = [
            kv[0].word + " " + _render_paths(kv[1], reach) for kv in by_common
        ]
        parts.append(
            " ( "
            + " | ".join(b for b in branches if _is_token_allowed(b))
            + " ) "
        )

    return re.sub(r"\s+", " ", " ".join(parts)).strip()


def render(graph: QWordGraph) -> str:
    return _render_paths(list_paths(graph), graph.reachability())


# ---------------------------------------------------------------------------
# Ngram lexicon (segmentation/NgramLexicon.java + HasherGroup.java)
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    r &= 63
    return ((x << r) | (x >> (64 - r))) & _M64 if r else x


def ordered_hash_apply(acc: int, add: int) -> int:
    """HasherGroup.OrderedHasher.apply (java:53-55)."""
    return _rotl64(acc, 1) ^ add


def ordered_hash_replace(acc: int, add: int, rem: int, n: int) -> int:
    """HasherGroup.OrderedHasher.replace (java:57-59)."""
    return _rotl64(acc, 1) ^ add ^ _rotl64(rem, n)


def term_hash(term: str) -> int:
    """HasherGroup.hash (java:36-38) — unsigned view of the murmur."""
    return hash_nearly_ascii(term) & _M64


def rolling_ordered_hash(parts: Iterable[str]) -> int:
    code = 0
    for p in parts:
        code = ordered_hash_apply(code, term_hash(p))
    return code


def find_segment_offsets(
    counts: Mapping[int, int], length: int, parts: list[str]
) -> list[tuple[int, int, int]]:
    """NgramLexicon.findSegmentOffsets (java:105-142): sliding ordered
    rolling hash over already-stemmed ``parts``; returns
    (start, length, count) per lexicon hit."""
    if len(parts) < length:
        return []
    hashes = [term_hash(p) for p in parts]
    out: list[tuple[int, int, int]] = []
    h = 0
    i = 0
    for i in range(length):
        h = ordered_hash_apply(h, hashes[i])
    i = length
    while True:
        ct = counts.get(h, 0)
        if ct > 0:
            out.append((i - length, length, ct))
        if i < len(hashes):
            h = ordered_hash_replace(h, hashes[i], hashes[i - length], length)
            i += 1
        else:
            break
    return out


_TRAIL_PUNCT = (".", ",", ":", ";")


def clean_ngram_terms(terms: list[str]) -> list[str]:
    """NgramExtractorMain.cleanTerms (java:60-101)."""
    out = []
    for s in terms:
        if s.endswith(")"):
            idx = s.rfind("(")
            if idx > 0:
                s = s[:idx].strip()
        if s.startswith("list of "):
            s = s[len("list of ") :]
        if s.endswith(_TRAIL_PUNCT):
            s = s[:-1]
        if " " not in s:
            continue
        if len(s) > 64:
            continue
        out.append(s)
    return out


def title_lexicon_hashes(title: str) -> list[int]:
    """The per-title lexicon contribution (NgramExtractorMain.java:
    119-131): normalize underscores, keep multi-word titles, clean,
    stem parts, one ordered rolling hash per cleaned term."""
    normalized = title.replace("_", " ")
    terms = []
    if " " in normalized:
        terms.append(normalized.lower())
    return [
        rolling_ordered_hash([porter_stem(p) for p in t.split(" ") if p])
        for t in clean_ngram_terms(terms)
    ]


# ---------------------------------------------------------------------------
# Expansion strategies (QueryExpansion.java)
# ---------------------------------------------------------------------------

_NUM_WORD_BOUNDARY = re.compile(r"[0-9][a-zA-Z]|[a-zA-Z][0-9]")


def _join_dashes(graph: QWordGraph) -> None:
    for qw in list(graph):
        if "-" in qw.word:
            graph.add_variant(qw, "".join(qw.word.split("-")))


def _split_word_num(graph: QWordGraph) -> None:
    # java:106-114 — DEAD CODE upstream, reproduced: matches() requires
    # the FULL word to match the 2-char boundary pattern, and the value
    # added is the dash-split rejoin of a word that cannot contain a
    # dash, i.e. the word itself, which add_variant always skips.
    for qw in list(graph):
        if _NUM_WORD_BOUNDARY.fullmatch(qw.word):
            graph.add_variant(qw, "-".join(qw.word.split("-")))


def _join_terms(graph: QWordGraph, term_freq: Callable[[str], int]) -> None:
    prev: QWord | None = None
    for qw in list(graph):
        if prev is not None:
            joined = prev.word + qw.word
            score_a = term_freq(prev.stemmed)
            score_b = term_freq(qw.stemmed)
            score_combo = term_freq(porter_stem(joined))
            if score_combo > score_a + score_b or score_combo > 1000:
                graph.add_variant_for_span(prev, qw, joined)
            elif (
                prev.word
                and qw.word
                and all(c.isalpha() for c in prev.word)
                and all(c.isdigit() for c in qw.word)
            ):
                graph.add_variant_for_span(prev, qw, prev.word + qw.word)
                graph.add_variant_for_span(prev, qw, prev.word + "-" + qw.word)
        prev = qw


def _noun_plural_forms_en(
    graph: QWordGraph, noun_variants: Mapping[str, list[str]]
) -> None:
    for part in list(graph.get_prev(_end())):
        for variant in noun_variants.get(part.word, []):
            graph.add_variant(part, variant)


def _category_keywords(graph: QWordGraph) -> None:
    subs = {
        "recipe": "category:food",
        "recipes": "category:food",
        "forum": "generator:forum",
        "wiki": "generator:wiki",
    }
    for qw in list(graph):
        if not graph.get_next_original(qw)[0].is_end():
            continue
        v = subs.get(qw.word)
        if v is not None:
            graph.add_variant(qw, v)


def _joiner_variants(graph: QWordGraph) -> None:
    for qw in list(graph):
        if graph.get_next_original(qw)[0].is_end():
            continue
        if graph.get_prev_original(qw)[0].is_beg():
            continue
        if qw.word == "vs":
            graph.add_link(
                graph.get_prev_original(qw)[0], graph.get_next_original(qw)[0]
            )
            graph.add_variant(qw, "and")


def _ngram_all(graph: QWordGraph) -> None:
    parts = [qw for qw in graph]
    if len(parts) > 1:
        graph.add_variant_for_span(
            parts[0], parts[-1], "_".join(q.word for q in parts)
        )


def create_segments(
    graph: QWordGraph, lexicon_counts: Mapping[int, int]
) -> list[list[str]]:
    """QueryExpansion.createSegments (java:202-243): lexicon ngrams of
    length 2..min(10, n)-1 over the stemmed original spine become span
    variants; returns the word-level segment constraints (sorted here —
    upstream emits HashSet order)."""
    nodes = list(graph)
    if len(nodes) <= 1:
        return []
    words = [n.stemmed for n in nodes]
    all_segments: list[tuple[int, int, int]] = []
    for length in range(2, min(10, len(words))):
        all_segments.extend(find_segment_offsets(lexicon_counts, length, words))
    all_segments.sort(key=lambda s: s[0])

    constraints: set[tuple[str, ...]] = set()
    for start, length, _ct in all_segments:
        end = start + length
        components = [nodes[i].word for i in range(start, end)]
        constraints.add(tuple(components))
        graph.add_variant_for_span(
            nodes[start], nodes[end - 1], "_".join(components)
        )
    return [list(c) for c in sorted(constraints)]


def list_full_constraints(graph: QWordGraph) -> list[list[str]]:
    """QueryExpansion.listFullConstraints (java:247-283), sorted here —
    upstream emits path-set iteration order."""
    paths = list_paths(graph)
    reach = graph.reachability()
    result: set[tuple[str, ...]] = set()
    for path in paths:
        words = [w.word for w in sorted(path, key=reach.topo_key)]
        if len(words) < 2:
            continue
        if any("_" in w for w in words):
            continue
        result.add(tuple(words))
    if not result:
        result.add(tuple(qw.word for qw in graph))
    return [list(t) for t in sorted(result)]


@dataclass
class Expansion:
    compiled_query: str
    optional_phrase_constraints: list[list[str]]
    full_phrase_constraints: list[list[str]]


def expand_query(
    words: list[str],
    term_freq: Callable[[str], int],
    lexicon_counts: Mapping[int, int],
    noun_variants: Mapping[str, list[str]] | None = None,
    lang_iso_code: str = "en",
) -> Expansion:
    """QueryExpansion.expandQuery (java:37-72): strategy chain in
    reference order (the English chain adds nounPluralFormsEN and
    joinerVariants; ngramAll is LAST), then — in Java's left-to-right
    constructor-argument order — the compiled rendering, THEN
    createSegments (which adds further span variants the rendering never
    sees), THEN the full-constraint listing (which does see them but
    excludes paths containing ``_`` ngrams)."""
    graph = QWordGraph(words)
    nv = noun_variants or {}

    _join_dashes(graph)
    _split_word_num(graph)
    _join_terms(graph, term_freq)
    if lang_iso_code.lower() == "en":
        _noun_plural_forms_en(graph, nv)
        _category_keywords(graph)
        _joiner_variants(graph)
    else:
        _category_keywords(graph)
    _ngram_all(graph)

    compiled = render(graph)
    segments = create_segments(graph, lexicon_counts)
    full = list_full_constraints(graph)

    return Expansion(
        compiled_query=compiled,
        optional_phrase_constraints=segments,
        full_phrase_constraints=full,
    )


# NounVariants.java:11-31 loads dictionary/noun_list.csv (a ~1M-pair
# English noun-form resource) into a SYMMETRIC word -> variants map.
# The resource file is data, not code; this demo table reproduces the
# loader's shape (both directions of every pair) for the corpus-free
# strategy — callers with a real noun list inject their own map.
_NOUN_PAIRS = [
    ("chair", "chairs"),
    ("keyboard", "keyboards"),
    ("recipe", "recipes"),
    ("ring", "rings"),
    ("nerve", "nerves"),
    ("science", "sciences"),
    ("neck", "necks"),
    ("speed", "speeds"),
]


def _build_noun_variants(pairs) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
        out.setdefault(b, []).append(a)
    return out


DEMO_NOUN_VARIANTS = _build_noun_variants(_NOUN_PAIRS)


#: Fixed expansion inputs mirroring the reference's QueryFactoryTest
#: expansion cases (testExpansion1-7 et al.) — shared by the driver
#: query and its sequential replica.
EXPANSION_DEMO_QUERIES = [
    "mechanical keyboard",
    "lawn-chair",
    "trs 80",
    "guitar wiki",
    "ford vs chevrolet",
    "garden chair",
    "elden ring mechanical keyboard slackware linux duke nukem 3d",
    "need for speed",
    "buy rimonabant buy acomplia",
    "the vietnam of computer science",
    "burning the nerves in the neck",
    "amazing work being done",
]
