"""Keyword / span projection per document — the converter's
DocumentKeywordExtractor chain re-expressed over the bounded DOM.

Reference parity map (all files under
code/functions/language-processing/java/nu/marginalia/):

- ``matches_word_pattern``  — keyword/DocumentPositionMapper.java
  matchesWordPattern, ported branch-for-branch (its upstream test
  vectors are pinned in tests/test_keywords.py).
- ``is_stop_word``          — language/WordPatterns.java isStopWord /
  isNotJunkWord (no resource files: the reference moved stopword lists
  out of this path, leaving only the junk-word rules — fully portable).
- ``split_segment``         — sentence/SentenceSegmentSplitter.java
  splitSegment token output (the query-side view: no separator bits, no
  per-sentence cap).  The index side runs the FULL sentence chain in
  functions/sentences.py (detector stand-in + precleaner + caps +
  separator bits + the exact FlattenAllLatin tables, which this legacy
  path now shares).
- ``url_keywords``          — keyword/extractors/UrlKeywords.java:
  [^a-z0-9A-Z]+ splits, leading-www skip, com/net/org tail blanking,
  porter stems for the containsUrl/containsDomain sets, and the
  synthetic DOC_URL sentence.
- ``title_stems``           — keyword/extractors/TitleKeywords.java
  (sorted-distinct words of TITLE-tagged frames, 100-term cap).
- ``SpanRec``               — keyword/SpanRecorder.java verbatim.
- ``keyword_projection``    — the FULL DocumentKeywordExtractor
  .extractKeywords chain: DocumentPositionMapper (1-based body
  positions with per-tag span recording, +2 padding, DOC_URL block,
  +2 padding, EXTERNAL_LINKTEXT blocks with sqrt-attenuated
  repetitions), the POS-extractor family (functions/posextract.py) for
  Subjects / NamesWords / Title / UrlPath / UrlDomain flags, the
  per-sentence NAME n-gram meta terms, createNGramTermsFromSet,
  getImportantWords, and the Artifact Synthetic terms.
- ``position_mask``         — keyword/model/DocumentKeywordsBuilder.java
  calculatePositionMask (256-wide windows into meta bits 8..63, with the
  half-window leniency bit).
- ``span_*`` operations     — index/forward/spans/DocumentSpan.java
  (countIntersections / containsRange / countRangeMatches /
  countRangeMatchesExact / countRangeMatchesAtBoundary / length),
  ported loop-for-loop over interlaced [start, end) lists.
- ``find_intersections``    — libraries/coded-sequence SequenceOperations
  .findIntersections with PhraseConstraintGroup's ``-offset`` iterator
  trick (PhraseConstraintGroupList.java): the returned values are the
  phrase START positions; vectorized here as an intersect1d chain.

Everything in this module is a pure per-document function — the
distributed plumbing lives in stages/fullrank.py and the sequential
oracle replica in fixtures/expected.py imports the same functions, so
engine and oracle cannot drift.
"""

from __future__ import annotations

import math
import re
import unicodedata

from .stem import porter_stem

# Included-tag ordinals, HtmlTag.java enum order (excluded tags last and
# never recorded): ANCHOR TITLE HEADING CODE NAV BODY EXTERNAL_LINKTEXT
# DOC_URL.  The weights tables in stages/fullrank.py index by these.
T_ANCHOR, T_TITLE, T_HEADING, T_CODE, T_NAV, T_BODY, T_EXTLINK, T_DOCURL = range(8)
INCLUDED_TAGS = (
    T_ANCHOR, T_TITLE, T_HEADING, T_CODE, T_NAV, T_BODY, T_EXTLINK, T_DOCURL,
)
TAG_NAMES = (
    "anchor", "title", "heading", "code", "nav", "body",
    "external_linktext", "doc_url",
)

# htmldoc.py tag-kind constants -> our ordinals (CODE=3, TITLE=4,
# ANCHOR=5, NAV=6, HEADING=7 there; SCRIPT/STYLE/FORM are excluded and
# never appear in tagged_frames stacks)
_KIND_TO_TAG = {3: T_CODE, 4: T_TITLE, 5: T_ANCHOR, 6: T_NAV, 7: T_HEADING}

# WordFlags.java bit positions
F_TITLE = 1 << 0
F_SUBJECTS = 1 << 1
F_NAMES = 1 << 2
F_SYNTHETIC = 1 << 3
F_SITE = 1 << 4
F_SITE_ADJACENT = 1 << 5
F_URL_PATH = 1 << 6
F_URL_DOMAIN = 1 << 7

MAX_WORD_LENGTH = 64          # DocumentKeywordsBuilder.java:18
MAX_POSITIONS_PER_WORD = 512  # DocumentKeywordsBuilder.java:19
MAX_SPANS_PER_TYPE = 8192     # DocumentKeywordsBuilder.java:20 (interlaced values)
POSITIONS_BITMASK_WINDOW_SIZE = 256  # DocumentKeywordsBuilder.java:21

_WORD_PART_SEPARATORS = ".-_/:+*@#"

# UnicodeNormalization.europeanWordBreaks (the ``en`` maximal-latin
# config's word-break pattern), transcribed for Python re
_WORD_BREAK = re.compile(
    "([^/<>$:_#@.a-zA-Z'+\\-0-9À-ÖØ-öø-ÿ]+)"
    "|[|]"
    "|(\\.(\\s+|$))"
)

_URL_SPLIT = re.compile("[^a-z0-9A-Z]+")  # UrlKeywords.splitPattern


def matches_word_pattern(s: str) -> bool:
    """DocumentPositionMapper.matchesWordPattern, ported exactly."""
    if len(s) > 48:
        return False
    i = 0
    n = len(s)
    for _run in range(15):
        if i >= n:
            break
        if s[i].isalnum():
            i += 1
            continue
        break
    if i == 0:
        return False
    for _j in range(8):
        if i == n:
            return True
        seps = 0
        while seps < 3 and i < n:
            c = s[i]
            if c.isalnum():
                break
            elif c not in _WORD_PART_SEPARATORS:
                return False
            else:
                i += 1
                seps += 1
        if seps > 2 or seps == 0:
            return False
        for _run in range(10):
            if i >= n:
                break
            if s[i].isalnum():
                i += 1
                continue
            break
    return i == n


def _has_more_than_n(s: str, c: str, mx: int) -> bool:
    """WordPatterns.hasMoreThanN — true when a (mx+1)-th occurrence of c
    exists before the final character (the Java idx scan never counts a
    match at position 0 or the last index as terminal)."""
    idx = 0
    for _ in range(mx + 1):
        idx = s.find(c, idx + 1)
        if idx < 0 or idx >= len(s) - 1:
            return False
    return True


def is_stop_word(word: str) -> bool:
    """WordPatterns.isStopWord == !isNotJunkWord (the reference moved
    actual stopword lists to the index; only junk rules remain)."""
    if not word.strip():
        return True
    if _has_more_than_n(word, "-", 4):
        return True
    if _has_more_than_n(word, "+", 2):
        return True
    if word.startswith("-") or word.endswith("-"):
        return True
    digits = 0
    for ch in word:
        if ch.isdigit():
            digits += 1
            if digits > 16:
                return True
    return False


def _is_discarded(word: str) -> bool:
    """WordPatterns.isDiscardedByTokenizer."""
    if not word.strip():
        return True
    if len(word) >= MAX_WORD_LENGTH:
        return True
    return all(c in "/*-" for c in word)


def _flatten_unicode(s: str) -> str:
    """FlattenAllLatin — delegates to the exact table port
    (functions/sentences.flatten_unicode) so the query-side tokenizer
    and the index-side sentence chain agree on every codepoint."""
    if s.isascii():
        return s
    from .sentences import flatten_unicode

    return flatten_unicode(s)


def split_segment(segment: str) -> list[str]:
    """SentenceSegmentSplitter.splitSegment (no per-sentence cap — the
    OpenNLP sentence detector is stubbed; see module docstring).  Keeps
    the words that the tokenizer keeps, INCLUDING ones the post-passes
    strip to empty — those still consume a position in the reference."""
    flat = _flatten_unicode(segment)
    words: list[str] = []
    i = 0
    n = len(flat)
    while i <= n:
        m = _WORD_BREAK.search(flat, i)
        if not m:
            words.append(flat[i:])
            break
        if i != m.start():
            words.append(flat[i:m.start()])
        if m.end() == i:  # defensive: pattern alternatives are all >= 1 char
            i += 1
        else:
            i = m.end()
    out: list[str] = []
    for part in words:
        if _is_discarded(part):
            continue
        # the reference's post-passes each test the ORIGINAL token and
        # overwrite the slot — they deliberately do NOT compose
        # (SentenceSegmentSplitter.java:68-86)
        kept = part
        if part.startswith("<") and part.endswith(">") and len(part) > 2:
            kept = part[1:-1]
        if part.startswith("'") and len(part) > 1:
            kept = part[1:]
        if part.endswith("'") and len(part) > 1:
            kept = part[:-1]
        p = part
        while p.endswith("."):
            p = p[:-1]
            kept = p
        out.append(kept)
    return out


def url_keywords(domain: str, path: str):
    """UrlKeywords.java — returns (domain_stems, path_stems, doc_url_words)
    where doc_url_words is the synthetic DOC_URL sentence (lowercase
    surface forms; blanks for the com/net/org tail, exactly as the
    reference emits them)."""
    domain_stems: set[str] = set()
    path_stems: set[str] = set()
    words_lc: list[str] = []
    parts = _URL_SPLIT.split(domain)
    for i, part in enumerate(parts):
        if i == 0 and part == "www":
            continue
        if i == len(parts) - 1 and part in ("com", "net", "org"):
            words_lc.append("")
            continue
        domain_stems.add(porter_stem(part))
        words_lc.append(part.lower())
    for part in _URL_SPLIT.split(path):
        if not part.strip():
            continue
        path_stems.add(porter_stem(part))
        words_lc.append(part.lower())
    return domain_stems, path_stems, words_lc


class SpanRec:
    """SpanRecorder.java — one recorder per included tag; update() is
    driven per word with that word's tag set."""

    __slots__ = ("tag", "spans", "start")

    def __init__(self, tag: int) -> None:
        self.tag = tag
        self.spans: list[int] = []  # interlaced start, end
        self.start = 0

    def update(self, tags: frozenset, pos: int) -> None:
        if self.tag in tags:
            if self.start <= 0:
                self.start = pos
        elif not tags and self.tag == T_BODY:
            if self.start <= 0:
                self.start = pos
        else:
            if self.start > 0:
                self.spans.append(self.start)
                self.spans.append(pos)
                self.start = 0

    def end_current_span(self, pos: int) -> None:
        if self.start > 0:
            self.spans.append(self.start)
            self.spans.append(pos)
            self.start = 0

    def finish(self, length: int) -> list[int]:
        if self.start > 0:
            self.spans.append(self.start)
            self.spans.append(length)
            self.start = 0
        return self.spans


def title_stems(frames: list) -> set[str]:
    """TitleKeywords.java — porter stems of the sorted-distinct words of
    TITLE-tagged frames, capped at 100 cumulative terms."""
    stems: set[str] = set()
    budget = 100
    for text, tags in frames:
        if T_TITLE not in tags:
            continue
        distinct = sorted(set(w.lower() for w in split_segment(text) if w))
        for w in distinct[:budget]:
            stems.add(porter_stem(w))
        budget -= min(budget, len(distinct))
        if budget <= 0:
            break
    return stems


def keyword_projection(
    frames: list,
    domain: str,
    path: str,
    link_texts: list | None = None,
    tf_dict: dict | None = None,
    tf_doc_count: int = 0,
) -> dict:
    """DocumentKeywordExtractor.extractKeywords over the tagged frames
    of the PRUNED DOM, on the REAL sentence model (functions/sentences):
    per-frame sentence extraction (detector stand-in + preclean + caps),
    POS tagging, and the full extractor family — TitleKeywords,
    NameLikeKeywords, SubjectLikeKeywords, WordsTfIdfCounts,
    ArtifactKeywords (functions/posextract) — feeding
    KeywordMetadata.getMetadataForWord flag bytes
    (Title/Subjects/NamesWords/UrlPath/UrlDomain), the per-sentence NAME
    n-gram meta terms, createNGramTermsFromSet, getImportantWords and
    addAllSyntheticTerms.

    ``frames`` — ``tagged_frames(pruned_root)`` output ([text, kindset]).
    ``link_texts`` — optional [(text, count), ...] external anchor texts
    pointing at this document (LinkTexts), already deterministically
    ordered by the caller.
    ``tf_dict`` / ``tf_doc_count`` — the TermFrequencyDict
    ({longHash: count} map + document count) the tf-idf extractor reads;
    the reference ships it as a pre-built model file per process, this
    engine builds it distributed (pipelines/export.term_freq_export) and
    broadcasts the map.

    Returns ``{"words": {word: [meta_long, positions]},
    "spans": {tag_ordinal: interlaced}, "size": body_word_count,
    "important_words": [...]}`` where meta_long carries the WordFlags
    byte plus the 256-window positions bitmask
    (DocumentKeywordsBuilder.calculatePositionMask), positions are
    1-based, and n-gram/synthetic terms ride with empty position lists.
    """
    from .posextract import (
        ArtifactKeywords,
        NameLikeKeywords,
        SubjectLikeKeywords,
        TitleKeywords,
        WordsTfIdfCounts,
        WordRep,
    )
    from .sentences import (
        extract_sentences_from_string,
        make_sentence,
        split_segment_sep,
    )
    from .pos import match_grammar_pattern

    # translate htmldoc kind codes -> HtmlTag ordinals once; excluded
    # kinds (script/style/form) appear only on EMPTY frames emitted at
    # element close — their text was suppressed by the tagger — so
    # dropping the codes loses nothing
    frames = [
        (
            text,
            frozenset(
                t for t in (_KIND_TO_TAG.get(k) for k in kinds) if t is not None
            ),
        )
        for text, kinds in frames
    ]
    # the document language data: per-frame sentence extraction
    dld = []
    for text, tags in frames:
        dld.extend(extract_sentences_from_string(text, tags))

    d_stems, p_stems, url_words = url_keywords(domain, path)
    tfidf = WordsTfIdfCounts(tf_dict or {}, max(tf_doc_count, 1), dld)
    title_kw = TitleKeywords(dld, T_TITLE)
    name_kw = NameLikeKeywords(dld, 2)
    subject_kw = SubjectLikeKeywords(tfidf, dld)
    artifact_kw = ArtifactKeywords(dld)

    def flags_for(stem: str) -> int:
        # KeywordMetadata.getMetadataForWord
        f = 0
        if subject_kw.contains(stem):
            f |= F_SUBJECTS
        if name_kw.contains(stem):
            f |= F_NAMES
        if title_kw.contains(stem):
            f |= F_TITLE
        if stem in p_stems:
            f |= F_URL_PATH
        if stem in d_stems:
            f |= F_URL_DOMAIN
        return f

    words: dict[str, list] = {}

    def add_word(w: str, stem: str, pos: int) -> None:
        # the mapper's addPos + addMeta pair (stop-word gate applied by
        # the caller, pattern + length gates here like the builder's)
        if not matches_word_pattern(w):
            return
        if len(w) > MAX_WORD_LENGTH:
            return
        ent = words.get(w)
        if ent is None:
            words[w] = [flags_for(stem), [pos]]
        else:
            ent[1].append(pos)

    def add_meta(w: str, stem: str) -> None:
        # DocumentKeywordsBuilder.addMeta: overwrite, meta-only entry
        # when the word is new (no positions)
        if len(w) > MAX_WORD_LENGTH:
            return
        ent = words.get(w)
        flags = flags_for(stem)
        if ent is None:
            words[w] = [flags, []]
        else:
            ent[0] = flags

    # --- body mapping (mapDocumentPositions) ---
    recorders = {t: SpanRec(t) for t in (T_ANCHOR, T_TITLE, T_HEADING, T_CODE, T_NAV, T_BODY)}
    pos = 0
    for sent in dld:
        tags = sent.html_tags
        for i in range(len(sent)):
            pos += 1
            for rec in recorders.values():
                rec.update(tags, pos)
            w = sent.words_lc[i]
            if is_stop_word(w):
                continue
            add_word(w, sent.stemmed[i], pos)
        # per-sentence NAME n-gram meta terms
        for span in match_grammar_pattern(sent, "name"):
            rep = WordRep(sent, span)
            add_meta(rep.word, rep.stemmed)
    size = pos  # index.getDocumentSize analog: body word count
    pos += 1
    spans: dict[int, list[int]] = {}
    for t, rec in recorders.items():
        se = rec.finish(pos)
        if se:
            spans[t] = se

    # --- DOC_URL block (mapUrlWordPositions) ---
    pos += 2
    url_rec = SpanRec(T_DOCURL)
    url_tags = frozenset((T_DOCURL,))
    for w in url_words:
        pos += 1
        url_rec.update(url_tags, pos)
        if is_stop_word(w):
            continue
        add_word(w, porter_stem(w), pos)
    pos += 1
    se = url_rec.finish(pos)
    if se:
        spans[T_DOCURL] = se

    # --- EXTERNAL_LINKTEXT blocks (mapLinkTextPositions) ---
    pos += 2
    ext_rec = SpanRec(T_EXTLINK)
    ext_tags = frozenset((T_EXTLINK,))
    for text, count in link_texts or ():
        reps = int(max(1, min(math.sqrt(count), 12)))
        # AnchorTextKeywords builds each link text with the
        # single-sentence extractSentence variant
        toks, seps = split_segment_sep(text)
        lsent = make_sentence(toks, seps, ext_tags, natural=True)
        for _ in range(reps):
            for i in range(len(lsent)):
                pos += 1
                ext_rec.update(ext_tags, pos)
                w = lsent.words_lc[i]
                if is_stop_word(w):
                    continue
                add_word(w, lsent.stemmed[i], pos)
            ext_rec.end_current_span(pos + 1)
            pos += 2
    se = ext_rec.finish(pos)
    if se:
        spans[T_EXTLINK] = se

    # --- createNGramTermsFromSet (title, subject, name reps) ---
    for rep_source in (title_kw, subject_kw, name_kw):
        for rep in rep_source.get_reps():
            if rep.word.strip():
                add_meta(rep.word, rep.stemmed)

    # --- importantWords + artifact synthetics ---
    from .posextract import important_words_funnel

    imp_funnel = important_words_funnel(tfidf, name_kw, subject_kw)
    imp_words = [w for w, _v, tf, k in imp_funnel if k]
    imp_words.sort(key=lambda w: next(
        (tf, w) for ww, _v, tf, k in imp_funnel if ww == w
    ))
    for w in sorted(artifact_kw.get_words()):
        # addAllSyntheticTerms: putIfAbsent with the Synthetic flag
        if len(w) > MAX_WORD_LENGTH:
            continue
        if w not in words:
            words[w] = [F_SYNTHETIC, []]

    # --- build(): position truncation + bitmask meta, span caps ---
    for wl, ent in words.items():
        plist = ent[1]
        if len(plist) > MAX_POSITIONS_PER_WORD:
            del plist[MAX_POSITIONS_PER_WORD:]
        m = position_mask(ent[0], plist)
        # Java long wraparound: the bitmask can set bit 63
        ent[0] = m - (1 << 64) if m >= (1 << 63) else m
    for t, se in spans.items():
        if len(se) > MAX_SPANS_PER_TYPE:
            # the Java breaks after the append that crosses the cap —
            # keep whole pairs up to the first crossing
            cut = ((MAX_SPANS_PER_TYPE + 1) // 2) * 2
            spans[t] = se[:cut]
    return {
        "words": words,
        "spans": spans,
        "size": size,
        "important_words": imp_words,
        "important_funnel": imp_funnel,
    }


def position_mask(term_meta: int, positions: list[int]) -> int:
    """DocumentKeywordsBuilder.calculatePositionMask."""
    ret = term_meta
    for p in positions:
        bit = (p // POSITIONS_BITMASK_WINDOW_SIZE) % 56
        ret |= 1 << (8 + bit)
        bit = ((p + POSITIONS_BITMASK_WINDOW_SIZE // 2) // POSITIONS_BITMASK_WINDOW_SIZE) % 56
        ret |= 1 << (8 + bit)
    return ret


# ---------------------------------------------------------------------------
# DocumentSpan operations (index/forward/spans/DocumentSpan.java), over
# interlaced [start, end) lists.  Ported loop-for-loop: the cursor
# semantics (which span advances when) are part of the contract.
# ---------------------------------------------------------------------------


def span_count_intersections(se: list[int], positions: list[int]) -> int:
    if not se or not positions:
        return 0
    sei = 0
    pi = 0
    start = se[sei]
    end = se[sei + 1]
    sei += 2
    pos = -1
    cnt = 0
    while True:
        if pos < start:
            if pi >= len(positions):
                break
            pos = positions[pi]
            pi += 1
        elif pos < end:
            cnt += 1
            if pi >= len(positions):
                break
            pos = positions[pi]
            pi += 1
        else:
            if sei >= len(se):
                break
            start = se[sei]
            end = se[sei + 1]
            sei += 2
    return cnt


def span_contains_range(se: list[int], positions: list[int], ln: int) -> bool:
    if len(se) < 2 or not positions:
        return False
    sei = 2
    start, end = se[0], se[1]
    pi = 0
    while pi < len(positions):
        p = positions[pi]
        if p >= start and p + ln <= end:
            return True
        elif p < end:
            pi += 1
        elif sei + 2 <= len(se):
            start, end = se[sei], se[sei + 1]
            sei += 2
        else:
            return False
    return False


def span_count_range_matches(se: list[int], positions: list[int], ln: int) -> int:
    if len(se) < 2 or not positions:
        return 0
    sei = 2
    start, end = se[0], se[1]
    pi = 0
    ret = 0
    while pi < len(positions):
        p = positions[pi]
        if p >= start and p + ln <= end:
            ret += 1
            pi += 1
        elif p < end:
            pi += 1
        elif sei + 2 <= len(se):
            start, end = se[sei], se[sei + 1]
            sei += 2
        else:
            break
    return ret


def span_count_range_matches_exact(se: list[int], positions: list[int], ln: int) -> int:
    if len(se) < 2 or not positions:
        return 0
    sei = 2
    start, end = se[0], se[1]
    pi = 0
    cnt = 0
    while pi < len(positions):
        p = positions[pi]
        if p == start and p + ln == end:
            cnt += 1
            if sei + 2 <= len(se):
                start, end = se[sei], se[sei + 1]
                sei += 2
            else:
                break
        elif p < end:
            pi += 1
        elif sei + 2 <= len(se):
            start, end = se[sei], se[sei + 1]
            sei += 2
        else:
            break
    return cnt


def span_count_range_matches_at_boundary(
    se: list[int], positions: list[int], ln: int
) -> int:
    if len(se) < 2 or not positions:
        return 0
    sei = 2
    start, end = se[0], se[1]
    pi = 0
    ret = 0
    while pi < len(positions):
        p = positions[pi]
        if p >= start and p + ln <= end:
            if p == start or p + ln == end:
                ret += 1
            pi += 1
        elif p < end:
            pi += 1
        elif sei + 2 <= len(se):
            start, end = se[sei], se[sei + 1]
            sei += 2
        else:
            break
    return ret


def span_length(se: list[int]) -> int:
    ln = 0
    for i in range(0, len(se), 2):
        ln += se[i + 1] - se[i]
    return ln


def find_intersections(position_lists: list) -> list[int]:
    """Full-phrase-group intersections: start positions where every term
    appears at its query offset (PhraseConstraintGroup.findIntersections
    with iterOffsets = -oi; SequenceOperations.findIntersections).
    Returns sorted unique starts."""
    import numpy as np

    if not position_lists:
        return []
    cur = None
    for j, plist in enumerate(position_lists):
        if plist is None or len(plist) == 0:
            return []
        adj = np.asarray(plist, dtype=np.int64) - j
        cur = adj if cur is None else np.intersect1d(cur, adj, assume_unique=True)
        if len(cur) == 0:
            return []
    return cur.tolist()
