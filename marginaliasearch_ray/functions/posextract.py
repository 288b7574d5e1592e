"""POS-driven keyword extractors — the DocumentKeywordExtractor family.

Reference parity map (code/functions/language-processing/java/nu/
marginalia/keyword/extractors/):

- ``WordsTfIdfCounts``    — WordsTfIdfCounts.java: KEYWORD-pattern span
  counts per stemmed form, getTermValue with the ``_``-split average,
  ``(int)(-v * 75)`` truncation, the ``cnt > 1 && value > 100`` high-set
  gate re-checked per span occurrence.
- ``NameLikeKeywords``    — NameLikeKeywords.java: NAME-pattern spans,
  the single-word all-caps skip, ``-1`` counting with the ``hasEnough``
  +1 quirk for non-joined words, count-ascending order (most frequent
  first, counts are negative), 150-stem cap.
- ``SubjectLikeKeywords`` — SubjectLikeKeywords.java: NOUN spans whose
  following position matches SUBJECT_SUFFIX, the ``nextCommaPos(end-1)
  <= end`` comma gate, tf-idf >= 100 via the ``_``-split average.
- ``ArtifactKeywords``    — ArtifactKeywords.java: mail-like lowercase
  words -> full address + user + domain (+@domain), with the ignored
  user/domain lists.
- ``TitleKeywords``       — TitleKeywords.java: getWordsFromSentence
  spans (length 1..4, TITLE grammar pattern, comma window, junk-word
  gate) over TITLE sentences, sorted-distinct per sentence, 100-rep cap.
- ``important_words``     — DocumentKeywordExtractor.getImportantWords:
  name+subject reps, >=3 chars, no ``_``, tf-idf-descending limit 16,
  termFreq > 100 gate, termFreq-ascending limit 6.

Determinism note (repo-wide documented deviation): the reference
iterates Java HashMap/HashSet entry sets whose order is
implementation-defined; everywhere that order can reach output (rep
lists feeding limit() cuts), this port iterates in sorted-key order
with the word as tiebreak.

All pure per-document computation over ``sentences.Sentence`` lists;
the term-frequency dict arrives as a plain ``{longHash: count}`` map
(built distributed by pipelines/export.term_freq_export — the reference
ships the same dict as a pre-built model file loaded per process).
"""

from __future__ import annotations

import math
import re

from .hashing import tfd_term_freq_hash_stemmed
from .pos import (
    match_grammar_pattern,
    match_grammar_pattern_at,
    match_grammar_pattern_span,
)
from .sentences import Sentence

__all__ = [
    "WordsTfIdfCounts",
    "NameLikeKeywords",
    "SubjectLikeKeywords",
    "ArtifactKeywords",
    "TitleKeywords",
    "important_words",
    "WordRep",
]


class WordRep:
    """model/WordRep.java — surface word + stemmed join for a span."""

    __slots__ = ("word", "stemmed", "length")

    def __init__(self, sent: Sentence, span: tuple):
        self.word = sent.construct_word_from_span(span)
        self.stemmed = sent.construct_stemmed_word_from_span(span)
        self.length = span[1] - span[0]

    def __repr__(self) -> str:  # pragma: no cover
        return f"WordRep({self.word!r})"


def _is_not_junk_word(word: str) -> bool:
    from .keywords import is_stop_word

    return not is_stop_word(word)


class WordsTfIdfCounts:
    """Per-document tf-idf over KEYWORD-pattern spans."""

    def __init__(self, tf_dict: dict, doc_count: int, dld: list[Sentence]):
        self._dict = tf_dict
        self.doc_count = float(doc_count)
        # one KEYWORD-pattern walk; spans + stems reused by the second
        # (high-rep) pass below — identical output to the Java double
        # walk, half the pattern-matching cost
        walk: list[tuple] = []
        counts: dict[str, int] = {}
        for sent in dld:
            spans = match_grammar_pattern(sent, "keyword")
            stems = [
                sent.construct_stemmed_word_from_span(span) for span in spans
            ]
            walk.append((sent, spans, stems))
            for stem in stems:
                counts[stem] = counts.get(stem, 0) + 1
        max_val = max(counts.values(), default=0)
        self.tf_idf: dict[str, int] = {}
        high_instances: set[str] = set()
        for key, cnt in counts.items():
            value = self.get_term_value(key, cnt, max_val)
            self.tf_idf[key] = value
            if cnt > 1 and value > 100:
                high_instances.add(key)
        # high-tf-idf reps; dedup matches the upstream HashSet<WordRep>
        # (equality on word)
        self._high: list[WordRep] = []
        seen_words: set[str] = set()
        if high_instances:
            for sent, spans, stems in walk:
                for span, stem in zip(spans, stems):
                    if stem in high_instances:
                        rep = WordRep(sent, span)
                        if rep.word not in seen_words:
                            seen_words.add(rep.word)
                            self._high.append(rep)

    def term_frequency_dict_value(self, rep: WordRep) -> int:
        return self.get_term_freq_stemmed(rep.stemmed)

    def get_term_freq_stemmed(self, stemmed: str) -> int:
        return self._dict.get(tfd_term_freq_hash_stemmed(stemmed), 0)

    def get_tf_idf(self, stemmed: str) -> int:
        return self.tf_idf.get(stemmed, 0)

    def get_reps(self) -> list[WordRep]:
        return self._high

    def get_term_value(self, key: str, count: int, max_value: float) -> int:
        if "_" in key:
            parts = key.split("_")
            total = 0.0
            for part in parts:
                total += self._value(part, count, max_value)
            return self._normalize_value(total / len(parts))
        return self._normalize_value(self._value(key, count, max_value))

    @staticmethod
    def _normalize_value(v: float) -> int:
        return int(-v * 75)  # Java (int) cast truncates toward zero

    def _value(self, key: str, value: float, max_value: float) -> float:
        freq = float(self.get_term_freq_stemmed(key))
        if freq < 1:
            freq = 1.0
        return (0.1 + 0.9 * value / max_value) * math.log(
            freq / self.doc_count
        )


class NameLikeKeywords:
    """Capitalized-run names (NAME grammar category)."""

    def __init__(self, dld: list[Sentence], min_count: int):
        counts: dict[str, int] = {}
        instances: dict[str, list[WordRep]] = {}
        inst_words: dict[str, set] = {}
        for sent in dld:
            for span in match_grammar_pattern(sent, "name"):
                if span[1] - span[0] <= 1 and sent.is_all_caps[span[0]]:
                    continue
                stemmed = sent.construct_stemmed_word_from_span(span)
                counts[stemmed] = counts.get(stemmed, 0) - 1
                rep = WordRep(sent, span)
                words = inst_words.setdefault(stemmed, set())
                if rep.word not in words:
                    words.add(rep.word)
                    instances.setdefault(stemmed, []).append(rep)

        def has_enough(stem: str, neg_count: int) -> bool:
            count = -neg_count
            if "_" in stem:
                return count >= min_count
            return count >= min_count + 1

        # count-ascending (negative counts: most frequent first); stem
        # tiebreak for determinism (upstream: hash order)
        ordered = sorted(
            (item for item in counts.items() if has_enough(*item)),
            key=lambda kv: (kv[1], kv[0]),
        )[:150]
        self.name_words: list[WordRep] = [
            rep for stem, _ in ordered for rep in instances[stem]
        ]
        self._stemmed = {rep.stemmed for rep in self.name_words}

    def contains(self, stemmed: str) -> bool:
        return stemmed in self._stemmed

    def get_reps(self) -> list[WordRep]:
        return self.name_words


class SubjectLikeKeywords:
    """[Noun phrase] (verb-ish suffix) -> the noun phrase is a subject."""

    def __init__(self, tfidf: WordsTfIdfCounts, dld: list[Sentence]):
        instances: dict[str, list[WordRep]] = {}
        inst_words: dict[str, set] = {}
        for sent in dld:
            for span in match_grammar_pattern(sent, "noun"):
                start, end = span
                if sent.next_comma_pos(end - 1) <= end:
                    continue
                if match_grammar_pattern_at(sent, "subject-suffix", end):
                    rep = WordRep(sent, (start, end))
                    stemmed = rep.stemmed
                    words = inst_words.setdefault(stemmed, set())
                    if rep.word not in words:
                        words.add(rep.word)
                        instances.setdefault(stemmed, []).append(rep)

        self.word_list: list[WordRep] = []
        for stemmed in sorted(instances):  # deterministic iteration
            if self._get_term_tf_idf(tfidf, stemmed) >= 100:
                self.word_list.extend(instances[stemmed])
        self._stemmed = {rep.stemmed for rep in self.word_list}

    def _get_term_tf_idf(self, tfidf: WordsTfIdfCounts, stemmed: str) -> int:
        if "_" in stemmed:
            parts = [p for p in stemmed.split("_") if p]
            if not parts:
                return 0
            total = 0
            for part in parts:
                total += self._get_term_tf_idf(tfidf, part)
            return total // len(parts) if total >= 0 else -(-total // len(parts))
        return tfidf.get_tf_idf(stemmed)

    def contains(self, stemmed: str) -> bool:
        return stemmed in self._stemmed

    def get_reps(self) -> list[WordRep]:
        return self.word_list


_MAIL_LIKE = re.compile(r"[a-zA-Z0-9._\-]+@[a-zA-Z0-9]+(\.[a-zA-Z0-9]+)+")
_IGNORED_DOMAINS = frozenset(("@hotmail.com", "@gmail.com", "@paypal.com"))
_IGNORED_USERS = frozenset(
    ("info", "legal", "contact", "press", "donotreply", "noreply",
     "no-reply", "admin", "root")
)


class ArtifactKeywords:
    """E-mail-address artifacts from the sentence word stream."""

    def __init__(self, dld: list[Sentence]):
        words: set[str] = set()
        for sent in dld:
            for lc in sent.words_lc:
                at_idx = lc.find("@")
                if len(lc) < 6 or at_idx < 0 or not _MAIL_LIKE.fullmatch(lc):
                    continue
                words.add(lc)
                domain = lc[at_idx:]
                user = lc[:at_idx]
                if domain not in _IGNORED_DOMAINS:
                    words.add(domain[1:])
                    words.add(domain)
                if user not in _IGNORED_USERS:
                    words.add(user)
        self.words = words

    def get_words(self) -> set[str]:
        return self.words


def _get_words_from_sentence(sent: Sentence) -> list[tuple]:
    """LanguageDefinition.getWordsFromSentence: spans of length 1..4
    passing the comma window, the TITLE grammar pattern (exact-length
    patterns only) and the junk-word gate, in the k-major scan order."""
    spans: list[tuple] = []
    for k in range(4):
        for i in range(k, len(sent)):
            w = (i - k, i + 1)
            if sent.next_comma_pos(w[0]) < w[1] - 1:
                continue
            if not match_grammar_pattern_span(sent, "title", w):
                continue
            word = sent.construct_word_from_span(w)
            if word.strip() and _is_not_junk_word(word):
                spans.append(w)
    return spans


class TitleKeywords:
    """Spans from TITLE-tagged sentences.

    Upstream stream shape: per TITLE sentence the SPANS are stable-sorted
    by start and deduped (WordSpan equality), mapped to WordReps, then a
    GLOBAL limit(100) applies across all title sentences BEFORE the
    word-keyed set collection."""

    def __init__(self, dld: list[Sentence], title_tag) -> None:
        reps: list[WordRep] = []
        budget = 100
        for sent in dld:
            if title_tag not in sent.html_tags:
                continue
            if budget <= 0:
                break
            spans = _get_words_from_sentence(sent)
            spans_sorted = sorted(spans, key=lambda w: w[0])  # stable
            seen_spans: set[tuple] = set()
            for span in spans_sorted:
                if span in seen_spans:
                    continue
                seen_spans.add(span)
                reps.append(WordRep(sent, span))
                budget -= 1
                if budget <= 0:
                    break
        # final collection is a SET keyed on word — order never reaches
        # output (reps feed flag membership + meta-only adds)
        seen_words: set[str] = set()
        uniq: list[WordRep] = []
        for rep in reps:
            if rep.word not in seen_words:
                seen_words.add(rep.word)
                uniq.append(rep)
        self.reps = uniq
        self._stemmed = {rep.stemmed for rep in uniq}

    def contains(self, stemmed: str) -> bool:
        return stemmed in self._stemmed

    def get_reps(self) -> list[WordRep]:
        return self.reps


def important_words_funnel(
    tfidf: WordsTfIdfCounts,
    names: NameLikeKeywords,
    subjects: SubjectLikeKeywords,
) -> list[tuple]:
    """DocumentKeywordExtractor.getImportantWords with the funnel made
    visible: -> [(word, tf_idf, term_freq, kept)] for the 16
    tf-idf-leading candidates, ``kept`` marking the final <=6 that
    survive the termFreq > 100 gate and the termFreq-ascending cut.
    Stable-sorted with the word tiebreak for determinism."""
    reps = [
        w
        for w in (*names.get_reps(), *subjects.get_reps())
        if len(w.word) >= 3 and "_" not in w.word
    ]
    reps.sort(key=lambda w: (-tfidf.get_tf_idf(w.stemmed), w.word))
    reps = reps[:16]
    passed = [w for w in reps if tfidf.term_frequency_dict_value(w) > 100]
    passed.sort(key=lambda w: (tfidf.term_frequency_dict_value(w), w.word))
    kept_words = {w.word for w in passed[:6]}
    return [
        (
            w.word,
            tfidf.get_tf_idf(w.stemmed),
            tfidf.term_frequency_dict_value(w),
            w.word in kept_words,
        )
        for w in reps
    ]


def important_words(
    tfidf: WordsTfIdfCounts,
    names: NameLikeKeywords,
    subjects: SubjectLikeKeywords,
) -> list[str]:
    """DocumentKeywordExtractor.getImportantWords (the kept words of
    :func:`important_words_funnel`, in termFreq-ascending order)."""
    funnel = important_words_funnel(tfidf, names, subjects)
    kept = [(w, tf) for w, _v, tf, k in funnel if k]
    kept.sort(key=lambda x: (x[1], x[0]))
    return [w for w, _ in kept]
