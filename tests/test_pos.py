"""POS pattern machinery + sentence chain tests.

The PosPattern vectors are transcribed from the reference's
PosPatternTest.java (language/pos); tagger behavior from
PosTagger.java and InitialTagger.java; sentence-chain behavior from
SentenceSegmentSplitter.java / SentencePreCleaner.java /
UnicodeNormalization.java.
"""

from __future__ import annotations

import pytest

from marginaliasearch_ray.functions.pos import (
    EN_PATTERNS,
    EN_TAGGER,
    PosPattern,
    PosTagger,
    match_grammar_pattern,
    tag_en_sentence,
)
from marginaliasearch_ray.functions.sentences import (
    SEP_COMMA,
    SEP_SPACE,
    Sentence,
    detect_sentences,
    extract_sentences_from_string,
    flatten_unicode,
    preclean,
    split_segment_sep,
    strip_possessive,
)


def sent_for(tags, commas=None, tagger=None):
    """PosPatternTest.createSentenceForPattern: commas[i]=True means the
    separator after word i is a COMMA (bit clear)."""
    tagger = tagger or _TEST_TAGGER
    n = len(tags)
    commas = commas or [False] * n
    seps = [SEP_COMMA if c else SEP_SPACE for c in commas]
    enc = [tagger.encode_tag_name(t) for t in tags]
    return Sentence(
        words_lc=list(tags), stemmed=list(tags), pos_tags=enc, seps=seps,
        is_capitalized=[False] * n, is_all_caps=[False] * n,
        include_in_stemming=[True] * n,
    )


_TEST_TAGGER = PosTagger("en", ["A1", "B1", "C1"])


class TestPosPattern:
    """All PosPatternTest.java vectors."""

    def test_match_sentence_single_term(self):
        pat = PosPattern(_TEST_TAGGER, "A1")
        ret = []
        n = pat.match_sentence(sent_for(["A1", "A1", "A1"]), ret)
        assert ret == [(0, 1), (1, 2), (2, 3)]
        assert n == len(ret)

    def test_match_sentence_single_term_comma(self):
        pat = PosPattern(_TEST_TAGGER, "A1")
        ret = []
        n = pat.match_sentence(
            sent_for(["A1", "A1", "A1"], commas=[True, False, True]), ret
        )
        assert ret == [(0, 1), (1, 2), (2, 3)]
        assert n == len(ret)

    def test_match_sentence_three_term(self):
        pat = PosPattern(_TEST_TAGGER, "A1 B1 C1")
        ret = []
        n = pat.match_sentence(
            sent_for(
                ["A1", "B1", "C1", "A1", "B1", "C1"],
                commas=[False, False, True, False, False, True],
            ),
            ret,
        )
        assert ret == [(0, 3), (3, 6)]
        assert n == 2

    def test_match_sentence_three_term_mismatch(self):
        pat = PosPattern(_TEST_TAGGER, "A1 B1 C1")
        ret = []
        n = pat.match_sentence(
            sent_for(
                ["A1", "B1", "A1", "C1", "A1", "C1"],
                commas=[False, False, True, False, False, True],
            ),
            ret,
        )
        assert ret == [] and n == 0

    def test_match_sentence_three_term_overlap(self):
        pat = PosPattern(_TEST_TAGGER, "A1 A1 A1")
        ret = []
        n = pat.match_sentence(
            sent_for(["A1", "A1", "A1", "A1"],
                     commas=[False, False, False, True]),
            ret,
        )
        assert ret == [(0, 3), (1, 4)]
        assert n == 2

    def test_match_sentence_three_term_comma(self):
        pat = PosPattern(_TEST_TAGGER, "A1 B1 C1")
        ret = []
        n = pat.match_sentence(
            sent_for(
                ["A1", "B1", "C1"] * 3,
                commas=[True, False, False, False, True, False, False, False,
                        True],
            ),
            ret,
        )
        assert ret == [(6, 9)]
        assert n == 1

    def test_is_match_single_term(self):
        pat = PosPattern(_TEST_TAGGER, "A1")
        s = sent_for(["A1", "B1", "A1"])
        assert pat.is_match(s, 0)
        assert not pat.is_match(s, 1)
        assert pat.is_match(s, 2)

    def test_is_match_three_term(self):
        pat = PosPattern(_TEST_TAGGER, "A1 B1 C1")
        s = sent_for(["A1", "B1", "A1", "B1", "C1"])
        assert [pat.is_match(s, i) for i in range(6)] == [
            False, False, True, False, False, False,
        ]

    def test_is_match_three_term_comma(self):
        pat = PosPattern(_TEST_TAGGER, "A1 B1 C1")
        s = sent_for(
            ["A1", "B1", "C1"] * 3,
            commas=[True, False, False, False, True, False, False, False, True],
        )
        assert [pat.is_match(s, i) for i in range(10)] == [
            False, False, False, False, False, False, True, False, False,
            False,
        ]

    def test_match_tag_pattern_single(self):
        pat = PosPattern(_TEST_TAGGER, "A1")
        other = PosPattern(_TEST_TAGGER, "A1 B1 A1")
        assert pat.match_tag_pattern(other.pattern) == [True, False, True]

    def test_match_tag_pattern_three(self):
        pat = PosPattern(_TEST_TAGGER, "A1 B1 C1")
        other = PosPattern(_TEST_TAGGER, "A1 B1 A1 B1 C1 A1 B1 C1")
        assert pat.match_tag_pattern(other.pattern) == [
            False, False, True, False, False, True, False, False,
        ]


class TestPatternParsing:
    def test_inversion_resets_after_one_token_outside_parens(self):
        tagger = PosTagger("en", ["X", "Y", "Z"])
        # "!X Y": first slot = all tags minus X; second slot = just Y
        pat = PosPattern(tagger, "!X Y")
        assert pat.pattern[0] == (
            tagger.encode_tag_name("Y") | tagger.encode_tag_name("Z")
        )
        assert pat.pattern[1] == tagger.encode_tag_name("Y")

    def test_inverted_paren_group(self):
        tagger = PosTagger("en", ["X", "Y", "Z"])
        pat = PosPattern(tagger, "!(X Y)")
        assert pat.pattern[0] == tagger.encode_tag_name("Z")

    def test_prefix_star_expansion(self):
        # NNP* expands against the sorted tag list
        pat = PosPattern(EN_TAGGER, "NNP*")
        want = EN_TAGGER.encode_tag_name("NNP") | EN_TAGGER.encode_tag_name(
            "NNPS"
        )
        assert pat.pattern[0] == want

    def test_bare_star_matches_everything(self):
        tagger = PosTagger("en", ["X", "Y"])
        pat = PosPattern(tagger, "*")
        assert pat.pattern[0] == (
            tagger.encode_tag_name("X") | tagger.encode_tag_name("Y")
        )

    def test_zero_length_pattern_raises(self):
        with pytest.raises(ValueError):
            PosPattern(_TEST_TAGGER, "")


class TestPosTagger:
    def test_first_appearance_registry(self):
        t = PosTagger("en", ["B", "A", "B", "C"])
        assert t.tag_names == ["B", "A", "C"]
        assert t.encode_tag_name("B") == 1
        assert t.encode_tag_name("A") == 2
        assert t.encode_tag_name("missing") == 0
        assert t.decode_tag_name(0) == "?"
        assert t.decode_tag_name(2) == "A"
        assert t.tags() == ["A", "B", "C"]

    def test_en_initial_tagger_branches(self):
        # InitialTagger.getTagForWordEn decision order
        tags = dict(zip(
            ["the", "The", "of", "runs", "Caesar", "quickly", "beautiful",
             "2024", "x-15", "example.com", '"quoted', "("],
            [EN_TAGGER.decode_tag_name(b) for b in tag_en_sentence(
                ["the", "The", "of", "runs", "Caesar", "quickly",
                 "beautiful", "2024", "x-15", "example.com", '"quoted',
                 "("])],
        ))
        assert tags["the"] == "DT" and tags["The"] == "DT"
        assert tags["of"] == "IN"
        assert tags["runs"] == "NNS"       # lowercase + trailing s
        assert tags["Caesar"] == "NNP"     # capitalized unknown
        assert tags["quickly"] == "RB"
        assert tags["beautiful"] == "JJ"
        assert tags["2024"] == "CD"
        assert tags["x-15"] == "JJ"        # digit-adjacent dash (jj1)
        assert tags["example.com"] == "NN"  # url shape
        assert tags['"quoted'] == "''"
        assert tags["("] == "?"


class TestGrammarPatterns:
    def test_name_pattern_finds_nnp_runs(self):
        words = ["Steve", "McQueen", "drove", "fast", "cars"]
        tags = tag_en_sentence(words)
        s = Sentence(
            words_lc=[w.lower() for w in words], stemmed=list(words),
            pos_tags=tags, seps=[SEP_SPACE] * 5,
            is_capitalized=[w[0].isupper() for w in words],
            is_all_caps=[False] * 5, include_in_stemming=[True] * 5,
        )
        spans = match_grammar_pattern(s, "name")
        assert (0, 1) in spans and (1, 2) in spans and (0, 2) in spans
        assert all(e <= 2 or (st, e) not in spans for st, e in [(2, 3)])

    def test_subject_suffix_matches_verb_forms(self):
        # "Greeks bearing gifts" -> NOUN at Greeks, suffix "bearing gifts"?
        # the canonical SubjectLikeKeywords example: [Name] (VBD VBZ)...
        words = ["Caesar", "was", "assassinated"]
        tags = tag_en_sentence(words)
        s = Sentence(
            words_lc=[w.lower() for w in words], stemmed=list(words),
            pos_tags=tags, seps=[SEP_SPACE] * 3,
            is_capitalized=[True, False, False], is_all_caps=[False] * 3,
            include_in_stemming=[True] * 3,
        )
        from marginaliasearch_ray.functions.pos import (
            match_grammar_pattern_at,
        )

        # noun span (0,1) ends at 1; subject-suffix "(VBD VBZ)" matches
        # at position 1 ("was" VBD)
        assert match_grammar_pattern_at(s, "subject-suffix", 1)


class TestSentenceChain:
    def test_flatten_tables(self):
        assert flatten_unicode("café") == "cafe"
        assert flatten_unicode("Über") == "ber"  # Ü is not in any table
        assert flatten_unicode("straße") == "strasse"
        assert flatten_unicode("Þing þing") == "thing thing"
        assert flatten_unicode("“quoted”") == '"quoted"'
        assert flatten_unicode("plain ascii") == "plain ascii"
        assert flatten_unicode("naïve") == "naive"
        assert flatten_unicode("日本") == ""  # non-latin dropped

    def test_split_segment_sep_matches_legacy_tokens(self):
        from marginaliasearch_ray.functions.keywords import split_segment

        for text in [
            "The quick, brown fox. Jumped!",
            "a|b c-d e.f <tag> 'quote' end.",
            "comma, separated, list",
            "",
            "trailing dot.",
        ]:
            words, seps = split_segment_sep(text, max_length=None)
            assert words == split_segment(text)
            assert len(seps) == len(words)

    def test_separator_bits(self):
        words, seps = split_segment_sep("alpha, beta gamma")
        assert words == ["alpha", "beta", "gamma"]
        assert seps == [SEP_COMMA, SEP_SPACE, SEP_SPACE]

    def test_max_length_truncation(self):
        words, seps = split_segment_sep(" ".join(f"w{i}" for i in range(300)))
        assert len(words) == 250 and len(seps) == 250

    def test_detect_and_preclean(self):
        sents = detect_sentences("First one. Second two! Third?")
        assert sents == ["First one.", "Second two!", "Third?"]
        # precleaner splits on ' -', '- ' and '|'
        assert preclean(["a - b", "c|d", "  ", "plain"]) == [
            "a", " b", "c", "d", "plain",
        ]

    def test_strip_possessive(self):
        assert strip_possessive("caesar's") == "caesar"
        assert strip_possessive("dogs'") == "dogs"
        assert strip_possessive("plain") == "plain"

    def test_extract_sentences_natural(self):
        out = extract_sentences_from_string("Caesar crossed the Rubicon. He won.")
        assert len(out) == 2
        s = out[0]
        assert s.words_lc == ["caesar", "crossed", "the", "rubicon"]
        assert s.is_capitalized == [True, False, False, True]
        # 'the' is DT -> excluded from stemming by !(IN TO CC DT)
        assert s.include_in_stemming == [True, True, False, True]

    def test_extract_sentences_non_language(self):
        from marginaliasearch_ray.functions.keywords import T_CODE

        out = extract_sentences_from_string(
            "x = f(y). return x.", frozenset((T_CODE,))
        )
        assert all(all(t == 0 for t in s.pos_tags) for s in out)
        assert all(all(s.include_in_stemming) for s in out)

    def test_construct_stemmed_span_excludes_closed_class(self):
        out = extract_sentences_from_string("The Wars of the Roses.")
        s = out[0]
        # span over "wars of the roses": of/the excluded from stemming
        stem = s.construct_stemmed_word_from_span((1, 5))
        assert stem == "war_rose"

    def test_token_count_equivalence(self):
        from marginaliasearch_ray.functions.sentences import (
            _token_count,
            split_segment_sep,
        )

        cases = [
            "The quick, brown fox. Jumped!",
            "a|b c-d e.f <tag> 'quote' end.",
            "", "   ", "---", "a " * 400, "x." * 50,
            "word " * 260,  # over the 250 cap
            "\x00 nul ☃ unicode café",
        ]
        for text in cases:
            words, _ = split_segment_sep(text, 250)
            assert _token_count(text, 250) == len(words), text[:40]

    def test_next_comma_pos(self):
        s = sent_for(["A1", "B1", "C1"], commas=[False, True, False])
        assert s.next_comma_pos(0) == 1
        assert s.next_comma_pos(2) == 3


class TestAbbreviationAwareDetector:
    """Punkt-style boundary suppression (the OpenNLP ME model's learned
    abbreviation behavior, approximated by rule — documented stand-in)."""

    def test_title_abbreviations_do_not_split(self):
        sents = detect_sentences("Dr. Smith arrived. He sat down.")
        assert sents == ["Dr. Smith arrived.", "He sat down."]

    def test_initials_do_not_split(self):
        sents = detect_sentences("J. R. R. Tolkien wrote it. It sold well.")
        assert sents == ["J. R. R. Tolkien wrote it.", "It sold well."]

    def test_internal_dot_tokens(self):
        sents = detect_sentences("Use flour, e.g. rye flour. Knead well.")
        assert sents == ["Use flour, e.g. rye flour.", "Knead well."]

    def test_hostname_end_still_splits(self):
        sents = detect_sentences("Visit example.com. We ship fast.")
        assert sents == ["Visit example.com.", "We ship fast."]

    def test_exclamation_always_splits(self):
        sents = detect_sentences("Call Dr! Now.")
        assert sents == ["Call Dr!", "Now."]

    def test_month_and_measure(self):
        sents = detect_sentences("Born Jan. 3rd in St. Ives. Died old.")
        assert sents == ["Born Jan. 3rd in St. Ives.", "Died old."]


class TestSentenceExtractorTestVectors:
    """SentenceExtractorTest.java (functions/language-processing/test/
    nu/marginalia/language/sentence/) — the upstream tokenization
    assertions, literal (testACDC comes from the keyword-package twin)."""

    @staticmethod
    def _words(text):
        from marginaliasearch_ray.functions.sentences import (
            extract_sentences_from_string,
        )

        return [w for s in extract_sentences_from_string(text) for w in s.words_lc]

    def test_acdc(self):
        assert self._words("AC/DC is a rock band.")[0] == "ac/dc"

    def test_cplusplus(self):
        assert self._words("std::vector") == ["std::vector"]

    def test_php(self):
        assert self._words("$_GET") == ["$_get"]

    def test_polish_artist(self):
        assert self._words("Uklański") == ["uklanski"]

    def test_java(self):
        assert self._words("Foreign Function & Memory API") == [
            "foreign", "function", "memory", "api",
        ]

    def test_apostrophe(self):
        assert self._words("duke nuke 'em's big ol' big gun") == [
            "duke", "nuke", "em", "big", "ol", "big", "gun",
        ]


class TestUnicodeNormalizationTestVectors:
    """UnicodeNormalizationTest.java (FlattenAllLatin) — literal."""

    def test_flatten_unicode_plain_ascii_no_copy(self):
        from marginaliasearch_ray.functions.sentences import flatten_unicode

        s = "abc"
        assert flatten_unicode(s) is s  # assertSame: no allocation on ascii

    def test_flatten_unicode(self):
        from marginaliasearch_ray.functions.sentences import flatten_unicode

        assert flatten_unicode("Stülpnagelstraße") == "Stulpnagelstrasse"
        assert flatten_unicode("Koncevičius") == "Koncevicius"

    def test_omit_non_flattenable(self):
        from marginaliasearch_ray.functions.sentences import flatten_unicode

        assert flatten_unicode("[アグレッシブ烈子]") == "[]"
