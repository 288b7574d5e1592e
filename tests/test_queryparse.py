"""Query-parser conformance (QueryParser.java / QueryFactory.java) —
including the six upstream QueryParserTest cases verbatim."""

import pytest

from marginaliasearch_ray.functions.queryparse import (
    parse_query,
    parse_query_tokens,
)


def _kinds(q):
    return [(t.kind, t.s, t.display) for t in parse_query_tokens(q)]


def test_reference_queryparser_cases():
    # QueryParserTest.java — all six upstream cases
    assert _kinds("__builtin_ffs") == [("literal", "builtin_ffs", "__builtin_ffs")]
    assert _kinds("strcpy()") == [("literal", "strcpy", "strcpy()")]
    assert _kinds("bob's") == [("literal", "bob", "bob's")]
    assert _kinds("-foo") == [("exclude", "foo", "-foo")]
    assert _kinds('-"foo bar"') == [("exclude_phrase", "foo_bar", '-"foo bar"')]
    assert _kinds('?"foo bar"') == [("priority", "foo_bar", '?"foo bar"')]


def test_special_operators():
    p = parse_query("q<5 year>2010 size=100 rank<3 qs=rf_url set:x lang:en near:y z")
    assert (p.quality, p.year, p.size, p.rank) == ("<5", ">2010", "=100", "<3")
    assert p.strategy == "REQUIRE_FIELD_URL"
    assert p.search_set == "X"
    assert p.include == ["z"]  # lang:/near: are spec no-ops


def test_site_semantics():
    lone = parse_query("site:a.example")
    assert lone.domain == "a.example" and lone.require == ["site:a.example"]
    multi = parse_query("cats site:a.example")
    assert multi.domain == "a.example" and multi.require == []
    wild = parse_query("site:*.b.example dogs")
    assert wild.domain == "b.example" and wild.require == ["site:b.example"]


def test_quoted_phrase_spec():
    p = parse_query('"rock -n- roll" extra')
    # '-n-' is a stop word: it becomes a "" placeholder in the phrase
    # constraint (SearchPhraseConstraint.trimStopWords — a wildcard
    # position in the adjacency check) and is dropped from the required
    # terms (WordPatterns.isStopWord via isNotJunkWord)
    assert p.phrases == [["rock", "", "roll"]]
    assert p.include == ["rock", "roll", "extra"]
    assert p.priority == ["rock_-n-_roll"]


def test_too_long_queries_cleared():
    p = parse_query(" ".join(f"w{i}" for i in range(12)))
    assert p.problems and p.include == []
    p2 = parse_query('"' + " ".join(f"w{i}" for i in range(33)) + '"')
    assert p2.problems and p2.include == []


def test_paren_advice_and_escape():
    p = parse_query("(hint) term")
    assert p.require == ["hint"] and p.include == ["term"]
    toks = _kinds(r"a\ b")
    assert toks == [("literal", "a b", "a\\ b")]


class TestSearchPhraseConstraintTestVectors:
    """SearchPhraseConstraintTest.java — trimStopWords semantics,
    literal (mandatory/optional/full all share the same trim)."""

    @staticmethod
    def _terms(*parts):
        from marginaliasearch_ray.functions.queryparse import (
            trim_phrase_stop_words,
        )

        return trim_phrase_stop_words(list(parts))

    def test_tokenizer_discarded_tokens_are_removed(self):
        assert self._terms("coca", "-", "cola") == ["coca", "cola"]
        assert self._terms("five", "*", "six") == ["five", "six"]

    def test_junk_words_become_placeholders(self):
        assert self._terms(
            "part", "number", "123456789012345678", "in", "stock"
        ) == ["part", "number", "", "in", "stock"]
        assert self._terms("foo", "-foo-", "bar") == ["foo", "", "bar"]

    def test_leading_and_trailing_placeholders_are_trimmed(self):
        assert self._terms("123456789012345678", "foo") == ["foo"]
        assert self._terms("foo", "123456789012345678") == ["foo"]
        assert self._terms("123456789012345678", "-") == []

    def test_plain_words_pass_through(self):
        assert self._terms("foo", "bar") == ["foo", "bar"]

    def test_placeholder_is_wildcard_in_adjacency(self):
        import numpy as np

        from marginaliasearch_ray.stages.index import _phrase_present

        toks = np.array(["part", "number", "zzz", "in", "stock"])
        assert _phrase_present(toks, ["part", "number", "", "in", "stock"])
        assert not _phrase_present(toks, ["part", "number", "", "stock"])


class TestQueryFactoryTestVectors:
    """QueryFactoryTest.java — the assertion-bearing upstream cases over
    the parse_query fold (QueryParser + QueryFactory semantics)."""

    def test_parse_no_specials(self):
        p = parse_query("in the year 2000")
        assert not p.year and not p.size and not p.quality

    def test_parse_site(self):
        p = parse_query("plato site:en.wikipedia.org")
        assert p.domain == "en.wikipedia.org"
        assert p.include == ["plato"]

    def test_parse_site_only_site_tag(self):
        # special flow: the domain's documents stay enumerable; this
        # engine carries the restriction through the domain filter (the
        # reference promotes the dummy site: term into the query list)
        p = parse_query("site:en.wikipedia.org")
        assert p.domain == "en.wikipedia.org"
        assert p.require == ["site:en.wikipedia.org"]
        assert p.include == []

    def test_parse_site_wildcard(self):
        p = parse_query("plato site:*.wikipedia.org")
        assert p.domain == "wikipedia.org"
        assert p.require == ["site:wikipedia.org"]
        assert p.include == ["plato"]

    def test_long_quoted_query_is_rejected(self):
        q = '"' + " ".join(f"word{i}" for i in range(50)) + ' "'
        assert parse_query(q).include == []

    def test_quoted_query_of_reasonable_length(self):
        assert parse_query('"to be or not to be that is the question"').include

    @pytest.mark.parametrize(
        "q,attr,want",
        [
            ("year=2000", "year", "=2000"),
            ("year<2000", "year", "<2000"),
            ("year>2000", "year", ">2000"),
            ("size=2000", "size", "=2000"),
            ("size<2000", "size", "<2000"),
            ("size>2000", "size", ">2000"),
            ("q=2000", "quality", "=2000"),
            ("q<2000", "quality", "<2000"),
            ("q>2000", "quality", ">2000"),
        ],
    )
    def test_spec_limits(self, q, attr, want):
        assert getattr(parse_query(q), attr) == want

    def test_priority_term(self):
        p = parse_query("physics ?tld:edu")
        assert p.priority == ["tld:edu"]
        assert p.include == ["physics"]

    def test_quoted_phrase_with_tokenizer_discarded_token(self):
        p = parse_query('"coca - cola"')
        assert p.include == ["coca", "cola"]
        assert p.phrases == [["coca", "cola"]]

    def test_quoted_phrase_with_asterisk(self):
        p = parse_query('"five * six"')
        assert p.include == ["five", "six"]
        assert p.phrases == [["five", "six"]]

    def test_quoted_phrase_with_junk_word(self):
        p = parse_query('"part number 123456789012345678 in stock"')
        assert p.include == ["part", "number", "in", "stock"]
        assert p.phrases == [["part", "number", "", "in", "stock"]]

    def test_quoted_single_word_possessive(self):
        assert parse_query("\"cat's\"").include == ["cat"]

    def test_negated_quoted_phrase(self):
        p = parse_query('pottery -"artisanal cheese"')
        assert p.include == ["pottery"]
        assert p.exclude == ["artisanal", "cheese"]
        assert p.phrases == []

    def test_promote_non_ranking_terms(self):
        # SearchQuery.promoteNonRankingTerms: advice-only queries rank by
        # the advice terms
        p = parse_query("?physics generator:wiki")
        assert "generator:wiki" in p.include
        assert p.require == []
