"""QWordGraph / renderer / expansion parity.

Vectors transcribed from the reference's QWordGraphTest.java (including
the upstream-@flaky testCompile5, whose expected string our
deterministic smallest-ord tie rule reproduces), plus strategy-level
tests against QueryExpansion.java semantics and NgramLexicon
sliding-window segmentation."""

from __future__ import annotations

import pytest

from marginaliasearch_ray.functions.qwordgraph import (
    Expansion,
    QWordGraph,
    clean_ngram_terms,
    create_segments,
    expand_query,
    find_segment_offsets,
    list_full_constraints,
    list_paths,
    render,
    rolling_ordered_hash,
    term_hash,
    title_lexicon_hashes,
)
from marginaliasearch_ray.functions.stem import porter_stem


def _zero_freq(_stem: str) -> int:
    return 0


# ---- QWordGraphTest.java ----


def test_repetition():
    g = QWordGraph(["to", "be", "or", "not", "to", "be"])
    assert g.compile_to_query() == "to be or not to be"


def test_bridging():
    g = QWordGraph(["first", "middle", "end"])
    g.add_link(g.node("first"), g.node("end"))
    assert g.compile_to_query() == "first ( middle | ) end"


def test_forward_reachability():
    g = QWordGraph(["q", "b", "c"])
    g.add_variant(g.node("b"), "d")
    r = g.forward_reachability()
    beg = g.node(" ^ ")
    assert r[g.node("q")] == {beg}
    assert r[g.node("b")] == {beg, g.node("q")}
    assert r[g.node("d")] == {beg, g.node("q")}
    assert r[g.node("c")] == {beg, g.node("q"), g.node("b"), g.node("d")}
    assert r[g.node(" $ ")] == {
        beg, g.node("q"), g.node("b"), g.node("d"), g.node("c")
    }


def test_reverse_reachability():
    g = QWordGraph(["q", "b", "c"])
    g.add_variant(g.node("b"), "d")
    r = g.reverse_reachability()
    end = g.node(" $ ")
    assert r[g.node("c")] == {end}
    assert r[g.node("b")] == {end, g.node("c")}
    assert r[g.node("d")] == {end, g.node("c")}
    assert r[g.node("q")] == {end, g.node("c"), g.node("b"), g.node("d")}
    assert r[g.node(" ^ ")] == {
        end, g.node("c"), g.node("b"), g.node("d"), g.node("q")
    }


def test_compile1():
    g = QWordGraph(["q", "b", "c"])
    g.add_variant(g.node("b"), "d")
    assert g.compile_to_query() == "q ( b | d ) c"


def test_compile2():
    g = QWordGraph(["b", "c", "d"])
    assert g.compile_to_query() == "b c d"


def test_compile3():
    g = QWordGraph(["q", "b", "c"])
    g.add_variant(g.node("q"), "d")
    assert g.compile_to_query() == "( q | d ) b c"


def test_compile4():
    g = QWordGraph(["q", "b", "c"])
    g.add_variant(g.node("c"), "d")
    assert g.compile_to_query() == "q b ( c | d )"


def test_compile5_upstream_flaky_case():
    # upstream tags this @flaky (variant order is HashMap-dependent);
    # our smallest-ord tie rule reproduces its expected string
    g = QWordGraph(["q", "b", "c"])
    g.add_variant(g.node("c"), "d")
    g.add_variant(g.node("b"), "e")
    assert g.compile_to_query() == "q ( b ( c | d ) | e ( c | d ) )"


def test_path_cap():
    # 2^k paths explode past MAX_PATHS and are truncated, not an error
    g = QWordGraph([f"w{i}" for i in range(6)])
    for i in range(6):
        g.add_variant(g.node(f"w{i}"), f"v{i}")
    assert len(list_paths(g)) == 16


# ---- expansion strategies ----


def test_join_dashes():
    e = expand_query(["lawn-chair"], _zero_freq, {})
    assert "lawnchair" in e.compiled_query
    assert "lawn-chair" in e.compiled_query


def test_ngram_all_variant():
    e = expand_query(["mechanical", "keyboard"], _zero_freq, {})
    assert e.compiled_query == "( mechanical keyboard | mechanical_keyboard )"
    # ngram paths are excluded from full constraints
    assert e.full_phrase_constraints == [["mechanical", "keyboard"]]


def test_join_terms_dict_coherence():
    # scoreCombo > scoreA + scoreB promotes the joined word
    freqs = {porter_stem("lawnchair"): 100,
             porter_stem("lawn"): 10, porter_stem("chair"): 20}
    e = expand_query(
        ["lawn", "chair"], lambda s: freqs.get(s, 0), {}
    )
    assert "lawnchair" in e.compiled_query
    # and without the dict signal it is not added
    e2 = expand_query(["lawn", "chair"], _zero_freq, {})
    assert "lawnchair" not in e2.compiled_query


def test_join_terms_alpha_numeric():
    e = expand_query(["trs", "80"], _zero_freq, {})
    assert "trs80" in e.compiled_query
    assert "trs-80" in e.compiled_query


def test_category_keywords_last_word_only():
    e = expand_query(["guitar", "wiki"], _zero_freq, {})
    assert "generator:wiki" in e.compiled_query
    e2 = expand_query(["wiki", "guitar"], _zero_freq, {})
    assert "generator:wiki" not in e2.compiled_query


def test_joiner_variants_vs():
    e = expand_query(["ford", "vs", "chevrolet"], _zero_freq, {})
    # 'vs' becomes optional (bridge) and gains an 'and' variant
    assert "and" in e.compiled_query
    assert ["ford", "chevrolet"] in e.full_phrase_constraints
    assert ["ford", "vs", "chevrolet"] in e.full_phrase_constraints


def test_noun_plural_forms_en():
    e = expand_query(
        ["garden", "chair"], _zero_freq, {},
        noun_variants={"chair": ["chairs"]},
    )
    assert "chairs" in e.compiled_query
    # non-English chain skips the plural strategy
    e2 = expand_query(
        ["garden", "chair"], _zero_freq, {},
        noun_variants={"chair": ["chairs"]}, lang_iso_code="sv",
    )
    assert "chairs" not in e2.compiled_query


# ---- ngram lexicon segmentation ----


def _lex(*phrases: str) -> dict[int, int]:
    counts: dict[int, int] = {}
    for p in phrases:
        h = rolling_ordered_hash([porter_stem(w) for w in p.split(" ")])
        counts[h] = counts.get(h, 0) + 1
    return counts


def test_find_segment_offsets_window():
    lex = _lex("elden ring", "duke nukem 3d")
    parts = [porter_stem(w) for w in
             ["elden", "ring", "duke", "nukem", "3d"]]
    assert find_segment_offsets(lex, 2, parts) == [(0, 2, 1)]
    assert find_segment_offsets(lex, 3, parts) == [(2, 3, 1)]
    assert find_segment_offsets(lex, 6, parts) == []


def test_create_segments_spans_and_constraints():
    lex = _lex("elden ring", "mechanical keyboard")
    words = ["elden", "ring", "mechanical", "keyboard"]
    e = expand_query(words, _zero_freq, lex)
    assert e.optional_phrase_constraints == [
        ["elden", "ring"],
        ["mechanical", "keyboard"],
    ]
    # segment variants appear only AFTER rendering (Java arg order):
    # the compiled query carries the ngramAll full join but NOT the
    # per-segment tokens added by createSegments
    tokens = e.compiled_query.split()
    assert "elden_ring" not in tokens
    assert "mechanical_keyboard" not in tokens
    assert "elden_ring_mechanical_keyboard" in tokens


def test_two_word_query_has_no_segments():
    # createSegments scans lengths 2..min(10, n)-1 EXCLUSIVE — a
    # two-word query never consults the lexicon (java:219)
    lex = _lex("elden ring")
    e = expand_query(["elden", "ring"], _zero_freq, lex)
    assert e.optional_phrase_constraints == []


def test_clean_ngram_terms():
    assert clean_ngram_terms(["foo bar (baz)"]) == ["foo bar"]
    assert clean_ngram_terms(["list of chairs and tables"]) == [
        "chairs and tables"
    ]
    assert clean_ngram_terms(["foo bar."]) == ["foo bar"]
    assert clean_ngram_terms(["single"]) == []
    assert clean_ngram_terms(["x " + "y" * 70]) == []


def test_title_lexicon_hashes():
    hs = title_lexicon_hashes("Elden_Ring")
    assert hs == [rolling_ordered_hash([porter_stem("elden"),
                                        porter_stem("ring")])]
    assert title_lexicon_hashes("Single") == []


def test_ordered_hash_is_order_sensitive():
    a, b = term_hash("alpha"), term_hash("beta")
    assert rolling_ordered_hash(["alpha", "beta"]) != rolling_ordered_hash(
        ["beta", "alpha"]
    )
    assert rolling_ordered_hash(["alpha"]) == a
    assert rolling_ordered_hash(["alpha", "beta"]) == ((a << 1) & ((1 << 64) - 1) | (a >> 63)) ^ b


class TestHasherGroupTestVectors:
    """HasherGroupTest.java ordered() — the upstream assertions, literal
    (the unordered variant has no consumer in this engine)."""

    def test_ordered(self):
        from marginaliasearch_ray.functions.qwordgraph import (
            ordered_hash_apply,
            ordered_hash_replace,
        )

        a, b, c = 5, 3, 2
        assert ordered_hash_apply(a, b) != ordered_hash_apply(b, a)
        assert ordered_hash_apply(b, c) == ordered_hash_replace(
            ordered_hash_apply(a, b), c, a, 2
        )


class TestNgramLexiconTestVector:
    """NgramLexiconTest.java findSegments — literal."""

    def test_find_segments(self):
        from marginaliasearch_ray.functions.qwordgraph import (
            find_segment_offsets,
            rolling_ordered_hash,
        )

        counts = {
            rolling_ordered_hash(["hello", "world"]): 1,
            rolling_ordered_hash(["rye", "bread"]): 1,
            rolling_ordered_hash(["rye", "world"]): 1,
        }
        words = ["hello", "world", "rye", "bread"]
        segs = [
            words[s : s + l] for s, l, _ in find_segment_offsets(counts, 2, words)
        ]
        assert segs == [["hello", "world"], ["rye", "bread"]]
