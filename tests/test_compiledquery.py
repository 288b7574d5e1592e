"""Compiled-query model parity — vectors transcribed from the
reference's CompiledQueryParserTest.java, CqExpressionTest.java and
CompiledQueryAggregatesTest.java."""

from __future__ import annotations

import pytest

from marginaliasearch_ray.functions.compiledquery import (
    CQ_EMPTY,
    CQ_IGNORE,
    CqAnd,
    CqOr,
    CqWord,
    boolean_aggregate,
    int_max_min_aggregate,
    long_bitmask_aggregate,
    parse_compiled_query,
    queries_aggregate,
)


def _w(q, word):
    return CqWord(q.data.index(word))


def test_empty():
    for s in ("", "( )", "( | )", "| ( | ) |"):
        assert parse_compiled_query(s).root == CQ_EMPTY, s


def test_single_word():
    q = parse_compiled_query("foo")
    assert q.root == _w(q, "foo")


def test_and_two_words():
    q = parse_compiled_query("foo bar")
    assert q.root == CqAnd((_w(q, "foo"), _w(q, "bar")))


def test_or_two_words():
    q = parse_compiled_query("foo | bar")
    assert q.root == CqOr((_w(q, "foo"), _w(q, "bar")))


def test_or_and_words():
    q = parse_compiled_query("foo | bar baz")
    assert q.root == CqOr((_w(q, "foo"), CqAnd((_w(q, "bar"), _w(q, "baz")))))


def test_and_and_or_and_and_words():
    q = parse_compiled_query("foo foobar | bar baz")
    assert q.root == CqOr(
        (
            CqAnd((_w(q, "foo"), _w(q, "foobar"))),
            CqAnd((_w(q, "bar"), _w(q, "baz"))),
        )
    )


def test_complex1():
    q = parse_compiled_query("foo ( bar | baz ) quux")
    assert q.root == CqAnd(
        (_w(q, "foo"), CqOr((_w(q, "bar"), _w(q, "baz"))), _w(q, "quux"))
    )


def test_complex2():
    q = parse_compiled_query("( ( ( a ) b ) c ) d")
    assert q.root == CqAnd(
        (
            CqAnd((CqAnd((_w(q, "a"), _w(q, "b"))), _w(q, "c"))),
            _w(q, "d"),
        )
    )


def test_nested():
    q = parse_compiled_query("( ( ( a ) ) )")
    assert q.root == _w(q, "a")


def test_optional_branch():
    q = parse_compiled_query("foo ( bar | ) baz")
    assert q.root == CqAnd(
        (_w(q, "foo"), CqOr((_w(q, "bar"), CQ_IGNORE)), _w(q, "baz"))
    )


def test_mismatched_parens():
    with pytest.raises(ValueError):
        parse_compiled_query("a ) b")
    with pytest.raises(ValueError):
        parse_compiled_query("( a")


def test_cohen():
    q = parse_compiled_query(
        "( tube brief of elaboration | brief_elaboration_of_a_tube )"
    )
    val = int_max_min_aggregate(
        q, lambda s: {"brief": 3, "tube": 2, "of": 1}.get(s, 0)
    )
    assert val == 0


# ---- CqExpressionTest.java ----


def test_get_paths_trivial():
    assert parse_compiled_query("1").root.paths() == [[0]]
    assert parse_compiled_query("1 2").root.paths() == [[0, 1]]
    assert parse_compiled_query("1 | 2").root.paths() == [[0], [1]]


# ---- CompiledQueryAggregatesTest.java ----


def _b(s):
    return s == "true"


def test_boolean_aggregates():
    assert not boolean_aggregate(parse_compiled_query("false"), _b)
    assert boolean_aggregate(parse_compiled_query("true"), _b)
    assert not boolean_aggregate(parse_compiled_query("false true"), _b)
    assert boolean_aggregate(
        parse_compiled_query("( true ) | ( true false )"), _b
    )
    assert boolean_aggregate(parse_compiled_query("( false ) | ( true )"), _b)
    assert boolean_aggregate(
        parse_compiled_query("( true false ) | ( true true )"), _b
    )
    assert not boolean_aggregate(
        parse_compiled_query("( true false ) | ( true false )"), _b
    )


def test_int_max_min_aggregates():
    assert int_max_min_aggregate(parse_compiled_query("5"), int) == 5
    assert int_max_min_aggregate(parse_compiled_query("5 3"), int) == 3
    assert int_max_min_aggregate(parse_compiled_query("5 3 | 6 7"), int) == 6


# ---- further semantics ----


def test_long_bitmask_aggregate():
    q = parse_compiled_query("a b | c")
    masks = {"a": 0b1100, "b": 0b0110, "c": 0b0001}
    assert long_bitmask_aggregate(q, masks.__getitem__) == 0b0101


def test_queries_aggregate_path_sets():
    q = parse_compiled_query("foo ( bar | baz )")
    ids = {"foo": 10, "bar": 20, "baz": 30}
    assert queries_aggregate(q, ids.__getitem__) == [{10, 20}, {10, 30}]


def test_all_paths_dedup_and_sort():
    # duplicate words along a path collapse (sort+unique), duplicate
    # paths dedup, empty branches drop
    q = parse_compiled_query("a a | a | ( | )")
    assert q.paths == ((0,),)


def test_optional_branch_paths():
    # "foo ( bar | ) baz": the ignore branch yields the path {foo, baz}
    q = parse_compiled_query("foo ( bar | ) baz")
    assert q.paths == ((0, 1, 2), (0, 2))
