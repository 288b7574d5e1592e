"""MathParser / Units conformance (functions/math/.../eval/*.java).

Expected strings are hand-derived from the Java semantics (DecimalFormat
rounds the double's shortest round-trip decimal digits; HALF_UP for the
math formatter, HALF_EVEN with log10/sig-fig digit budgets for units).
The expression set includes every case from the upstream MathParserTest
and UnitsTest.
"""

import math

import pytest

from marginaliasearch_ray.functions.mathparse import (
    MathEvalError,
    MathParseError,
    convert_units,
    eval_formatted,
    eval_math,
)

# --- MathParserTest.parse() cases (MathParserTest.java:14-24) ------------

UPSTREAM_EVAL = [
    ("3+5", "8"),
    ("1+(300+log(5))", "302.609438"),
    ("sqrt(1+300)", "17.349352"),
    ("sqrt(pi)", "1.772454"),
    ("3+5-5", "3"),
    ("3+-5+5", "3"),
    ("3+-5+log 5", "-0.390562"),
    ("log -5", "NaN"),
]


@pytest.mark.parametrize("expr,expected", UPSTREAM_EVAL)
def test_upstream_eval_cases(expr, expected):
    assert eval_formatted(expr) == expected


def test_eval_values():
    assert eval_math("3+5") == 8.0
    assert eval_math("1+(300+log(5))") == 1 + (300 + math.log(5))
    assert eval_math("sqrt(1+300)") == math.sqrt(301)
    assert eval_math("2^10") == 1024.0
    assert eval_math("1+2*3^2") == 19.0
    assert eval_math("(3.5+2)*3") == 16.5
    assert math.isnan(eval_math("1/0"))
    assert eval_math("3--5") == 8.0  # '-' after '-' is unary
    assert eval_math("(5)-3") == 2.0  # '-' after a group stays binary
    assert eval_math("-5") == -5.0  # leading unary minus
    assert eval_math("3*-2") == -6.0


def test_power_is_left_associative_scan():
    # binaryExpression scans left to right for EVERY operator class (the
    # reference has no right-assoc special case for '^'), so 2^3^2
    # reduces as (2^3)^2 = 64, not 2^(3^2) = 512.
    assert eval_math("2^3^2") == 64.0


def test_trivial_fast_path():
    # isTrivial requires a period: "3.5" and ".5" bypass the parser
    assert eval_formatted("3.5") == "3.5"
    assert eval_formatted(".5") == "0.5"
    assert eval_math(".5") == 0.5
    # "35" is NOT trivial but parses fine anyway
    assert eval_formatted("35") == "35"


def test_grouping_and_rounding():
    assert eval_formatted("123456789*1000") == "123,456,789,000"
    assert eval_formatted("2^10") == "1,024"
    # HALF_UP at 6 fraction digits
    assert eval_formatted("1/3") == "0.333333"
    assert eval_formatted("2/3") == "0.666667"


def test_parse_errors_render_empty():
    assert eval_formatted("3 & 5") == ""  # illegal char -> ParseException
    assert eval_formatted("3.4.5 + 1") == ""  # double period
    assert eval_formatted("3\t5") == ""  # tab is NOT Character.isSpaceChar


def test_eval_errors_propagate():
    # unbalanced parens / non-reducing groups are IllegalArgumentException
    # in the reference and are NOT swallowed by evalFormatted
    with pytest.raises(MathEvalError):
        eval_formatted("(3+5")
    with pytest.raises(MathEvalError):
        eval_formatted("log10(1000)")  # 'log10' tokenizes as log,10 — sic
    with pytest.raises(MathEvalError):
        eval_formatted("")


def test_unknown_function_and_constants():
    with pytest.raises(MathEvalError):
        eval_math("frob(5)")
    assert eval_formatted("e") == "2.718282"
    assert eval_formatted("pi") == "3.141593"


# --- UnitsTest cases (UnitsTest.java:8-43) --------------------------------


UPSTREAM_UNITS = [
    (("3.33", "cm", "m"), ".0333 m"),
    (("10", "km", "ft"), "32,808 ft"),
    (("10", "oz", "tons"), ".000283 metric tons"),
    (("10", "pc", "in"), "12,148,336,929,133,859,000 in"),
    (("50", "K", "K"), "50 K"),
    (("50", "F", "K"), "283.2 K"),
    (("50", "C", "K"), "323.2 K"),
    (("50", "K", "F"), "-369.7 F"),
    (("50", "F", "F"), "50 F"),
    (("50", "C", "F"), "122 F"),
    (("50", "K", "C"), "-223.1 C"),
    (("50", "F", "C"), "10 C"),
    (("50", "C", "C"), "50 C"),
]


@pytest.mark.parametrize("args,expected", UPSTREAM_UNITS)
def test_upstream_units_cases(args, expected):
    assert convert_units(*args) == expected


def test_units_misc():
    # same row via different alias names -> echo input with canonical name
    assert convert_units("7.5", "KILOMETERS", "km") == "7.5 km"
    # unknown unit / cross-type -> None
    assert convert_units("1", "km", "kg") is None
    assert convert_units("1", "zork", "m") is None
    # unparseable value -> None
    assert convert_units("x+", "km", "m") is None
    # value may be an expression (Units.java evals through MathParser)
    assert convert_units("3+2", "km", "m") == "5,000 m"
    # negative linear conversion keeps the manual '-' prefix
    assert convert_units("-40", "F", "C") == "-40 C"


def test_units_sigfig_budget():
    # sigFigs counts DIGIT CHARS of the input string: "26.2" -> 3
    # 26.2 * 1609.344 / 1000 = 42.164...; intFraction 1 -> maxFrac 3
    assert convert_units("26.2", "miles", "km") == "42.165 km"
    # sub-1 results get maximumIntegerDigits == 0: bare leading '.'
    assert convert_units("1", "mm", "m") == ".001 m"


def test_nan_and_infinity_formatting():
    assert eval_formatted("log -5") == "NaN"
    assert eval_formatted("0-log(0)") == "∞"  # Math.log(0) = -Inf


def test_extreme_values():
    from marginaliasearch_ray.functions.mathparse import _java_decimal_format

    # the largest double has ~309 integer digits — formatter must not
    # blow its decimal context
    assert _java_decimal_format(1e308, max_frac=6).startswith("100,000")
    assert _java_decimal_format(5e-324, max_frac=6) == "0"
    assert _java_decimal_format(-0.0, max_frac=6) == "-0"
    assert _java_decimal_format(float("inf"), max_frac=6) == "∞"
    assert eval_formatted("2^1000").startswith("10,715,086,071,862,673,")
    # '-' after '^' is NOT a negate position in the reference
    # (negate checks "+-%*/A" only), so 2^-2 fails to reduce — faithfully
    with pytest.raises(MathEvalError):
        eval_formatted("2^-2")
    # overflow to infinity through the pow path
    assert eval_formatted("0-2^1024") == "-∞"
    # zero conversions survive the (int) log10(-inf) int-wrap path
    assert convert_units("0", "m", "km") == "0 km"
    assert convert_units("0", "C", "K") == "273 K"
    # '%' is not a tokenizer char -> ParseException -> ''
    assert eval_formatted("5%0") == ""
