"""Math expression evaluator + unit conversion (the assistant service's
"math" function).

Semantics reproduced from the reference:

- ``MathParser`` (functions/math/java/nu/marginalia/functions/math/eval/
  MathParser.java:18-240): trivial-decimal fast path, tokenizer
  (``()+-/*^`` singles, digit runs with at most one period, alphabetic
  runs classified constant/function, Unicode-space skip, anything else a
  parse error), then the exact transform order parenthesize -> negate ->
  functions -> ``^`` -> ``*/`` -> ``+-`` with the reference's quirks:

  * unary minus binds only at position 0 or after one of ``+-%*/A``
    (MathParser.java:73-95) — so ``3--5`` parses as ``3 - (-5)`` but
    ``(5)-3`` keeps the binary minus;
  * a function token applies to exactly the ONE following token
    (MathParser.java:110-120), hence ``log 5 + 1`` is ``log(5) + 1``;
  * division / modulo by zero evaluate to NaN, not an error
    (MathParser.java:368-380);
  * a group that does not reduce to a single token raises (the Java
    ``IllegalArgumentException`` — NOT swallowed by ``evalFormatted``,
    which only catches number-format/parse errors, MathParser.java:38).

  ``eval_formatted`` renders through the Java
  ``DecimalFormat.getInstance(Locale.US)`` conventions: grouping by 3,
  HALF_UP, max 6 fraction digits, no trailing zeros (MathParser.java:24-41).
  Java's DecimalFormat rounds the double's SHORTEST round-trip decimal
  representation (FloatingDecimal digits), which is exactly Python
  ``repr(float)`` — not the exact binary expansion.

- ``Units`` (functions/math/java/nu/marginalia/functions/math/eval/
  Units.java:16-124) + the packaged units.csv (functions/math/resources/
  units.csv, transcribed verbatim as data below): case-insensitive name
  lookup, identity short-circuit (same csv ROW -> echo the input string),
  cross-type refusal, C/F/K temperature special cases, otherwise
  ``from.base * value / to.base``; the result is formatted with a
  default ``new DecimalFormat()`` (HALF_EVEN) whose integer/fraction
  digit budgets derive from ``(int) log10(|value|)`` and the count of
  digit characters in the input string (Units.java:79-90) — including
  the quirk that a sub-1 result gets ``maximumIntegerDigits == 0`` and
  formats with a bare leading ``.``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal, localcontext
from typing import Callable, Optional

__all__ = [
    "MathParseError",
    "MathEvalError",
    "eval_math",
    "eval_formatted",
    "convert_units",
]


class MathParseError(ValueError):
    """Java ParseException / NumberFormatException analog (swallowed by
    eval_formatted)."""


class MathEvalError(ValueError):
    """Java IllegalArgumentException analog (NOT swallowed)."""


_TRIVIAL = re.compile(r"[0-9]+\.[0-9]*|\.[0-9]+")

_CONSTANTS = {"e": math.e, "pi": math.pi, "2pi": 2 * math.pi}

_FUNCTIONS: dict[str, Callable[[float], float]] = {
    "sqrt": lambda v: math.sqrt(v) if v >= 0 else float("nan"),
    "log": lambda v: math.log(v) if v > 0 else _log_edge(v),
    "log10": lambda v: math.log10(v) if v > 0 else _log_edge(v),
    "log2": lambda v: (math.log(v) / math.log(2)) if v > 0 else _log_edge(v),
    "cos": math.cos,
    "sin": math.sin,
    "tan": math.tan,
}


def _log_edge(v: float) -> float:
    # Java Math.log(0) == -Infinity, Math.log(negative) == NaN; Python's
    # math.log raises instead.
    return float("-inf") if v == 0 else float("nan")


# --- token model (mirrors the Token class family) -----------------------


class _Tok:
    __slots__ = ("t",)

    def __init__(self, t: str):
        self.t = t

    def evaluate(self) -> float:
        raise MathEvalError(f"Can't evaluate {self!r}")

    def transform(self, mapper) -> None:
        pass


class _Str(_Tok):
    __slots__ = ("value",)

    def __init__(self, t: str, value: str):
        super().__init__(t)
        self.value = value

    def evaluate(self) -> float:
        cv = _CONSTANTS.get(self.value)
        if cv is not None:
            return cv
        try:
            return float(self.value)
        except ValueError as e:  # NumberFormatException
            raise MathParseError(str(e)) from None


class _Uni(_Tok):
    __slots__ = ("arg",)

    def __init__(self, t: str, arg: _Tok):
        super().__init__(t)
        self.arg = arg

    def evaluate(self) -> float:
        if self.t == "~":
            return -self.arg.evaluate()
        raise MathEvalError(f"Can't evaluate {self!r}")

    def transform(self, mapper) -> None:
        self.arg.transform(mapper)


class _Group(_Tok):
    __slots__ = ("args",)

    def __init__(self, args: list[_Tok]):
        super().__init__(" ")
        self.args = args

    def evaluate(self) -> float:
        if len(self.args) == 1:
            return self.args[0].evaluate()
        raise MathEvalError(f"Can't evaluate group of {len(self.args)}")

    def transform(self, mapper) -> None:
        self.args = mapper(self.args)


class _Bi(_Tok):
    __slots__ = ("left", "right")

    def __init__(self, t: str, left: _Tok, right: _Tok):
        super().__init__(t)
        self.left = left
        self.right = right

    def transform(self, mapper) -> None:
        self.left.transform(mapper)
        self.right.transform(mapper)

    def evaluate(self) -> float:
        # the reference evaluates the right side first (MathParser.java:360)
        rv = self.right.evaluate()
        t = self.t
        if t == "+":
            return self.left.evaluate() + rv
        if t == "-":
            return self.left.evaluate() - rv
        if t == "*":
            return self.left.evaluate() * rv
        if t == "/":
            if rv == 0:
                return float("nan")
            return self.left.evaluate() / rv
        if t == "%":
            if rv == 0:
                return float("nan")
            return math.fmod(self.left.evaluate(), rv)  # Java % on doubles
        if t == "^":
            return _java_pow(self.left.evaluate(), rv)
        if t == "F":
            assert isinstance(self.left, _Str)
            fn = _FUNCTIONS.get(self.left.value.lower())
            if fn is None:
                raise MathEvalError(f"Can't evaluate function {self.left.value}")
            return fn(rv)
        raise MathEvalError(f"Can't evaluate {t}")


def _java_pow(a: float, b: float) -> float:
    # Math.pow never raises; Python ** returns complex for negative base
    # with fractional exponent (Java: NaN) and raises on 0**-n / overflow.
    odd_int = b == int(b) and int(b) % 2 != 0
    try:
        r = a**b
    except ZeroDivisionError:  # Math.pow(±0, negative)
        neg = math.copysign(1.0, a) < 0 and odd_int
        return float("-inf") if neg else float("inf")
    except OverflowError:  # finite operands, infinite result
        return float("-inf") if (a < 0 and odd_int) else float("inf")
    if isinstance(r, complex):
        return float("nan")
    return float(r)


# --- tokenizer / transforms (exact MathParser.java order) ----------------


def _tokenize(expr: str) -> list[_Tok]:
    tokens: list[_Tok] = []
    i = 0
    n = len(expr)
    while i < n:
        c = expr[i]
        if c in "()+-/*^":
            tokens.append(_Tok(c))
            i += 1
        elif c.isdigit():
            j = i + 1
            has_period = False
            while j < n:
                c2 = expr[j]
                if c2.isdigit():
                    j += 1
                    continue
                if c2 == ".":
                    if not has_period:
                        has_period = True
                        j += 1
                        continue
                    raise MathParseError(f"Malformatted number in {expr} at {j}")
                break
            tokens.append(_Str("0", expr[i:j]))
            i = j
        elif c.isalpha():
            j = i + 1
            while j < n and expr[j].isalpha():
                j += 1
            s = expr[i:j]
            tokens.append(_Str("C" if s in _CONSTANTS else "A", s))
            i = j
        elif _is_space_char(c):
            i += 1
        else:
            raise MathParseError(f"{expr} at {i}")
    return tokens


def _is_space_char(c: str) -> bool:
    # Character.isSpaceChar: Unicode space categories only ('\t' is NOT
    # a space char and parses as an error, faithfully).
    import unicodedata

    return unicodedata.category(c) in ("Zs", "Zl", "Zp")


def _parenthesize(tokens: list[_Tok]) -> list[_Tok]:
    i = 0
    depth = 0
    while i < len(tokens):
        t = tokens[i]
        if t.t == ")":
            raise MathEvalError("Unbalanced parentheses")
        if t.t == "(":
            j = i + 1
            while j < len(tokens):
                t2 = tokens[j]
                if t2.t == "(":
                    depth += 1
                elif t2.t == ")":
                    if depth == 0:
                        break
                    depth -= 1
                j += 1
            if j == len(tokens):
                raise MathEvalError(f"Unbalanced parentheses, depth = {depth}")
            tokens[i] = _Group(_parenthesize(tokens[i + 1 : j]))
            del tokens[i + 1 : j + 1]
        i += 1
    return tokens


def _negate(tokens: list[_Tok]) -> list[_Tok]:
    if not tokens:
        return tokens
    for t in tokens:
        t.transform(_negate)
    i = 0
    while i < len(tokens) - 1:
        t = tokens[i]
        if t.t != "-":
            i += 1
            continue
        if i == 0:
            tokens[0] = _Uni("~", tokens[1])
            del tokens[1]
            continue
        t2 = tokens[i - 1]
        if t2.t in "+-%*/A":
            tokens[i] = _Uni("~", tokens[i + 1])
            del tokens[i + 1]
            continue
        i += 1
    return tokens


def _functions(tokens: list[_Tok]) -> list[_Tok]:
    if not tokens:
        return tokens
    for t in tokens:
        t.transform(_functions)
    i = 0
    while i < len(tokens) - 1:
        t = tokens[i]
        if t.t != "A":
            i += 1
            continue
        tokens[i] = _Bi("F", t, tokens[i + 1])
        del tokens[i + 1]
    return tokens


def _binary(tokens: list[_Tok], operators: str) -> list[_Tok]:
    for t in tokens:
        t.transform(lambda toks: _binary(toks, operators))
    i = 1
    while i < len(tokens) - 1:
        t = tokens[i]
        if t.t in operators:
            tokens[i] = _Bi(t.t, tokens[i - 1], tokens[i + 1])
            del tokens[i + 1]
            del tokens[i - 1]
            # Java sets i=i-1 then the for-update restores it: net the
            # SAME index is examined next (now holding the shifted-left
            # successor token), never index i-1 (the new node itself).
            continue
        i += 1
    return tokens


def eval_math(expr: str) -> float:
    """MathParser.eval — raises MathParseError / MathEvalError."""
    if _TRIVIAL.fullmatch(expr):
        return float(expr)
    tokens = _tokenize(expr)
    tokens = _parenthesize(tokens)
    tokens = _negate(tokens)
    tokens = _functions(tokens)
    tokens = _binary(tokens, "^")
    tokens = _binary(tokens, "*/")
    tokens = _binary(tokens, "+-")
    return _Group(tokens).evaluate()


# --- Java DecimalFormat rendering ----------------------------------------


def _java_decimal_format(
    v: float,
    *,
    max_frac: int,
    max_int: Optional[int] = None,
    rounding: str = ROUND_HALF_UP,
) -> str:
    """Format a double the way java.text.DecimalFormat ("#,##0.###"-family
    pattern: grouping size 3, min fraction 0, min integer 1) does after
    setMaximumFractionDigits(max_frac) / setMaximumIntegerDigits(max_int).

    Mirrors the two non-obvious behaviors: rounding applies to the
    SHORTEST round-trip decimal digits of the double (repr), and the
    integer part is TRUNCATED to its trailing ``max_int`` digits
    (max_int == 0 yields a bare leading '.')."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "∞" if v > 0 else "-∞"
    neg = math.copysign(1.0, v) < 0
    max_frac = max(0, max_frac)
    with localcontext() as ctx:
        # quantize needs (integer digits + max_frac) precision: up to
        # ~309 integer digits for the largest double + a 340 budget
        ctx.prec = 800
        d = Decimal(repr(abs(v)))
        q = d.quantize(Decimal(1).scaleb(-max_frac), rounding=rounding)
    sign, digits, exp = q.as_tuple()
    ds = "".join(map(str, digits))
    if exp > 0:  # integral value normalized with positive exponent
        ds += "0" * exp
        exp = 0
    if -exp > len(ds):
        ds = "0" * (-exp - len(ds)) + ds
    int_part = ds[: len(ds) + exp] if exp else ds
    frac_part = ds[len(ds) + exp :] if exp else ""
    frac_part = frac_part.rstrip("0")  # minimumFractionDigits == 0
    if max_int is not None:
        int_part = int_part[-max_int:] if max_int > 0 else ""
    int_part = int_part.lstrip("0")
    if not int_part and max_int != 0:
        int_part = "0"  # minimumIntegerDigits == 1
    # grouping size 3
    if len(int_part) > 3:
        rev = int_part[::-1]
        int_part = ",".join(rev[k : k + 3] for k in range(0, len(rev), 3))[::-1]
    out = int_part
    if frac_part:
        out += "." + frac_part
    elif not int_part:
        out = "0"  # nothing survived on either side
    return ("-" + out) if neg else out


def eval_formatted(expr: str) -> str:
    """MathParser.evalFormatted — Locale.US, HALF_UP, 6 fraction digits;
    parse/number errors render as ''. (MathParser.java:30-42)"""
    try:
        if _TRIVIAL.fullmatch(expr):
            return _java_decimal_format(float(expr), max_frac=6)
        return _java_decimal_format(eval_math(expr), max_frac=6)
    except MathEvalError:
        raise
    except (MathParseError, ValueError):
        return ""


# --- Units ----------------------------------------------------------------

# functions/math/resources/units.csv transcribed verbatim (value, type,
# names...); duplicated rows kept so the name->row mapping matches the
# reference's last-insert-wins HashMap fill (Units.java:29-40).
_UNITS_CSV: tuple[tuple[float, str, tuple[str, ...]], ...] = (
    (30856775800000000, "DISTANCE", ("pc", "parsec", "parsecs")),
    (9460500000000000, "DISTANCE", ("ly", "light years", "light year")),
    (149597870700, "DISTANCE", ("au", "astronomical unit")),
    (1000, "DISTANCE", ("km", "kilometers", "kilometer")),
    (1, "DISTANCE", ("m", "meters", "meter")),
    (0.1, "DISTANCE", ("dm", "decimeters", "decimeter")),
    (0.01, "DISTANCE", ("cm", "centimeters", "centimeter")),
    (0.001, "DISTANCE", ("mm", "millimeters", "millimeter")),
    (0.9144, "DISTANCE", ("yd", "yards", "yard")),
    (0.0254, "DISTANCE", ("in", "inches", "inch")),
    (0.3048, "DISTANCE", ("ft", "feet", "foot")),
    (0.3048, "DISTANCE", ("ft", "feet", "foot")),
    (1609.344, "DISTANCE", ("miles", "mile")),
    (1852, "DISTANCE", ("nautical miles", "nautical mile")),
    (201.168, "DISTANCE", ("furlong", "furlongs")),
    (1, "WEIGHT", ("kg", "kilograms", "kilogram")),
    (0.001, "WEIGHT", ("g", "grams", "gram")),
    (1000, "WEIGHT", ("metric tons", "ton", "tons", "tonne", "tonnes")),
    (907.185, "WEIGHT", ("short tons", "short ton", "imperial ton", "imperial tons", "")),
    (0.45359237, "WEIGHT", ("lb", "lbs", "pounds")),
    (0.0283495231, "WEIGHT", ("oz", "ounces", "ounce")),
    (1, "AREA", ("m^2", "square meters", "square meter")),
    (0.01, "AREA", ("dm^2", "square decimeters", "square decimeter")),
    (0.0001, "AREA", ("cm^2", "square centimeters", "square centimeter")),
    (0.000001, "AREA", ("mm^2", "square millimeters", "square millimeter")),
    (1000000, "AREA", ("km^2", "square kilometers", "square kilometer")),
    (4046.9, "AREA", ("ac", "acre", "acres")),
    (2589988.1103360, "AREA", ("sq mi", "mi^2", "square miles", "square mile")),
    (258.99881103360, "AREA", ("hectares", "hectare")),
    (0.09290304, "AREA", ("ft^2", "square foot", "square feet")),
    (0.83612736, "AREA", ("yd^2", "square yard", "square yards")),
    (0.00064516, "AREA", ("in^2", "square inch", "square inches")),
    (1, "VOLUME", ("m^3", "cubic meter", "cubic meters")),
    (1000000000, "VOLUME", ("km^3", "cubic kilometer", "cubic kilometers")),
    (0.001, "VOLUME", ("L", "l", "dm^3", "liter", "liters", "cubic decimeter", "cubic decimeter")),
    (0.0001, "VOLUME", ("dl", "deciliter", "deciliters")),
    (0.0001, "VOLUME", ("cl", "centiliter", "centiliters")),
    (0.00001, "VOLUME", ("ml", "milliliter", "milliliters")),
    (0.000001, "VOLUME", ("cm^3", "cc", "cubic centimeter", "cubic centimeters")),
    (0.000000001, "VOLUME", ("mm^3", "cubic millimeter", "cubic millimeters")),
    (0.000236588237, "VOLUME", ("us cup", "cup", "cups")),
    (0.0000295735296, "VOLUME", ("fl.oz.", "fl oz", "fluid ounces", "fluid ounce")),
    (0.028316846592, "VOLUME", ("ft^3", "cubic foot", "cubic feet")),
    (0.000016387064, "VOLUME", ("in^3", "cubic inch", "cubic inches")),
    (0.764554857984, "VOLUME", ("yd^3", "cubic yard", "cubic yards")),
    (0.000473176473, "VOLUME", ("US pint", "pint", "pints")),
    (0.00378541178, "VOLUME", ("gallon", "gallons")),
    (1, "TEMPERATURE", ("C", "c", "celsius", "centigrade")),
    (0, "TEMPERATURE", ("F", "f", "fahrenheit", "fahrenheit")),
    (0, "TEMPERATURE", ("K", "k", "kelvin", "kelvins")),
    (1, "TIME", ("S", "s", "second", "seconds")),
    (0.001, "TIME", ("ms", "millisecond")),
    (60, "TIME", ("min", "minutes")),
    (3600, "TIME", ("hour", "hours")),
    (864000, "TIME", ("day", "days")),  # sic — the reference data says 864000
    (604800, "TIME", ("week", "weeks")),
    (31557600.0, "TIME", ("year", "years")),
    (31557600.0, "TIME", ("year", "years")),
    (315576000.0, "TIME", ("decade", "decades")),
    (3155760000.0, "TIME", ("century", "centuries")),
    (1, "ANGLE", ("degree", "degrees")),
    (57.2957795, "ANGLE", ("radians", "radian")),
)


@dataclass(frozen=True, eq=False)  # eq=False: Unit.java has identity equality
class _Unit:
    base: float
    type: str
    name: str  # vals[2] — the canonical (first) name


def _build_units() -> dict[str, _Unit]:
    by_name: dict[str, _Unit] = {}
    for base, typ, names in _UNITS_CSV:
        u = _Unit(float(base), typ, names[0])
        for nm in names:
            by_name[nm.lower()] = u
    return by_name


_UNITS_BY_NAME = _build_units()


def _convert_temperature(v: float, frm: _Unit, to: _Unit) -> float:
    if frm.name == "C":
        if to.name == "K":
            return v + 273.15
        if to.name == "F":
            return 32.0 + 9 * v / 5
    elif frm.name == "F":
        if to.name == "C":
            return 5 * (v - 32.0) / 9
        if to.name == "K":
            return 5 * (v - 32.0) / 9 + 273.15
    elif frm.name == "K":
        if to.name == "C":
            return v - 273.15
        if to.name == "F":
            return 32.0 + 9 * (v - 273.15) / 5
    return 0.0


def convert_units(value: str, from_name: str, to_name: str) -> Optional[str]:
    """Units.convert — None where the Java Optional is empty."""
    frm = _UNITS_BY_NAME.get(from_name.lower())
    to = _UNITS_BY_NAME.get(to_name.lower())
    if frm is None or to is None:
        return None
    if frm is to:
        return f"{value} {frm.name}"
    if frm.type != to.type:
        return None
    try:
        val = eval_math(value)
    except (MathParseError, MathEvalError, ValueError):
        return None
    if frm.type == "TEMPERATURE":
        converted = _convert_temperature(val, frm, to)
    else:
        converted = frm.base * val / to.base
    negative = converted < 0
    if negative:
        converted = -converted
    # (int) Math.log10 truncates toward zero; log10(0) is -inf -> INT_MIN
    lg = math.log10(converted) if converted > 0 else float("-inf")
    int_fraction = int(lg) if math.isfinite(lg) else -(2**31)
    sig_figs = sum(ch.isdigit() for ch in value)

    def _i32(x: int) -> int:  # Java int arithmetic wraps silently
        return (x + 2**31) % 2**32 - 2**31

    # DecimalFormat clamps negative digit budgets to 0 and caps fraction
    # digits at 340 (DOUBLE_FRACTION_DIGITS).
    formatted = _java_decimal_format(
        converted,
        max_frac=min(340, max(0, _i32(1 + sig_figs - int_fraction))),
        max_int=max(0, _i32(1 + int_fraction)),
        rounding=ROUND_HALF_EVEN,
    )
    return ("-" if negative else "") + f"{formatted} {to.name}"
