"""Braille-block punch cards (libraries/braille-block-punch-cards/
BrailleBlockPunchCards.java:3-54) — the reference's debug rendering of
bit patterns (position masks, metadata words) as braille dot-matrix
glyphs, one U+2800-block char per byte.

The braille block's historical dot addressing (2x6 extended to 2x8)
forces the bit permutation documented upstream:

    native  0 1 2 3 4 5 6 7  ->  braille 0 1 2 6 3 4 5 7

i.e. ``(v & 0x87) | ((v & 0x70) >> 1) | ((v & 0x08) << 3)``.
"""

from __future__ import annotations

_BRAILLE_BASE = 0x2800


def _bin2brail(v: int) -> int:
    return (v & 0x87) | ((v & 0x70) >> 1) | ((v & 0x08) << 3)


def print_bits(val: int, bits: int) -> str:
    """printBits (java:7-15): one braille char per 8 bits, low byte
    first, ``val`` treated as an unsigned 64-bit word."""
    val &= (1 << 64) - 1
    out = []
    b = 0
    while b < bits:
        out.append(chr(_BRAILLE_BASE + _bin2brail(val & 0xFF)))
        val >>= 8
        b += 8
    return "".join(out)
