"""Coded-sequence byte parity (libraries/coded-sequence).

Vectors transcribed from the reference unit tests:
- BitWriterTest.java (bit-level byte patterns, int overflow, gamma/delta
  round-trips)
- EliasGammaSequenceIteratorTest.java (codec vectors, empty, readCount)
- VarintCodedSequenceTest.java (testSimple / testEmpty)
plus hypothesis round-trip properties over random strictly-increasing
sequences for both codecs.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marginaliasearch_ray.functions.codedseq import (
    BitReader,
    BitWriter,
    gamma_decode,
    gamma_encode,
    gamma_value_count,
    varint_decode,
    varint_encode,
    varint_value_count,
)


# ---- BitWriterTest.java vectors ----


def test_put_bits_full_byte():
    w = BitWriter()
    for b in (False, True, True, True, True, True, True, False):
        w.put_bit(b)
    assert w.finish() == bytes([0b0111_1110])


def test_put_bits_partial_byte():
    w = BitWriter()
    for b in (True, False, True, True, True, True, True):
        w.put_bit(b)
    assert w.finish() == bytes([0b1011_1110])


def test_put_bits_one_and_a_half_byte():
    w = BitWriter()
    for b in (True, False, True, True, True, True, True, False, True, True):
        w.put_bit(b)
    assert w.finish() == bytes([0b1011_1110, 0b1100_0000])


def test_put_bits_int_overflow():
    w = BitWriter()
    for _ in range(4):
        for b in (True, False, True, True, True, True, True, False):
            w.put_bit(b)
    w.put_bit(True)
    w.put_bit(True)
    assert w.finish() == bytes([0b1011_1110] * 4 + [0b1100_0000])


def test_put1():
    w = BitWriter()
    w.put_bits(1, 1)
    assert w.finish() == bytes([0b1000_0000])


def test_put4():
    w = BitWriter()
    w.put_bits(1, 4)
    assert w.finish() == bytes([0b0001_0000])


def test_put8():
    w = BitWriter()
    w.put_bits(3, 8)
    assert w.finish() == bytes([0b0000_0011])


def test_put8_all_ones():
    w = BitWriter()
    w.put_bits(~0, 8)
    assert w.finish() == bytes([0b1111_1111])


def test_put8_3():
    w = BitWriter()
    w.put_bits(~0, 8)
    w.put_bits(0, 8)
    w.put_bits(~0, 8)
    w.put_bits(1, 1)
    assert w.finish() == bytes(
        [0b1111_1111, 0, 0b1111_1111, 0b1000_0000]
    )


def test_int_overflow():
    w = BitWriter()
    w.put_bits(~0, 24)
    w.put_bits(0, 16)
    w.put_bits(1, 1)
    assert w.finish() == bytes([0xFF, 0xFF, 0xFF, 0, 0, 0b1000_0000])


def test_int_overflow_misaligned():
    w = BitWriter()
    w.put_bits(0, 2)
    w.put_bits(~0, 24)
    w.put_bits(0, 16)
    w.put_bits(1, 1)
    assert w.finish() == bytes(
        [0b0011_1111, 0xFF, 0xFF, 0b1100_0000, 0, 0b0010_0000]
    )


def test_fuzz_case_1():
    w = BitWriter()
    w.put_bits(1, 6)
    w.put_bits(702, 11)
    r = BitReader(w.finish())
    assert r.get(6) == 1
    assert r.get(11) == 702


def test_fuzz_case_2():
    w = BitWriter()
    w.put_bits(0, 6)
    w.put_bits(0, 2)
    out = w.finish()
    assert out == bytes([0])
    r = BitReader(out)
    assert r.get(6) == 0
    assert r.get(2) == 0


def test_writer_reader_fuzz():
    rng = random.Random(1234)
    for _ in range(1000):
        w = BitWriter()
        aw = rng.randint(1, 30)
        bw = rng.randint(1, 30)
        a = rng.randint(0, (1 << aw) - 1)
        b = rng.randint(0, (1 << bw) - 1)
        w.put_bits(a, aw)
        w.put_bits(b, bw)
        r = BitReader(w.finish())
        assert r.get(aw) == a
        assert r.get(bw) == b


def test_gamma_roundtrip():
    w = BitWriter()
    w.put_gamma(1)
    w.put_gamma(2)
    w.put_gamma(30)
    r = BitReader(w.finish())
    assert r.get_gamma() == 1
    assert r.get_gamma() == 2
    assert r.get_gamma() == 30


def test_delta_roundtrip():
    w = BitWriter()
    w.put_delta(1)
    w.put_delta(2)
    w.put_delta(30)
    r = BitReader(w.finish())
    assert r.get_delta() == 1
    assert r.get_delta() == 2
    assert r.get_delta() == 30


def test_gamma_misaligned():
    w = BitWriter()
    w.put_bits(0, 2)
    w.put_gamma(4)
    w.put_bits(0, 2)
    w.put_gamma(2)
    r = BitReader(w.finish())
    r.get(2)
    assert r.get_gamma() == 4
    r.get(2)
    assert r.get_gamma() == 2


# ---- EliasGammaSequenceIteratorTest.java vectors ----


def test_gamma_codec():
    assert gamma_decode(gamma_encode([1, 3, 5, 16, 32, 64])) == [1, 3, 5, 16, 32, 64]


def test_gamma_codec_empty():
    assert gamma_decode(gamma_encode([])) == []
    # encode of an empty list is gamma(1) = a single '1' bit
    assert gamma_encode([]) == bytes([0b1000_0000])


def test_gamma_value_count():
    assert gamma_value_count(gamma_encode([1, 3, 5, 16, 32, 64])) == 6
    assert gamma_value_count(b"") == 0


def test_gamma_codec2():
    assert gamma_decode(gamma_encode([1, 256])) == [1, 256]


def test_gamma_fuzz_pairs():
    rng = random.Random(7)
    for _ in range(1000):
        seq = [1, 1 + rng.randint(1, 511)]
        assert gamma_decode(gamma_encode(seq)) == seq


# ---- VarintCodedSequenceTest.java vectors ----


def test_varint_simple():
    seq = [1, 3, 5, 16, 1024, 2048, 40000, 268435446]
    data = varint_encode(seq)
    assert varint_value_count(data) == 8
    assert varint_decode(data) == seq


def test_varint_empty():
    data = varint_encode([])
    assert data == bytes([0x01])  # varint(count+1) = varint(1)
    assert varint_value_count(data) == 0
    assert varint_decode(data) == []


def test_varint_known_bytes():
    # deltas of [1, 3] are 1, 2; header varint(3): all single-byte
    assert varint_encode([1, 3]) == bytes([0x03, 0x01, 0x02])
    # delta 1008 = 0b111_1110000 -> 0x87 0x70 (high group carries 0x80)
    assert varint_encode([1008]) == bytes([0x02, 0x87, 0x70])


def test_strictly_increasing_required():
    with pytest.raises(ValueError):
        varint_encode([1, 1])
    with pytest.raises(ValueError):
        gamma_encode([2, 1])
    with pytest.raises(ValueError):
        gamma_encode([0])


# ---- round-trip properties ----

increasing = st.lists(
    st.integers(min_value=1, max_value=1 << 27), min_size=0, max_size=200
).map(lambda xs: sorted(set(xs)))


@settings(max_examples=300, deadline=None)
@given(increasing)
def test_gamma_roundtrip_property(seq):
    data = gamma_encode(seq)
    assert gamma_decode(data) == seq
    assert gamma_value_count(data) == len(seq)


@settings(max_examples=300, deadline=None)
@given(increasing)
def test_varint_roundtrip_property(seq):
    data = varint_encode(seq)
    assert varint_decode(data) == seq
    assert varint_value_count(data) == len(seq)


@settings(max_examples=200, deadline=None)
@given(increasing)
def test_codecs_agree(seq):
    assert gamma_decode(gamma_encode(seq)) == varint_decode(varint_encode(seq))


# ---- BrailleBlockPunchCards.java ----


def test_braille_punch_cards():
    from marginaliasearch_ray.functions.bbpc import print_bits

    # empty byte = blank braille block; all bits = full block
    assert print_bits(0, 8) == "⠀"
    assert print_bits(0xFF, 8) == "⣿"
    # the documented permutation: native bit 3 -> braille bit 6 (0x40),
    # native bits 4..6 -> braille bits 3..5
    assert print_bits(0b0000_1000, 8) == chr(0x2800 + 0x40)
    assert print_bits(0b0111_0000, 8) == chr(0x2800 + 0x38)
    assert print_bits(0b1000_0111, 8) == chr(0x2800 + 0x87)
    # multi-byte: low byte first
    assert print_bits(0x00FF, 16) == "⣿⠀"
    # 8-bit injectivity: 256 distinct glyphs
    assert len({print_bits(v, 8) for v in range(256)}) == 256
