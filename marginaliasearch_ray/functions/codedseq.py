"""Byte-exact coded integer sequences (libraries/coded-sequence).

The reference stores every keyword position list and every HtmlTag span
list as a delta-coded byte sequence — ``VarintCodedSequence`` in the
converter/index data model (SlopDocumentRecord.java, CodedWordSpan.java,
IndexJournalSlopWriter.java) and the Elias-gamma ``GammaCodedSequence``
in the legacy index journal and parts of reverse-index construction
(FullPreindexDocuments.java).  This module reproduces both encodings
BYTE-FOR-BYTE:

- ``BitWriter`` / ``BitReader`` — libraries/coded-sequence/java/nu/
  marginalia/sequence/io/BitWriter.java:8-137 and BitReader.java:11-179:
  a 64-bit big-endian accumulator written as whole longs, with the
  final partial long truncated to ``ceil(bitPosition/8)`` meaningful
  bytes (BitWriter.finishLastByte, java:124-135).  The reader refills
  in 8/4/2/1-byte big-endian chunks (BitReader.readNext, java:147-178).
- ``gamma_encode`` / ``gamma_decode`` — GammaCodedSequence.java:148-263:
  gamma(count+1) then gamma(delta) per strictly-increasing value; the
  on-disk bytes are the writer's meaningful bytes only (the slop column
  writes ``buffer()`` position..limit, slop/GammaCodedSequenceColumn).
- ``varint_encode`` / ``varint_decode`` — VarintCodedSequence.java:
  32-205: varint(count+1) then varint(delta), where the varint is
  BIG-endian 7-bit groups with the continuation bit on every group but
  the last (encodeValue, java:110-132; values < 2^28).

Deltas must be strictly positive in both codecs: gamma cannot represent
zero at all, and the varint path's buffer-size precalculation allots
zero bytes for a zero delta (requiredBufferSize, java:78-108), so a
non-increasing sequence fails upstream as well.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1


class BitWriter:
    """BitWriter.java:8-137 — MSB-first bit packing into big-endian
    64-bit words; ``finish`` returns only the meaningful bytes."""

    __slots__ = ("_cur", "_bitpos", "_out")

    def __init__(self) -> None:
        self._cur = 0
        self._bitpos = 0
        self._out = bytearray()

    def put_bit(self, value: bool) -> None:
        self._cur = ((self._cur << 1) | (1 if value else 0)) & _M64
        self._bitpos += 1
        if self._bitpos == 64:
            self._out += self._cur.to_bytes(8, "big")
            self._cur = 0
            self._bitpos = 0

    def put_bits(self, value: int, width: int) -> None:
        """Write the lowest ``width`` bits of ``value`` (java:49-71)."""
        if width > 32:
            raise ValueError("width > 32")
        value &= (1 << width) - 1 if width else 0
        rem = 64 - self._bitpos
        if rem < width:
            # split between two longs
            self._cur = ((self._cur << rem) | (value >> (width - rem))) & _M64
            self._out += self._cur.to_bytes(8, "big")
            self._cur = value & ((1 << (width - rem)) - 1)
            self._bitpos = width - rem
        else:
            self._cur = ((self._cur << width) | value) & _M64
            self._bitpos += width

    def put_gamma(self, value: int) -> None:
        """Elias gamma: (bits-1) zeroes then the value (java:84-91)."""
        if value <= 0:
            raise ValueError("gamma value must be positive")
        bits = value.bit_length()
        self.put_bits(0, bits - 1)
        self.put_bits(value, bits)

    def put_delta(self, value: int) -> None:
        """Elias delta: gamma(bits) then the value (java:97-106)."""
        if value <= 0:
            raise ValueError("delta value must be positive")
        bits = value.bit_length()
        self.put_gamma(bits)
        self.put_bits(value, bits)

    def finish(self) -> bytes:
        """Flush the partial long, truncated to its meaningful bytes
        (finishLastByte, java:124-135)."""
        if self._bitpos > 0:
            n = self._bitpos // 8 + (0 if self._bitpos % 8 == 0 else 1)
            last = (self._cur << (64 - self._bitpos)) & _M64
            self._out += last.to_bytes(8, "big")[:n]
            self._cur = 0
            self._bitpos = 0
        return bytes(self._out)


class BitReader:
    """BitReader.java:11-179 — mirrors the 8/4/2/1-byte refill ladder so
    trailing-byte behavior is identical."""

    __slots__ = ("_buf", "_pos", "_cur", "_bitpos")

    def __init__(self, data: bytes) -> None:
        self._buf = data
        self._pos = 0
        self._cur = 0
        self._bitpos = 0

    def _read_next(self) -> None:
        rem = len(self._buf) - self._pos
        for size, bits in ((8, 64), (4, 32), (2, 16), (1, 8)):
            if rem >= size:
                self._cur = int.from_bytes(
                    self._buf[self._pos : self._pos + size], "big"
                )
                self._pos += size
                self._bitpos = bits
                return
        raise ValueError("No more data to read")

    def get_bit(self) -> bool:
        if self._bitpos <= 0:
            self._read_next()
        self._bitpos -= 1
        return (self._cur >> self._bitpos) & 1 != 0

    def get(self, width: int) -> int:
        """Read ``width`` bits MSB-first (java:51-93)."""
        if self._bitpos >= width:
            self._bitpos -= width
            return (self._cur >> self._bitpos) & ((1 << width) - 1) if width else 0
        if self._bitpos <= 0:
            self._read_next()
        result = 0
        while width > 0:
            dw = self._bitpos - width
            if dw >= 0:
                result |= (self._cur >> dw) & ((1 << width) - 1)
                self._bitpos -= width
                width = 0
            else:
                result |= (self._cur & ((1 << self._bitpos) - 1)) << -dw
                width -= self._bitpos
                self._read_next()
        return result

    def take_while_zero(self) -> int:
        """Count zero bits up to the next 1 (java:96-119)."""
        result = 0
        while True:
            if self._bitpos <= 0:
                self._read_next()
            window = (self._cur << (64 - self._bitpos)) & _M64
            # number of leading zeros of the 64-bit window
            zeroes = 64 - window.bit_length()
            result += min(self._bitpos, zeroes)
            self._bitpos -= zeroes
            if self._bitpos > 0:
                return result

    def get_gamma(self) -> int:
        bits = self.take_while_zero()
        return self.get(bits + 1)

    def get_delta(self) -> int:
        bits = self.get_gamma()
        return self.get(bits)

    def has_more(self) -> bool:
        return self._bitpos > 0 or self._pos < len(self._buf)


def gamma_encode(values) -> bytes:
    """GammaCodedSequence.encode (java:152-186): gamma(count+1) then
    gamma deltas of a strictly increasing positive sequence."""
    w = BitWriter()
    vals = list(values)
    w.put_gamma(len(vals) + 1)
    prev = 0
    for v in vals:
        d = int(v) - prev
        if d <= 0:
            raise ValueError(f"sequence must be strictly increasing: {vals}")
        w.put_gamma(d)
        prev = int(v)
    return w.finish()


def gamma_decode(data: bytes) -> list[int]:
    """EliasGammaSequenceIterator (java:202-263), including the
    hasMore/rem stopping rules for the zero-padded final byte."""
    if len(data) == 0:
        return []
    r = BitReader(data)
    rem = r.get_gamma() - 1
    out: list[int] = []
    last = 0
    while rem > 0 and r.has_more():
        rem -= 1
        bits = 1 + r.take_while_zero()
        if not r.has_more():
            break
        last += r.get(bits)
        out.append(last)
    return out


def gamma_value_count(data: bytes) -> int:
    """GammaCodedSequence.valueCount (java:140-145)."""
    if len(data) == 0:
        return 0
    return BitReader(data).get_gamma() - 1


def _varint_put(out: bytearray, value: int) -> None:
    # VarintCodedSequence.encodeValue (java:110-132)
    if value < (1 << 7):
        out.append(value)
    elif value < (1 << 14):
        out.append((value >> 7) | 0x80)
        out.append(value & 0x7F)
    elif value < (1 << 21):
        out.append(((value >> 14) & 0x7F) | 0x80)
        out.append(((value >> 7) & 0x7F) | 0x80)
        out.append(value & 0x7F)
    elif value < (1 << 28):
        out.append(((value >> 21) & 0x7F) | 0x80)
        out.append(((value >> 14) & 0x7F) | 0x80)
        out.append(((value >> 7) & 0x7F) | 0x80)
        out.append(value & 0x7F)
    else:
        raise ValueError("Value too large to encode")


def varint_encode(values) -> bytes:
    """VarintCodedSequence.generate (java:55-75): varint(count+1) then
    varint deltas of a strictly increasing positive sequence."""
    out = bytearray()
    vals = list(values)
    _varint_put(out, len(vals) + 1)
    prev = 0
    for v in vals:
        d = int(v) - prev
        if d <= 0:
            raise ValueError(f"sequence must be strictly increasing: {vals}")
        _varint_put(out, d)
        prev = int(v)
    return bytes(out)


def varint_decode(data: bytes) -> list[int]:
    """VarintCodedSequence.values (java:149-205)."""
    pos = 0

    def take() -> int:
        nonlocal pos
        b = data[pos]
        pos += 1
        if b & 0x80 == 0:
            return b
        value = b & 0x7F
        while True:
            b = data[pos]
            pos += 1
            value = (value << 7) | (b & 0x7F)
            if b & 0x80 == 0:
                return value

    take()  # count header (count+1); values follow as deltas
    out: list[int] = []
    val = 0
    while pos < len(data):
        val += take()
        out.append(val)
    return out


def varint_value_count(data: bytes) -> int:
    """VarintCodedSequence.valueCount (java:183-187)."""
    pos = 0
    b = data[pos]
    if b & 0x80 == 0:
        return b - 1
    value = b & 0x7F
    while True:
        pos += 1
        b = data[pos]
        value = (value << 7) | (b & 0x7F)
        if b & 0x80 == 0:
            return value - 1
