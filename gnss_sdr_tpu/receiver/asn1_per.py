"""Minimal unaligned-PER (UPER) codec with a declarative schema DSL.

The interoperability backbone of the SUPL client: OMA SUPL (ULP) and
3GPP RRLP messages are ASN.1 PER on the wire
(/root/reference/src/core/libs/supl/ carries ~580 asn1c-generated C
files for this; the subset of X.691 rules those messages actually use
is small and is implemented here directly):

- SEQUENCE with extension marker + OPTIONAL-presence bitmap
- CHOICE with extension marker (root-index bit-field)
- constrained whole numbers (minimal bit-field, no alignment in UPER)
- ENUMERATED (extensible), BOOLEAN
- OCTET STRING / BIT STRING, fixed or length-prefixed
- SEQUENCE OF with constrained size
- unconstrained length determinants (single/double octet forms) for
  extension-addition skipping and open types

Schemas are data (tuples), mirroring the ASN.1 modules they implement
(cited per message in supl_messages.py), so the codec is one generic
walker instead of per-message bit twiddling.
"""

from __future__ import annotations

import math


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def bit(self, v: int) -> None:
        self._bits.append(1 if v else 0)

    def bits(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self._bits.append((value >> k) & 1)

    def bytes_(self, data: bytes) -> None:
        for b in data:
            self.bits(b, 8)

    def to_bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        n = 0
        for b in self._bits:
            acc = (acc << 1) | b
            n += 1
            if n == 8:
                out.append(acc)
                acc, n = 0, 0
        if n:
            out.append(acc << (8 - n))
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0   # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        v = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def bytes_(self, n: int) -> bytes:
        return bytes(self.bits(8) for _ in range(n))


def _bitlen(r: int) -> int:
    return max(1, math.ceil(math.log2(r))) if r > 1 else 0


# --------------------------------------------------------------------------
# schema node constructors (plain tuples: (kind, *params))
# --------------------------------------------------------------------------

def INT(lo: int, hi: int):
    return ("int", lo, hi)


def BOOL():
    return ("bool",)


def ENUM(n_root: int, extensible: bool = True):
    return ("enum", n_root, extensible)


def OCTETS(size: int | None = None, lo: int | None = None,
           hi: int | None = None):
    """Fixed ``size`` or length-constrained (lo..hi) octet string."""
    return ("octets", size, lo, hi)


def BITSTR(size: int):
    return ("bitstr", size)


def SEQ(*fields, ext: bool = True):
    """fields: (name, node) or (name, node, "opt")."""
    return ("seq", fields, ext)


def CHOICE(*alts, ext: bool = True):
    """alts: (name, node)."""
    return ("choice", alts, ext)


def SEQ_OF(node, lo: int, hi: int):
    return ("seqof", node, lo, hi)


def NULLTYPE():
    return ("null",)


def UNSUPPORTED(name: str):
    """Placeholder keeping CHOICE index / OPTIONAL positions for types
    this codec does not implement; raises only if actually selected."""
    return ("unsupported", name)


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def _unconstrained_length(w: BitWriter, n: int) -> None:
    """General length determinant (X.691 10.9): '0'+7 bits or
    '10'+14 bits."""
    if n < 128:
        w.bits(n, 8)
    elif n < 16384:
        w.bits(0x8000 | n, 16)
    else:
        raise ValueError("fragmented lengths unsupported")


def encode(node, value, w: BitWriter | None = None) -> bytes | None:
    top = w is None
    if top:
        w = BitWriter()
    kind = node[0]
    if kind == "int":
        _, lo, hi = node
        if not lo <= value <= hi:
            raise ValueError(f"integer {value} outside [{lo},{hi}]")
        w.bits(value - lo, _bitlen(hi - lo + 1))
    elif kind == "bool":
        w.bit(1 if value else 0)
    elif kind == "enum":
        _, n_root, extensible = node
        if extensible:
            w.bit(0)
        w.bits(int(value), _bitlen(n_root))
    elif kind == "octets":
        _, size, lo, hi = node
        data = bytes(value)
        if size is not None:
            if len(data) != size:
                raise ValueError(f"octet string length {len(data)} != {size}")
        else:
            if not lo <= len(data) <= hi:
                raise ValueError("octet string length out of range")
            w.bits(len(data) - lo, _bitlen(hi - lo + 1))
        w.bytes_(data)
    elif kind == "bitstr":
        _, size = node
        bits = value  # iterable of 0/1, length == size
        if len(bits) != size:
            raise ValueError("bit string length mismatch")
        for b in bits:
            w.bit(b)
    elif kind == "seq":
        _, fields, ext = node
        if ext:
            w.bit(0)   # no extension additions produced by this encoder
        for name, sub, *flags in fields:
            if "opt" in flags:
                w.bit(0 if value.get(name) is None else 1)
        for name, sub, *flags in fields:
            v = value.get(name)
            if v is None:
                if "opt" in flags:
                    continue
                raise ValueError(f"missing mandatory field {name!r}")
            encode(sub, v, w)
    elif kind == "choice":
        _, alts, ext = node
        (alt_name, alt_value), = value.items()
        idx = next(i for i, (n, _s) in enumerate(alts) if n == alt_name)
        if ext:
            w.bit(0)
        w.bits(idx, _bitlen(len(alts)))
        encode(alts[idx][1], alt_value, w)
    elif kind == "seqof":
        _, sub, lo, hi = node
        if not lo <= len(value) <= hi:
            raise ValueError("SEQUENCE OF size out of range")
        w.bits(len(value) - lo, _bitlen(hi - lo + 1))
        for item in value:
            encode(sub, item, w)
    elif kind == "null":
        pass
    elif kind == "unsupported":
        raise NotImplementedError(f"ASN.1 type {node[1]!r} not implemented")
    else:
        raise ValueError(f"unknown schema node {kind!r}")
    if top:
        return w.to_bytes()
    return None


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def _read_unconstrained_length(r: BitReader) -> int:
    if r.bit() == 0:
        return r.bits(7)
    if r.bit() == 0:
        return r.bits(14)
    raise ValueError("fragmented lengths unsupported")


def decode(node, data_or_reader):
    r = data_or_reader if isinstance(data_or_reader, BitReader) \
        else BitReader(bytes(data_or_reader))
    kind = node[0]
    if kind == "int":
        _, lo, hi = node
        return lo + r.bits(_bitlen(hi - lo + 1))
    if kind == "bool":
        return bool(r.bit())
    if kind == "enum":
        _, n_root, extensible = node
        if extensible and r.bit():
            # extension value: normally-small non-negative number
            return 1000 + _read_normally_small(r)
        return r.bits(_bitlen(n_root))
    if kind == "octets":
        _, size, lo, hi = node
        if size is not None:
            return r.bytes_(size)
        n = lo + r.bits(_bitlen(hi - lo + 1))
        return r.bytes_(n)
    if kind == "bitstr":
        _, size = node
        return [r.bit() for _ in range(size)]
    if kind == "seq":
        _, fields, ext = node
        has_ext = bool(ext and r.bit())
        present = {}
        for name, sub, *flags in fields:
            if "opt" in flags:
                present[name] = bool(r.bit())
        out = {}
        for name, sub, *flags in fields:
            if "opt" in flags and not present[name]:
                continue
            out[name] = decode(sub, r)
        if has_ext:
            # skip extension additions: presence bitmap (normally-small
            # length) then open-type fields, each length-prefixed
            n_ext = _read_normally_small(r) + 1
            flags = [r.bit() for _ in range(n_ext)]
            for f in flags:
                if f:
                    n = _read_unconstrained_length(r)
                    r.bytes_(n)
        return out
    if kind == "choice":
        _, alts, ext = node
        if ext and r.bit():
            raise ValueError("extension alternative not supported")
        idx = r.bits(_bitlen(len(alts)))
        name, sub = alts[idx]
        return {name: decode(sub, r)}
    if kind == "seqof":
        _, sub, lo, hi = node
        n = lo + r.bits(_bitlen(hi - lo + 1))
        return [decode(sub, r) for _ in range(n)]
    if kind == "null":
        return None
    if kind == "unsupported":
        raise NotImplementedError(f"ASN.1 type {node[1]!r} not implemented")
    raise ValueError(f"unknown schema node {kind!r}")


def _read_normally_small(r: BitReader) -> int:
    """X.691 10.6 normally-small non-negative whole number."""
    if r.bit() == 0:
        return r.bits(6)
    n = _read_unconstrained_length(r)
    return int.from_bytes(r.bytes_(n), "big")
