"""Independent pure-Python replica of Spark SQL's ``xxhash64`` expression.

Implements the public xxHash64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) with Spark's
expression semantics (seed 42 by default; multi-argument calls chain each
argument's hash as the next argument's seed; IntegerType hashes via the
4-byte finalizer, LongType via the 8-byte finalizer, StringType as its UTF-8
bytes).  Used ONLY to generate expected values for the DuckDB-side dedup
oracles (scripts/gen_scale_oracles.py) — the engine itself always uses the
JVM expression.  Parity with Spark is pinned by tests/test_kernel.py's
xxh64 cross-check.
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * P1 + P4) & _M


def hash_long(value: int, seed: int) -> int:
    """xxhash64 of one 64-bit value (Spark LongType path)."""
    value &= _M
    h = (seed + P5 + 8) & _M
    h ^= _round(0, value)
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """xxhash64 of one 32-bit value (Spark IntegerType path)."""
    h = (seed + P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """xxhash64 of a byte string (Spark StringType path: UTF-8 bytes)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i + 32 <= length:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + length) & _M
    while i + 8 <= length:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < length:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(*cols)``: chain each argument's hash as the
    seed of the next; ints use the 4-byte path, Python ints tagged as
    longs / plain large ints the 8-byte path, strings their UTF-8 bytes.

    Pass ``("int", v)`` to force the IntegerType path and ``("long", v)``
    for LongType; bare Python ints default to LongType (Spark literals of
    small ints are IntegerType — be explicit at call sites).
    """
    h = seed & _M
    for v in values:
        if isinstance(v, tuple):
            kind, v = v
        elif isinstance(v, str):
            kind = "str"
        elif isinstance(v, int):
            kind = "long"
        else:
            raise TypeError(f"unsupported type {type(v)}")
        if kind == "int":
            h = hash_int(v, h)
        elif kind == "long":
            h = hash_long(v, h)
        else:
            h = hash_bytes(v.encode("utf-8"), h)
    return _to_signed(h)
