"""Pure-Python XXH64 compatible with Spark's ``xxhash64`` expression.

Implements the public xxHash-64 algorithm (Yann Collet's public-domain
spec) in the form Spark's JVM expression evaluates it: fixed-width inputs
(int/long) go through the specialized 4/8-byte kernels, strings hash their
UTF-8 bytes, and multi-argument calls chain (each value's hash seeds the
next, initial seed 42).  Parity with the JVM is asserted by
``tests/test_xxh64.py`` over random ints/longs/strings and the exact
argument shapes the dedup operators use.

Purpose: an INDEPENDENT (non-Spark) implementation of the engine's hash
kernel, so the MinHash-LSH and SimHash oracles in
``scripts/gen_expected.py`` can be computed without touching the Spark
code under test.  DuckDB has no xxhash64, so these ops are otherwise
unverifiable at the driver gate.
"""

from __future__ import annotations

PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # XxHash64 expression default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME2) & _M
    h ^= h >> 29
    h = (h * PRIME3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """XXH64 of a 4-byte int (Spark hashes IntegerType/ShortType/ByteType
    and FloatType bit patterns through this kernel)."""
    h = (seed + PRIME5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * PRIME1) & _M
    h = (_rotl(h, 23) * PRIME2 + PRIME3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """XXH64 of an 8-byte long (LongType / DoubleType bit patterns /
    TimestampType)."""
    h = (seed + PRIME5 + 8) & _M
    h ^= (_rotl(((value & _M) * PRIME2) & _M, 31) * PRIME1) & _M
    h = (_rotl(h, 27) * PRIME1 + PRIME4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string, Spark-style (StringType/BinaryType):
    only the word-aligned length is added to the accumulator."""
    length = len(data)
    aligned = length & ~7
    off = 0
    if aligned >= 32:
        limit = aligned - 32
        v1 = (seed + PRIME1 + PRIME2) & _M
        v2 = (seed + PRIME2) & _M
        v3 = seed & _M
        v4 = (seed - PRIME1) & _M
        while off <= limit:
            v1 = (_rotl((v1 + int.from_bytes(data[off:off + 8], "little") * PRIME2) & _M, 31) * PRIME1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[off + 8:off + 16], "little") * PRIME2) & _M, 31) * PRIME1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[off + 16:off + 24], "little") * PRIME2) & _M, 31) * PRIME1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[off + 24:off + 32], "little") * PRIME2) & _M, 31) * PRIME1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * PRIME2) & _M, 31) * PRIME1) & _M
            h = (h * PRIME1 + PRIME4) & _M
    else:
        h = (seed + PRIME5) & _M
    h = (h + length) & _M
    while off <= aligned - 8:
        k1 = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k1 * PRIME2) & _M, 31) * PRIME1) & _M
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & _M
        off += 8
    if off + 4 <= length:
        k = int.from_bytes(data[off:off + 4], "little")
        h ^= (k * PRIME1) & _M
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & _M
        off += 4
    while off < length:
        h ^= (data[off] * PRIME5) & _M
        h = (_rotl(h, 11) * PRIME1) & _M
        off += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Spark ``F.xxhash64(...)`` twin: fold each value left-to-right, the
    running hash seeding the next (exactly XxHash64's computeHash chain).

    Accepted value forms:
      int            -> LongType  (hash_long)
      ("int", i)     -> IntegerType (hash_int) — e.g. an F.lit(i) column
      str / bytes    -> StringType/BinaryType (hash_bytes, UTF-8)
    Returns the SIGNED 64-bit value Spark emits.
    """
    h = seed & _M
    for v in values:
        if isinstance(v, tuple) and v[0] == "int":
            h = hash_int(int(v[1]), h)
        elif isinstance(v, bool):
            raise TypeError("ambiguous bool — pass ('int', 0/1)")
        elif isinstance(v, int):
            h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return _to_signed(h)
