"""Pure-Python XXH64 matching Spark's `F.xxhash64` (seed 42).

Spark's XxHash64 expression (public Apache Spark source,
sql/catalyst XXH64.java) hashes each argument in sequence, feeding
the running hash as the seed of the next argument's hash:

    h = seed (42)
    for arg in args:
        h = hash_one(arg, seed=h)

LongType args use the 8-byte specialization (identical to XXH64 over
the 8-byte little-endian encoding); StringType args hash the UTF-8
bytes. IntegerType uses the 4-byte path (``hash_int``) — the engine
casts everything to long/string before hashing, so that path exists
only for completeness. Pinned against Spark-generated vectors in
tests/golden/xxhash64_vectors.json (SURVEY.md §7 M0, FIXTURES.md F3).
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * PRIME1 + PRIME4) & MASK64


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (returns uint64)."""
    seed &= MASK64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed
        v4 = (seed - PRIME1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 8-byte specialization (Spark hashes LongType this way)."""
    return xxh64_bytes((value & MASK64).to_bytes(8, "little"), seed)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 4-byte specialization (Spark IntegerType path)."""
    return xxh64_bytes((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


def to_i64(u: int) -> int:
    """Reinterpret uint64 as Spark's signed long."""
    u &= MASK64
    return u - (1 << 64) if u >= (1 << 63) else u


def to_u64(s: int) -> int:
    """Reinterpret signed long as uint64 (accepts numpy ints too)."""
    return int(s) & MASK64


def spark_xxhash64(*args, seed: int = SPARK_SEED) -> int:
    """Replicate Spark's multi-argument ``xxhash64(...)`` (signed result).

    str args → UTF-8 bytes path, int args → 8-byte long path,
    bytes args → bytes path. Hash chains left to right.
    """
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = xxh64_bytes(a, h)
        elif isinstance(a, bool):
            raise TypeError("boolean hashing not pinned")
        elif isinstance(a, int):
            h = xxh64_long(a, h)
        else:
            raise TypeError(f"unsupported xxhash64 arg type: {type(a)}")
    return to_i64(h)
