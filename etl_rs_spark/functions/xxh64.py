"""Driver-side xxHash64, bit-identical to Spark SQL's ``xxhash64``.

Spark's bucket routing, manifest key blooms and point-lookup probes all
hash with ``F.xxhash64`` (the public xxHash64 algorithm, Yann Collet,
BSD — implemented in Spark as
sql/catalyst/.../expressions/XXH64.java with fixed seed 42). Paying a
Spark micro-job just to hash k probe keys puts ~100 ms of scheduling in
front of every interactive ``LakeTable.lookup``; this module computes
the same hashes in pure Python so a point lookup issues exactly ONE
Spark job (the pruned scan).

Semantics pinned against the JVM by tests/test_xxh64_pin.py over every
supported key dtype (strings incl. unicode/empty, int family including
negatives, longs at the extremes) — if Spark ever changed its hashing,
the pin test fails before any lookup can go quietly wrong.

Supported input types mirror what a CDC bucket column can be: the int
family (byte/short/int — Spark hashes all three with its 4-byte
specialization), long, and UTF-8 strings. Anything else raises
``UnsupportedKeyType`` and the caller falls back to the Spark probe
job, so correctness never depends on this fast path.
"""
from __future__ import annotations

_M = (1 << 64) - 1  # 64-bit wrap

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


class UnsupportedKeyType(TypeError):
    """Raised for dtypes this fast path does not cover; callers fall
    back to hashing through a Spark job."""


def _rotl(x: int, r: int) -> int:
    x &= _M
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h &= _M
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte specialization used for
    byte/short/int(/date) inputs."""
    h = (seed + P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte specialization used for
    long(/timestamp) inputs."""
    h = (seed + P5 + 8) & _M
    h ^= (_rotl((value & _M) * P2 & _M, 31) * P1) & _M
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def _round(acc: int, k: int) -> int:
    acc = (acc + k * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & _M


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (what Spark applies to the
    UTF-8 bytes of a string column)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i <= length - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + length) & _M
    while i <= length - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i <= length - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < length:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


#: dtype.simpleString() -> per-value hasher (value, seed) -> unsigned
_HASHERS = {
    "tinyint": hash_int,
    "smallint": hash_int,
    "int": hash_int,
    "bigint": hash_long,
    "string": lambda v, s: hash_bytes(v.encode("utf-8"), s),
}


def spark_xxhash64(values: list, dtypes: list[str], seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(c1, c2, ...)`` semantics: fields are hashed in
    order, each using the running hash as its seed, starting from
    Spark's fixed seed 42. Returns the SIGNED 64-bit value Spark
    returns. NULL fields are skipped (Spark leaves the running hash
    unchanged for null inputs)."""
    h = seed
    for v, dt in zip(values, dtypes):
        if v is None:
            continue
        fn = _HASHERS.get(dt)
        if fn is None:
            raise UnsupportedKeyType(
                f"no driver-side xxhash64 for dtype {dt!r}; "
                "use the Spark probe path"
            )
        if dt != "string" and not isinstance(v, int):
            raise UnsupportedKeyType(
                f"dtype {dt!r} expects int, got {type(v).__name__}"
            )
        if dt == "string" and not isinstance(v, str):
            raise UnsupportedKeyType(
                f"dtype 'string' expects str, got {type(v).__name__}"
            )
        h = fn(v, h & _M)
    return _signed(h & _M)


def bucket_of(value, dtype: str, num_buckets: int) -> int:
    """Driver-side twin of ``bucket_expr``: pmod(xxhash64(v), N)."""
    h = spark_xxhash64([value], [dtype])
    return ((h % num_buckets) + num_buckets) % num_buckets
