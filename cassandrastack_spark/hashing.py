"""Driver-side implementation of Spark's ``hash()`` (Murmur3 x86_32).

Why: the storage engine routes rows to ``_bucket = pmod(hash(partition
key), n_buckets)`` (storage.py). A point read must compute that bucket
on the DRIVER to build the pruning filter — going through a 1-row
DataFrame + ``.head()`` costs a full Spark job per lookup. This module
reproduces Spark's hash bit-for-bit in pure Python (verified against
the JVM in tests/test_storage.py), so bucket routing is a few hundred
nanoseconds of driver CPU.

Semantics mirrored from the public Spark sources
(``Murmur3_x86_32.java`` / ``HashExpression`` in ``hash.scala``):

- seed 42; multi-column hashing chains (col_i's hash seeds col_i+1)
- int/short/byte/boolean hash as a 4-byte int
- long (and timestamp micros) hashes as two ints (low word, high word)
- string hashes its UTF-8 bytes 4 at a time little-endian, tail bytes
  one SIGNED byte at a time (Spark's deviation from canonical Murmur3)
- float/double normalize -0 to +0, then hash their IEEE-754 bits
- a NULL column leaves the running hash unchanged
"""

from __future__ import annotations

import struct

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK32
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed, _mix_k1(value & _MASK32)), 4)


def _hash_long(value: int, seed: int) -> int:
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed, _mix_k1(v & _MASK32))
    h1 = _mix_h1(h1, _mix_k1(v >> 32))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    h1 = seed
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i : i + 4], "little")))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 128:  # Java bytes are signed; sign-extend before mixing
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _fmix(h1, len(data))


def _hash_one(value, seed: int, dtype: str | None = None) -> int:
    """Hash one column value. ``dtype`` is the DECLARED Spark type
    (``DataType.simpleString()``) — it drives the int-vs-long dispatch,
    because the JVM hashes a bigint column holding 1 as a LONG, while a
    magnitude-based guess would hash it as an int and route to the
    wrong bucket."""
    if value is None:
        return seed
    if isinstance(value, bool):
        return _hash_int(1 if value else 0, seed)
    if isinstance(value, int):
        if dtype in ("bigint", "long", "timestamp", "timestamp_ntz"):
            return _hash_long(value, seed)
        if dtype in ("int", "integer", "smallint", "short", "tinyint",
                     "byte", "date") or (
            dtype is None and -(1 << 31) <= value < (1 << 31)
        ):
            return _hash_int(value, seed)
        return _hash_long(value, seed)
    if isinstance(value, float):
        if value == 0.0:  # normalize -0.0, matching Spark
            value = 0.0
        if dtype == "float":
            return _hash_int(
                struct.unpack("<i", struct.pack("<f", value))[0], seed
            )
        return _hash_long(
            struct.unpack("<q", struct.pack("<d", value))[0], seed
        )
    if isinstance(value, str):
        return _hash_bytes(value.encode("utf-8"), seed)
    if isinstance(value, (bytes, bytearray)):
        return _hash_bytes(bytes(value), seed)
    raise TypeError(
        f"unsupported partition-key type for driver-side hashing: "
        f"{type(value).__name__} (int/long/float/str/bytes/bool/None)"
    )


def spark_hash(*values, dtypes=None) -> int:
    """``F.hash(*cols)`` as a signed 32-bit int, computed driver-side.

    ``dtypes``: optional per-value declared Spark types
    (``DataType.simpleString()``); without them integer values are
    dispatched by magnitude, which only matches the JVM when the column
    type matches the natural literal type.
    """
    h = SPARK_HASH_SEED
    for i, v in enumerate(values):
        h = _hash_one(v, h, dtypes[i] if dtypes else None)
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_of(values, n_buckets: int, dtypes=None) -> int:
    """``pmod(hash(*values), n_buckets)`` — the storage bucket route."""
    return spark_hash(*values, dtypes=dtypes) % n_buckets
