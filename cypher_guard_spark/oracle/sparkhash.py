"""Pure-Python twins of Spark SQL's `hash()` and `xxhash64()` expressions.

Spark's `hash(c1, c2, …)` is MurmurHash3 x86 32-bit folded left-to-right
over the arguments starting from seed 42: the running hash seeds the next
argument's hash. `xxhash64(…)` composes the same way with xxHash64.
Per-type hashing (int → 4-byte int hash, long → 8-byte, string → UTF-8
bytes) mirrors Spark's HashExpression type dispatch. Both algorithms are
public specifications (MurmurHash3 by Austin Appleby, xxHash by Yann
Collet); the tail handling below matches Spark's variant of murmur3, which
mixes each trailing byte as a SIGN-EXTENDED int instead of accumulating a
tail word — that quirk is part of Spark's on-disk/hash compatibility
surface, so the oracle must reproduce it.

Parity is enforced by tests/test_oracle_hashes.py, which compares these
functions against the real Spark expressions over a randomized corpus.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF

# --- MurmurHash3 x86_32 (Spark variant) ------------------------------------

_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix32(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _murmur3_bytes(data: bytes, seed: int) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian words,
    then each trailing byte mixed individually as a sign-extended int."""
    h1 = seed & _M32
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i : i + 4], "little")))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:
            b -= 0x100  # Java byte is signed; sign-extend before mixing
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _fmix32(h1, n)


def _murmur3_int(value: int, seed: int) -> int:
    return _fmix32(_mix_h1(seed & _M32, _mix_k1(value & _M32)), 4)


def _murmur3_long(value: int, seed: int) -> int:
    low = value & _M32
    high = (value >> 32) & _M32
    h1 = _mix_h1(seed & _M32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix32(h1, 8)


def _to_signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _to_signed64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_hash(*args, seed: int = 42) -> int:
    """`F.hash(*args)` twin: int32 result, arguments folded left-to-right."""
    h = seed & _M32
    for a in args:
        if isinstance(a, str):
            h = _murmur3_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = _murmur3_bytes(a, h)
        elif isinstance(a, bool):
            h = _murmur3_int(1 if a else 0, h)
        elif isinstance(a, int):
            if -(1 << 31) <= a < (1 << 31):
                h = _murmur3_int(a, h)
            else:
                h = _murmur3_long(a, h)
        else:
            raise TypeError(f"unsupported hash argument type: {type(a)}")
    return _to_signed32(h)


# --- xxHash64 (Spark variant) ----------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    if n >= 32:
        acc = [
            (seed + _P1 + _P2) & _M64,
            (seed + _P2) & _M64,
            seed & _M64,
            (seed - _P1) & _M64,
        ]
        i = 0
        while i <= n - 32:
            for lane in range(4):
                w = int.from_bytes(data[i + 8 * lane : i + 8 * lane + 8], "little")
                acc[lane] = (
                    _rotl64((acc[lane] + w * _P2) & _M64, 31) * _P1
                ) & _M64
            i += 32
        h = (
            _rotl64(acc[0], 1)
            + _rotl64(acc[1], 7)
            + _rotl64(acc[2], 12)
            + _rotl64(acc[3], 18)
        ) & _M64
        for v in acc:
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i <= n - 8:
        w = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((w * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl64(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        w = int.from_bytes(data[i : i + 4], "little")
        h ^= (w * _P1) & _M64
        h = ((_rotl64(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    return _fmix64(h)


def _xxh64_int(value: int, seed: int) -> int:
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & _M32) * _P1) & _M64
    h = ((_rotl64(h, 23) * _P2) + _P3) & _M64
    return _fmix64(h)


def _xxh64_long(value: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl64((value * _P2) & _M64, 31) * _P1) & _M64
    h = ((_rotl64(h, 27) * _P1) + _P4) & _M64
    return _fmix64(h)


def spark_xxhash64(*args, seed: int = 42, int_widths: tuple | None = None) -> int:
    """`F.xxhash64(*args)` twin: int64 result, arguments folded
    left-to-right.

    Python ints default to Spark's 4-byte int hash when they fit in int32
    (matching `hash()`-produced minhash columns); pass
    ``int_widths=("long", …)`` per argument to force the 8-byte long hash
    for columns that are LongType on the Spark side regardless of value.
    """
    h = seed & _M64
    for idx, a in enumerate(args):
        width = int_widths[idx] if int_widths else None
        if isinstance(a, str):
            h = _xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = _xxh64_bytes(a, h)
        elif isinstance(a, bool):
            h = _xxh64_int(1 if a else 0, h)
        elif isinstance(a, int):
            if width == "long" or not (-(1 << 31) <= a < (1 << 31)):
                h = _xxh64_long(a & _M64, h)
            else:
                h = _xxh64_int(a, h)
        else:
            raise TypeError(f"unsupported xxhash64 argument type: {type(a)}")
    return _to_signed64(h)
