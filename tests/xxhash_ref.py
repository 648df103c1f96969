"""Pure-Python XXH64 matching Spark's `xxhash64` expression.

Implements the public XXH64 algorithm (Collet's xxHash spec) plus the
Spark-specific per-type dispatch: IntegerType hashes via the 4-byte
primitive path, LongType via the 8-byte path, StringType via the
byte-stream path over UTF-8, and multi-argument calls fold left with
the running hash as the next seed (seed 42 to start).  Used by the
pytest oracles for the minhash/simhash/LSH queries, which are not
SQL-expressible in DuckDB (no xxhash64 there).
"""

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong — the 8-byte primitive shortcut."""
    h = (seed + P5 + 8) & M64
    h ^= _round(0, value & M64)
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — the 4-byte primitive shortcut."""
    h = (seed + P5 + 4) & M64
    h ^= ((value & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*args) -> int:
    """Spark `xxhash64(args...)`: fold left over seed 42; int -> 4-byte
    path, Python int tagged as long via ("long", v) or plain int beyond
    int32 -> 8-byte path, str -> UTF-8 byte-stream path.  Returns the
    SIGNED 64-bit value Spark returns.

    Plain Python ints are treated as Spark IntegerType when they fit in
    int32 (matching F.lit) and LongType otherwise."""
    h = 42
    for a in args:
        if isinstance(a, tuple) and a[0] == "long":
            h = xxh64_long(a[1], h)
        elif isinstance(a, bool):  # pragma: no cover - not used
            raise TypeError("bool hashing not implemented")
        elif isinstance(a, int):
            if -(1 << 31) <= a < (1 << 31):
                h = xxh64_int(a, h)
            else:
                h = xxh64_long(a, h)
        elif isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = xxh64_bytes(a, h)
        else:
            raise TypeError(f"unsupported type {type(a)}")
    return _to_signed(h)
