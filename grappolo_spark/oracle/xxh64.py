"""Pure-Python XXH64 over longs — oracle twin of Spark's ``xxhash64``.

The engine's deterministic per-vertex randomness (coloring priorities,
sampling masks) is ``F.xxhash64(...)`` — partition-invariant by
construction (SURVEY §2.8). The oracle needs bit-identical values, so this
implements the public XXH64 algorithm (Yann Collet's spec,
github.com/Cyan4973/xxHash) for the one shape Spark uses on bigint
columns: each long is hashed as one 8-byte little-endian block, and
multi-column calls chain ``hash = xxh64_long(col_i, seed=hash)`` starting
from seed 42 — verified bit-for-bit against Spark in
tests/test_coloring.py.

CONTRACT: engine code must cast every xxhash64 input to LongType — Spark
hashes a 4-byte int column differently (hashInt), which this oracle does
not model.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark's hashLong)."""
    value &= MASK
    seed &= MASK
    acc = (seed + PRIME5 + 8) & MASK
    # one full 8-byte lane
    lane = _rotl((value * PRIME2) & MASK, 31) * PRIME1 & MASK
    acc ^= lane
    acc = (_rotl(acc, 27) * PRIME1 + PRIME4) & MASK
    # avalanche
    acc ^= acc >> 33
    acc = (acc * PRIME2) & MASK
    acc ^= acc >> 29
    acc = (acc * PRIME3) & MASK
    acc ^= acc >> 32
    return acc


def to_signed(x: int) -> int:
    """Two's-complement view, as Spark returns LongType."""
    x &= MASK
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64(*values: int, seed: int = 42) -> int:
    """Spark ``F.xxhash64(long_col, ...)``: chained per-column hashing."""
    h = seed
    for v in values:
        h = xxh64_long(v, h)
    return to_signed(h)
