"""DuckDB-SQL twin of Spark's ``xxhash64`` over BIGINT columns.

The engine's deterministic per-vertex randomness is ``F.xxhash64(...)``
(SURVEY §2.8); the DuckDB correctness oracles need the same values INSIDE
SQL (no UDFs — the driver runs plain SQL strings). This module emits a
nested-SELECT chain that computes XXH64 of one 8-byte little-endian long
(Yann Collet's public spec, github.com/Cyan4973/xxHash — the same shape
``oracle/xxh64.py`` implements in Python) using HUGEINT arithmetic mod
2^64. Multi-column calls chain ``h = xxh64(col_i, seed=h)`` from seed 42,
exactly like Spark.

Every step lives in its own SELECT layer (lateral-alias substitution
would blow the expression tree up exponentially — rotl/xorshift reference
their input twice per step).
"""

from __future__ import annotations

M64 = "18446744073709551616"  # 2^64
M32 = "4294967296"            # 2^32
PRIME1 = "11400714785074694791"
PRIME2 = "14029467366897019727"
PRIME3 = "1609587929392839161"
PRIME4 = "9650029242287828579"
PRIME5 = "2870177450012600261"


def _mulmod(a: str, c: str) -> str:
    """(a * c) mod 2^64 for 0 <= a < 2^64 and constant c < 2^64, split so
    no intermediate exceeds HUGEINT's 127-bit positive range."""
    return (
        f"((({a} % {M32}) * {c}::HUGEINT"
        f" + ((({a} // {M32}) * {c}::HUGEINT) % {M32}) * {M32}::HUGEINT)"
        f" % {M64}::HUGEINT)"
    )


def _rotl(x: str, r: int) -> str:
    return f"((({x} * {1 << r}::HUGEINT) % {M64}::HUGEINT) + ({x} // {1 << (64 - r)}::HUGEINT))"


def xxh64_long_steps(value: str, seed: str) -> list[tuple[str, str]]:
    """[(col_name, expr)] chain computing xxh64_long(value, seed).

    ``value`` and ``seed`` are SQL expressions available in the source
    relation; intermediate columns are named _x0.._x7 (HUGEINT in
    [0, 2^64)); the final unsigned hash lands in column ``_x7``.
    """
    u = f"(CASE WHEN ({value}) < 0 THEN ({value})::HUGEINT + {M64}::HUGEINT ELSE ({value})::HUGEINT END)"
    s = f"(CASE WHEN ({seed}) < 0 THEN ({seed})::HUGEINT + {M64}::HUGEINT ELSE ({seed})::HUGEINT END)"
    steps = [
        # acc0 = seed + PRIME5 + 8 ; lane0 = value * PRIME2
        ("_a0", f"(({s} + {PRIME5}::HUGEINT + 8) % {M64}::HUGEINT)"),
        ("_l0", _mulmod(u, PRIME2)),
        ("_l1", _rotl("_l0", 31)),
        ("_l2", _mulmod("_l1", PRIME1)),
        ("_a1", "xor(_a0, _l2)"),
        ("_a2", f"(({_mulmod(_rotl('_a1', 27), PRIME1)} + {PRIME4}::HUGEINT) % {M64}::HUGEINT)"),
        ("_x4", "xor(_a2, _a2 // 8589934592)"),          # >> 33
        ("_x5", _mulmod("_x4", PRIME2)),
        ("_x6", "xor(_x5, _x5 // 536870912)"),           # >> 29
        ("_x6b", _mulmod("_x6", PRIME3)),
        ("_x7", f"xor(_x6b, _x6b // {M32})"),            # >> 32
    ]
    return steps


def xxh64_sql(src: str, cols: list[str], value: str, seed: str, out: str) -> str:
    """A SELECT over ``src`` (a relation name or parenthesized subquery)
    carrying ``cols`` through and adding signed-BIGINT column ``out`` =
    Spark xxhash64-chain step of (value, seed)."""
    inner = src
    for name, expr in xxh64_long_steps(value, seed):
        keep = ", ".join(cols)
        inner = f"(SELECT {keep}, {expr} AS {name} FROM {inner} _t_{name})"
        cols = cols + [name]
    passthrough = ", ".join(c for c in cols if not c.startswith(("_a", "_l", "_x")))
    signed = (
        f"CASE WHEN _x7 >= 9223372036854775808::HUGEINT"
        f" THEN (_x7 - {M64}::HUGEINT)::BIGINT ELSE _x7::BIGINT END"
    )
    return f"(SELECT {passthrough}, {signed} AS {out} FROM {inner} _fin)"
