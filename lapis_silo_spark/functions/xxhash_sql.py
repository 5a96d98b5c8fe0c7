"""DuckDB-SQL reimplementation of Spark's ``xxhash64`` for fixed-width
ASCII inputs — the device that makes the xxhash fast path of the MinHash
LSH pipeline fully oracle-checkable.

Spark's ``F.xxhash64(string)`` is XXH64 (seed 42) over the UTF-8 bytes.
For the dedup pipeline the inputs are character k-shingles of normalized
printable-ASCII text, so every input is exactly ``k`` bytes and only the
XXH64 short-input path applies (no 32-byte accumulator lanes): for k in
[5, 7] that is one little-endian 4-byte round, ``k - 4`` single-byte
rounds, and the final avalanche (k >= 8 would add the 8-byte-word round,
which no current caller needs). All arithmetic is mod 2^64; DuckDB's
HUGEINT (int128) holds every intermediate if 64x64 multiplies are split
into 32-bit halves, and ``xor``/``//``/``%`` work on HUGEINT natively.

The emitted SQL is a chain of CTEs (one per hash step) because each step
references the previous value several times — inlining would blow up the
expression tree exponentially. Parity with Spark is pinned by
``tests/test_xxhash_sql.py`` over random printable shingles and by the
``dedup_minhash_lsh_pairs_fast`` correctness row.
"""

from __future__ import annotations

XXH_PRIME_1 = 0x9E3779B185EBCA87
XXH_PRIME_2 = 0xC2B2AE3D27D4EB4F
XXH_PRIME_3 = 0x165667B19E3779F9
XXH_PRIME_5 = 0x27D4EB2F165667C5
_M64 = 1 << 64
_M32 = 1 << 32
_SEED = 42  # Spark's fixed xxhash64 seed


def _mulmod(x: str, c: int) -> str:
    """(x * c) mod 2^64 for a HUGEINT expression ``x`` < 2^64 and constant
    ``c``, via 32-bit split — every intermediate stays under 2^96."""
    cl, ch = c % _M32, c // _M32
    return (
        f"((({x}) % 4294967296) * {cl} + "
        f"(((({x}) % 4294967296) * {ch} + (({x}) // 4294967296) * {cl}) "
        f"% 4294967296) * 4294967296) % 18446744073709551616"
    )


def _rotl(x: str, r: int) -> str:
    """rotl64: high and low parts are bit-disjoint, so ``+`` == ``|``."""
    return (
        f"((({x}) * {1 << r}) % 18446744073709551616) + "
        f"(({x}) // {1 << (64 - r)})"
    )


def xxhash64_steps(k: int) -> list[tuple[str, str]]:
    """Ordered (column, expression) steps computing XXH64(seed=42) of a
    ``k``-byte ASCII string whose bytes are HUGEINT columns b0..b{k-1}.
    The final step yields ``h32`` = hash mod 2^32 (Spark's
    ``pmod(xxhash64(s), 2^32)``: 2^64 ≡ 0 mod 2^32, so the unsigned
    residue equals Spark's pmod of the signed value).
    """
    if not 5 <= k <= 7:
        raise ValueError(f"xxhash64_steps: k must be in [5, 7], got {k}")
    steps: list[tuple[str, str]] = []
    h0 = (_SEED + XXH_PRIME_5 + k) % _M64
    u32 = " + ".join(f"b{i} * {1 << (8 * i)}" for i in range(4))
    steps.append(("u32", u32))
    # 4-byte round: u32 * PRIME1 < 2^96, no split needed
    steps.append(
        ("t4", f"(u32 * {XXH_PRIME_1}) % 18446744073709551616")
    )
    steps.append(("h1", f"xor(CAST({h0} AS HUGEINT), t4)"))
    steps.append(("r1", _rotl("h1", 23)))
    steps.append(
        ("h2", f"({_mulmod('r1', XXH_PRIME_2)} + {XXH_PRIME_3}) "
               f"% 18446744073709551616")
    )
    prev = "h2"
    for i in range(4, k):  # single-byte rounds
        steps.append(
            (f"tb{i}", f"(b{i} * {XXH_PRIME_5}) % 18446744073709551616")
        )
        steps.append((f"hb{i}", f"xor({prev}, tb{i})"))
        steps.append((f"rb{i}", _rotl(f"hb{i}", 11)))
        steps.append((f"hm{i}", _mulmod(f"rb{i}", XXH_PRIME_1)))
        prev = f"hm{i}"
    # avalanche
    steps.append(("a1", f"xor({prev}, ({prev}) // 8589934592)"))          # >> 33
    steps.append(("a2", _mulmod("a1", XXH_PRIME_2)))
    steps.append(("a3", "xor(a2, a2 // 536870912)"))                      # >> 29
    steps.append(("a4", _mulmod("a3", XXH_PRIME_3)))
    steps.append(("a5", "xor(a4, a4 // 4294967296)"))                     # >> 32
    steps.append(("h32", "CAST(a5 % 4294967296 AS BIGINT)"))
    return steps


def xxhash32_ctes(src: str, shingle_col: str, k: int = 5,
                  prefix: str = "xx", carry: str = "id") -> tuple[str, str]:
    """CTE chain computing ``h32`` = Spark ``pmod(xxhash64(sh), 2^32)`` per
    row of CTE ``src`` (columns: ``carry``, ``shingle_col``). Returns
    ``(ctes_sql, final_cte)``; the final CTE has columns (carry, h32).
    """
    bytes_sql = ", ".join(
        f"CAST(unicode(substr({shingle_col}, {i + 1}, 1)) AS HUGEINT) AS b{i}"
        for i in range(k)
    )
    ctes = [f"{prefix}0 AS (SELECT {carry}, {bytes_sql} FROM {src})"]
    prev = f"{prefix}0"
    for n, (name, expr) in enumerate(xxhash64_steps(k), 1):
        ctes.append(
            f"{prefix}{n} AS (SELECT *, {expr} AS {name} FROM {prev})"
        )
        prev = f"{prefix}{n}"
    final = f"{prefix}F"
    ctes.append(f"{final} AS (SELECT {carry}, h32 FROM {prev})")
    return ",\n".join(ctes), final
