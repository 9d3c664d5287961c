"""Deterministic cross-engine hashing for dedup sketches.

Engines disagree on their native hash functions (Spark xxhash64 vs
DuckDB's murmur-flavored ``hash``), so sketches that must be
oracle-checkable are built on md5 → hex → integer, which both engines
compute identically, followed by pure 64-bit-safe integer arithmetic:

    h32(s)      = int(md5(s)[0:8], 16)               ∈ [0, 2^32)
    minhash_i   = min over shingles of (a_i*h32 + b_i) mod P

with P = 4294967311 (smallest prime > 2^32) and a_i < 2^20 so a*h+b
stays below 2^52 — no signed-64 overflow in either engine (DuckDB
*raises* on BIGINT overflow; Spark silently wraps — both are parity
killers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_P = 4294967311  # smallest prime > 2^32

# Deterministic (a, b) parameter pairs — generated once from a fixed
# linear-congruential sweep; stable across runs and engines.
def minhash_params(k: int = 16) -> list[tuple[int, int]]:
    params, x = [], 88172645463325252
    for _ in range(k):
        # xorshift64 steps; masked into the safe ranges documented above.
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        a = (x % (1 << 20)) | 1          # odd, < 2^20
        b = (x >> 20) % MINHASH_P
        params.append((a, b))
    return params


def h32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative bigint (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# NOTE: signature/band/simhash assembly lives in operators/dedup.py as
# explode + aggregate plans — array-fold formulations here were 16-60×
# slower because Catalyst does no CSE inside lambda expressions (each
# hash function re-evaluated every shingle's md5).
