"""Sizing math for split-block Bloom filters.

Implements equation 3 of Putze, Sanders & Singler, "Cache-, Hash- and
Space-Efficient Bloom Filters" (WEA 2007) — the same model the reference uses
(``/root/reference/c/lib/util.c:5-81``, doc in ``c/lib/util-internal.h``).
Matching this math exactly gives identical filter sizes for a given
(ndv, fpp), hence identical FPP behavior to the reference.

Defaults: word_bits=32, bucket_words=8, hash_bits=32 (one 256-bit bucket,
8 set bits per key) — ``c/lib/block.c:8-18``.
"""

from __future__ import annotations

import functools
import math

BUCKET_WORDS = 8
WORD_BITS = 32
HASH_BITS = 32
BUCKET_BYTES = WORD_BITS * BUCKET_WORDS // 8  # 32


def block_fpp_detail(ndv: float, bytes_: float, word_bits: float = WORD_BITS,
                     bucket_words: float = BUCKET_WORDS,
                     hash_bits: float = HASH_BITS) -> float:
    """False-positive probability of a split-block Bloom filter (Putze eq. 3).

    Poisson-weighted sum over the load of one bucket, plus the hash-collision
    term for finite hash_bits. Reference: c/lib/util.c:5-34.
    """
    if ndv == 0:
        return 0.0
    if bytes_ <= 0:
        return 1.0
    if ndv / (bytes_ * 8) > 3:
        return 1.0
    result = 0.0
    lam = bucket_words * word_bits / ((bytes_ * 8) / ndv)
    loglam = math.log(lam)
    log1collide = -hash_bits * math.log(2.0)
    max_j = 10000
    for j in range(max_j):
        i = max_j - 1 - j
        logp = i * loglam - lam - math.lgamma(i + 1)
        base = 1.0 - (1.0 - 1.0 / word_bits) ** i
        logfinner = bucket_words * (math.log(base) if base > 0 else -math.inf)
        logcollide = math.log(i) + log1collide if i > 0 else -math.inf
        result += math.exp(logp + logfinner) + math.exp(logp + logcollide)
    return min(result, 1.0)


@functools.lru_cache(maxsize=65536)
def block_fpp(ndv: float, bytes_: float) -> float:
    return block_fpp_detail(ndv, bytes_)


@functools.lru_cache(maxsize=4096)
def block_bytes_needed(ndv: float, fpp: float) -> int:
    """Smallest byte size (rounded up to whole buckets) achieving <= fpp.
    Cached: the model is a pure function and identical (ndv, fpp) pairs
    recur for every per-block partial of the same build (~90ms per miss —
    a 10k-term Poisson sum per probe of the search).

    Exponential then binary search over the fpp model, as in
    c/lib/util.c:36-58.
    """
    bucket_bytes = BUCKET_BYTES
    result = 1
    while block_fpp(ndv, result) > fpp:
        if result * 2 < result:  # pragma: no cover — overflow guard
            return result
        result *= 2
    if result <= bucket_bytes:
        return bucket_bytes
    lo = 0
    while lo + 1 < result:
        mid = lo + (result - lo) // 2
        test = block_fpp(ndv, mid)
        if test < fpp:
            result = mid
        elif test == fpp:
            return ((mid + bucket_bytes - 1) // bucket_bytes) * bucket_bytes
        else:
            lo = mid
    return ((result + bucket_bytes - 1) // bucket_bytes) * bucket_bytes


def block_capacity(bytes_: int, fpp: float) -> int:
    """Largest ndv a `bytes_`-sized filter supports at <= fpp (c/lib/util.c:60-81)."""
    result = 1
    while block_fpp(result, bytes_) < fpp:
        result *= 2
    if result == 1:
        return 0
    lo = 0
    while lo + 1 < result:
        mid = lo + (result - lo) // 2
        test = block_fpp(mid, bytes_)
        if test < fpp:
            lo = mid
        elif test == fpp:
            return mid
        else:
            result = mid
    return lo
