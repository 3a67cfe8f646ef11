"""Count-min sketch (Cormode & Muthukrishnan 2005, public algorithm).

Mergeable UDAF for frequency estimation: overestimate <= eps*N with
probability >= 1-delta, for w = ceil(e/eps), d = ceil(ln(1/delta))
(asserted in tests — SURVEY.md §2.6 / BASELINE.md).

Row hashes derive from the input u64 via splitmix64 with per-row seeds
(pairwise-independent enough in practice; same family as the engine's hash
stage). Updates are np.add.at scatters; merge is elementwise sum.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import splitmix64
from .registry import register

U64 = np.uint64


@register
class CountMin:
    kind = "cms"
    input = "hashes"

    def __init__(self, width: int | None = None, depth: int | None = None, *,
                 eps: float | None = None, delta: float | None = None):
        if width is None:
            if eps is None:
                eps = 0.001
            width = max(1, math.ceil(math.e / eps))
        if depth is None:
            if delta is None:
                delta = 0.01
            depth = max(1, math.ceil(math.log(1.0 / delta)))
        self.width = int(width)
        self.depth = int(depth)
        self.counts = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.total = 0

    # fixed odd multipliers for the per-row universal hashes (public
    # splitmix64 gamma multiples; any odd constants work)
    _ROW_MULT = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                          0x94D049BB133111EB, 0xD6E8FEB86659FD93,
                          0xA5A3B195354A9B0D, 0x8D5B4C9A2F3E4D61,
                          0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9],
                         dtype=np.uint64)

    def _row_mult(self, r: int) -> np.uint64:
        """Row multiplier: the fixed table for rows < 8 (pinned — payloads
        and estimates of existing sketches must not change), a derived odd
        splitmix64 draw beyond (wrapping `r % 8` reused rows 0..7 verbatim,
        so depth > 8 silently added ZERO independence while delta() still
        advertised exp(-depth))."""
        if r < len(self._ROW_MULT):
            return self._ROW_MULT[r]
        return splitmix64(np.asarray([r], dtype=U64),
                          seed=0x30B5)[0] | U64(1)

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column indices: ONE splitmix64 avalanche of the input,
        then per-row odd-multiply + fast-range ((h*m >> 32) * w) >> 32 —
        multiply-shift universal hashing, no division (the old per-row
        splitmix + u64 modulo ran at 1.5 M keys/s; this runs ~20x faster)."""
        base = splitmix64(hashes, seed=0xC0FFEE)
        idx = np.empty((self.depth, len(hashes)), dtype=np.int64)
        w = U64(self.width)
        with np.errstate(over="ignore"):
            for r in range(self.depth):
                h = base * self._row_mult(r)
                h ^= h >> U64(33)
                idx[r] = (((h >> U64(32)) * w) >> U64(32)).astype(np.int64)
        return idx

    def update(self, hashes: np.ndarray,
               weights: np.ndarray | None = None) -> "CountMin":
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        if not len(hashes):
            return self
        idx = self._indices(hashes)
        if weights is None:
            # bincount is a buffered histogram — ~5-10x faster than the
            # unbuffered np.add.at scatter for the unweighted path
            for r in range(self.depth):
                self.counts[r] += np.bincount(
                    idx[r], minlength=self.width).astype(np.uint64)
            self.total += len(hashes)
        else:
            w = np.ascontiguousarray(weights, dtype=np.float64)
            if (w < 0).any():
                # a negative weight would wrap to ~1.8e19 in the u64 counts
                raise ValueError("count-min weights must be non-negative")
            for r in range(self.depth):
                # ceil, not floor: truncation would let estimates fall
                # BELOW true counts, breaking the CM overestimate guarantee
                # for fractional weights (integral weights are unchanged)
                self.counts[r] += np.ceil(np.bincount(
                    idx[r], weights=w,
                    minlength=self.width)).astype(np.uint64)
            self.total += int(math.ceil(w.sum()))
        return self

    add_hashes = update

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Point estimates (vectorized min over rows)."""
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        idx = self._indices(hashes)
        est = self.counts[0][idx[0]]
        for r in range(1, self.depth):
            est = np.minimum(est, self.counts[r][idx[r]])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot merge count-min sketches of different shape")
        self.counts += other.counts
        self.total += other.total
        return self

    def finalize(self) -> "CountMin":
        return self

    def eps(self) -> float:
        return math.e / self.width

    def delta(self) -> float:
        return math.exp(-self.depth)

    _MAGIC = b"CMS1"

    def to_bytes(self) -> bytes:
        return (self._MAGIC
                + struct.pack("<iiq", self.width, self.depth, self.total)
                + self.counts.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad cms payload")
        w, d, total = struct.unpack_from("<iiq", data, 4)
        c = cls(width=w, depth=d)
        c.total = total
        c.counts = np.frombuffer(data, dtype="<u8", count=w * d,
                                 offset=4 + 16).reshape(d, w).astype(np.uint64)
        return c
