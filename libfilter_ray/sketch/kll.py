"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016 — public algorithm).

Mergeable UDAF with rank error eps ~ O(1/k) at compactor parameter k.
Compaction randomness (the odd/even coin) is derived deterministically from
the compactor's content via splitmix64, so a sketch is a pure function of
its input multiset + structure: Ray task retries cannot skew results
(SURVEY.md §4.2 determinism requirement).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import splitmix64
from .registry import register


def _capacity(k: int, depth_below: int) -> int:
    """Capacity of a compactor `depth_below` levels below the top: k*(2/3)^d."""
    return max(2, int(np.ceil(k * (2.0 / 3.0) ** depth_below)))


@register
class KLL:
    kind = "kll"
    input = "values"

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    # -- internals ---------------------------------------------------------
    def _cap(self, level: int) -> int:
        return _capacity(self.k, len(self.compactors) - 1 - level)

    def _total_size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _total_cap(self) -> int:
        return sum(self._cap(l) for l in range(len(self.compactors)))

    def _compact(self) -> None:
        while self._total_size() >= self._total_cap():
            for level in range(len(self.compactors)):
                if len(self.compactors[level]) >= self._cap(level):
                    if level + 1 == len(self.compactors):
                        self.compactors.append(np.empty(0, dtype=np.float64))
                    c = np.sort(self.compactors[level])
                    # deterministic coin from content (retry-safe)
                    bits = c.view(np.uint64)
                    seed_val = (len(c)
                                ^ int(bits[0]) ^ int(bits[-1])
                                ^ (level << 32)) % 2**64
                    coin = int(splitmix64(
                        np.array([seed_val], dtype=np.uint64))[0]
                        & np.uint64(1))
                    promoted = c[coin::2]
                    self.compactors[level + 1] = np.concatenate(
                        [self.compactors[level + 1], promoted])
                    self.compactors[level] = np.empty(0, dtype=np.float64)
                    break
            else:
                break

    # -- protocol ----------------------------------------------------------
    def update(self, values: np.ndarray) -> "KLL":
        v = np.ascontiguousarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return self
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self.n += len(v)
        self._compact()
        return self

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for level, c in enumerate(other.compactors):
            if len(c):
                self.compactors[level] = np.concatenate(
                    [self.compactors[level], c])
        self.n += other.n
        self._compact()
        return self

    def finalize(self) -> "KLL":
        return self

    def _weighted_items(self):
        vals, wts = [], []
        for level, c in enumerate(self.compactors):
            if len(c):
                vals.append(c)
                wts.append(np.full(len(c), 1 << level, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> float:
        """Estimated number of items <= x."""
        v, w = self._weighted_items()
        if not len(v):
            return 0.0
        return float(w[v <= x].sum())

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if not len(v):
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = min(int(np.searchsorted(cum, target)), len(v) - 1)
        return float(v[i])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    _MAGIC = b"KLL1"

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC,
                 struct.pack("<iqi", self.k, self.n, len(self.compactors))]
        for c in self.compactors:
            parts.append(struct.pack("<I", len(c)))
            parts.append(c.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad kll payload")
        k, n, levels = struct.unpack_from("<iqi", data, 4)
        s = cls(k)
        s.n = n
        s.compactors = []
        off = 4 + struct.calcsize("<iqi")
        for _ in range(levels):
            (ln,) = struct.unpack_from("<I", data, off)
            off += 4
            s.compactors.append(
                np.frombuffer(data, dtype="<f8", count=ln, offset=off).copy())
            off += 8 * ln
        return s
