"""Taffy block filter — growable Bloom filter of stacked block levels.

Sequential semantics match the reference (``/root/reference/c/lib/taffy-block.c:9-32``,
``c/include/filter/taffy-block.h:35-48``):

- level x is planned at bytes_needed(ndv << x, fpp/(x+1)^2 * 6/3.1415^2)
  (the per-level fpp budget 6eps/(i^2 pi^2), sum <= eps — doc/taffy/taffy.tex:500-508;
  NOTE the reference uses the literal 3.1415, reproduced here for size parity)
- inserts go into the NEWEST level only; `ttl` counts remaining inserts;
  when ttl <= 0 the next level opens (last_ndv doubles, ttl = last_ndv)
- find = OR of find over all open levels

Distributed merge (engine-defined — the reference has no union for this type;
SURVEY.md §2.6): two accumulators with IDENTICAL (ndv, fpp) parameters have
identical level plans, so merge = level-wise bitwise OR of common levels +
summed per-level insert counts. Set semantics are exact (no false negatives,
monotone false positives); the *effective* fpp of a merged filter depends on
real level occupancy, exposed honestly via estimated_fpp() from the summed
counts. Byte layout after merge depends on how keys were partitioned across
levels, so conformance is at set-semantics level (like taffy-cuckoo,
SURVEY.md §2.9) while single-writer sequential builds are byte-identical to
the reference.

Adds are vectorized: a batch is split at ttl boundaries and each chunk goes
through BlockBloom's vectorized scatter.
"""

from __future__ import annotations

import struct

import numpy as np

from . import sizing
from .block_bloom import BlockBloom
from .registry import register

_SUM = 6.0 / (3.1415 ** 2)
MAX_LEVELS = 48


@register
class TaffyBlock:
    kind = "taffy_block"
    input = "hashes"

    def __init__(self, ndv: int = 1024, fpp: float = 0.01):
        self.ndv_param = int(ndv)
        self.fpp_param = float(fpp)
        ndv2 = sizing.block_capacity(1, fpp * _SUM)
        ndv_eff = max(int(ndv), ndv2)
        self.last_ndv = ndv_eff
        self.ttl = ndv_eff
        self.levels: list[BlockBloom] = [
            BlockBloom(sizing.block_bytes_needed(ndv_eff, fpp * _SUM))]
        self.counts: list[int] = [0]  # inserts per level (engine bookkeeping)
        self._ndv_eff = ndv_eff

    # level plan is derived lazily — computing 48 bytes_needed calls up front
    # costs ~10ms each at large ndv; only materialize the sizes we open.
    def _level_size(self, x: int) -> int:
        return sizing.block_bytes_needed(
            self._ndv_eff << x, self.fpp_param / ((x + 1) ** 2) * _SUM)

    @property
    def cursor(self) -> int:
        return len(self.levels)

    def _upsize(self) -> None:
        if self.cursor >= MAX_LEVELS:
            raise OverflowError("taffy block filter exceeded 48 levels")
        self.last_ndv *= 2
        self.levels.append(BlockBloom(self._level_size(self.cursor)))
        self.counts.append(0)
        self.ttl = self.last_ndv

    def add_hashes(self, hashes: np.ndarray) -> "TaffyBlock":
        hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
        i, n = 0, len(hashes)
        while i < n:
            if self.ttl <= 0:
                self._upsize()
            k = min(int(self.ttl), n - i)
            self.levels[-1].add_hashes(hashes[i:i + k])
            self.counts[-1] += k
            self.ttl -= k
            i += k
        return self

    update = add_hashes

    def add_hash(self, h: int) -> None:
        self.add_hashes(np.array([h], dtype=np.uint64))

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=bool)
        for lvl in self.levels:
            rem = ~out
            if not rem.any():
                break
            out[rem] = lvl.find_hashes(hashes[rem])
        return out

    def find_hash(self, h: int) -> bool:
        return bool(self.find_hashes(np.array([h], dtype=np.uint64))[0])

    # -- mergeable-UDAF protocol ------------------------------------------
    def merge(self, other: "TaffyBlock") -> "TaffyBlock":
        if (self.ndv_param, self.fpp_param) != (other.ndv_param, other.fpp_param):
            raise ValueError("can only merge identically-parameterized "
                             "taffy block filters (same ndv/fpp plan)")
        while self.cursor < other.cursor:
            self._upsize()
        for i, lvl in enumerate(other.levels):
            self.levels[i].merge(lvl)
            self.counts[i] += other.counts[i]
        # remaining capacity of the newest level under the summed counts
        cap = self._ndv_eff << max(0, self.cursor - 1)
        self.ttl = cap - self.counts[-1]
        return self

    def finalize(self) -> "TaffyBlock":
        return self

    def estimated_fpp(self) -> float:
        """Honest fpp estimate from actual per-level occupancy (Putze model)."""
        miss = 1.0
        for lvl, cnt in zip(self.levels, self.counts):
            miss *= 1.0 - sizing.block_fpp(cnt, lvl.size_in_bytes())
        return 1.0 - miss

    def size_in_bytes(self) -> int:
        return sum(l.size_in_bytes() for l in self.levels)

    def clone(self) -> "TaffyBlock":
        t = TaffyBlock.__new__(TaffyBlock)
        t.ndv_param, t.fpp_param = self.ndv_param, self.fpp_param
        t._ndv_eff, t.last_ndv, t.ttl = self._ndv_eff, self.last_ndv, self.ttl
        t.levels = [l.clone() for l in self.levels]
        t.counts = list(self.counts)
        return t

    # -- serde (engine format: self-describing header + level dumps) ------
    _MAGIC = b"TBF1"

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC,
                 struct.pack("<QdQqQi", self.ndv_param, self.fpp_param,
                             self._ndv_eff, self.ttl, self.last_ndv,
                             self.cursor)]
        for lvl, cnt in zip(self.levels, self.counts):
            payload = lvl.to_bytes()
            parts.append(struct.pack("<QQ", cnt, len(payload)))
            parts.append(payload)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "TaffyBlock":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad taffy block payload")
        off = 4
        ndv, fpp, ndv_eff, ttl, last_ndv, cursor = struct.unpack_from(
            "<QdQqQi", data, off)
        off += struct.calcsize("<QdQqQi")
        t = cls.__new__(cls)
        t.ndv_param, t.fpp_param = ndv, fpp
        t._ndv_eff, t.ttl, t.last_ndv = ndv_eff, ttl, last_ndv
        t.levels, t.counts = [], []
        for _ in range(cursor):
            cnt, ln = struct.unpack_from("<QQ", data, off)
            off += 16
            t.levels.append(BlockBloom.from_bytes(data[off:off + ln]))
            t.counts.append(cnt)
            off += ln
        return t

    def __eq__(self, other) -> bool:
        return (isinstance(other, TaffyBlock)
                and self.cursor == other.cursor
                and all(a == b for a, b in zip(self.levels, other.levels)))

    def __hash__(self):  # pragma: no cover
        return id(self)
