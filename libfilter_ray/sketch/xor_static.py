"""Static (xor) filter — immutable, bulk-built from the full hash list.

Reimplements the reference semantics (SURVEY.md §2.1 ops 23-25):

- size = (0.75 + 1/ln ln n) * n bytes (2n for n < 10), rounded up to 8
  (``c/lib/static.c:12-16``)
- 3-ary hyperedges over a sliding window: window = 3 + m^(2/3) (capped at m),
  start = mulhi64(hash, m-window), vertices via successive mulhi64 with
  in-edge collision bumping, 8-bit fingerprint from the remaining bits
  (``c/include/filter/static.h:38-59``)
- build: peel degree-1 vertices to a stack; on 2-core failure grow size by
  1.01x and retry; back-substitute fingerprints in reverse peel order
  (``c/lib/peel.h:75-119``, ``c/lib/static.c:17-82``)
- find: xor the 3 vertex bytes with the edge fingerprint == 0
  (``c/include/filter/static.h:62-75``)

NOT mergeable — the engine builds one per group via
``groupby(key).map_groups`` (SURVEY.md §2.6). find is fully vectorized
(mulhi64 via 32-bit split); build's peel loop is sequential by nature
(reference TODO "multi-threading and SIMD", c/lib/peel.h:74) and runs
per-group inside one task.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .registry import register

U64 = np.uint64
ARITY = 3
_M64 = (1 << 64) - 1


def _mulhi64_vec(a: np.ndarray, b: int) -> np.ndarray:
    """High 64 bits of a (u64 array) * b (u64 scalar), vectorized."""
    b_lo = np.uint64(b & 0xFFFFFFFF)
    b_hi = np.uint64(b >> 32)
    a_lo = a & np.uint64(0xFFFFFFFF)
    a_hi = a >> np.uint64(32)
    with np.errstate(over="ignore"):
        ll = a_lo * b_lo
        lh = a_lo * b_hi
        hl = a_hi * b_lo
        hh = a_hi * b_hi
        cross = (ll >> np.uint64(32)) + (lh & np.uint64(0xFFFFFFFF)) + \
            (hl & np.uint64(0xFFFFFFFF))
        return hh + (lh >> np.uint64(32)) + (hl >> np.uint64(32)) + \
            (cross >> np.uint64(32))


def _window(m: int) -> int:
    w = int(ARITY + math.pow(m, 2.0 / 3.0))
    return m if w > m else w


def _make_edges_vec(hashes: np.ndarray, m: int):
    """Vectorized edge construction (static.h:38-59).
    Returns (vertices (n,3) int64, fingerprints (n,) uint8)."""
    h = np.ascontiguousarray(hashes, dtype=U64)
    window = _window(m)
    mw = m - window
    start = _mulhi64_vec(h, mw).astype(np.int64)
    with np.errstate(over="ignore"):
        h = h * U64(mw)
    verts = np.empty((len(h), ARITY), dtype=np.int64)
    for j in range(ARITY):
        vj = _mulhi64_vec(h, window).astype(np.int64)
        # collision bump: while (vj == any previous) vj++, wrapping at window
        for _ in range(ARITY + 1):  # bounded: at most ARITY-1 collisions
            clash = np.zeros(len(h), dtype=bool)
            for k in range(j):
                clash |= vj == verts[:, k] - start
            if not clash.any():
                break
            vj[clash] += 1
            vj[clash & (vj == window)] = 0
        verts[:, j] = vj + start
        with np.errstate(over="ignore"):
            h = h * U64(window)
    fps = (h >> U64(56)).astype(np.uint8)
    return verts, fps


@register
class StaticXor:
    """Bulk-built xor filter. Construct via `build(hashes)`; the Sketch
    protocol's update/merge are unsupported by design (matching the
    reference, which has no add/union for static filters)."""

    kind = "static_xor"
    input = "hashes"

    def __init__(self):
        self.xors: np.ndarray | None = None  # uint8[m]

    # -- construction ------------------------------------------------------
    @classmethod
    def build(cls, hashes: np.ndarray) -> "StaticXor":
        # Dedupe first (preserving first-occurrence order — the byte layout
        # depends on edge order): duplicate hashes yield identical hyperedges,
        # which can never be peeled (a 2-clone 2-core) at any size. The filter
        # is a set structure, so dedup preserves semantics; the reference
        # leaves this to callers (its fixed-seed test corpus is duplicate-free).
        h = np.ascontiguousarray(hashes, dtype=U64)
        _, first = np.unique(h, return_index=True)
        if len(first) != len(h):
            h = h[np.sort(first)]
        n = len(h)
        if n == 0:
            f = cls()
            f.xors = np.zeros(8, dtype=np.uint8)
            return f
        size = int((2.0 if n < 10 else (0.75 + 1.0 / math.log(math.log(n)))) * n)
        size = (size + 7) // 8 * 8
        while True:
            f = cls._try_build(h, size)
            if f is not None:
                return f
            size = int(size * 1.01) + 1
            size = (size + 7) // 8 * 8

    @classmethod
    def _try_build(cls, h: np.ndarray, m: int) -> "StaticXor | None":
        n = len(h)
        verts, fps = _make_edges_vec(h, m)
        # node state: degree count + xor of incident edge ids (peel.h:21-43)
        count = np.zeros(m, dtype=np.int64)
        exor = np.zeros(m, dtype=np.int64)
        for j in range(ARITY):
            np.add.at(count, verts[:, j], 1)
            np.bitwise_xor.at(exor, verts[:, j], np.arange(n, dtype=np.int64))
        # peel (faithful to peel.h:75-106)
        peel_edge = np.empty(m, dtype=np.int64)
        peel_vertex = np.empty(m, dtype=np.int64)
        init = np.nonzero(count <= 1)[0]
        end = len(init)
        peel_vertex[:end] = init
        peel_edge[:end] = exor[init]
        begin = 0
        while begin < end:
            v = peel_vertex[begin]
            if count[v] == 0:
                begin += 1
                continue
            e = exor[v]  # the single remaining incident edge
            for k in range(ARITY):
                u = verts[e, k]
                exor[u] ^= e
                count[u] -= 1
                if count[u] == 1 and u != v:
                    peel_edge[end] = exor[u]
                    peel_vertex[end] = u
                    end += 1
            begin += 1
        if begin < m:
            return None  # 2-core remains
        # unpeel: reverse back-substitution (peel.h:108-119)
        xors = np.zeros(m, dtype=np.uint8)
        for j in range(m - 1, -1, -1):
            e = peel_edge[j]
            acc = fps[e]
            for k in range(ARITY):
                acc ^= xors[verts[e, k]]
            xors[peel_vertex[j]] = acc
        f = cls()
        f.xors = xors
        return f

    # -- probe -------------------------------------------------------------
    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        m = len(self.xors)
        verts, fps = _make_edges_vec(hashes, m)
        acc = fps.copy()
        for j in range(ARITY):
            acc ^= self.xors[verts[:, j]]
        return acc == 0

    def find_hash(self, k: int) -> bool:
        return bool(self.find_hashes(np.array([k], dtype=U64))[0])

    def size_in_bytes(self) -> int:
        return len(self.xors)

    def clone(self) -> "StaticXor":
        f = StaticXor()
        f.xors = self.xors.copy()
        return f

    def merge(self, other):  # pragma: no cover
        raise TypeError("static xor filters are not mergeable; build per "
                        "group via map_groups (SURVEY.md §2.6)")

    def finalize(self) -> "StaticXor":
        return self

    _MAGIC = b"SXF1"

    def to_bytes(self) -> bytes:
        return self._MAGIC + struct.pack("<Q", len(self.xors)) + \
            self.xors.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "StaticXor":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad static xor payload")
        (m,) = struct.unpack_from("<Q", data, 4)
        f = cls()
        f.xors = np.frombuffer(data, dtype=np.uint8, count=m, offset=12).copy()
        return f
