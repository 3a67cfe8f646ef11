"""Minimal taffy cuckoo filter (MTCF) — fine-grained growth, reimplementing
the reference semantics (SURVEY.md §2.1 op 22):

- 2 sides x 32 levels (``log_levels`` = 5); each level is an array of
  4-slot buckets; growth ("upsize") doubles ONE level at a time via a
  cursor (``c/lib/minimal-taffy-cuckoo.c`` upsize; when the cursor wraps,
  ``log_side_size`` increments and each side's lo/hi Feistels swap)
- slot = {long_fp:1, fingerprint:9, tail:6}, tail==0 => empty
  (``c/include/filter/paths.h:52-58``; head=9, tail=5)
- hash->path quotienting with TWO Feistel permutations per side (hi for
  full-length keys, lo for one-bit-shorter keys); levels below the cursor
  have doubled bucket arrays and one-bit-shorter fingerprints
  (``paths.h:106-146``)
- re_path converts a path between sides/levels and can emit TWO paths when
  a short path must transmute to long with an empty tail
  (``paths.h:280-343``); re_path_upsize is the growth variant
  (``paths.h:218-277``)
- insert: bucket scan (empty -> place; same fingerprint + tail-prefix ->
  dedupe; else kick PCG-chosen slot), ping-pong sides with ttl=128, stash
  overflow (``minimal-taffy-cuckoo.h:27-59,183-230``)
- growth policy: upsize while occupied > 0.9*capacity or occupied+4 >=
  capacity or total stash > 8 (``minimal-taffy-cuckoo.h:169-181``)

NOT mergeable: the reference has no union for this type, so it is exposed
as a single-writer filter only (`merge` raises; SURVEY.md §2.1 "optional —
no union => not a mergeable UDAF"). Inserts are scalar per key, like the
reference; membership probing is vectorized (batched path computation +
packed-slot snapshot, parity-tested against the scalar path).
"""

from __future__ import annotations

import struct

import numpy as np

from .registry import register
from .taffy_cuckoo import (PCG, Feistel, _is_prefix_of_vec, _mask,
                           is_prefix_of)

U64 = np.uint64

LOG_LEVELS = 5
LEVELS = 1 << LOG_LEVELS  # 32
HEAD = 9
TAIL = 5
LOG_SLOTS = 2
SLOTS = 4
EMPTY = (False, 0, 0)  # (long_fp, fingerprint, tail); tail==0 => empty

# Fixed 24xu64 entropy (c/lib/minimal-taffy-cuckoo.c kEntropy)
K_ENTROPY = [
    0x2BA7538EE1234073, 0xFCC3777539B147D6, 0x6086C563576347E7,
    0x52EFF34EE1764465, 0x8639CBF57F264867, 0x5A31EE34F0224CCB,
    0x07A1CB8140744EE6, 0xF2296CF6A6524E9F, 0x28A31CEC9F6D4484,
    0x688F3FE9DE7245F6, 0x1DC17831966B41A2, 0xF227166E425E4B0C,
    0x4A2A62BAFC694440, 0x2E6BBEA775E3429D, 0x5687DD060BA64169,
    0xC5D95E8A38A44789, 0xD30480AB74084EDC, 0xD72483670EC14DF3,
    0x0414954940374787, 0x8CD86ADFDA93493F, 0x50D61C3272A24CCB,
    0x40CB1E4F0DA34CC3, 0xB88F09C3AF35472E, 0x8DE6D01BB8A849A5,
]


class Path:
    """(level, bucket, slot) — slot inline as (long_fp, fingerprint, tail)."""

    __slots__ = ("level", "bucket", "long_fp", "fingerprint", "tail")

    def __init__(self, level=0, bucket=0, long_fp=False, fingerprint=0,
                 tail=0):
        self.level, self.bucket = level, bucket
        self.long_fp, self.fingerprint, self.tail = long_fp, fingerprint, tail

    def same_key(self, o: "Path") -> bool:
        return (self.level == o.level and self.bucket == o.bucket
                and self.long_fp == o.long_fp
                and self.fingerprint == o.fingerprint)

    def __eq__(self, o) -> bool:  # path_equal (paths.h:76-84)
        return self.same_key(o) and self.tail == o.tail

    def copy(self) -> "Path":
        return Path(self.level, self.bucket, self.long_fp, self.fingerprint,
                    self.tail)


def to_path(raw: int, f: Feistel, cursor: int, low_level_size: int,
            full_is_short: bool) -> Path:
    """paths.h:106-146. Returns tail==0 path when invalid (short key whose
    level falls below the cursor)."""
    fis = 1 if full_is_short else 0
    shift = 64 - LOG_LEVELS - low_level_size - HEAD + fis - TAIL
    pre_tail = (raw >> shift) & ((1 << 64) - 1) if shift >= 0 else raw << -shift
    raw_tail = _mask(TAIL, pre_tail)
    pre_idx_fp = pre_tail >> TAIL
    w = LOG_LEVELS + low_level_size + HEAD - fis
    hashed = f.forward(w, pre_idx_fp)
    p = Path()
    p.level = hashed >> (low_level_size + HEAD - fis)
    big_index = p.level < cursor
    if big_index and full_is_short:
        p.tail = 0
        return p
    bi = 1 if big_index else 0
    p.bucket = _mask(low_level_size + bi, hashed >> (HEAD - fis - bi))
    p.long_fp = (not big_index) and (not full_is_short)
    p.fingerprint = _mask(HEAD - fis - bi, hashed)
    p.tail = raw_tail * 2 + 1
    return p


def from_path_no_tail(p: Path, f: Feistel, level_size: int,
                      fingerprint_size: int) -> int:
    """paths.h:148-163."""
    hashed = (((p.level << level_size) | p.bucket) << fingerprint_size) \
        | p.fingerprint
    pre = f.backward(LOG_LEVELS + level_size + fingerprint_size, hashed)
    return (pre << (64 - LOG_LEVELS - level_size - fingerprint_size)) \
        & ((1 << 64) - 1)


def re_path(p: Path, from_short: Feistel, from_long: Feistel,
            to_short: Feistel, to_long: Feistel, log_from_size: int,
            log_to_size: int, from_cursor: int, to_cursor: int
            ) -> tuple[Path, Path | None]:
    """paths.h:280-343. Returns (next, extra-or-None)."""
    assert p.tail != 0
    upsize = bool(log_to_size - log_from_size)
    if p.level < from_cursor:
        assert not p.long_fp
        key = from_path_no_tail(p, from_long, log_from_size + 1, HEAD - 1)
        q = to_path(key, to_long, to_cursor, log_to_size, False)
        q.tail = p.tail
        return q, None
    if p.long_fp:
        key = from_path_no_tail(p, from_long, log_from_size, HEAD)
        q = to_path(key, to_short if upsize else to_long, to_cursor,
                    log_to_size, upsize)
        q.tail = p.tail
        return q, None
    key = from_path_no_tail(p, from_short, log_from_size, HEAD - 1)
    q = to_path(key, to_short, to_cursor, log_to_size, True)
    if not upsize and q.level >= to_cursor:
        assert q.tail != 0
        q.tail = p.tail
        return q, None
    # q invalid: level below cursor but fingerprint one bit short
    if p.tail != 1 << TAIL:
        k = key | ((p.tail >> TAIL)
                   << (64 - LOG_LEVELS - log_from_size - HEAD))
        q2 = to_path(k, to_long, to_cursor, log_to_size, False)
        q2.tail = _mask(TAIL + 1, p.tail << 1)
        return q2, None
    # empty tail: emit both 0- and 1-extensions
    extra = to_path(key, to_long, to_cursor, log_to_size, False)
    extra.tail = p.tail
    k = key | (1 << (64 - LOG_LEVELS - log_from_size - HEAD))
    q2 = to_path(k, to_long, to_cursor, log_to_size, False)
    q2.tail = p.tail
    return q2, extra


def re_path_upsize(p: Path, flo: Feistel, fhi: Feistel, log_size: int,
                   from_cursor: int) -> tuple[Path, Path | None]:
    """paths.h:218-277 — growth variant (same side, cursor+1)."""
    to_cursor = from_cursor + 1
    assert p.tail != 0
    if p.level < from_cursor:
        key = from_path_no_tail(p, fhi, log_size + 1, HEAD - 1)
        q = to_path(key, fhi, to_cursor, log_size, False)
        q.tail = p.tail
        return q, None
    if p.long_fp:
        key = from_path_no_tail(p, fhi, log_size, HEAD)
        q = to_path(key, fhi, to_cursor, log_size, False)
        q.tail = p.tail
        return q, None
    key = from_path_no_tail(p, flo, log_size, HEAD - 1)
    q = to_path(key, flo, to_cursor, log_size, True)
    if q.level >= to_cursor:
        assert q.tail != 0
        q.tail = p.tail
        return q, None
    if p.tail != 1 << TAIL:
        k = key | ((p.tail >> TAIL)
                   << (64 - LOG_LEVELS - log_size - HEAD))
        q2 = to_path(k, fhi, to_cursor, log_size, False)
        q2.tail = _mask(TAIL + 1, p.tail << 1)
        return q2, None
    extra = to_path(key, fhi, to_cursor, log_size, False)
    extra.tail = p.tail
    k = key | (1 << (64 - LOG_LEVELS - log_size - HEAD))
    q2 = to_path(k, fhi, to_cursor, log_size, False)
    q2.tail = p.tail
    return q2, extra


class _Side:
    """hi/lo Feistels + 32 levels of bucket lists + stash."""

    def __init__(self, log_level_size: int, keys):
        self.hi = Feistel(keys[0:4])
        self.lo = Feistel(keys[6:10])
        self.levels = [self._level(log_level_size) for _ in range(LEVELS)]
        self.stash: list[Path] = []

    @staticmethod
    def _level(log_size: int):
        return [[EMPTY] * SLOTS for _ in range(1 << log_size)]

    # level ops (minimal-taffy-cuckoo.h:27-75)
    def level_insert(self, p: Path, rng: PCG) -> Path:
        b = self.levels[p.level][p.bucket]
        for i in range(SLOTS):
            if b[i][2] == 0:
                b[i] = (p.long_fp, p.fingerprint, p.tail)
                out = p.copy()
                out.tail = 0
                return out
            if b[i][0] == p.long_fp and b[i][1] == p.fingerprint:
                if is_prefix_of(b[i][2], p.tail):
                    return p  # already present
        i = rng.get()
        out = Path(p.level, p.bucket, b[i][0], b[i][1], b[i][2])
        b[i] = (p.long_fp, p.fingerprint, p.tail)
        return out

    def level_find(self, p: Path) -> bool:
        b = self.levels[p.level][p.bucket]
        for i in range(SLOTS):
            if b[i][2] == 0:
                continue
            if b[i][0] == p.long_fp and b[i][1] == p.fingerprint \
                    and is_prefix_of(b[i][2], p.tail):
                return True
        return False

    def find(self, p: Path) -> bool:
        for s in self.stash:
            if s.tail != 0 and s.long_fp == p.long_fp \
                    and s.fingerprint == p.fingerprint \
                    and is_prefix_of(s.tail, p.tail) \
                    and s.level == p.level and s.bucket == p.bucket:
                return True
        return self.level_find(p)


@register
class MinimalTaffyCuckoo:
    """Single-writer fine-grained-growth cuckoo filter."""

    kind = "minimal_taffy_cuckoo"
    input = "hashes"

    def __init__(self, bytes_: int = 0):
        # reference create_with_bytes ignores bytes and starts at size 0
        # (minimal-taffy-cuckoo.c "TODO: start with a size other than 0")
        self.sides = [_Side(0, K_ENTROPY[0:12]), _Side(0, K_ENTROPY[12:24])]
        self.cursor = 0
        self.log_side_size = 0
        self.rng = PCG(LOG_SLOTS)
        self.occupied = 0
        self._version = 0  # bumped on mutation; invalidates _snapshot

    # -- capacity / size ---------------------------------------------------
    def capacity(self) -> int:
        return 2 + 2 * SLOTS * ((1 << self.log_side_size) * LEVELS
                                + (1 << self.log_side_size) * self.cursor)

    def size_in_bytes(self) -> int:
        return 2 * self.capacity() + 2 * 10  # 2B slots + path overhead

    # -- find --------------------------------------------------------------
    def find_hash(self, k: int) -> bool:
        k = int(k)
        for i in (0, 1):
            p = to_path(k, self.sides[i].lo, self.cursor,
                        self.log_side_size, True)
            if p.tail != 0 and self.sides[i].find(p):
                return True
            p = to_path(k, self.sides[i].hi, self.cursor,
                        self.log_side_size, False)
            if p.tail != 0 and self.sides[i].find(p):
                return True
        return False

    def _to_path_vec(self, raw: np.ndarray, f: Feistel,
                     full_is_short: bool):
        """Vectorized paths.h:106-146 over a u64 batch. Returns
        (level, bucket, long_fp, fingerprint, tail) int64/bool arrays;
        tail==0 marks invalid paths (short key below the cursor)."""
        fis = 1 if full_is_short else 0
        lls = self.log_side_size
        shift = 64 - LOG_LEVELS - lls - HEAD + fis - TAIL
        if shift >= 0:
            pre_tail = raw >> U64(shift)
        else:
            # shift < 0 means w + TAIL > 64 (log_side_size >= 46 — a
            # petabyte-scale single filter): a u64 left shift would drop
            # the TOP Feistel-input bits and diverge from the scalar
            # path's unbounded-int arithmetic. Refuse rather than return
            # silently-wrong membership.
            raise OverflowError(
                "vectorized find unsupported at log_side_size >= "
                f"{64 - LOG_LEVELS - HEAD + 1 - TAIL}; use find_hash")
        raw_tail = (pre_tail & U64((1 << TAIL) - 1)).astype(np.int64)
        w = LOG_LEVELS + lls + HEAD - fis
        hashed = f.forward(w, pre_tail >> U64(TAIL))
        level = (hashed >> U64(lls + HEAD - fis)).astype(np.int64)
        big = level < self.cursor
        bucket = np.where(
            big,
            ((hashed >> U64(HEAD - fis - 1))
             & U64((1 << (lls + 1)) - 1)).astype(np.int64),
            ((hashed >> U64(HEAD - fis))
             & U64((1 << lls) - 1)).astype(np.int64))
        fp = np.where(
            big,
            (hashed & U64((1 << (HEAD - fis - 1)) - 1)).astype(np.int64),
            (hashed & U64((1 << (HEAD - fis)) - 1)).astype(np.int64))
        long_fp = (~big) & (not full_is_short)
        tail = raw_tail * 2 + 1
        if full_is_short:
            tail = np.where(big, 0, tail)  # invalid: level below cursor
        return level, bucket, long_fp, fp, tail

    def _snapshot(self):
        """(2, LEVELS, max_buckets, SLOTS) uint16 packed-slot view of the
        level lists, padded to the largest level size; rebuilt lazily when
        `_version` (bumped on every mutating call) changes."""
        snap = getattr(self, "_snap", None)
        ver = self._version
        if snap is not None and snap[0] == ver:
            return snap[1]
        max_b = max(len(lvl) for side in self.sides for lvl in side.levels)
        words = np.zeros((2, LEVELS, max_b, SLOTS), dtype=np.uint16)
        for s, side in enumerate(self.sides):
            for lv, level in enumerate(side.levels):
                arr = np.array(
                    [[self._pack_slot(slot) for slot in bucket]
                     for bucket in level], dtype=np.uint16)
                words[s, lv, :len(level)] = arr
        self._snap = (ver, words)
        return words

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership (parity-tested against the scalar
        find_hash): both per-side path variants computed over the whole
        batch, one packed-slot gather + fingerprint compare per variant,
        tail-prefix check only on candidates."""
        hashes = np.ascontiguousarray(np.atleast_1d(hashes), dtype=U64)
        n = len(hashes)
        snap = getattr(self, "_snap", None)
        stale = snap is None or snap[0] != self._version
        # scalar fallback when the batch is tiny, or when a mutation just
        # invalidated the snapshot and the batch is too small to amortize
        # the O(capacity) rebuild (check-then-insert interleavings would
        # otherwise rebuild per probe call)
        if n < 32 or (stale and n * 16 < self.occupied):
            return np.fromiter((self.find_hash(int(k)) for k in hashes),
                               dtype=bool, count=n)
        words = self._snapshot()
        out = np.zeros(n, dtype=bool)
        for i, side in enumerate(self.sides):
            for f, fis in ((side.lo, True), (side.hi, False)):
                level, bucket, long_fp, fp, tail = \
                    self._to_path_vec(hashes, f, fis)
                valid = tail != 0
                wslots = words[i, level, bucket]        # (n, SLOTS)
                cand = ((wslots >> 15) == long_fp[:, None]) \
                    & (((wslots >> 6) & 0x1FF) == fp[:, None]) \
                    & ((wslots & 0x3F) != 0) & valid[:, None]
                ridx, sidx = np.nonzero(cand)
                if len(ridx):
                    ok = _is_prefix_of_vec(
                        (wslots[ridx, sidx] & 0x3F).astype(np.uint16),
                        tail[ridx].astype(np.uint16))
                    out[ridx[ok]] = True
                for p in side.stash:
                    if p.tail == 0:
                        continue
                    m0 = valid & (level == p.level) & (bucket == p.bucket) \
                        & (long_fp == p.long_fp) & (fp == p.fingerprint)
                    if m0.any():
                        idx = np.flatnonzero(m0)
                        ok = _is_prefix_of_vec(
                            np.full(len(idx), p.tail, dtype=np.uint16),
                            tail[idx].astype(np.uint16))
                        out[idx[ok]] = True
        return out

    # -- insert ------------------------------------------------------------
    def add_hash(self, k: int) -> None:
        self._version += 1
        while (self.occupied > 0.9 * self.capacity()
               or self.occupied + 4 >= self.capacity()
               or len(self.sides[0].stash) + len(self.sides[1].stash) > 8):
            self._upsize()
        p = to_path(int(k), self.sides[0].hi, self.cursor,
                    self.log_side_size, False)
        self._insert_detail(0, p, 128)

    def update(self, hashes: np.ndarray) -> "MinimalTaffyCuckoo":
        for k in np.ascontiguousarray(hashes, dtype=U64):
            self.add_hash(int(k))
        return self

    add_hashes = update

    def _insert_detail(self, side: int, p: Path, ttl: int) -> None:
        assert p.tail != 0
        while True:
            for i in (side, 1 - side):
                ttl -= 1
                if ttl < 0:
                    self.sides[i].stash.append(p.copy())
                    self.occupied += 1
                    return
                q = p.copy()
                r = self.sides[i].level_insert(p, self.rng)
                if r.tail == 0:
                    self.occupied += 1
                    return
                if r == q:
                    return  # already present
                nxt, extra = re_path(
                    r, self.sides[i].lo, self.sides[i].hi,
                    self.sides[1 - i].lo, self.sides[1 - i].hi,
                    self.log_side_size, self.log_side_size,
                    self.cursor, self.cursor)
                if extra is not None and extra.tail != 0:
                    self._insert_detail(1 - i, extra, ttl)
                p = nxt
                assert p.tail != 0

    # -- growth (minimal-taffy-cuckoo.c upsize) ----------------------------
    def _upsize(self) -> None:
        last = [self.sides[0].levels[self.cursor],
                self.sides[1].levels[self.cursor]]
        for i in (0, 1):
            self.sides[i].levels[self.cursor] = \
                _Side._level(self.log_side_size + 1)
        self.cursor += 1
        old_stashes = [self.sides[0].stash, self.sides[1].stash]
        self.sides[0].stash = []
        self.sides[1].stash = []
        self.occupied -= len(old_stashes[0]) + len(old_stashes[1])
        for s in (0, 1):
            for p in old_stashes[s]:
                r, q = re_path_upsize(p, self.sides[s].lo, self.sides[s].hi,
                                      self.log_side_size, self.cursor - 1)
                assert r.tail != 0
                if q is not None and q.tail != 0:
                    self._insert_detail(s, q, 128)
                self._insert_detail(s, r, 128)
        for s in (0, 1):
            for bi, bucket in enumerate(last[s]):
                for slot in bucket:
                    if slot[2] == 0:
                        continue
                    self.occupied -= 1
                    p = Path(self.cursor - 1, bi, slot[0], slot[1], slot[2])
                    r, q = re_path_upsize(p, self.sides[s].lo,
                                          self.sides[s].hi,
                                          self.log_side_size,
                                          self.cursor - 1)
                    assert r.tail != 0
                    if q is not None and q.tail != 0:
                        self._insert_detail(s, q, 128)
                    self._insert_detail(s, r, 128)
        if self.cursor == LEVELS:
            self.cursor = 0
            self.log_side_size += 1
            for i in (0, 1):
                self.sides[i].lo, self.sides[i].hi = \
                    self.sides[i].hi, self.sides[i].lo

    # -- protocol ----------------------------------------------------------
    def merge(self, other):
        raise TypeError(
            "minimal taffy cuckoo filters are not mergeable (the reference "
            "has no union for this type; SURVEY.md §2.1 op 22) — build "
            "single-writer or use taffy_cuckoo for distributed merges")

    def finalize(self) -> "MinimalTaffyCuckoo":
        return self

    _MAGIC = b"MTC1"

    @staticmethod
    def _pack_slot(slot) -> int:
        return (int(slot[0]) << 15) | (slot[1] << 6) | slot[2]

    @staticmethod
    def _unpack_slot(w: int):
        return (bool(w >> 15), (w >> 6) & 0x1FF, w & 0x3F)

    def to_bytes(self) -> bytes:
        out = [self._MAGIC,
               struct.pack("<QQQ", self.cursor, self.log_side_size,
                           self.occupied)]
        for side in self.sides:
            for f in (side.hi, side.lo):
                out.append(struct.pack("<4Q", f.k00, f.k01, f.k10, f.k11))
            for lvl in side.levels:
                out.append(struct.pack("<Q", len(lvl)))
                words = np.array([self._pack_slot(s) for b in lvl for s in b],
                                 dtype="<u2")  # little-endian pinned
                out.append(words.tobytes())
            out.append(struct.pack("<Q", len(side.stash)))
            for p in side.stash:
                out.append(struct.pack("<QQH", p.level, p.bucket,
                                       self._pack_slot(
                                           (p.long_fp, p.fingerprint, p.tail))))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MinimalTaffyCuckoo":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad minimal taffy cuckoo payload")
        off = 4
        f = cls()
        f.cursor, f.log_side_size, f.occupied = \
            struct.unpack_from("<QQQ", data, off)
        off += 24
        for side in f.sides:
            for fe in ("hi", "lo"):
                k = struct.unpack_from("<4Q", data, off)
                off += 32
                feis = Feistel(k)
                setattr(side, fe, feis)
            side.levels = []
            for _ in range(LEVELS):
                (n,) = struct.unpack_from("<Q", data, off)
                off += 8
                words = np.frombuffer(data, dtype="<u2",
                                      count=n * SLOTS, offset=off)
                off += 2 * n * SLOTS
                lvl = [[cls._unpack_slot(int(words[b * SLOTS + s]))
                        for s in range(SLOTS)] for b in range(n)]
                side.levels.append(lvl)
            (ns,) = struct.unpack_from("<Q", data, off)
            off += 8
            side.stash = []
            for _ in range(ns):
                lv, bk, w = struct.unpack_from("<QQH", data, off)
                off += 18
                lf, fp, tl = cls._unpack_slot(w)
                side.stash.append(Path(lv, bk, lf, fp, tl))
        f._version += 1
        return f
