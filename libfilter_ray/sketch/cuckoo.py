"""Standard (non-taffy) cuckoo filter — the engine's BENCH BASELINE sketch.

The reference's op 27 is a set of benchmark shims around an EXTERNAL
cuckoo-filter library (``cpp/extras/benchmarks/bench.cpp:79-118``;
``cuckoofilter.h`` / ``cuckoo32.hpp`` / ``singletable.h``) used purely as
the comparison baseline in its published tables (``doc/doc.tex:60-76``
pits SBBF against "cuckoo-8"). The engine has no external libraries, so
this module implements the textbook filter itself from the public paper —
Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better
Than Bloom" (CoNEXT 2014): 4-slot buckets, fp-bit fingerprints,
partial-key cuckoo hashing (the alternate bucket is ``i ^ H(fingerprint)``,
so relocation needs only the stored fingerprint), bounded kick chains.

Role and honest scope:
- baseline for bench comparisons (``bench.py`` kernel table mirrors the
  reference's SBBF-vs-cuckoo rows) and a registry kind for completeness;
- supports DELETE (the cuckoo filter's distinguishing feature over Bloom);
  ``add_hashes`` therefore stores duplicates (multiset, paper §3.2) and a
  failed kick chain unwinds atomically, while ``update()`` — the
  Sketch-protocol build path — applies find-first SET semantics so
  duplicate-heavy columns never overflow a bucket with one key's copies;
- NOT mergeable: like the reference's shimmed baseline, union is not part
  of the cuckoo-filter contract (`merge` raises) — the mergeable growable
  story belongs to TaffyBlock/TaffyCuckoo.

Vectorization: find/delete/contains are fully vectorized (two gathers +
compares per batch); insert batch-places every key whose candidate
buckets have a free slot in two vectorized sweeps (i1 then i2, per-bucket
slot ranks from one stable argsort) and walks Python only over the
kick-chain remainder — a few percent of keys at the paper's 95% sizing
(the kick loop itself resists vectorization, like the TaffyCuckoo insert
path, SURVEY.md §7.4).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import splitmix64
from .registry import register

U64 = np.uint64
SLOTS_PER_BUCKET = 4
MAX_KICKS = 500


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@register
class CuckooFilter:
    """Partial-key cuckoo filter (Fan et al. 2014). ``fp_bits`` <= 16;
    fingerprints are stored in uint16 slots, 0 = empty (fingerprint
    values are mapped to 1..2^fp_bits-1, the paper's non-zero trick)."""

    kind = "cuckoo"
    input = "hashes"

    def __init__(self, bytes_: int | None = None, *,
                 ndv: int | None = None, fp_bits: int = 12,
                 seed: int = 0x00C5):
        if not 1 <= fp_bits <= 16:
            raise ValueError(f"fp_bits must be in 1..16, got {fp_bits}")
        if bytes_ is None:
            if ndv is None:
                raise ValueError("need bytes_ or ndv")
            # paper sizing: ndv / (slots * 0.95 load), rounded up to pow2
            bytes_ = _next_pow2(
                max(int(ndv / 0.95 / SLOTS_PER_BUCKET), 1)) \
                * SLOTS_PER_BUCKET * 2
        num_buckets = _next_pow2(max(bytes_ // (SLOTS_PER_BUCKET * 2), 1))
        self.fp_bits = fp_bits
        self.seed = seed
        self.num_buckets = num_buckets
        self._mask = U64(num_buckets - 1)
        self.table = np.zeros((num_buckets, SLOTS_PER_BUCKET),
                              dtype=np.uint16)
        self.occupied = 0
        # deterministic kick-victim stream (PCG-free: splitmix counter)
        self._kick_ctr = 0
        self._alt_lut_cache: np.ndarray | None = None
        self._victim_buf: np.ndarray | None = None
        self._victim_pos = 0

    # -- key -> (i1, fingerprint); i2 = i1 ^ H(fp) ------------------------
    def _fp_of(self, hashes: np.ndarray) -> np.ndarray:
        span = U64((1 << self.fp_bits) - 1)
        return (splitmix64(hashes, seed=self.seed) % span + U64(1)) \
            .astype(np.uint16)

    def _i1_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes >> U64(32)) & self._mask

    def _alt(self, idx: np.ndarray | int, fp) -> np.ndarray | int:
        """Alternate bucket: i ^ H(fingerprint) — computable from the
        stored fingerprint alone (the partial-key property that makes
        relocation possible)."""
        h = splitmix64(np.asarray(fp, dtype=U64), seed=self.seed ^ 0x5bd1)
        return (np.asarray(idx, dtype=U64) ^ h) & self._mask

    def _alt_lut(self) -> np.ndarray:
        """fp -> H(fp) & mask offset table for the scalar kick loop
        (H depends only on the <=2^16 fingerprint values, so one
        vectorized pass replaces a numpy scalar hash per kick). Lazy:
        only kick chains pay the 8*2^fp_bits bytes."""
        lut = self._alt_lut_cache
        if lut is None:
            fps = np.arange(1 << self.fp_bits, dtype=U64)
            lut = self._alt_lut_cache = np.asarray(
                self._alt(np.zeros(len(fps), dtype=U64), fps),
                dtype=np.int64)
        return lut

    def _next_victim(self) -> int:
        """Next deterministic kick-victim slot: the splitmix counter
        stream, refilled in vectorized blocks of 4096 (same values the
        per-kick scalar hash produced — int() before the modulo, see the
        kick-loop comment)."""
        buf, pos = self._victim_buf, self._victim_pos
        if buf is None or pos >= len(buf):
            start = self._kick_ctr + 1
            buf = self._victim_buf = (splitmix64(
                np.arange(start, start + 4096, dtype=U64),
                seed=self.seed ^ 0x94d0).astype(np.int64)
                % SLOTS_PER_BUCKET)
            pos = self._victim_pos = 0
        self._victim_pos = pos + 1
        self._kick_ctr += 1
        return int(buf[pos])

    # -- insert ------------------------------------------------------------
    def _bulk_place(self, buckets: np.ndarray,
                    fps: np.ndarray) -> np.ndarray:
        """Vectorized no-kick placement: fill each target bucket's free
        slots in key order (per-bucket ranks from one stable argsort;
        every (bucket, slot) scatter target is unique by construction).
        Returns the placed mask; unplaced keys found their bucket full
        after earlier-ranked keys in this same batch took the free
        slots."""
        tbl = self.table
        n = len(buckets)
        placed = np.zeros(n, dtype=bool)
        if n == 0:
            return placed
        ub, inv = np.unique(buckets, return_inverse=True)
        rows = tbl[ub]
        nfree = (rows == 0).sum(axis=1)
        # free columns first, original column order preserved (stable)
        free_pos = np.argsort(rows != 0, axis=1, kind="stable")
        order = np.argsort(inv, kind="stable")
        counts = np.bincount(inv, minlength=len(ub))
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = np.arange(n) - starts[inv[order]]
        ok = ranks < nfree[inv]
        if ok.any():
            tbl[buckets[ok], free_pos[inv[ok], ranks[ok]]] = fps[ok]
            self.occupied += int(ok.sum())
            placed[ok] = True
        return placed

    def add_hashes(self, hashes: np.ndarray) -> "CuckooFilter":
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        if not len(hashes):
            return self
        fps = self._fp_of(hashes)
        i1s = self._i1_of(hashes)
        i2s = self._alt(i1s, fps)
        tbl = self.table
        # Fast path: batch-place everything whose candidate buckets have
        # room — one i1 sweep, then an i2 sweep for the spillover. At the
        # paper's 95% sizing the kick loop below sees only the tail few
        # percent, so the per-key Python cost is off the hot path.
        # MULTISET semantics (paper §3.2) hold throughout: duplicate
        # fingerprints are STORED, never deduped — deletion support
        # requires it; set-membership builds go through update(), which
        # applies find-first set semantics instead.
        pending = np.arange(len(hashes))
        i1l = i1s.astype(np.int64)
        i2l = i2s.astype(np.int64)
        for targets in (i1l, i2l):
            if not len(pending):
                return self
            done = self._bulk_place(targets[pending], fps[pending])
            pending = pending[~done]
        for k in pending:
            fp = fps[k]
            i1, i2 = int(i1s[k]), int(i2s[k])
            placed = False
            # re-check for empties: a prior key's kick chain never frees
            # a slot, but the recheck is cheap and keeps this path
            # self-contained
            for idx in (i1, i2):
                row = tbl[idx]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = fp
                    self.occupied += 1
                    placed = True
                    break
            if placed:
                continue
            if (tbl[i1] == fp).all() and (tbl[i2] == fp).all():
                # kicking could never help: every slot this key may
                # occupy already holds its own fingerprint
                raise RuntimeError(
                    "duplicate overflow: this key's candidate buckets "
                    "hold nothing but its own fingerprint copies — cuckoo "
                    "filters bound duplicates at ~2b per key (Fan et al. "
                    "§3.2); dedupe the input (update() does), or use the "
                    "block/taffy filters for duplicate-heavy columns")
            # kick chain (paper alg. 1): evict a pseudorandom victim.
            # Every swap is RECORDED so a failed chain unwinds completely
            # — raising with a half-relocated victim would leave a false
            # negative for a previously inserted key. The victim stream is
            # precomputed per chain (one vectorized splitmix over the
            # counter range — int() BEFORE the modulo avoids the
            # np.uint64 % python-int float64 promotion trap that once
            # capped achievable load at ~78%), and the alternate bucket
            # comes from the fp->offset LUT: the loop body is pure-python
            # int arithmetic plus one table swap.
            idx, cur = i1, int(fp)
            chain: list[tuple[int, int, int]] = []
            lut = self._alt_lut()
            mask = self.num_buckets - 1
            for _ in range(MAX_KICKS):
                victim = self._next_victim()
                old = int(tbl[idx, victim])
                chain.append((idx, victim, old))
                tbl[idx, victim] = cur
                cur = old
                idx = (idx ^ int(lut[cur])) & mask
                row = tbl[idx]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = cur
                    self.occupied += 1
                    placed = True
                    break
            if not placed:
                for uidx, uslot, old in reversed(chain):
                    tbl[uidx, uslot] = old
                raise RuntimeError(
                    f"cuckoo filter full after {MAX_KICKS} kicks at "
                    f"{self.occupied}/{self.num_buckets * SLOTS_PER_BUCKET}"
                    " slots (table restored, no keys lost) — size it "
                    "larger (the paper's 95% load bound)")
        return self

    # -- vectorized probe / delete ------------------------------------------
    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        fps = self._fp_of(hashes)
        i1 = self._i1_of(hashes).astype(np.int64)
        i2 = self._alt(i1, fps).astype(np.int64)
        t = self.table
        return ((t[i1] == fps[:, None]).any(axis=1)
                | (t[i2] == fps[:, None]).any(axis=1))

    def delete_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one stored copy of each key's fingerprint; returns a
        bool array (True = a slot was cleared). Deleting a key never
        inserted is the caller's contract violation (paper §3.2) — it
        may clear another key's colliding fingerprint."""
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        out = np.zeros(len(hashes), dtype=bool)
        fps = self._fp_of(hashes)
        i1s = self._i1_of(hashes)
        i2s = self._alt(i1s, fps)
        for k in range(len(hashes)):
            fp = fps[k]
            for idx in (int(i1s[k]), int(i2s[k])):
                hit = np.flatnonzero(self.table[idx] == fp)
                if len(hit):
                    self.table[idx, hit[0]] = 0
                    self.occupied -= 1
                    out[k] = True
                    break
        return out

    # -- Sketch protocol -----------------------------------------------------
    def update(self, hashes: np.ndarray) -> "CuckooFilter":
        """SET-semantics accumulate for membership builds: dedupe the
        batch and skip keys the filter already reports present
        (find-first) — a duplicate-heavy column (e.g. a low-cardinality
        key built over many batches) never overflows a bucket with its
        own copies. A fingerprint-collision skip is harmless here (the
        key already answers present); workflows needing DELETE must use
        add_hashes directly, whose multiset semantics store every copy."""
        hashes = np.unique(np.ascontiguousarray(hashes, dtype=U64))
        if not len(hashes):
            return self
        return self.add_hashes(hashes[~self.find_hashes(hashes)])

    def add_hash(self, h: int) -> None:
        self.add_hashes(np.array([h], dtype=U64))

    def find_hash(self, h: int) -> bool:
        return bool(self.find_hashes(np.array([h], dtype=U64))[0])

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        raise NotImplementedError(
            "standard cuckoo filters are not union-mergeable (fingerprints "
            "lose the bits relocation needs) — use taffy_cuckoo for the "
            "mergeable growable filter; this kind is the bench baseline, "
            "mirroring the reference's shim role (bench.cpp:79-118)")

    def finalize(self) -> "CuckooFilter":
        return self

    def to_bytes(self) -> bytes:
        # seed packs as u64: __init__ accepts any int seed (64-bit seeds
        # are a common habit) and a '<I' pack would crash only at
        # serialize time, after all the insert work
        head = struct.pack("<IQQ", self.fp_bits,
                           self.seed % (1 << 64), self.num_buckets)
        return head + self.table.astype("<u2", copy=False).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        fp_bits, seed, nb = struct.unpack("<IQQ", data[:20])
        f = cls(bytes_=int(nb) * SLOTS_PER_BUCKET * 2, fp_bits=fp_bits,
                seed=seed)
        arr = np.frombuffer(data[20:], dtype="<u2").astype(np.uint16)
        f.table = arr.reshape(int(nb), SLOTS_PER_BUCKET).copy()
        f.occupied = int((f.table != 0).sum())
        return f

    def size_in_bytes(self) -> int:
        return 20 + self.table.nbytes  # <IQQ header, as to_bytes packs

    def clone(self) -> "CuckooFilter":
        f = CuckooFilter(bytes_=self.num_buckets * SLOTS_PER_BUCKET * 2,
                         fp_bits=self.fp_bits, seed=self.seed)
        f.table = self.table.copy()
        f.occupied = self.occupied
        f._kick_ctr = self._kick_ctr
        return f
