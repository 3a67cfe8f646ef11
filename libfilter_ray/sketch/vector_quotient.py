"""Taffy vector-quotient filter (TVQF) — the reference's two-choice growable
quotient filter experiment (``/root/reference/cpp/include/filter/taffy-vector-quotient.hpp``).

Layout (faithful to the reference, hpp:14-45): 64-byte lines of 32 quotient
buckets sharing 28 two-byte entries; a 64-bit metadata word encodes the
quotient->entry mapping as an interleaved bitvector (32 ones = bucket
boundaries, zeros = entries — hpp:34-35,49-81); each entry is
lean(1) | fingerprint(9) | tail(5+1) bits (kHeadSize=9/kTailSize=5,
hpp:14-16,37-41); two Feistel permutations pick candidate lines and the
less-populated one wins (the "lean" bit records the choice, hpp:119-134);
growth decodes every entry through the inverse permutation and reinserts
one tail bit deeper, exactly the taffy path-extension scheme
(hpp:172-200; same as taffy-cuckoo upsize, c/lib/taffy-cuckoo.c:208-237).
Entropy constants reproduced from hpp:28-31.

The reference header is bench-only dead code — it is never instantiated
anywhere in the repo and has no tests — and contains three internal
defects this implementation corrects (each breaks the no-false-negative
invariant across growth):

1. hpp:125 mixes the encoded tail into the Feistel input
   (``(raw << 1) | (encoded_tail << kHeadSize)``) while Upsize's decoder
   (hpp:186) reconstructs the permuted value WITHOUT the tail — the
   round-trip loses keys. Here only the raw high bits are permuted (the
   taffy-cuckoo convention, taffy-cuckoo.h:106-127).
2. hpp:132 stores ``encoded_tail << 1`` into the 6-bit tail field,
   truncating the top tail bit. Here the 6-bit encoded tail is stored
   verbatim.
3. hpp:88 indexes entry storage by metadata BIT position (``data[i]`` for
   ``i`` in ``[begin, nth_one)``); entry slots are bit position minus the
   number of ones below (= quotient). Here the subtraction is applied.

Like the minimal taffy cuckoo (SURVEY.md §2.1 op 22) the filter has no
union: distributed builds are single-writer per group
(groupby.map_groups), which is the reference's own model (it is a
single-threaded bench structure).
"""

from __future__ import annotations

import struct

import numpy as np

from .registry import register
from .taffy_cuckoo import Feistel, _is_prefix_of_vec, is_prefix_of

U64 = np.uint64
HEAD = 9                      # kHeadSize, hpp:14
TAIL = 5                      # kTailSize, hpp:15
LOG_QUOTIENTS = 5             # 32 quotient buckets per line
SLOTS = 28                    # entries per line (hpp:45)
TAIL_MASK = (1 << (TAIL + 1)) - 1
FP_MASK = (1 << HEAD) - 1
EMPTY_TAIL_MARK = 1 << TAIL
META_INIT = 0xFFFFFFFF        # 32 ones, no entries (hpp:35)
_M64 = (1 << 64) - 1

# hpp:28-31
ENTROPY = (0xB15DBFC96A694E83, 0x52837326421249C7,
           0x50A38B0AEC7C4BAA, 0x5E71DE01DA7842E0,
           0xC675B743F7C74FAE, 0x42D64F9D750B46B5,
           0xA6FAFA9AAC5D4C8B, 0xF394F37B5E4C4972)


def _nth_one_pos(meta: int, n: int) -> int:
    """Bit position of the n-th (0-indexed) set bit — the portable
    ``_tzcnt_u64(_pdep_u64(1 << n, meta))`` (hpp:53,86)."""
    m = meta
    for _ in range(n):
        m &= m - 1
    return (m & -m).bit_length() - 1


@register
class TaffyVectorQuotient:
    kind = "taffy_vector_quotient"
    input = "hashes"

    def __init__(self, log_size: int = 0):
        self._init_arrays(int(log_size))
        self.f = [Feistel(ENTROPY[0:4]), Feistel(ENTROPY[4:8])]
        self.occupancy = 0

    def _init_arrays(self, log_size: int) -> None:
        self.log_size = log_size
        n = 1 << log_size
        self.meta = np.full(n, META_INIT, dtype=U64)
        self.lean = np.zeros((n, SLOTS), dtype=np.uint8)
        self.fp = np.zeros((n, SLOTS), dtype=np.uint16)
        self.tailarr = np.zeros((n, SLOTS), dtype=np.uint8)

    # total addressed bits: line index + quotient + fingerprint
    @property
    def _w(self) -> int:
        return self.log_size + LOG_QUOTIENTS + HEAD

    # -- line ops ----------------------------------------------------------
    def _population(self, li: int) -> int:
        return int(self.meta[li]).bit_length() - 32  # hpp:97-99

    def _line_insert(self, li: int, lean: int, quotient: int, fp: int,
                     tail: int) -> bool:
        meta = int(self.meta[li])
        if meta.bit_length() - 32 >= SLOTS:  # hpp:49 (lzcnt == 4 <=> full)
            return False
        nth_one = _nth_one_pos(meta, quotient)
        new_meta = (meta & ((1 << nth_one) - 1)) \
            | ((meta >> nth_one) << (nth_one + 1))  # hpp:55-56
        p = nth_one - quotient  # entry slot (hpp:74)
        self.lean[li, p + 1:] = self.lean[li, p:-1].copy()
        self.fp[li, p + 1:] = self.fp[li, p:-1].copy()
        self.tailarr[li, p + 1:] = self.tailarr[li, p:-1].copy()
        self.lean[li, p] = lean
        self.fp[li, p] = fp
        self.tailarr[li, p] = tail
        self.meta[li] = U64(new_meta & _M64)
        return True

    def _line_find(self, li: int, lean: int, quotient: int, fp: int,
                   tail: int) -> bool:
        meta = int(self.meta[li])
        nth_one = _nth_one_pos(meta, quotient)
        begin = 0 if quotient == 0 else _nth_one_pos(meta, quotient - 1) + 1
        for p in range(begin - quotient, nth_one - quotient):  # fix (3)
            if (self.lean[li, p] == lean and self.fp[li, p] == fp
                    and is_prefix_of(int(self.tailarr[li, p]), tail)):
                return True
        return False

    # -- path machinery ----------------------------------------------------
    def _decompose(self, hashed: int) -> tuple[int, int, int]:
        li = hashed >> (LOG_QUOTIENTS + HEAD)
        quotient = (hashed >> HEAD) & ((1 << LOG_QUOTIENTS) - 1)
        return li, quotient, hashed & FP_MASK

    def _try_insert_raw(self, raw: int, tail: int) -> bool:
        """One two-choice attempt: permute the raw high bits through both
        Feistels, place into the less-populated line (hpp:119-134; fix 1:
        the tail never enters the permutation)."""
        w = self._w
        pre = (raw & _M64) >> (64 - w)
        cand = []
        for i in (0, 1):
            hashed = self.f[i].forward(w, pre)
            li, q, fp = self._decompose(hashed)
            cand.append((li, q, fp, self._population(li)))
        lean = 1 if cand[0][3] > cand[1][3] else 0  # hpp:128
        li, q, fp, _ = cand[lean]
        ok = self._line_insert(li, lean, q, fp, tail)
        if ok:
            self.occupancy += 1
        return ok

    # -- public API --------------------------------------------------------
    def add_hash(self, k: int) -> None:
        while True:
            w = self._w
            pre_tail = (int(k) & _M64) >> (64 - w - TAIL)
            tail = ((pre_tail & ((1 << TAIL) - 1)) * 2 + 1) & TAIL_MASK
            if self._try_insert_raw(int(k), tail):
                return
            self._upsize()

    def add_hashes(self, hashes: np.ndarray) -> "TaffyVectorQuotient":
        for k in np.ascontiguousarray(hashes, dtype=U64):
            self.add_hash(int(k))
        return self

    update = add_hashes

    def find_hash(self, k: int) -> bool:
        w = self._w
        pre = (int(k) & _M64) >> (64 - w)
        pre_tail = (int(k) & _M64) >> (64 - w - TAIL)
        tail = ((pre_tail & ((1 << TAIL) - 1)) * 2 + 1) & TAIL_MASK
        for i in (0, 1):
            hashed = self.f[i].forward(w, pre)
            li, q, fp = self._decompose(hashed)
            if self._line_find(li, i, q, fp, tail):
                return True
        return False

    # popcount per byte / nth-set-bit-in-byte LUTs for the vectorized find
    _POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                          axis=1).sum(axis=1).astype(np.int64)
    _NTH8 = np.full((256, 8), 8, dtype=np.int64)
    for _b in range(256):
        _r = 0
        for _bit in range(8):
            if (_b >> _bit) & 1:
                _NTH8[_b, _r] = _bit
                _r += 1
    del _b, _r, _bit

    def _nth_one_pos_vec(self, meta_bytes: np.ndarray,
                         cum: np.ndarray, rank: np.ndarray) -> np.ndarray:
        """Bit position of the rank-th set bit per row — vectorized
        select via per-byte popcount prefix sums + an in-byte LUT.
        meta_bytes: (n, 8) uint8; cum: (n, 8) inclusive prefix popcounts."""
        byte_idx = (cum <= rank[:, None]).sum(axis=1)
        prev = np.where(byte_idx > 0,
                        cum[np.arange(len(rank)), np.maximum(byte_idx, 1) - 1],
                        0)
        in_rank = rank - prev
        bval = meta_bytes[np.arange(len(rank)), byte_idx]
        return byte_idx * 8 + self._NTH8[bval, in_rank]

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: both Feistel permutations over the whole
        batch, metadata select-nth-one via byte-popcount LUTs, then one
        (n, SLOTS) masked compare per side — no per-key Python."""
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        w = self._w
        pre = hashes >> U64(64 - w)
        pre_tail = hashes >> U64(64 - w - TAIL)
        tail = (((pre_tail & U64((1 << TAIL) - 1)) << U64(1)) | U64(1)) \
            .astype(np.uint16)
        out = np.zeros(n, dtype=bool)
        slot_range = np.arange(SLOTS, dtype=np.int64)[None, :]
        for i in (0, 1):
            hashed = self.f[i].forward(w, pre)
            li = (hashed >> U64(LOG_QUOTIENTS + HEAD)).astype(np.int64)
            q = ((hashed >> U64(HEAD))
                 & U64((1 << LOG_QUOTIENTS) - 1)).astype(np.int64)
            fp = (hashed & U64(FP_MASK)).astype(np.uint16)
            meta_bytes = self.meta[li].view(np.uint8).reshape(-1, 8)
            cum = np.cumsum(self._POP8[meta_bytes], axis=1)
            nth = self._nth_one_pos_vec(meta_bytes, cum, q)
            begin = np.where(
                q > 0,
                self._nth_one_pos_vec(meta_bytes, cum,
                                      np.maximum(q - 1, 0)) + 1,
                0)
            lo = (begin - q)[:, None]
            hi = (nth - q)[:, None]
            in_range = (slot_range >= lo) & (slot_range < hi)
            lean_ok = self.lean[li] == i
            fp_ok = self.fp[li] == fp[:, None]
            cand = in_range & lean_ok & fp_ok
            # tail-prefix check only on the (rare) fingerprint matches —
            # the full (n, SLOTS) prefix pass was the dominant cost
            ridx, sidx = np.nonzero(cand)
            if len(ridx):
                tl = self.tailarr[li[ridx], sidx].astype(np.uint16)
                ok = _is_prefix_of_vec(tl, tail[ridx])
                out[ridx[ok]] = True
        return out

    # -- growth ------------------------------------------------------------
    @staticmethod
    def _extend(raw: int, tail: int, w: int, target_w: int):
        """All (raw', tail') widenings of `raw` from `w` to `target_w`
        significant bits, consuming one tail bit per extra address bit
        (taffy-cuckoo's path-extension scheme, c/lib/taffy-cuckoo.c:208-237);
        an exhausted tail (EMPTY mark) forks into BOTH one-bit extensions."""
        stack = [(raw, tail, w)]
        while stack:
            r, tl, ww = stack.pop()
            if ww >= target_w:
                yield r, tl
                continue
            ext = 1 << (64 - ww - 1)
            if tl == EMPTY_TAIL_MARK:
                stack.append((r, EMPTY_TAIL_MARK, ww + 1))
                stack.append((r | ext, EMPTY_TAIL_MARK, ww + 1))
            else:
                stack.append((r | (tl >> TAIL) * ext,
                              (tl << 1) & TAIL_MASK, ww + 1))

    def _migrate_into(self, t: "TaffyVectorQuotient") -> bool:
        """Decode every entry through the inverse permutation and reinsert
        into `t`, widened to t's address width. Returns False the moment an
        insert fails — the caller restarts with a bigger target (the
        reference's `goto start`, hpp:175-194) so `t` itself NEVER upsizes
        mid-migration (a nested upsize would re-read phantom raw bits and
        mass-produce false negatives)."""
        w = self._w
        for li in range(1 << self.log_size):
            meta = int(self.meta[li])
            p, q = 0, 0
            for bit in range(meta.bit_length()):
                if (meta >> bit) & 1:
                    q += 1
                    continue
                lean = int(self.lean[li, p])
                fp = int(self.fp[li, p])
                tail = int(self.tailarr[li, p])
                hashed = ((li << LOG_QUOTIENTS) | q) << HEAD | fp
                raw = (self.f[lean].backward(w, hashed) << (64 - w)) & _M64
                for r2, t2 in self._extend(raw, tail, w, t._w):
                    if not t._try_insert_raw(r2, t2):
                        return False
                p += 1
        return True

    def _upsize(self) -> None:
        """Grow by decode-and-reinsert (hpp:172-200 with fixes 1-3): try a
        target one level up; if migration overflows any line, discard the
        target and retry one level bigger (the reference's size_up++)."""
        size_up = 1
        while True:
            t = TaffyVectorQuotient.__new__(TaffyVectorQuotient)
            t._init_arrays(self.log_size + size_up)
            t.f = self.f
            t.occupancy = 0
            if self._migrate_into(t):
                break
            size_up += 1
        self.log_size = t.log_size
        self.meta, self.lean, self.fp, self.tailarr = \
            t.meta, t.lean, t.fp, t.tailarr
        self.occupancy = t.occupancy

    # -- sketch protocol ---------------------------------------------------
    def finalize(self) -> "TaffyVectorQuotient":
        return self

    def size_in_bytes(self) -> int:
        return 64 << self.log_size  # sizeof(Line) << log_size (hpp:25)

    def clone(self) -> "TaffyVectorQuotient":
        t = TaffyVectorQuotient.__new__(TaffyVectorQuotient)
        t.log_size = self.log_size
        t.meta = self.meta.copy()
        t.lean = self.lean.copy()
        t.fp = self.fp.copy()
        t.tailarr = self.tailarr.copy()
        t.f = self.f
        t.occupancy = self.occupancy
        return t

    _MAGIC = b"TVQ1"

    def to_bytes(self) -> bytes:
        return b"".join([
            self._MAGIC,
            struct.pack("<iq", self.log_size, self.occupancy),
            self.meta.astype("<u8").tobytes(),
            self.lean.tobytes(),
            self.fp.astype("<u2").tobytes(),
            self.tailarr.tobytes(),
        ])

    @classmethod
    def from_bytes(cls, data: bytes) -> "TaffyVectorQuotient":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad taffy vector-quotient payload")
        off = 4
        log_size, occ = struct.unpack_from("<iq", data, off)
        off += struct.calcsize("<iq")
        n = 1 << log_size
        t = cls.__new__(cls)
        t.log_size = log_size
        t.occupancy = occ
        t.meta = np.frombuffer(data, dtype="<u8", count=n,
                               offset=off).astype(U64)
        off += 8 * n
        t.lean = np.frombuffer(data, dtype=np.uint8, count=n * SLOTS,
                               offset=off).reshape(n, SLOTS).copy()
        off += n * SLOTS
        t.fp = np.frombuffer(data, dtype="<u2", count=n * SLOTS,
                             offset=off).astype(np.uint16).reshape(n, SLOTS)
        off += 2 * n * SLOTS
        t.tailarr = np.frombuffer(data, dtype=np.uint8, count=n * SLOTS,
                                  offset=off).reshape(n, SLOTS).copy()
        t.f = [Feistel(ENTROPY[0:4]), Feistel(ENTROPY[4:8])]
        return t
