"""Taffy cuckoo filter — growable quotienting cuckoo filter with UNION.

Reimplements the reference semantics (SURVEY.md §2.1 ops 10-21):

- constants: head(fingerprint)=10 bits, tail=5(+1 marker) bits, 4 slots/bucket,
  2 sides (``c/include/filter/taffy-cuckoo.h:42-66``)
- hash->path quotienting via a 2-round asymmetric Feistel permutation whose
  round function is strong multiply-shift (``c/include/filter/util.h:30-89``)
- fixed 8xu64 entropy constants (``c/lib/taffy-cuckoo.c:100-102``)
- insert: scan 4 slots (empty -> place; same fingerprint + tail-prefix ->
  dedupe; else kick a PCG-chosen slot), ping-pong sides with ttl=32, stash on
  failure (``taffy-cuckoo.h:169-202,320-383``)
- growth: upsize to 2x while occupancy > 0.90*capacity or occupied+4 >=
  capacity or stashes > 8 (``taffy-cuckoo.h:390-400``); upsize steals one tail
  bit per element, inserting BOTH extensions when the tail is empty
  (``c/lib/taffy-cuckoo.c:208-258``)
- union of unequal-size filters: 3-case re-path with tail-bit consumption /
  extension enumeration (``c/lib/taffy-cuckoo.c:260-348``) — this is the
  distributed-merge operation
- freeze: drop tails, keep 10-bit fingerprints; fingerprint 0 reads as
  present (``c/lib/taffy-cuckoo.c:127-160``, ``taffy-cuckoo.h:254-273``).
  DEVIATION: the reference freezes stash entries as un-permuted raw values
  (taffy-cuckoo.c:133-135) but probes them with the forward-permuted value
  (taffy-cuckoo.h:259-262), which can never match; we store the permuted
  index||fingerprint so frozen stash members stay findable.

Layout/RNG are insert-order sensitive, so distributed conformance is at SET
semantics (no false negatives; union(x,y).find == x.find|y.find; fpp within
2^-F bound) — SURVEY.md §2.9. Finds are numpy-vectorized; inserts are a
per-key loop over a numpy-precomputed path table (SURVEY.md §7.4).
"""

from __future__ import annotations

import struct

import numpy as np

from .registry import register

U64 = np.uint64
HEAD = 10
TAIL = 5
LOG_SLOTS = 2
SLOTS = 4
TAIL_MASK = (1 << (TAIL + 1)) - 1  # 6-bit field
FP_MASK = (1 << HEAD) - 1
EMPTY_TAIL_MARK = 1 << TAIL  # encoded empty sequence

# Fixed entropy constants — c/lib/taffy-cuckoo.c:100-102
ENTROPY = (0x2BA7538EE1234073, 0xFCC3777539B147D6,
           0x6086C563576347E7, 0x52EFF34EE1764465,
           0x8639CBF57F264867, 0x5A31EE34F0224CCB,
           0x07A1CB8140744EE6, 0xF2296CF6A6524E9F)

_M64 = (1 << 64) - 1


def _mask(w: int, x: int) -> int:
    return x & ((1 << w) - 1)


class Feistel:
    """2-round asymmetric Feistel permutation (util.h:30-89). Scalar ints or
    numpy u64 arrays transparently."""

    __slots__ = ("k00", "k01", "k10", "k11")

    def __init__(self, entropy4):
        self.k00, self.k01, self.k10, self.k11 = entropy4

    def _subhash(self, s, t, w, x, k0, k1):
        m_st = (1 << (s + t)) - 1
        if isinstance(x, np.ndarray):
            with np.errstate(over="ignore"):
                prod = (x & U64((1 << w) - 1)) * U64(k0 & m_st) + U64(k1 & m_st)
            return (prod >> U64(w)) & U64((1 << (s + t - w)) - 1)
        prod = (_mask(w, x) * (k0 & m_st) + (k1 & m_st)) & _M64
        return _mask(s + t - w, prod >> w)

    def forward(self, w: int, x):
        s, t = w >> 1, w - (w >> 1)
        if isinstance(x, np.ndarray):
            l0 = x & U64((1 << s) - 1)
            r0 = (x >> U64(s)) & U64((1 << t) - 1)
            l1 = r0
            r1 = l0 ^ self._subhash(s, t, t, r0, self.k00, self.k01)
            l2 = r1
            r2 = l1 ^ self._subhash(s, t, s, r1, self.k10, self.k11)
            return (r2 << U64(s)) | l2
        l0 = _mask(s, x)
        r0 = _mask(t, x >> s)
        l1 = r0
        r1 = l0 ^ self._subhash(s, t, t, r0, self.k00, self.k01)
        l2 = r1
        r2 = l1 ^ self._subhash(s, t, s, r1, self.k10, self.k11)
        return (r2 << s) | l2

    def backward(self, w: int, x):
        s, t = w >> 1, w - (w >> 1)
        if isinstance(x, np.ndarray):
            l2 = x & U64((1 << s) - 1)
            r2 = (x >> U64(s)) & U64((1 << t) - 1)
            r1 = l2
            l1 = r2 ^ self._subhash(s, t, s, r1, self.k10, self.k11)
            r0 = l1
            l0 = r1 ^ self._subhash(s, t, t, r0, self.k00, self.k01)
            return (r0 << U64(s)) | l0
        l2 = _mask(s, x)
        r2 = _mask(t, x >> s)
        r1 = l2
        l1 = r2 ^ self._subhash(s, t, s, r1, self.k10, self.k11)
        r0 = l1
        l0 = r1 ^ self._subhash(s, t, t, r0, self.k00, self.k01)
        return (r0 << s) | l0


class PCG:
    """Minimal PCG32 with bit-slicing cache (util.h:108-153, same seeds)."""

    __slots__ = ("bit_width", "state", "inc", "current", "remaining")

    def __init__(self, bit_width: int = LOG_SLOTS):
        self.bit_width = bit_width
        self.state = 0x13D26DF6F74044B3
        self.inc = 0x0D09B2D3025545A0
        self.current = 0
        self.remaining = 0

    def get(self) -> int:
        if self.remaining >= self.bit_width:
            r = _mask(self.bit_width, self.current)
            self.current >>= self.bit_width
            self.remaining -= self.bit_width
            return r
        old = self.state
        self.state = (old * 6364136223846793005 + (self.inc | 1)) & _M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        self.current = ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF
        self.remaining = 32 - self.bit_width
        r = _mask(self.bit_width, self.current)
        self.current >>= self.bit_width
        return r


def is_prefix_of(x: int, y: int) -> bool:
    """Tail-sequence prefix test (util.h:168-180)."""
    a = x ^ y
    c = (x & -x).bit_length() - 1  # ctz
    h = (y & -y).bit_length() - 1
    if c < h:
        return False
    return a == 0 or (a.bit_length() - 1) <= c


def tail_pair(x: int, y: int) -> int:
    """Combine two encoded tails that represent sequences identical except
    for their LAST digit, returning the encoding of the one-digit-shorter
    common prefix; 0 if not combinable (util.h:212-224 `tail_pair` /
    util.hpp `Combinable` — an insert-elision optimization the reference
    defines but never calls; provided for §2.8 kernel completeness).

    Derivation (not a transliteration): a tail sequence b1..bk is encoded
    as b1..bk followed by a 1 sentinel then zero padding, so two sequences
    of equal length k differing only in bk have equal trailing-zero counts
    z and an XOR with exactly one set bit, at position z+1. The combined
    encoding moves the sentinel up one position, which is the average
    (x + y) / 2 = common_prefix_bits + 2^(z+1).

    Correctness properties (tested exhaustively): a slot holding the
    combined value answers a SUPERSET of what x and y answered (so the
    elision can never introduce a false negative), and EXACTLY their
    union on full-length query tails (ctz == 0, i.e. tail*2+1 — the only
    shape `find` ever probes with), so filter behavior is unchanged."""
    assert x != 0 and y != 0 and x < (1 << 15) and y < (1 << 15)
    if x == y:
        return 0
    xy = x ^ y
    if xy & (xy - 1):  # more than one differing bit
        return 0
    zx = (x & -x).bit_length() - 1  # ctz
    zy = (y & -y).bit_length() - 1
    if zx != zy or xy != (1 << (zx + 1)):
        return 0
    return (x + y) >> 1


def _is_prefix_of_vec(x: np.ndarray, qtail: np.ndarray) -> np.ndarray:
    """Vectorized is_prefix_of for uint16 arrays (x may be 0 -> False)."""
    x32 = x.astype(np.int32)
    q32 = qtail.astype(np.int32)
    a = x32 ^ q32
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(x32 > 0, np.log2(np.where(x32 > 0, x32 & -x32, 1))
                     .astype(np.int32), -1)
        h = np.log2(np.where(q32 > 0, q32 & -q32, 1)).astype(np.int32)
        alog = np.where(a > 0, np.log2(np.where(a > 0, a, 1)), -1).astype(np.int32)
    return (x32 > 0) & (c >= h) & ((a == 0) | (alog <= c))


class _Side:
    __slots__ = ("f", "fps", "tails", "stash")

    def __init__(self, log_side_size: int, entropy4):
        self.f = Feistel(entropy4)
        nb = 1 << log_side_size
        self.fps = np.zeros((nb, SLOTS), dtype=np.uint16)
        self.tails = np.zeros((nb, SLOTS), dtype=np.uint16)
        self.stash: list[tuple[int, int, int]] = []  # (bucket, fp, tail)


def _to_path(raw: int, f: Feistel, log: int) -> tuple[int, int, int]:
    """hash -> (bucket, fingerprint, encoded_tail) — taffy-cuckoo.h:106-127."""
    w = log + HEAD
    pre = (raw & _M64) >> (64 - w)
    hashed = f.forward(w, pre)
    bucket = hashed >> HEAD
    fp = hashed & FP_MASK
    pre_tail = (raw & _M64) >> (64 - w - TAIL)
    tail = ((_mask(TAIL, pre_tail)) * 2 + 1) & TAIL_MASK
    return bucket, fp, tail


def _from_path_no_tail(bucket: int, fp: int, f: Feistel, log: int) -> int:
    """(bucket, fp) -> raw high bits — taffy-cuckoo.h:132-142."""
    w = log + HEAD
    hashed = (bucket << HEAD) | fp
    pre = f.backward(w, hashed)
    return (pre << (64 - w)) & _M64


@register
class TaffyCuckoo:
    kind = "taffy_cuckoo"
    input = "hashes"

    def __init__(self, bytes_: int = 512):
        import math

        lss = math.log((max(int(bytes_), 1) / 2 / SLOTS / 2), 2) if bytes_ else 1.0
        log_side_size = int(max(lss, 1.0))
        self._init_sides(log_side_size)

    def _init_sides(self, log_side_size: int) -> None:
        self.log_side_size = log_side_size
        self.sides = [_Side(log_side_size, ENTROPY[:4]),
                      _Side(log_side_size, ENTROPY[4:])]
        self.rng = PCG(LOG_SLOTS)
        self.occupied = 0

    # -- core insert machinery -------------------------------------------
    def capacity(self) -> int:
        return 2 * SLOTS * (1 << self.log_side_size)

    def _side_insert(self, side: _Side, bucket: int, fp: int, tail: int):
        """taffy-cuckoo.h:169-202. Returns (bucket, fp, tail) per contract:
        tail==0 -> placed in empty slot; unchanged triple -> deduped;
        else -> the kicked occupant."""
        fps, tails = side.fps[bucket], side.tails[bucket]
        for i in range(SLOTS):
            if tails[i] == 0:
                fps[i], tails[i] = fp, tail
                return bucket, fp, 0
            if fps[i] == fp and is_prefix_of(int(tails[i]), tail):
                return bucket, fp, tail
        i = self.rng.get()
        kicked = (bucket, int(fps[i]), int(tails[i]))
        fps[i], tails[i] = fp, tail
        return kicked

    def _insert_side_path_ttl(self, s: int, bucket: int, fp: int, tail: int,
                              ttl: int = 32) -> bool:
        """taffy-cuckoo.h:320-383."""
        both = [self.sides[s], self.sides[1 - s]]
        while True:
            for i in (0, 1):
                q = (bucket, fp, tail)
                bucket, fp, tail = self._side_insert(both[i], bucket, fp, tail)
                if tail == 0:
                    self.occupied += 1
                    return True
                if (bucket, fp, tail) == q:
                    return True
                saved_tail = tail
                if ttl <= 0:
                    both[i].stash.append((bucket, fp, tail))
                    self.occupied += 1
                    return False
                ttl -= 1
                raw = _from_path_no_tail(bucket, fp, both[i].f, self.log_side_size)
                bucket, fp, _ = _to_path(raw, both[1 - i].f, self.log_side_size)
                tail = saved_tail

    def _upsize_helper(self, fp: int, tail: int, bucket: int, s: int,
                       t: "TaffyCuckoo") -> None:
        """c/lib/taffy-cuckoo.c:208-237."""
        if tail == 0:
            return
        q = _from_path_no_tail(bucket, fp, self.sides[s].f, self.log_side_size)
        if tail == EMPTY_TAIL_MARK:
            # no tail bits left: insert both one-bit extensions
            b2, f2, _ = _to_path(q, t.sides[0].f, t.log_side_size)
            t._insert_side_path_ttl(0, b2, f2, tail)
            q |= 1 << (64 - self.log_side_size - HEAD - 1)
            b2, f2, _ = _to_path(q, t.sides[0].f, t.log_side_size)
            t._insert_side_path_ttl(0, b2, f2, tail)
        else:
            q |= (tail >> TAIL) << (64 - self.log_side_size - HEAD - 1)
            b2, f2, _ = _to_path(q, t.sides[0].f, t.log_side_size)
            t._insert_side_path_ttl(0, b2, f2, (tail << 1) & TAIL_MASK)

    def _upsize(self) -> None:
        """c/lib/taffy-cuckoo.c:239-258."""
        # NB: the reference's upsize builds the target via create(), which
        # RESETS the PCG to its seed state (taffy-cuckoo.c:240,76-80) — the
        # upsized filter continues from a fresh rng, not the old one.
        t = TaffyCuckoo.__new__(TaffyCuckoo)
        t._init_sides(self.log_side_size + 1)
        for s in (0, 1):
            for (bucket, fp, tail) in self.sides[s].stash:
                self._upsize_helper(fp, tail, bucket, s, t)
            side = self.sides[s]
            occ = np.nonzero(side.tails)
            for bi, si in zip(*occ):
                self._upsize_helper(int(side.fps[bi, si]),
                                    int(side.tails[bi, si]), int(bi), s, t)
        self.log_side_size = t.log_side_size
        self.sides = t.sides
        self.rng = t.rng
        self.occupied = t.occupied

    def add_hash(self, k: int) -> None:
        while (self.occupied > 0.90 * self.capacity()
               or self.occupied + 4 >= self.capacity()
               or len(self.sides[0].stash) + len(self.sides[1].stash) > 8):
            self._upsize()
        b, fp, tl = _to_path(int(k), self.sides[0].f, self.log_side_size)
        self._insert_side_path_ttl(0, b, fp, tl)

    def add_hashes(self, hashes: np.ndarray) -> "TaffyCuckoo":
        """Sequential bulk insert — BIT-IDENTICAL to per-key ``add_hash``
        (this is the path the golden C-reference conformance digests pin,
        tests/golden/tcf_golden.txt). Distributed builds go through
        ``update``/``add_hashes_bulk`` instead, which trade slot-for-slot
        layout identity for a vectorized build at the same membership /
        fpp / growth semantics."""
        for k in np.ascontiguousarray(hashes, dtype=U64):
            self.add_hash(int(k))
        return self

    # -- vectorized bulk build (the distributed hot path) -------------------
    def _bulk_place_pass(self, q: np.ndarray, tails: np.ndarray):
        """One vectorized placement pass over path entries.

        ``q`` carries the bucket/fp-defining HIGH bits (a raw 64-bit hash,
        or a re-derived tail-free prefix during upsize migration); ``tails``
        are the explicit encoded tails. From one gather of both sides'
        candidate buckets (pass-start state):

        - dedupe entries whose (fp, stored-tail-prefix) already sit in
          either side's bucket (a superset of the scalar dedupe, which only
          sees the bucket it inserts into — strictly fewer wasted slots,
          same membership), and exact-duplicate repeats within the pass;
        - of the remaining entries, place the FIRST one targeting each
          (side, bucket) into that bucket's first empty slot — side 0 if it
          has room, else side 1 — one scatter per side (no PCG use, no
          kicks). Later same-bucket entries are DEFERRED: their decision
          was computed from pass-start state, so they re-derive next pass
          (placements only FILL empty slots, which is why a pass-start
          dedupe stays valid and a pass-start "bucket full" cannot unfill);
        - entries whose BOTH buckets are full are SLOW — the caller runs
          them through the scalar kick path against live state.

        Returns (deferred_positions, slow_positions); placements/dedupes
        are committed/dropped in place. Entry order is immaterial here —
        the sequential-conformance path is ``add_hashes``, not this."""
        m = len(q)
        idx = np.arange(m)
        s0, s1 = self.sides
        w = self.log_side_size + HEAD
        pre = q >> U64(64 - w)
        h0 = s0.f.forward(w, pre)
        b0 = (h0 >> U64(HEAD)).astype(np.int64)
        f0 = (h0 & U64(FP_MASK)).astype(np.uint16)
        h1 = s1.f.forward(w, pre)
        b1 = (h1 >> U64(HEAD)).astype(np.int64)
        f1 = (h1 & U64(FP_MASK)).astype(np.uint16)
        r0f, r0t = s0.fps[b0], s0.tails[b0]      # (m, SLOTS) copies
        r1f, r1t = s1.fps[b1], s1.tails[b1]
        m0 = (r0f == f0[:, None]) & _is_prefix_of_vec(
            r0t.ravel(), np.repeat(tails, SLOTS)).reshape(m, SLOTS)
        m1 = (r1f == f1[:, None]) & _is_prefix_of_vec(
            r1t.ravel(), np.repeat(tails, SLOTS)).reshape(m, SLOTS)
        dedupe = m0.any(1) | m1.any(1)
        e0, e1 = r0t == 0, r1t == 0
        has0, has1 = e0.any(1), e1.any(1)
        fe0, fe1 = e0.argmax(1), e1.argmax(1)
        # an entry is a no-op duplicate only when BOTH q and tail match an
        # earlier entry; same-q different-tail entries stay fresh (they
        # share buckets, so the first-per-bucket rule serializes them)
        _, hfirst, hinv = np.unique(q, return_index=True,
                                    return_inverse=True)
        fidx = hfirst[hinv]
        fresh = (fidx == idx) | (tails != tails[fidx])
        place0 = fresh & ~dedupe & has0
        place1 = fresh & ~dedupe & ~has0 & has1
        slow = fresh & ~dedupe & ~has0 & ~has1
        win = np.zeros(m, dtype=bool)
        c0 = np.flatnonzero(place0)
        if len(c0):
            _, first = np.unique(b0[c0], return_index=True)
            w0 = c0[first]
            win[w0] = True
            s0.fps[b0[w0], fe0[w0]] = f0[w0]
            s0.tails[b0[w0], fe0[w0]] = tails[w0]
        c1 = np.flatnonzero(place1)
        if len(c1):
            _, first = np.unique(b1[c1], return_index=True)
            w1 = c1[first]
            win[w1] = True
            s1.fps[b1[w1], fe1[w1]] = f1[w1]
            s1.tails[b1[w1], fe1[w1]] = tails[w1]
        self.occupied += int(win.sum())
        return (np.flatnonzero((place0 | place1) & ~win),
                np.flatnonzero(slow))

    def _bulk_policy(self) -> None:
        """The 0.90 / +4 / stash>8 growth policy (taffy-cuckoo.h:390-400)
        with the vectorized upsize — the bulk-path twin of the check at
        the top of ``add_hash`` (which must keep the scalar `_upsize` for
        the golden sequential digests)."""
        while (self.occupied > 0.90 * self.capacity()
               or self.occupied + 4 >= self.capacity()
               or len(self.sides[0].stash)
               + len(self.sides[1].stash) > 8):
            self._upsize_bulk()

    def add_hashes_bulk(self, hashes: np.ndarray) -> "TaffyCuckoo":
        """Bulk insert for distributed builds: multi-pass vectorized
        two-side placement (``_bulk_place_pass``) in margin-capped chunks
        so the growth policy cannot trigger mid-pass, a vectorized upsize
        (``_upsize_bulk``), and kick-path work minimized by DEFERRAL:
        a key whose both candidate buckets are full near the 0.90 load
        ceiling is carried until after the next upsize (where the halved
        load lets it place vectorized) instead of walking the scalar kick
        chain now; only the final-drain residue (input exhausted, no
        upsize pending) takes the scalar path. Deterministic for a given
        input sequence and a VALID TaffyCuckoo under every property the
        conformance suite pins (members found, fpp bound, growth policy,
        union semantics) — but NOT slot-for-slot identical to the per-key
        reference order, which the golden digests pin via ``add_hashes``."""
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        n = len(hashes)
        i = 0
        carry = np.empty(0, dtype=U64)   # slow keys awaiting an upsize
        carry_log = self.log_side_size
        while i < n or len(carry):
            self._bulk_policy()
            if len(carry) and i >= n and self.log_side_size == carry_log:
                # input exhausted and no growth since deferral: the carry
                # can only make progress through the scalar kick path
                for k in carry:
                    self._bulk_policy()
                    b, fp, tl = _to_path(int(k), self.sides[0].f,
                                         self.log_side_size)
                    self._insert_side_path_ttl(0, b, fp, tl)
                carry = carry[:0]
                continue
            cap = self.capacity()
            margin = min(int(0.90 * cap) - self.occupied,
                         cap - 5 - self.occupied) + 1
            if margin <= 0:
                self.add_hash(int(hashes[i]) if i < n else int(carry[0]))
                if i < n:
                    i += 1
                else:
                    carry = carry[1:]
                continue
            if len(carry) and self.log_side_size > carry_log:
                chunk, carry = carry[:margin], carry[margin:]
            else:
                chunk = hashes[i:i + margin]
                i += len(chunk)
            w = self.log_side_size + HEAD
            pre_tail = chunk >> U64(64 - w - TAIL)
            tails = (((pre_tail & U64((1 << TAIL) - 1)) * U64(2) + U64(1))
                     .astype(np.uint16))
            pq, pt = chunk, tails
            while len(pq):
                deferred, slow = self._bulk_place_pass(pq, pt)
                if len(slow):
                    carry = np.concatenate([carry, pq[slow]])
                pq, pt = pq[deferred], pt[deferred]
            carry_log = self.log_side_size
        return self

    def _upsize_bulk(self) -> None:
        """Vectorized upsize for bulk-built filters: the same entry
        transformation as `_upsize`/`_upsize_helper`
        (c/lib/taffy-cuckoo.c:208-258) — re-derive each entry's tail-free
        prefix, push one tail bit into it (both one-bit extensions when
        the tail is empty) — executed as array ops, with the migrated
        entries inserted into the 2x target through the multi-pass bulk
        placement instead of one scalar ttl-insert per entry. Only the
        bulk path calls this; scalar ``add_hash`` keeps `_upsize` so the
        golden sequential digests stay pinned."""
        t = TaffyCuckoo.__new__(TaffyCuckoo)
        t._init_sides(self.log_side_size + 1)
        log = self.log_side_size
        w = log + HEAD
        qs, ts = [], []
        for s in (0, 1):
            side = self.sides[s]
            sb = np.array([e[0] for e in side.stash], dtype=np.int64)
            sf = np.array([e[1] for e in side.stash], dtype=np.uint16)
            st = np.array([e[2] for e in side.stash], dtype=np.uint16)
            bi, si = np.nonzero(side.tails)
            bucket = np.concatenate([sb, bi.astype(np.int64)])
            fp = np.concatenate([sf, side.fps[bi, si]])
            tail = np.concatenate([st, side.tails[bi, si]])
            if not len(bucket):
                continue
            hashed = (bucket.astype(U64) << U64(HEAD)) | fp.astype(U64)
            q = side.f.backward(w, hashed) << U64(64 - w)
            emark = tail == EMPTY_TAIL_MARK
            qe = q[emark]
            bit = U64(1) << U64(64 - log - HEAD - 1)
            qs += [qe, qe | bit]
            ts += [np.full(len(qe), EMPTY_TAIL_MARK, dtype=np.uint16)] * 2
            qn = q[~emark] | ((tail[~emark].astype(U64) >> U64(TAIL))
                              << U64(64 - log - HEAD - 1))
            qs.append(qn)
            ts.append(((tail[~emark].astype(np.uint16) << 1)
                       & np.uint16(TAIL_MASK)))
        self.log_side_size = t.log_side_size
        self.sides = t.sides
        self.rng = t.rng
        self.occupied = t.occupied
        if not qs:
            return
        pq, pt = np.concatenate(qs), np.concatenate(ts)
        while len(pq):
            deferred, slow = self._bulk_place_pass(pq, pt)
            for j in slow:
                # target-side scalar ttl-insert, as in _upsize_helper
                # (no policy re-check during migration — the target never
                # upsizes mid-migration, matching the scalar path; an
                # overfull stash triggers at the next add)
                bkt, fpj, _ = _to_path(int(pq[j]), self.sides[0].f,
                                       self.log_side_size)
                self._insert_side_path_ttl(0, bkt, fpj, int(pt[j]))
            pq, pt = pq[deferred], pt[deferred]

    update = add_hashes_bulk

    # -- vectorized find ---------------------------------------------------
    def _paths_vec(self, hashes: np.ndarray, side: _Side):
        w = self.log_side_size + HEAD
        pre = hashes >> U64(64 - w)
        hashed = side.f.forward(w, pre)
        bucket = (hashed >> U64(HEAD)).astype(np.int64)
        fp = (hashed & U64(FP_MASK)).astype(np.uint16)
        pre_tail = hashes >> U64(64 - w - TAIL)
        tail = (((pre_tail & U64((1 << TAIL) - 1)) * U64(2) + U64(1))
                .astype(np.uint16))
        return bucket, fp, tail

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        out = np.zeros(len(hashes), dtype=bool)
        for side in self.sides:
            bucket, fp, tail = self._paths_vec(hashes, side)
            sfps = side.fps[bucket]          # (n, SLOTS)
            stls = side.tails[bucket]
            # tail-prefix check only on fingerprint matches (rare): the
            # multi-pass prefix kernel over all n x SLOTS was the dominant
            # probe cost
            ridx, sidx = np.nonzero(sfps == fp[:, None])
            if len(ridx):
                ok = _is_prefix_of_vec(stls[ridx, sidx], tail[ridx])
                out[ridx[ok]] = True
            for (sb, sf, st) in side.stash:
                m0 = (bucket == sb) & (fp == sf)
                if m0.any():
                    idx = np.flatnonzero(m0)
                    ok = _is_prefix_of_vec(
                        np.full(len(idx), st, dtype=np.uint16), tail[idx])
                    out[idx[ok]] = True
        return out

    def find_hash(self, k: int) -> bool:
        return bool(self.find_hashes(np.array([k], dtype=U64))[0])

    # -- merge (union) -----------------------------------------------------
    def _union_help(self, that: "TaffyCuckoo", side: int, bucket: int,
                    fp: int, tail: int) -> None:
        """c/lib/taffy-cuckoo.c:260-313 — 3-case cross-size re-path."""
        hashed = _from_path_no_tail(bucket, fp, that.sides[side].f,
                                    that.log_side_size)
        tail_size = TAIL - ((tail & -tail).bit_length() - 1)
        if that.log_side_size == self.log_side_size:
            b, f, _ = _to_path(hashed, self.sides[0].f, self.log_side_size)
            self._insert_side_path_ttl(0, b, f, tail)
        elif that.log_side_size + tail_size >= self.log_side_size:
            orin = (tail & (tail - 1)) << (
                64 - that.log_side_size - HEAD - TAIL - 1)
            hashed |= orin
            b, f, _ = _to_path(hashed, self.sides[0].f, self.log_side_size)
            newtail = (tail << (self.log_side_size - that.log_side_size)) & TAIL_MASK
            self._insert_side_path_ttl(0, b, f, newtail)
        else:
            orin = (tail & (tail - 1)) << (
                64 - that.log_side_size - HEAD - TAIL - 1)
            hashed |= orin
            span = self.log_side_size - that.log_side_size - tail_size
            for i in range(1 << span):
                tmp = hashed | (i << (64 - self.log_side_size - HEAD))
                b, f, _ = _to_path(tmp, self.sides[0].f, self.log_side_size)
                self._insert_side_path_ttl(0, b, f, EMPTY_TAIL_MARK)

    def _union_one(self, that: "TaffyCuckoo") -> None:
        assert that.log_side_size <= self.log_side_size
        for side in (0, 1):
            for (b, f, t) in that.sides[side].stash:
                self._union_help(that, side, b, f, t)
            s = that.sides[side]
            occ = np.nonzero(s.tails)
            for bi, si in zip(*occ):
                self._union_help(that, side, int(bi),
                                 int(s.fps[bi, si]), int(s.tails[bi, si]))

    def merge(self, other: "TaffyCuckoo") -> "TaffyCuckoo":
        """Union — clone-larger + re-path-smaller (c/lib/taffy-cuckoo.c:336-348).

        Base selection is by log_side_size FIRST (the union kernel requires
        base.log_side_size >= other's; the reference picks by `occupied`,
        which can disagree after a stash-overflow upsize and would hit the
        negative-shift path), with occupancy as the tiebreak."""
        big, small = (self, other) \
            if (self.log_side_size, self.occupied) >= \
               (other.log_side_size, other.occupied) else (other, self)
        result = big.clone()
        result._union_one(small)
        # adopt result state
        self.log_side_size = result.log_side_size
        self.sides = result.sides
        self.rng = result.rng
        self.occupied = result.occupied
        return self

    def finalize(self) -> "TaffyCuckoo":
        return self

    # -- freeze ------------------------------------------------------------
    def freeze(self) -> "FrozenTaffyCuckoo":
        fz = FrozenTaffyCuckoo.__new__(FrozenTaffyCuckoo)
        fz.log_side_size = self.log_side_size
        fz.fps = [s.fps.copy() for s in self.sides]
        fz.stash = []
        for s in self.sides:
            # DEVIATION (documented above): store the permuted index||fp so
            # stash members remain findable after freeze.
            fz.stash.append([((b << HEAD) | f) for (b, f, _) in s.stash])
        return fz

    # -- misc --------------------------------------------------------------
    def size_in_bytes(self) -> int:
        return (2 * 2 * (1 << self.log_side_size) * SLOTS
                + 16 * (len(self.sides[0].stash) + len(self.sides[1].stash)))

    def clone(self) -> "TaffyCuckoo":
        t = TaffyCuckoo.__new__(TaffyCuckoo)
        t.log_side_size = self.log_side_size
        t.sides = []
        for i, s in enumerate(self.sides):
            ns = _Side(self.log_side_size,
                       ENTROPY[:4] if i == 0 else ENTROPY[4:])
            ns.fps = s.fps.copy()
            ns.tails = s.tails.copy()
            ns.stash = list(s.stash)
            t.sides.append(ns)
        t.rng = PCG(LOG_SLOTS)
        t.rng.state, t.rng.inc = self.rng.state, self.rng.inc
        t.rng.current, t.rng.remaining = self.rng.current, self.rng.remaining
        t.occupied = self.occupied
        return t

    # -- serde (engine format) --------------------------------------------
    _MAGIC = b"TCF1"

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC,
                 struct.pack("<iQ", self.log_side_size, self.occupied)]
        for s in self.sides:
            parts.append(struct.pack("<I", len(s.stash)))
            for (b, f, t) in s.stash:
                parts.append(struct.pack("<QHH", b, f, t))
            parts.append(s.fps.astype("<u2").tobytes())
            parts.append(s.tails.astype("<u2").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "TaffyCuckoo":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad taffy cuckoo payload")
        off = 4
        log, occ = struct.unpack_from("<iQ", data, off)
        off += 12
        t = cls.__new__(cls)
        t._init_sides(log)
        t.occupied = occ
        nb = 1 << log
        for s in t.sides:
            (n_stash,) = struct.unpack_from("<I", data, off)
            off += 4
            for _ in range(n_stash):
                b, f, tl = struct.unpack_from("<QHH", data, off)
                off += 12
                s.stash.append((b, f, tl))
            cnt = nb * SLOTS
            s.fps = np.frombuffer(data, dtype="<u2", count=cnt, offset=off) \
                .reshape(nb, SLOTS).astype(np.uint16)
            off += 2 * cnt
            s.tails = np.frombuffer(data, dtype="<u2", count=cnt, offset=off) \
                .reshape(nb, SLOTS).astype(np.uint16)
            off += 2 * cnt
        return t


class FrozenTaffyCuckoo:
    """Read-only probe structure: 10-bit fingerprints, no tails.
    fingerprint==0 probes as present (taffy-cuckoo.h:264-266)."""

    kind = "frozen_taffy_cuckoo"

    def find_hashes(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        out = np.zeros(len(hashes), dtype=bool)
        w = self.log_side_size + HEAD
        for i in (0, 1):
            f = Feistel(ENTROPY[:4] if i == 0 else ENTROPY[4:])
            pre = hashes >> U64(64 - w)
            permuted = f.forward(w, pre)
            bucket = (permuted >> U64(HEAD)).astype(np.int64)
            fp = (permuted & U64(FP_MASK)).astype(np.uint16)
            rows = self.fps[i][bucket]
            out |= (fp == 0) | (rows == fp[:, None]).any(axis=1)
            if self.stash[i]:
                st = np.asarray(self.stash[i], dtype=U64)
                out |= np.isin(permuted, st)
        return out

    def find_hash(self, k: int) -> bool:
        return bool(self.find_hashes(np.array([k], dtype=U64))[0])

    def size_in_bytes(self) -> int:
        return sum(a.size * HEAD // 8 for a in self.fps) + \
            8 * sum(len(s) for s in self.stash)

    _MAGIC = b"FTC1"

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC, struct.pack("<i", self.log_side_size)]
        for i in (0, 1):
            parts.append(struct.pack("<I", len(self.stash[i])))
            parts.append(np.asarray(self.stash[i], dtype="<u8").tobytes())
            parts.append(self.fps[i].astype("<u2").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrozenTaffyCuckoo":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad frozen taffy cuckoo payload")
        off = 4
        (log,) = struct.unpack_from("<i", data, off)
        off += 4
        fz = cls.__new__(cls)
        fz.log_side_size = log
        fz.fps, fz.stash = [], []
        nb = 1 << log
        for _ in (0, 1):
            (n,) = struct.unpack_from("<I", data, off)
            off += 4
            fz.stash.append(np.frombuffer(data, dtype="<u8", count=n,
                                          offset=off).tolist())
            off += 8 * n
            fz.fps.append(np.frombuffer(data, dtype="<u2", count=nb * SLOTS,
                                        offset=off).reshape(nb, SLOTS)
                          .astype(np.uint16))
            off += 2 * nb * SLOTS
        return fz
