"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public algorithm).

Engine addition on top of the reference's filter family (SURVEY.md §2.6):
register-max merge makes it a mergeable UDAF. Relative standard error
~ 1.04/sqrt(m) with m = 2^p registers (asserted in tests).

Fully vectorized: register index = top p bits of the u64 hash; rho = number
of leading zeros of the remaining bits + 1, computed with a branchless
numpy bit-length reduction (no per-row Python).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .registry import register

U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (exact, no float rounding)."""
    x = x.copy()
    out = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = x >> U64(s)
        big = t > 0
        out[big] += s
        x[big] = t[big]
    out += (x > 0).astype(np.int64)
    return out


@register
class HyperLogLog:
    kind = "hll"
    input = "hashes"

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, hashes: np.ndarray) -> "HyperLogLog":
        hashes = np.ascontiguousarray(hashes, dtype=U64)
        if not len(hashes):
            return self
        idx = (hashes >> U64(64 - self.p)).astype(np.int64)
        rest = hashes << U64(self.p)  # low 64-p bits shifted to top
        # rho = leading zeros of `rest` within 64-p bits, + 1
        rho = (64 - _bit_length_u64(rest) + 1).astype(np.uint8)
        rho = np.minimum(rho, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    add_hashes = update

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def finalize(self) -> "HyperLogLog":
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            v = int((self.registers == 0).sum())
            if v:
                return m * math.log(m / v)
        return float(e)

    def std_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    _MAGIC = b"HLL1"

    def to_bytes(self) -> bytes:
        return self._MAGIC + struct.pack("<i", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        if data[:4] != cls._MAGIC:
            raise ValueError("bad hll payload")
        (p,) = struct.unpack_from("<i", data, 4)
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8, count=h.m,
                                    offset=8).copy()
        return h
