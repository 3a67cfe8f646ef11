"""Frequent Directions: deterministic mergeable matrix sketch.

Streaming low-rank summary of a tall matrix A (rows = embedding
vectors): maintain an ell x dim sketch B with the covariance guarantee

    || A^T A  -  B^T B ||_2  <=  2 ||A||_F^2 / ell

(Liberty, "Simple and deterministic matrix sketching", KDD 2013;
Ghashami, Liberty, Phillips & Woodruff, JMLR 2016 prove the sketch is
MERGEABLE: inserting one sketch's rows into another preserves the same
bound, so per-block partials tree-merge like every other UDAF here).
This is the engine's matrix-analytics member of the sketch family —
streaming PCA / covariance / spectral-norm estimates over an embedding
column without ever materializing the n x d matrix.

Implementation is the standard fast variant: a 2*ell-row buffer; when
full, one SVD shrinks it back to ell rows by subtracting the ell-th
squared singular value from every direction. All numpy; the per-shrink
cost is one (2*ell x dim) SVD per ell inserted rows.

Order note: FD is deterministic for a FIXED insertion order; different
block orders give different (all bound-satisfying) sketches — the
guarantee, not the bytes, is the merge contract (unlike HLL/KMV).

The reference engine has no matrix sketch; engine addition for the
embedding-curation family (reference protocol shape:
cpp/include/filter/block.hpp:109-128 duck-typed sketch surface).
"""

from __future__ import annotations

import struct

import numpy as np

from .registry import register


@register
class FrequentDirections:
    kind = "fd"
    input = "vectors"

    def __init__(self, dim: int, ell: int = 64):
        if ell < 1 or dim < 1:
            raise ValueError("fd: dim and ell must be >= 1")
        self.dim = int(dim)
        self.ell = int(ell)
        self.B = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self.filled = 0
        self.count = 0            # rows of A seen
        self.fnorm2 = 0.0         # ||A||_F^2 (exact running sum)

    # -- insertion ---------------------------------------------------
    def _insert_rows(self, X: np.ndarray) -> None:
        i = 0
        while i < len(X):
            space = self.B.shape[0] - self.filled
            take = min(space, len(X) - i)
            self.B[self.filled:self.filled + take] = X[i:i + take]
            self.filled += take
            i += take
            if self.filled == self.B.shape[0]:
                self._shrink()

    def update(self, X: np.ndarray):
        """Accumulate an (n, dim) float64 block of data rows."""
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != self.dim:
            raise ValueError(
                f"fd: expected (n, {self.dim}) rows, got {X.shape}")
        self.count += len(X)
        self.fnorm2 += float(np.einsum("ij,ij->", X, X))
        self._insert_rows(X)
        return self

    def _shrink(self) -> None:
        # one SVD: subtract delta = sigma_ell^2 from every direction —
        # the top ell directions each lose exactly delta, so ||B||_F^2
        # drops by >= ell*delta per shrink and sum(delta_t) <=
        # ||A||_F^2 / ell, which IS the covariance bound. At most
        # ell-1 rows survive with positive weight.
        _, s, vt = np.linalg.svd(self.B[:self.filled],
                                 full_matrices=False)
        delta = s[self.ell - 1] ** 2 if len(s) >= self.ell else 0.0
        s2 = np.sqrt(np.maximum(s[:self.ell] ** 2 - delta, 0.0))
        k = int(np.count_nonzero(s2))
        self.B[:] = 0.0
        if k:
            self.B[:k] = s2[:k, None] * vt[:k]
        self.filled = k

    # -- UDAF protocol -----------------------------------------------
    def merge(self, other: "FrequentDirections"):
        if (other.dim, other.ell) != (self.dim, self.ell):
            raise ValueError("fd: merging incompatible sketches")
        self._insert_rows(other.B[:other.filled])
        self.count += other.count
        self.fnorm2 += other.fnorm2
        return self

    def finalize(self):
        if self.filled > self.ell:
            self._shrink()
        return self

    # -- results -----------------------------------------------------
    def sketch_matrix(self) -> np.ndarray:
        """The current (<= 2*ell, dim) sketch rows B."""
        return self.B[:self.filled].copy()

    def cov_error_bound(self) -> float:
        """Worst-case ||A^T A - B^T B||_2 bound (see _shrink: the
        delta = sigma_ell^2 rule gives sum(delta_t) <= ||A||_F^2/ell)."""
        return self.fnorm2 / self.ell

    def singular_values(self) -> np.ndarray:
        return np.linalg.svd(self.B[:self.filled],
                             compute_uv=False) if self.filled \
            else np.zeros(0)

    # -- serde -------------------------------------------------------
    _HDR = struct.Struct("<4sqqqqd")

    def to_bytes(self) -> bytes:
        return self._HDR.pack(b"FD01", self.dim, self.ell, self.filled,
                              self.count, self.fnorm2) \
            + self.B[:self.filled].tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "FrequentDirections":
        magic, dim, ell, filled, count, fnorm2 = \
            cls._HDR.unpack_from(b, 0)
        if magic != b"FD01":
            raise ValueError("fd: bad payload magic")
        sk = cls(dim=dim, ell=ell)
        sk.filled, sk.count, sk.fnorm2 = filled, count, fnorm2
        rows = np.frombuffer(b, dtype=np.float64,
                             offset=cls._HDR.size).reshape(filled, dim)
        sk.B[:filled] = rows
        return sk
