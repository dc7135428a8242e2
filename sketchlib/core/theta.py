"""KMV / theta sketch for distinct counting WITH set operations.

Where HyperLogLog only unions, the KMV ("k minimum values") bottom-k
sketch supports intersection/difference cardinalities — the operation
behind corpus-overlap and benchmark-contamination checks in training
pipelines.  Summary: the k smallest distinct 64-bit hash values.
With theta = k-th smallest / 2^64, the distinct estimate is
(k - 1) / theta (unbiased, RSE ~ 1/sqrt(k - 2)).

Set ops (theta-sketch algebra): for sketches A, B with
theta* = min(theta_A, theta_B), the items of A∩B below theta* are a
uniform sample of the true intersection, so
|A∩B| ~= |{h in A∩B : h < theta*}| / theta*.  Union merges exactly
(bottom-k of the union).  All merges are associative/commutative/
idempotent on the state.

Hashes come from the same streams as HLL (JVM xxhash64 / numpy
splitmix) — a theta sketch and an HLL built from the same column use
identical inputs.
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.hashing import combine_domains

_MAGIC = b"TH02"
_MAX = float(2**64)


class ThetaSketch:
    __slots__ = ("k", "hashes", "hash_domain")

    def __init__(self, k: int = 4096):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted ascending, unique
        self.hash_domain = 0

    # ------------------------------------------------------------------- build

    def add_hashes(self, hashes) -> None:
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        if h.size == 0:
            return
        merged = np.union1d(self.hashes, h)  # sorted unique
        self.hashes = merged[: self.k]

    # ------------------------------------------------------------------- merge

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("cannot merge theta sketches of different k")
        self.hash_domain = combine_domains(
            self.hash_domain, other.hash_domain, "ThetaSketch"
        )
        merged = np.union1d(self.hashes, other.hashes)
        self.hashes = merged[: self.k]
        return self

    # ----------------------------------------------------------------- queries

    @property
    def theta(self) -> float:
        """Sampling threshold in [0, 1]."""
        if self.hashes.size < self.k:
            return 1.0
        return float(self.hashes[-1]) / _MAX

    def estimate(self) -> float:
        n = self.hashes.size
        if n < self.k:
            return float(n)  # exact below capacity
        return (self.k - 1) / self.theta

    def relative_std_error(self) -> float:
        return 1.0 / np.sqrt(max(self.k - 2, 1))

    def _cut(self) -> int:
        """Integer sampling threshold: the k-th smallest hash, or
        2^64-1 below capacity (theta = 1, every hash retained)."""
        if self.hashes.size < self.k:
            return 2**64 - 1
        return int(self.hashes[-1])

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        """Estimated |A ∩ B|.

        The threshold stays a 64-bit INTEGER (min of the two sketches'
        k-th smallest hashes) for the <= comparison, and theta is
        derived from that same integer for the division — a float64
        round-trip (int(theta * 2^64)) loses ~11 low bits and can
        include/exclude hashes at the threshold inconsistently with the
        theta used as divisor."""
        cut = min(self._cut(), other._cut())
        if cut == 2**64 - 1:  # both sketches exact: no scaling
            common = np.intersect1d(
                self.hashes, other.hashes, assume_unique=True
            ).size
            return float(common)
        # STRICT < matches estimate()'s convention ((k-1)/theta counts
        # the hashes strictly below the k-th smallest): with <= the
        # identity intersect(A, A) would be k/theta > estimate(A) and
        # jaccard(A, A) would exceed 1.
        cut64 = np.uint64(cut)
        a = self.hashes[self.hashes < cut64]
        b = other.hashes[other.hashes < cut64]
        common = np.intersect1d(a, b, assume_unique=True).size
        theta = float(cut) / _MAX
        return common / theta if theta > 0 else float(common)

    def union_estimate(self, other: "ThetaSketch") -> float:
        tmp = ThetaSketch(k=self.k)
        tmp.hashes = self.hashes.copy()
        tmp.merge(other)
        return tmp.estimate()

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """Estimated |A \\ B| (>= 0)."""
        return max(self.estimate() - self.intersect_estimate(other), 0.0)

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        u = self.union_estimate(other)
        return self.intersect_estimate(other) / u if u > 0 else 0.0

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        return (
            struct.pack(
                "<4s B i q", _MAGIC, self.hash_domain, self.k,
                self.hashes.size,
            )
            + self.hashes.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        if bytes(data[:4]) == b"TH01":  # legacy: no domain byte
            hdr = struct.calcsize("<4s i q")
            _m, k, n = struct.unpack("<4s i q", data[:hdr])
            domain = 0
        else:
            hdr = struct.calcsize("<4s B i q")
            magic, domain, k, n = struct.unpack("<4s B i q", data[:hdr])
            if magic != _MAGIC:
                raise ValueError("not a ThetaSketch blob")
        sk = cls(k=k)
        sk.hash_domain = int(domain)
        sk.hashes = np.frombuffer(data, np.uint64, n, hdr).copy()
        return sk
