"""Bloom filter for approximate membership.

Not in the reference crate — mandated by the north rule; semantics and
the false-positive-rate formula FPR ~= (1 - e^(-k*n/m))^k from the
published Bloom-filter analysis.  No false negatives ever.  Merge is
bitwise OR of equally-sized filters — exactly associative, commutative,
idempotent.

Bit positions derive from one base hash by double hashing
(h1 + i * h2 mod m); inputs are pre-hashed uint64 (JVM-side
``F.xxhash64`` in Spark pipelines).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.hashing import combine_domains, splitmix64

_MAGIC = b"BF02"
_U64 = np.uint64


class BloomFilter:
    __slots__ = ("m", "k", "words", "n_added", "hash_domain")

    def __init__(self, m_bits: int = 1 << 20, k: int = 7):
        self.m = int(m_bits)
        self.k = int(k)
        self.words = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n_added = 0
        self.hash_domain = 0

    @classmethod
    def from_capacity(cls, n_items: int, fpr: float = 0.01) -> "BloomFilter":
        """Size for a target false-positive rate at n_items insertions."""
        m = int(np.ceil(-n_items * np.log(fpr) / (np.log(2.0) ** 2)))
        k = max(int(round((m / max(n_items, 1)) * np.log(2.0))), 1)
        return cls(m_bits=max(m, 64), k=k)

    # ------------------------------------------------------------------- build

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes
        h2 = splitmix64(hashes) | _U64(1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            mixed = h1[None, :] + ks * h2[None, :]
            if self.m & (self.m - 1) == 0:  # bitmask beats uint64 modulo
                return (mixed & _U64(self.m - 1)).astype(np.int64)
            return (mixed % _U64(self.m)).astype(np.int64)

    def add_hashes(self, hashes) -> None:
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        if h.size == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.words, pos >> 6, _U64(1) << (pos.astype(np.uint64) & _U64(63)))
        self.n_added += int(h.size)

    # ------------------------------------------------------------------- merge

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("cannot merge Bloom filters with different geometry")
        self.hash_domain = combine_domains(
            self.hash_domain, other.hash_domain, "BloomFilter"
        )
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    # ----------------------------------------------------------------- queries

    def contains_hashes(self, hashes) -> np.ndarray:
        """Vectorized membership probe -> bool array (no false negatives)."""
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)  # (k, n)
        bits = (self.words[pos >> 6] >> (pos.astype(np.uint64) & _U64(63))) & _U64(1)
        return bits.astype(bool).all(axis=0)

    def expected_fpr(self) -> float:
        """(1 - e^(-k*n/m))^k at the current fill."""
        return float(
            (1.0 - np.exp(-self.k * self.n_added / self.m)) ** self.k
        )

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        return (
            struct.pack(
                "<4s B q i q", _MAGIC, self.hash_domain, self.m, self.k,
                self.n_added,
            )
            + self.words.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        if bytes(data[:4]) == b"BF01":  # legacy: no domain byte
            hdr = struct.calcsize("<4s q i q")
            _m, m, k, n_added = struct.unpack("<4s q i q", data[:hdr])
            domain = 0
        else:
            hdr = struct.calcsize("<4s B q i q")
            magic, domain, m, k, n_added = struct.unpack(
                "<4s B q i q", data[:hdr]
            )
            if magic != _MAGIC:
                raise ValueError("not a BloomFilter blob")
        sk = cls(m_bits=m, k=k)
        sk.hash_domain = int(domain)
        sk.words = np.frombuffer(
            data, dtype=np.uint64, count=(m + 63) // 64, offset=hdr
        ).copy()
        sk.n_added = n_added
        return sk

    def __repr__(self) -> str:  # pragma: no cover
        return f"BloomFilter(m={self.m}, k={self.k}, n={self.n_added})"
