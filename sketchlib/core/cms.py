"""Count-min sketch for frequency / heavy-hitter queries.

Not in the reference crate — mandated by the north rule; semantics and
bounds from the published count-min paper (Cormode & Muthukrishnan
2005): with width w = ceil(e/eps) and depth d = ceil(ln(1/delta)),
point-query overestimate <= eps * N with probability >= 1 - delta.
Merge is element-wise matrix addition — exactly associative and
commutative.

Row hashes derive from one base hash by double hashing
(h1 + row * h2 mod w), computed vectorized over uint64 arrays; inputs
are pre-hashed (JVM-side ``F.xxhash64`` in Spark pipelines).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.hashing import combine_domains, splitmix64

_MAGIC = b"CM02"
_U64 = np.uint64


class CountMinSketch:
    __slots__ = ("depth", "width", "table", "total", "hash_domain")

    def __init__(self, depth: int = 5, width: int = 16384):
        self.depth = int(depth)
        self.width = int(width)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0
        self.hash_domain = 0

    @classmethod
    def from_error_bounds(cls, eps: float, delta: float) -> "CountMinSketch":
        width = int(np.ceil(np.e / eps))
        depth = int(np.ceil(np.log(1.0 / delta)))
        return cls(depth=max(depth, 1), width=max(width, 2))

    # ------------------------------------------------------------------- build

    def _row_indices(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column indices via double hashing (bitmask for
        power-of-two widths — uint64 modulo costs several x more)."""
        h1 = hashes
        h2 = splitmix64(hashes) | _U64(1)  # odd => full-period stride
        rows = np.arange(self.depth, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            mixed = h1[None, :] + rows * h2[None, :]
            if self.width & (self.width - 1) == 0:
                idx = mixed & _U64(self.width - 1)
            else:
                idx = mixed % _U64(self.width)
        return idx.astype(np.int64)

    def add_hashes(self, hashes, counts=None) -> None:
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        if h.size == 0:
            return
        if counts is None:
            c = np.ones(h.size, dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64)
        idx = self._row_indices(h)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], c)
        self.total += int(c.sum())

    # ------------------------------------------------------------------- merge

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("cannot merge CMS with different dimensions")
        self.hash_domain = combine_domains(
            self.hash_domain, other.hash_domain, "CountMinSketch"
        )
        self.table += other.table
        self.total += other.total
        return self

    # ----------------------------------------------------------------- queries

    def estimate_hashes(self, hashes) -> np.ndarray:
        """Point-query estimates (upper bounds on true counts)."""
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        idx = self._row_indices(h)
        ests = self.table[np.arange(self.depth)[:, None], idx]
        return ests.min(axis=0)

    def error_bound(self) -> float:
        """eps * N for this width (holds w.p. 1 - e^-depth)."""
        return (np.e / self.width) * self.total

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        return (
            struct.pack(
                "<4s B i i q", _MAGIC, self.hash_domain, self.depth,
                self.width, self.total,
            )
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        if bytes(data[:4]) == b"CM01":  # legacy: no domain byte
            hdr = struct.calcsize("<4s i i q")
            _m, depth, width, total = struct.unpack("<4s i i q", data[:hdr])
            domain = 0
        else:
            hdr = struct.calcsize("<4s B i i q")
            magic, domain, depth, width, total = struct.unpack(
                "<4s B i i q", data[:hdr]
            )
            if magic != _MAGIC:
                raise ValueError("not a CountMinSketch blob")
        sk = cls(depth=depth, width=width)
        sk.hash_domain = int(domain)
        sk.table = (
            np.frombuffer(data, dtype=np.int64, count=depth * width, offset=hdr)
            .reshape(depth, width)
            .copy()
        )
        sk.total = total
        return sk

    def __repr__(self) -> str:  # pragma: no cover
        return f"CountMinSketch(d={self.depth}, w={self.width}, total={self.total})"
