"""Fixed-capacity relative-compactor sketch (the reference's RCSketch).

Semantics from /root/reference/src/rc_sketch/rc_sketch.rs: the input
length must be known up front; every level gets the same buffer size
``max(2k * ceil(log2(n/k)), 2k)`` (rc_sketch.rs:91-111).  Insertion
fills level 0 in ``buffer_size/2`` chunks (rc_sketch.rs:46-59);
overflow compacts and cascades into level+1 (rc_sketch.rs:161-236).
The compaction point follows the exponential schedule
``len - (trailing_ones(counter)+1) * k`` (rc_sketch.rs:117-123), or a
fixed ``buffer_size/2`` in fast mode (rc_sketch.rs:130-132).  Two
compaction methods (compaction_method.rs:1-5): keep a random odd/even
half (default) or average adjacent pairs (AverageNeighbour).

Differences from the reference: compaction coins are seeded
(determinism — the reference uses thread RNG), and a true merge is
provided (concat levels + recompact; the reference never merges,
SURVEY.md §1.4).  Query code matches KLL: ranks are level-weighted
counts (rc_sketch.rs:279-299).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.hashing import mix_seed, splitmix64_int

_MAGIC = b"RC01"

KEEP_HALF = 0  # CompactionMethod::Default
AVERAGE_NEIGHBOUR = 1  # CompactionMethod::AverageNeighbour


def _trailing_ones(x: int) -> int:
    t = 0
    while x & 1:
        t += 1
        x >>= 1
    return t


class RCSketch:
    """Known-n relative compactor over float64 values."""

    __slots__ = ("k", "seed", "buffer_size", "levels", "counters", "count",
                 "min", "max", "fast", "method")

    def __init__(
        self,
        input_length: int,
        k: int = 200,
        seed: int = 42,
        fast: bool = False,
        method: int = KEEP_HALF,
    ):
        self.k = int(k)
        self.seed = int(seed)
        n = max(int(input_length), 1)
        # buffer_size = max(2k * ceil(log2(n/k)), 2k)  (rc_sketch.rs:91-111)
        self.buffer_size = max(
            2 * self.k * int(np.ceil(np.log2(max(n / self.k, 2.0)))), 2 * self.k
        )
        self.levels: list[np.ndarray] = [np.empty(0)]
        self.counters: list[int] = [0]
        self.count = 0
        self.min = np.inf
        self.max = -np.inf
        self.fast = bool(fast)
        self.method = int(method)

    # ------------------------------------------------------------------- build

    def add_buffer(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.count += v.size
        step = max(self.buffer_size // 2, 1)
        for i in range(0, v.size, step):  # rc_sketch.rs:52-59
            self._insert_at(0, v[i : i + step])

    def add(self, value: float) -> None:
        self.add_buffer(np.array([value]))

    def _insert_at(self, h: int, chunk: np.ndarray) -> None:
        """Fill the level only up to buffer_size per step, compacting
        while at capacity (rc_sketch.rs:200-236: the buffer "may be
        overfilled ... keep compacting until size is below the buffer
        size") — levels stay bounded by buffer_size."""
        while h >= len(self.levels):
            self.levels.append(np.empty(0))
            self.counters.append(0)
        pos = 0
        while pos < chunk.size or self.levels[h].size >= self.buffer_size:
            room = self.buffer_size - self.levels[h].size
            if room > 0 and pos < chunk.size:
                take = chunk[pos : pos + room]
                self.levels[h] = np.concatenate([self.levels[h], take])
                pos += take.size
            while self.levels[h].size >= self.buffer_size:
                promoted = self._compact(h)
                if promoted.size:
                    self._insert_at(h + 1, promoted)

    def _compact_index(self, h: int) -> int:
        length = self.levels[h].size
        if self.fast:
            return self.buffer_size // 2  # rc_sketch.rs:130-132
        idx = length - (_trailing_ones(self.counters[h]) + 1) * self.k
        return min(max(int(idx), 0), int(length) - 1)

    def _coin(self, h: int) -> int:
        return splitmix64_int(mix_seed(self.seed, h, self.counters[h])) & 1

    def _compact(self, h: int) -> np.ndarray:
        """Sort, keep the protected prefix, reduce the rest
        (rc_sketch.rs:243-274)."""
        buf = np.sort(self.levels[h])
        idx = self._compact_index(h)
        keep, rest = buf[:idx], buf[idx:]
        if self.method == AVERAGE_NEIGHBOUR:
            if rest.size % 2:  # keep the odd leftover in place
                keep = np.concatenate([keep, rest[-1:]])
                rest = rest[:-1]
            promoted = (rest[0::2] + rest[1::2]) / 2.0
        else:
            promoted = rest[self._coin(h) :: 2]
        self.counters[h] += 1
        self.levels[h] = keep
        return promoted

    # ------------------------------------------------------------------- merge

    def merge(self, other: "RCSketch") -> "RCSketch":
        """Concat levels pairwise, recompact overflowing levels (not in
        the reference — SURVEY.md §1.4)."""
        if other.k != self.k:
            raise ValueError("cannot merge RCSketch with different k")
        self.buffer_size = max(self.buffer_size, other.buffer_size)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
            self.counters.append(0)
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
            self.counters[h] += other.counters[h]
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        h = 0
        while h < len(self.levels):
            while self.levels[h].size >= self.buffer_size:
                promoted = self._compact(h)
                if promoted.size:
                    self._insert_at(h + 1, promoted)
            h += 1
        return self

    # ----------------------------------------------------------------- queries

    def rank(self, v) -> np.ndarray | float:
        """rank(v) = sum_levels count(x <= v) * 2^level
        (rc_sketch.rs:279-285)."""
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        out = np.zeros(va.shape)
        for h, lv in enumerate(self.levels):
            if lv.size:
                out += np.searchsorted(np.sort(lv), va, side="right") * float(1 << h)
        return out if np.ndim(v) else float(out[0])

    def quantile_at_value(self, v):
        if self.count == 0:
            return np.nan
        return self.rank(v) / float(self.count)

    def value_at_quantile(self, q):
        """Walk sorted weighted values until cum weight > q*n
        (rc_sketch.rs:65-76)."""
        qa = np.atleast_1d(np.asarray(q, dtype=np.float64))
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, float(1 << h)))
        if not vals:
            out = np.full(qa.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        idx = np.clip(np.searchsorted(cum, qa * float(self.count), side="left"), 0, v.size - 1)
        out = v[idx]
        return out if np.ndim(q) else float(out[0])


    # reference trait-surface aliases (traits.rs:24-29)
    def est_value_at_quantile(self, q):
        return self.value_at_quantile(q)

    def est_quantile_at_value(self, v):
        return self.quantile_at_value(v)

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        parts = [
            struct.pack(
                "<4s i q q d d i i B B",
                _MAGIC, self.k, self.seed, self.count, self.min, self.max,
                self.buffer_size, len(self.levels), int(self.fast), self.method,
            )
        ]
        for h, lv in enumerate(self.levels):
            parts.append(struct.pack("<q q", lv.size, self.counters[h]))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "RCSketch":
        hdr = struct.calcsize("<4s i q q d d i i B B")
        (magic, k, seed, count, mn, mx, bufsz, nlev, fast, method) = struct.unpack(
            "<4s i q q d d i i B B", data[:hdr]
        )
        if magic != _MAGIC:
            raise ValueError("not an RCSketch blob")
        sk = cls(input_length=1, k=k, seed=seed, fast=bool(fast), method=method)
        sk.buffer_size = bufsz
        sk.levels, sk.counters = [], []
        off = hdr
        lh = struct.calcsize("<q q")
        for _ in range(nlev):
            n, ctr = struct.unpack("<q q", data[off : off + lh])
            off += lh
            sk.levels.append(np.frombuffer(data, np.float64, n, off).copy())
            off += 8 * n
            sk.counters.append(ctr)
        sk.count = count
        sk.min = mn
        sk.max = mx
        return sk
