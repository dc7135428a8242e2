"""KLL / relative-compactor quantile sketch with a true mergeable state.

Semantics follow the reference's adaptive relative compactor
(/root/reference/src/rc_sketch/rc_sketch2.rs): state is a stack of
level buffers where a value in level h represents 2^h originals
(rc_sketch.rs:289-299); level h starts with 3 sections of size k and,
every 2^(sections-1) compactions, doubles its section count while
shrinking section size by sqrt(2) (rc_sketch2.rs:116-121 — the KLL
capacity schedule); compaction sorts the buffer, keeps a protected
lower portion, and promotes every other element of the rest to level
h+1 (rc_sketch.rs:243-274), choosing odd/even with a coin flip.  The
compaction point follows the exponential schedule
``len/2 + (sections - trailing_ones(counter) - 1) * section_size``
(rc_sketch2.rs:127-136).

Two deliberate departures from the reference:

* **True merge.**  The reference never implements sketch merge (its
  ``MergableDigest`` trait has no impl; SURVEY.md §1.4) — it avoids
  merging by combining query results.  Distributed aggregation needs a
  real merge: here levels are concatenated pairwise and then compacted
  while over capacity, the standard KLL merge from the KLL paper.
* **Seeded determinism.**  The reference flips unseeded coins
  (rc_sketch.rs:259); here the coin for (level, counter) derives from a
  fixed sketch seed via splitmix64 so rebuilds and checkpoint resumes
  reproduce bit-identical state (SURVEY.md §7.4).

Rank queries are exactly additive across levels:
``rank(v) = sum_h count(level_h <= v) * 2^h`` (rc_sketch.rs:279-285).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.hashing import mix_seed, splitmix64_int

_MAGIC = b"KL01"


def _trailing_ones(x: int) -> int:
    t = 0
    while x & 1:
        t += 1
        x >>= 1
    return t


class KLL:
    """Mergeable KLL quantile sketch over float64 values.

    Parameters
    ----------
    k : section size parameter; the reference's accuracy bar uses k=200
        at n=1e6 (rc_sketch2.rs:423-519).
    seed : base seed for compaction coin flips (determinism).
    """

    __slots__ = ("k", "seed", "levels", "sections", "section_size", "counters",
                 "count", "min", "max")

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = []
        self.sections: list[int] = []
        self.section_size: list[int] = []
        self.counters: list[int] = []
        self.count = 0
        self.min = np.inf
        self.max = -np.inf
        self._grow()

    # ------------------------------------------------------------------ sizing

    def _grow(self) -> None:
        """Add a level (rc_sketch2.rs:241-246): 3 sections of size k."""
        self.levels.append(np.empty(0, dtype=np.float64))
        self.sections.append(3)
        self.section_size.append(self.k)
        self.counters.append(0)

    def _buffer_cap(self, h: int) -> int:
        """2 * sections * section_size (rc_sketch2.rs:109-111)."""
        return 2 * self.sections[h] * self.section_size[h]

    def _sketch_cap(self) -> int:
        return sum(self._buffer_cap(h) for h in range(len(self.levels)))

    def _stored(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _update_sections(self, h: int) -> None:
        """KLL capacity schedule (rc_sketch2.rs:116-121)."""
        if self.counters[h] >= (1 << (self.sections[h] - 1)):
            self.sections[h] *= 2
            self.section_size[h] = max(int(np.ceil(self.section_size[h] / np.sqrt(2.0))), 2)

    # ------------------------------------------------------------------- build

    def add_buffer(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.count += v.size
        # pre-sort the incoming batch: every level then stays a
        # concatenation of SORTED RUNS (kept prefix + promoted slices
        # are sorted by construction), so the per-compaction stable
        # sort degenerates to a timsort run-merge — O(len) instead of
        # O(len log len).  Order-insensitive by the KLL guarantees;
        # deterministic (same batch stream -> same state).
        v = np.sort(v)
        # fill level 0 up to whole-sketch capacity, then compress
        # (rc_sketch2.rs:171-207)
        cap = self._sketch_cap()
        pos = 0
        while pos < v.size:
            room = max(cap - self._stored(), 0)
            if room == 0:
                self._compress()
                cap = self._sketch_cap()
                room = max(cap - self._stored(), 1)
            take = v[pos : pos + room]
            self.levels[0] = np.concatenate([self.levels[0], take])
            pos += take.size

    def add(self, value: float) -> None:
        self.add_buffer(np.array([value]))

    def add_weighted(self, values, weights) -> None:
        """Bulk insert pre-aggregated (value, integer-weight) pairs.

        A level-h item carries weight 2^h, so a weight w decomposes
        LOSSLESSLY over the levels of its binary expansion: inserting
        v at every level ℓ with bit ℓ set in w adds exactly weight w
        of v — identical rank mass to w raw copies, without
        materializing them.  (Not in the reference; the standard
        weighted-KLL construction.)  This is the fast path for
        low-cardinality integer streams pre-reduced via bincount —
        ~vocab items per task instead of every token."""
        v = np.asarray(values, dtype=np.float64).ravel()
        w = np.asarray(weights).ravel()
        if v.size == 0:
            return
        if v.shape != w.shape:
            raise ValueError("values/weights length mismatch")
        if not np.issubdtype(w.dtype, np.integer):
            wi = w.astype(np.int64)
            if not np.array_equal(wi, w):
                raise ValueError("KLL weights must be integers")
            w = wi
        if (w < 0).any():
            raise ValueError("KLL weights must be >= 0")
        keep = w > 0
        v, w = v[keep], w[keep]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.count += int(w.sum())
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]  # masked slices stay sorted runs
        max_bit = int(w.max()).bit_length()
        for lvl in range(max_bit):
            sel = (w >> lvl) & 1 == 1
            if not sel.any():
                continue
            while lvl >= len(self.levels):
                self._grow()
            self.levels[lvl] = np.concatenate([self.levels[lvl], v[sel]])
        # restore capacity invariants (same loop as merge)
        guard = 0
        while any(
            self.levels[h].size >= self._buffer_cap(h) and self.levels[h].size > 1
            for h in range(len(self.levels))
        ):
            self._compress()
            guard += 1
            if guard > 64:  # pragma: no cover
                break

    # -------------------------------------------------------------- compaction

    def _compact_index(self, h: int) -> int:
        """Exponential compaction schedule (rc_sketch2.rs:127-136)."""
        length = int(self.levels[h].size)
        idx = length // 2 + (
            self.sections[h] - _trailing_ones(self.counters[h]) - 1
        ) * self.section_size[h]
        return min(max(idx, 0), length - 1)

    def _coin(self, h: int) -> int:
        return splitmix64_int(mix_seed(self.seed, h, self.counters[h])) & 1

    def _compact_level(self, h: int) -> None:
        """Sort; protect values below the compact index; promote every
        other value of the rest (rc_sketch.rs:243-274)."""
        # stable = timsort: detects the sorted runs every level is made
        # of (see add_buffer) and merges them in ~linear time
        buf = np.sort(self.levels[h], kind="stable")
        idx = self._compact_index(h)
        keep, promote_src = buf[:idx], buf[idx:]
        off = self._coin(h)
        promoted = promote_src[off::2]
        self.counters[h] += 1
        self._update_sections(h)
        self.levels[h] = keep
        if h + 1 >= len(self.levels):
            self._grow()
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def _compress(self) -> None:
        """Compact every overflowing level, bottom-up
        (rc_sketch2.rs:220-238)."""
        h = 0
        while h < len(self.levels):
            if self.levels[h].size >= self._buffer_cap(h) and self.levels[h].size > 1:
                self._compact_level(h)
            h += 1

    # ------------------------------------------------------------------- merge

    def merge(self, other: "KLL") -> "KLL":
        """True KLL merge: concatenate levels pairwise, then compact
        while over capacity (absent from the reference — SURVEY.md §1.4)."""
        while len(self.levels) < len(other.levels):
            self._grow()
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
            if h < len(other.counters):
                self.counters[h] += other.counters[h]
                while self.sections[h] < other.sections[h]:
                    self.sections[h] *= 2
                    self.section_size[h] = max(
                        int(np.ceil(self.section_size[h] / np.sqrt(2.0))), 2
                    )
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        # re-compact until all levels fit
        guard = 0
        while any(
            self.levels[h].size >= self._buffer_cap(h) and self.levels[h].size > 1
            for h in range(len(self.levels))
        ):
            self._compress()
            guard += 1
            if guard > 64:  # pragma: no cover
                break
        return self

    # ----------------------------------------------------------------- queries

    def _weighted(self):
        """Flatten to (sorted values, weights) — rc_sketch.rs:289-299."""
        vals = []
        wts = []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, v) -> np.ndarray | float:
        """Estimated number of items <= v (interpolate_rank,
        rc_sketch.rs:279-285)."""
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        out = np.zeros(va.shape, dtype=np.float64)
        for h, lv in enumerate(self.levels):
            if lv.size:
                s = np.sort(lv)
                out += np.searchsorted(s, va, side="right") * float(1 << h)
        return out if np.ndim(v) else float(out[0])

    def quantile_at_value(self, v) -> np.ndarray | float:
        r = self.rank(v)
        if self.count == 0:
            return np.nan
        return r / float(self.count)

    def value_at_quantile(self, q) -> np.ndarray | float:
        """Walk sorted weighted values until cumulative weight exceeds
        q*n (rc_sketch.rs:65-76)."""
        qa = np.atleast_1d(np.asarray(q, dtype=np.float64))
        vals, wts = self._weighted()
        if vals.size == 0:
            out = np.full(qa.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        cum = np.cumsum(wts)
        target = qa * float(self.count)
        idx = np.searchsorted(cum, target, side="left")
        idx = np.clip(idx, 0, vals.size - 1)
        out = vals[idx]
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
                "<4s i q q d d i",
                _MAGIC,
                self.k,
                self.seed,
                self.count,
                self.min,
                self.max,
                len(self.levels),
            )
        ]
        for h in range(len(self.levels)):
            lv = self.levels[h]
            parts.append(
                struct.pack(
                    "<q i i q", lv.size, self.sections[h], self.section_size[h],
                    self.counters[h],
                )
            )
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        hdr = struct.calcsize("<4s i q q d d i")
        magic, k, seed, count, mn, mx, nlev = struct.unpack("<4s i q q d d i", data[:hdr])
        if magic != _MAGIC:
            raise ValueError("not a KLL blob")
        sk = cls(k=k, seed=seed)
        sk.levels, sk.sections, sk.section_size, sk.counters = [], [], [], []
        off = hdr
        lh = struct.calcsize("<q i i q")
        for _ in range(nlev):
            n, sec, ssz, ctr = struct.unpack("<q i i q", data[off : off + lh])
            off += lh
            sk.levels.append(
                np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
            )
            off += 8 * n
            sk.sections.append(sec)
            sk.section_size.append(ssz)
            sk.counters.append(ctr)
        sk.count = count
        sk.min = mn
        sk.max = mx
        return sk

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"KLL(k={self.k}, levels={len(self.levels)}, stored={self._stored()}, "
            f"count={self.count})"
        )
