"""SpaceSaving heavy-hitter sketch (Metwally, Agrawal & El Abbadi 2005).

Not in the reference crate — complements count-min for the frequency
query class: SpaceSaving tracks the identities of the top items
directly (CMS needs a candidate set), with the published guarantees for
capacity m over a stream of N items:

* every item with true count > N/m is in the sketch;
* each reported count overestimates by at most its error term
  ``err[i] <= N/m`` (tracked per counter).

Merge (Agarwal et al., "Mergeable Summaries"): sum counts (and errors)
for shared keys, add the other sketch's min-count floor to missing
keys' potential, then re-truncate to capacity.  The guarantee (error
<= N_total/m) is preserved under merge.

State is a dict keyed by uint64 item hash (identity is the hash; at
10^12 scale the 64-bit collision rate is negligible and the raw key can
be recovered by a candidate join, same as CMS).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"SS02"


class SpaceSaving:
    __slots__ = ("capacity", "counts", "errors", "total", "hash_domain")

    def __init__(self, capacity: int = 256):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.counts: dict[int, int] = {}
        self.errors: dict[int, int] = {}
        self.total = 0
        self.hash_domain = 0

    # ------------------------------------------------------------------- build

    def add_hashes(self, hashes, counts=None) -> None:
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        if h.size == 0:
            return
        if counts is None:
            uniq, cnt = np.unique(h, return_counts=True)
        else:
            c = np.asarray(counts, dtype=np.int64)
            order = np.argsort(h, kind="stable")
            hs, cs = h[order], c[order]
            edge = np.empty(hs.size, dtype=bool)
            edge[0] = True
            np.not_equal(hs[1:], hs[:-1], out=edge[1:])
            ids = np.cumsum(edge) - 1
            uniq = hs[edge]
            cnt = np.bincount(ids, weights=cs).astype(np.int64)
        self.total += int(cnt.sum())
        # batch update: existing keys accumulate, new keys admit by
        # evicting the current minimum (SpaceSaving admission rule).
        # Min-eviction uses a lazy heap (stale entries skipped on pop)
        # — O(log C) amortized per admit instead of an O(C) dict scan,
        # which at 10^12-token scale (vocab >> capacity) was ~O(C x
        # distinct) per task.  Ties on the minimum count may evict a
        # different key than the old linear scan did (both choices are
        # valid SpaceSaving; the published guarantee is unaffected).
        import heapq

        heap = [(v, k) for k, v in self.counts.items()]
        heapq.heapify(heap)
        counts, errors = self.counts, self.errors
        for k, c in zip(uniq.tolist(), cnt.tolist()):
            cur = counts.get(k)
            if cur is not None:
                counts[k] = cur + c
                heapq.heappush(heap, (cur + c, k))
            elif len(counts) < self.capacity:
                counts[k] = c
                errors[k] = 0
                heapq.heappush(heap, (c, k))
            else:
                while True:
                    mv, mk = heap[0]
                    if counts.get(mk) == mv:
                        break
                    heapq.heappop(heap)  # stale entry
                heapq.heappop(heap)
                del counts[mk]
                errors.pop(mk, None)
                counts[k] = mv + c
                errors[k] = mv
                heapq.heappush(heap, (mv + c, k))
            if len(heap) > 8 * self.capacity:
                # compact stale entries: bound heap memory by O(C),
                # not by the number of updates in this call
                heap = [(v, k) for k, v in counts.items()]
                heapq.heapify(heap)

    # ------------------------------------------------------------------- merge

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if other.capacity != self.capacity:
            raise ValueError("cannot merge SpaceSaving of different capacity")
        from sketchlib.core.hashing import combine_domains

        self.hash_domain = combine_domains(
            self.hash_domain, other.hash_domain, "SpaceSaving"
        )
        s_min = min(self.counts.values()) if len(self.counts) == self.capacity else 0
        o_min = min(other.counts.values()) if len(other.counts) == other.capacity else 0
        keys = set(self.counts) | set(other.counts)
        merged: dict[int, int] = {}
        errs: dict[int, int] = {}
        for k in keys:
            a = self.counts.get(k)
            b = other.counts.get(k)
            # a key absent from one side may have up to that side's
            # minimum count unobserved — fold it into count AND error
            if a is None:
                merged[k] = (b or 0) + s_min
                errs[k] = other.errors.get(k, 0) + s_min
            elif b is None:
                merged[k] = a + o_min
                errs[k] = self.errors.get(k, 0) + o_min
            else:
                merged[k] = a + b
                errs[k] = self.errors.get(k, 0) + other.errors.get(k, 0)
        # keep the top `capacity` by merged count
        if len(merged) > self.capacity:
            top = sorted(merged, key=merged.__getitem__, reverse=True)[
                : self.capacity
            ]
            merged = {k: merged[k] for k in top}
            errs = {k: errs[k] for k in top}
        self.counts = merged
        self.errors = errs
        self.total += other.total
        return self

    # ----------------------------------------------------------------- queries

    def top_k(self, k: int = 10):
        """[(hash, est_count, max_err)] sorted by estimate descending."""
        order = sorted(self.counts, key=self.counts.__getitem__, reverse=True)[:k]
        return [(int(h), self.counts[h], self.errors.get(h, 0)) for h in order]

    def estimate_hashes(self, hashes) -> np.ndarray:
        h = np.asarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64, copy=False).view(np.uint64)
        return np.array([self.counts.get(int(x), 0) for x in h], dtype=np.int64)

    def guaranteed_min_count(self) -> float:
        """Any item with true count above total/capacity is tracked."""
        return self.total / self.capacity

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        n = len(self.counts)
        keys = np.fromiter(self.counts.keys(), dtype=np.uint64, count=n)
        cnts = np.fromiter(self.counts.values(), dtype=np.int64, count=n)
        errs = np.fromiter(
            (self.errors.get(int(k), 0) for k in keys), dtype=np.int64, count=n
        )
        return (
            struct.pack(
                "<4s B i q i", _MAGIC, self.hash_domain, self.capacity,
                self.total, n,
            )
            + keys.tobytes()
            + cnts.tobytes()
            + errs.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaceSaving":
        if bytes(data[:4]) == b"SS01":  # legacy: no domain byte
            hdr = struct.calcsize("<4s i q i")
            _m, cap, total, n = struct.unpack("<4s i q i", data[:hdr])
            domain = 0
        else:
            hdr = struct.calcsize("<4s B i q i")
            magic, domain, cap, total, n = struct.unpack(
                "<4s B i q i", data[:hdr]
            )
            if magic != _MAGIC:
                raise ValueError("not a SpaceSaving blob")
        sk = cls(capacity=cap)
        sk.hash_domain = int(domain)
        off = hdr
        keys = np.frombuffer(data, np.uint64, n, off); off += 8 * n
        cnts = np.frombuffer(data, np.int64, n, off); off += 8 * n
        errs = np.frombuffer(data, np.int64, n, off)
        sk.counts = {int(k): int(c) for k, c in zip(keys, cnts)}
        sk.errors = {int(k): int(e) for k, e in zip(keys, errs)}
        sk.total = total
        return sk
