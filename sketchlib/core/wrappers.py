"""Composition wrappers over quantile sketches.

* ``SymDigest`` — the reference's symmetric-tail wrapper
  (/root/reference/src/sym_digest.rs:26-71): feed x into a "low"
  digest and -x into a mirrored "high" digest; route queries by the
  side of the median so both tails get the low-quantile accuracy that
  relative compactors concentrate near rank 0.
* ``RankCombinedGroup`` — the reference's never-merged distributed
  query combine (/root/reference/src/parallel_digest.rs:44-80): rank
  queries are exactly additive across disjoint sub-sketches
  (sum of sub-rank * sub-count / total), and inverse queries bisect
  the value domain [min, max] down to 1e-6 relative width, returning
  the smallest bound whose combined CDF reaches q.  Used when partial
  sketches are kept per-partition and never merged (e.g. streaming
  snapshots); once a true merge exists this is only a cross-check.
"""

from __future__ import annotations

import numpy as np


class SymDigest:
    """Symmetric-accuracy wrapper: two mirrored digests."""

    def __init__(self, factory):
        self.low = factory()
        self.high = factory()
        self.count = 0

    def add_buffer(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        self.low.add_buffer(v)
        self.high.add_buffer(-v)
        self.count += v.size

    def merge(self, other: "SymDigest") -> "SymDigest":
        self.low.merge(other.low)
        self.high.merge(other.high)
        self.count += other.count
        return self

    def value_at_quantile(self, q) -> float:
        """Route by side of the median (sym_digest.rs:42-55)."""
        q = float(q)
        if q <= 0.5:
            return float(np.atleast_1d(self.low.value_at_quantile(q))[0])
        return -float(np.atleast_1d(self.high.value_at_quantile(1.0 - q))[0])

    def quantile_at_value(self, v) -> float:
        v = float(v)
        ql = float(np.atleast_1d(self.low.quantile_at_value(v))[0])
        if ql <= 0.5:
            return ql
        return 1.0 - float(np.atleast_1d(self.high.quantile_at_value(-v))[0])


class HighTailView:
    """Query adapter over a sketch BUILT ON NEGATED VALUES.

    Relative compactors (KLL/RCSketch here) concentrate accuracy near
    rank 0 — the LOW tail (measured: p0.001 exact, p0.9999 rank error
    ~8x tail mass at k=200, n=1e6).  Feeding ``-x`` flips the
    protected side, making the HIGH tail (p99.9/p99.99 token lengths)
    the accurate one at 1x state — half of ``SymDigest``'s cost when
    only one tail matters.  This view owns the negated-domain sketch
    and flips queries back; the underlying state stays a plain
    sketch, so the distributed build/merge machinery is untouched.
    """

    __slots__ = ("sk",)

    def __init__(self, sk):
        self.sk = sk

    @property
    def count(self):
        return self.sk.count

    def value_at_quantile(self, q):
        qa = np.atleast_1d(np.asarray(q, dtype=np.float64))
        out = -np.atleast_1d(self.sk.value_at_quantile(1.0 - qa))
        return out if np.ndim(q) else float(out[0])

    def quantile_at_value(self, v):
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        out = 1.0 - np.atleast_1d(
            self.sk.quantile_at_value(np.nextafter(-va, -np.inf))
        )
        return out if np.ndim(v) else float(out[0])

    def rank(self, v):
        """Inclusive rank #{x <= v}, matching the wrapped sketch's
        convention.  Naively ``count - sk.rank(-v)`` counts #{x < v}
        — off by the full atom mass on tied values (and discrete
        token lengths tie constantly).  #{x <= v} = count -
        #{-x < -v}, and the strict-less rank in the negated domain is
        the inclusive rank just below ``-v`` (nextafter toward -inf),
        since stored atoms equal to ``-v`` then fall outside it."""
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        out = self.count - np.atleast_1d(
            self.sk.rank(np.nextafter(-va, -np.inf))
        )
        return out if np.ndim(v) else float(out[0])

    def merge(self, other: "HighTailView") -> "HighTailView":
        self.sk.merge(other.sk)
        return self

    def owned_size(self) -> int:
        return self.sk.owned_size()

    # reference trait-surface aliases
    def est_value_at_quantile(self, q):
        return self.value_at_quantile(q)

    def est_quantile_at_value(self, v):
        return self.quantile_at_value(v)


class MultiDigest:
    """Ensembling wrapper (/root/reference/src/multi_digest.rs:30-60):
    broadcast every insert to all member digests, average the
    estimates.  Experimental in the reference; provided for parity."""

    def __init__(self, factories):
        self.digests = [f() for f in factories]
        if not self.digests:
            raise ValueError("need at least one digest")
        self.count = 0

    def add_buffer(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        for d in self.digests:
            d.add_buffer(v)
        self.count += v.size

    def merge(self, other: "MultiDigest") -> "MultiDigest":
        for a, b in zip(self.digests, other.digests):
            a.merge(b)
        self.count += other.count
        return self

    def value_at_quantile(self, q) -> float:
        return float(
            np.mean(
                [np.atleast_1d(d.value_at_quantile(float(q)))[0] for d in self.digests]
            )
        )

    def quantile_at_value(self, v) -> float:
        return float(
            np.mean(
                [np.atleast_1d(d.quantile_at_value(float(v)))[0] for d in self.digests]
            )
        )


class RankCombinedGroup:
    """Query-combine over disjoint, unmerged sub-sketches."""

    def __init__(self, sketches):
        self.sketches = list(sketches)
        if not self.sketches:
            raise ValueError("need at least one sub-sketch")
        self.total = float(sum(s.count for s in self.sketches))
        self.min = min(float(s.min) for s in self.sketches)
        self.max = max(float(s.max) for s in self.sketches)

    def quantile_at_value(self, v) -> float:
        """sum(sub_cdf * sub_count) / total (parallel_digest.rs:44-51)."""
        if self.total == 0:
            return float("nan")
        acc = 0.0
        for s in self.sketches:
            acc += float(np.atleast_1d(s.quantile_at_value(float(v)))[0]) * float(s.count)
        return acc / self.total

    def value_at_quantile(self, q) -> float:
        """Bisection over [min, max] to 1e-6 relative width, smallest
        bound with CDF >= q (parallel_digest.rs:53-80)."""
        q = float(q)
        lo, hi = self.min, self.max
        denom = abs(self.min) + abs(self.max)
        if denom == 0:
            return 0.0
        while (hi - lo) / denom > 1e-6:
            mid = (lo + hi) / 2.0
            if self.quantile_at_value(mid) >= q:
                hi = mid
            else:
                lo = mid
        return hi
