"""DDSketch — a fully-mergeable quantile sketch with *relative*-error
guarantees (Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable
Quantile Sketch with Relative-Error Guarantees", VLDB 2019).

This is a from-scratch implementation, NOT part of the reference crate
(Scratchcat1/approximate-quantiles covers rank-error sketches only:
t-digest / RCSketch / KLL).  It widens the library's quantile family
with the complementary guarantee: ``|est - x_q| <= alpha * |x_q|`` for
the data item ``x_q`` at the queried rank — i.e. the error scales with
the VALUE, so the p99.9 of a heavy-tailed latency/length distribution
is as accurate (relatively) as the median, where rank-error sketches
smear the tail.

Design (paper §2.1-2.3, logarithmic-mapping + collapsing store):

* ``gamma = (1 + alpha) / (1 - alpha)``; a value ``x > 0`` lands in
  bucket ``i = ceil(log_gamma(x))`` (bucket i covers
  ``(gamma^(i-1), gamma^i]``), estimated by the bucket midpoint
  ``2 * gamma^i / (gamma + 1)`` — the worst-case relative error over
  the bucket is exactly ``alpha``.
* Three stores: positive buckets, negative buckets (mirrored), and an
  exact zero count — sparse ``(sorted int64 index, float64 count)``
  array pairs, so ``add_buffer`` and ``merge`` are pure vectorized
  numpy (np.unique + np.add.at), no per-value Python.
* Bounded memory: when the two bucket stores exceed ``max_bins``, the
  LOWEST-value buckets collapse into one (paper §2.3) — the guarantee
  is preserved for every quantile above the collapsed mass, which is
  the tail-accuracy contract the sketch exists for.

Merge laws: bucket counts are integers carried in float64, and store
union is a symmetric sorted merge, so merge is bit-exact commutative
and associative as long as no collapse triggers (property-tested);
with collapsing, counts/min/max stay exact and the relative-error
guarantee above the collapsed mass still holds (also tested).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"DD01"


def _merge_store(
    idx_a: np.ndarray, cnt_a: np.ndarray, idx_b: np.ndarray, cnt_b: np.ndarray
):
    """Union two sparse (index, count) stores, summing shared buckets."""
    # copies, never views: the caller stores the result on self and
    # _collapse mutates counts in place — returning the other sketch's
    # arrays by reference would silently corrupt THAT sketch later
    if idx_a.size == 0:
        return idx_b.copy(), cnt_b.copy()
    if idx_b.size == 0:
        return idx_a.copy(), cnt_a.copy()
    idx = np.concatenate([idx_a, idx_b])
    cnt = np.concatenate([cnt_a, cnt_b])
    u, inv = np.unique(idx, return_inverse=True)
    out = np.zeros(u.size, dtype=np.float64)
    np.add.at(out, inv, cnt)
    return u, out


class DDSketch:
    """Relative-error quantile sketch (alpha-accurate at every rank)."""

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        if max_bins < 2:
            raise ValueError("max_bins must be >= 2")
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        # log(gamma) = log1p(2a / (1-a)) — log1p keeps precision for
        # small alpha where (1+a)/(1-a) is 1 + tiny
        self._log_gamma = math.log1p(2.0 * alpha / (1.0 - alpha))
        self.pos_idx = np.empty(0, dtype=np.int64)
        self.pos_cnt = np.empty(0, dtype=np.float64)
        self.neg_idx = np.empty(0, dtype=np.int64)
        self.neg_cnt = np.empty(0, dtype=np.float64)
        self.zero_count = 0.0
        self.count = 0.0
        self.min = math.inf
        self.max = -math.inf
        self.collapsed = False

    # ------------------------------------------------------------------ build

    def _bucket(self, mag: np.ndarray) -> np.ndarray:
        """Bucket indices for strictly-positive magnitudes."""
        return np.ceil(np.log(mag) / self._log_gamma).astype(np.int64)

    def _estimate(self, idx: np.ndarray) -> np.ndarray:
        """Bucket-midpoint value estimates: 2*gamma^i / (gamma+1)."""
        g1 = math.exp(self._log_gamma) + 1.0
        return np.exp(idx.astype(np.float64) * self._log_gamma) * (2.0 / g1)

    def add_buffer(self, values) -> None:
        self.add_weighted(values, None)

    def add(self, value: float) -> None:
        self.add_buffer(np.asarray([value], dtype=np.float64))

    def add_weighted(self, values, weights) -> None:
        """Vectorized weighted insert; NaNs are dropped.  Integer-valued
        weights keep every downstream count exact (float64 carries
        integers exactly below 2^53)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        if weights is None:
            w = np.ones(v.size, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64).ravel()
            if w.size != v.size:
                raise ValueError("values and weights must align")
            if np.any(w < 0):
                raise ValueError("weights must be non-negative")
        keep = ~np.isnan(v)
        v, w = v[keep], w[keep]
        keep = w > 0
        v, w = v[keep], w[keep]
        if v.size == 0:
            return
        self.count += float(w.sum())
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        pos = v > 0
        neg = v < 0
        self.zero_count += float(w[~pos & ~neg].sum())
        for mask, store in ((pos, "pos"), (neg, "neg")):
            if not mask.any():
                continue
            ix = self._bucket(np.abs(v[mask]))
            u, inv = np.unique(ix, return_inverse=True)
            c = np.zeros(u.size, dtype=np.float64)
            np.add.at(c, inv, w[mask])
            if store == "pos":
                self.pos_idx, self.pos_cnt = _merge_store(
                    self.pos_idx, self.pos_cnt, u, c
                )
            else:
                self.neg_idx, self.neg_cnt = _merge_store(
                    self.neg_idx, self.neg_cnt, u, c
                )
        self._collapse()

    # ----------------------------------------------------------------- merge

    def merge(self, other: "DDSketch") -> "DDSketch":
        if not isinstance(other, DDSketch):
            raise TypeError("can only merge DDSketch with DDSketch")
        if other.alpha != self.alpha:
            raise ValueError(
                f"alpha mismatch: {self.alpha} vs {other.alpha} — "
                "bucket domains are incompatible"
            )
        self.pos_idx, self.pos_cnt = _merge_store(
            self.pos_idx, self.pos_cnt, other.pos_idx, other.pos_cnt
        )
        self.neg_idx, self.neg_cnt = _merge_store(
            self.neg_idx, self.neg_cnt, other.neg_idx, other.neg_cnt
        )
        self.zero_count += other.zero_count
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.collapsed = self.collapsed or other.collapsed
        self.max_bins = min(self.max_bins, other.max_bins)
        self._collapse()
        return self

    def _collapse(self) -> None:
        """Collapse the lowest-VALUE buckets until the two stores fit in
        ``max_bins``.  Value order is: negative buckets by descending
        index (most negative first), then positive by ascending index —
        so the collapse eats the negative tail first, spilling into the
        exact-zero count, then the smallest positive buckets."""
        excess = (self.pos_idx.size + self.neg_idx.size) - self.max_bins
        if excess <= 0:
            return
        self.collapsed = True
        # negative store: ascending index == descending value, so the
        # lowest values sit at the END of the array
        if self.neg_idx.size:
            take = min(excess, self.neg_idx.size - 1)
            if take > 0:
                keep = self.neg_idx.size - take
                # lowest `take+1` value-buckets merge into the highest
                # of them (position keep-1 in ascending-index order)
                self.neg_cnt[keep - 1] += self.neg_cnt[keep:].sum()
                self.neg_idx = self.neg_idx[:keep]
                self.neg_cnt = self.neg_cnt[:keep]
                excess -= take
            if excess > 0:
                # the whole negative store must go: fold it into zero
                self.zero_count += float(self.neg_cnt.sum())
                self.neg_idx = np.empty(0, dtype=np.int64)
                self.neg_cnt = np.empty(0, dtype=np.float64)
                excess -= 1
        if excess > 0 and self.pos_idx.size:
            # positive store: lowest values at the FRONT
            take = min(excess, self.pos_idx.size - 1)
            self.pos_cnt[take] += self.pos_cnt[:take].sum()
            self.pos_idx = self.pos_idx[take:]
            self.pos_cnt = self.pos_cnt[take:]

    # ---------------------------------------------------------------- queries

    def _ordered(self):
        """(ascending value estimates, counts) across all three stores."""
        vals = []
        cnts = []
        if self.neg_idx.size:
            vals.append(-self._estimate(self.neg_idx)[::-1])
            cnts.append(self.neg_cnt[::-1])
        if self.zero_count > 0:
            vals.append(np.zeros(1))
            cnts.append(np.asarray([self.zero_count]))
        if self.pos_idx.size:
            vals.append(self._estimate(self.pos_idx))
            cnts.append(self.pos_cnt)
        if not vals:
            return np.empty(0), np.empty(0)
        return np.concatenate(vals), np.concatenate(cnts)

    def value_at_quantile(self, q) -> np.ndarray | float:
        """Paper §2.1: the bucket whose cumulative count first exceeds
        ``q * (n - 1)``; output clamped to the exact [min, max]."""
        qa = np.atleast_1d(np.asarray(q, dtype=np.float64))
        vals, cnts = self._ordered()
        if vals.size == 0 or self.count <= 0:
            out = np.full(qa.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        cum = np.cumsum(cnts)
        target = qa * (self.count - 1.0)
        idx = np.searchsorted(cum, target, side="right")
        idx = np.clip(idx, 0, vals.size - 1)
        out = np.clip(vals[idx], self.min, self.max)
        return out if np.ndim(q) else float(out[0])

    def rank(self, v) -> np.ndarray | float:
        """Estimated count of items <= v."""
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        vals, cnts = self._ordered()
        if vals.size == 0:
            out = np.zeros(va.shape)
            return out if np.ndim(v) else float(out[0])
        cum = np.concatenate([[0.0], np.cumsum(cnts)])
        out = cum[np.searchsorted(vals, va, side="right")]
        return out if np.ndim(v) else float(out[0])

    def quantile_at_value(self, v) -> np.ndarray | float:
        if self.count == 0:
            return np.nan
        return self.rank(v) / float(self.count)

    # reference trait-surface aliases (traits.rs:24-29)
    def est_value_at_quantile(self, q):
        return self.value_at_quantile(q)

    def est_quantile_at_value(self, v):
        return self.quantile_at_value(v)

    # ------------------------------------------------------------------ serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                struct.pack(
                    "<4s d i d d d d ? q q",
                    _MAGIC,
                    self.alpha,
                    self.max_bins,
                    self.zero_count,
                    self.count,
                    self.min,
                    self.max,
                    self.collapsed,
                    self.pos_idx.size,
                    self.neg_idx.size,
                ),
                self.pos_idx.tobytes(),
                self.pos_cnt.tobytes(),
                self.neg_idx.tobytes(),
                self.neg_cnt.tobytes(),
            ]
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        fmt = "<4s d i d d d d ? q q"
        hdr = struct.calcsize(fmt)
        (magic, alpha, max_bins, zero, count, mn, mx, collapsed, np_, nn) = (
            struct.unpack(fmt, data[:hdr])
        )
        if magic != _MAGIC:
            raise ValueError("not a DDSketch blob")
        sk = cls(alpha=alpha, max_bins=max_bins)
        off = hdr
        sk.pos_idx = np.frombuffer(data, np.int64, np_, offset=off).copy()
        off += 8 * np_
        sk.pos_cnt = np.frombuffer(data, np.float64, np_, offset=off).copy()
        off += 8 * np_
        sk.neg_idx = np.frombuffer(data, np.int64, nn, offset=off).copy()
        off += 8 * nn
        sk.neg_cnt = np.frombuffer(data, np.float64, nn, offset=off).copy()
        sk.zero_count = zero
        sk.count = count
        sk.min = mn
        sk.max = mx
        sk.collapsed = collapsed
        return sk

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"DDSketch(alpha={self.alpha}, bins="
            f"{self.pos_idx.size + self.neg_idx.size}, count={self.count})"
        )
