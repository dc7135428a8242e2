"""Merge-based t-digest with fully vectorized numpy compression.

Semantics follow the reference's merging t-digest
(/root/reference/src/t_digest/t_digest.rs): state is a mean-sorted list
of weighted centroids plus exact min/max
(t_digest.rs:12-30); bulk insert wraps values as weight-1 centroids and
runs one merge-compression pass (t_digest.rs:49-66, 301-361); quantile
queries interpolate between centroid half-weight midpoints with min/max
clamps (t_digest.rs:68-266).  Sketch-merge is centroid-list
concatenation + one compression pass, exactly the shape of the
reference's ``ParTDigest::flush`` (par_t_digest.rs:59-89).

The compression kernel here is *not* the reference's sequential greedy
sweep: it assigns each centroid to an integer bin of the scale function
evaluated at its cumulative-weight midpoint and reduces each bin with a
weighted mean (np.argsort + np.bincount — no per-element Python).  Each
resulting cluster spans ~one k-unit, preserving the t-digest accuracy
guarantee, and the whole build is O(n log n) vectorized.

State is SoA: ``means: f64[]``, ``weights: f64[]`` — the layout the
reference benchmarked as fastest (benches/baseline.rs:184-246).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.scale_functions import get_scale

_MAGIC = b"TD01"


def _find_closest(ms: list, xm: float):
    """t_digest.rs:527-575 find_closest_centroids on a mean-sorted
    list: half-open ``range`` over the centroids at minimum SIGNED
    distance, with the reference's equal-distance expansion (its
    right-expansion checks the element past the exclusive end — kept
    as-is for parity).  None when empty."""
    import bisect

    n = len(ms)
    if n == 0:
        return None
    index = bisect.bisect_left(ms, xm)
    if index == 0:
        min_lr = ms[0] - xm
        left, right = 0, 1
    elif index == n:
        min_lr = ms[n - 1] - xm
        left, right = n - 1, n
    else:
        min_lr = min(ms[index - 1] - xm, ms[index] - xm)
        left, right = index, index + 1
    while left > 0 and ms[left - 1] - xm == min_lr:
        left -= 1
    while right < n - 1 and ms[right + 1] - xm == min_lr:
        right += 1
    return range(left, right)


class TDigest:
    """Mergeable t-digest over float64 values.

    Parameters
    ----------
    delta : compression factor (number of k-units across [0,1]);
        reference tests use 2000-4000 at n=1e6 (t_digest.rs:749-784).
    scale : one of k0,k1,k2,k2_asym,k2n,k3 (k2 is the reference
        examples' default, accuracy.rs:496).
    buffer_factor : values buffered per compression pass, as a multiple
        of delta (amortizes the sort, cf. BufferedDigest
        buffered_digest.rs:40-79).
    """

    __slots__ = (
        "delta",
        "scale",
        "means",
        "weights",
        "min",
        "max",
        "_buf",
        "_buf_len",
        "_buf_cap",
    )

    def __init__(self, delta: float = 2000.0, scale: str = "k2", buffer_factor: int = 10):
        self.delta = float(delta)
        self.scale = scale
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf
        self._buf: list[tuple[np.ndarray, np.ndarray]] = []
        self._buf_len = 0
        self._buf_cap = max(int(buffer_factor * delta), 1024)

    # ------------------------------------------------------------------ build

    def add_buffer(self, values) -> None:
        """Bulk insert raw values (weight 1 each)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        self._buf.append((v, None))
        self._buf_len += v.size
        if self._buf_len >= self._buf_cap:
            self._flush()

    def add_weighted(self, values, weights) -> None:
        """Bulk insert pre-aggregated (value, weight) pairs.

        The fast path for low-cardinality integer streams (e.g. token
        ids): pre-reduce with np.bincount, then feed counts here.
        """
        v = np.asarray(values, dtype=np.float64).ravel()
        w = np.asarray(weights, dtype=np.float64).ravel()
        if v.size == 0:
            return
        if v.shape != w.shape:
            raise ValueError("values/weights length mismatch")
        self._buf.append((v, w))
        self._buf_len += v.size
        if self._buf_len >= self._buf_cap:
            self._flush()

    def add(self, value: float) -> None:
        self.add_buffer(np.array([value]))

    # ------------------------------------------------------------- compression

    def _flush(self) -> None:
        if not self._buf:
            return
        raw = [m for m, w in self._buf if w is None]
        weighted = [(m, w) for m, w in self._buf if w is not None]
        self._buf = []
        self._buf_len = 0

        ms = [self.means]
        ws = [self.weights]
        if raw:
            v = raw[0] if len(raw) == 1 else np.concatenate(raw)
            if v.size:
                self.min = min(self.min, float(v.min()))
                self.max = max(self.max, float(v.max()))
                rm, rw = self._compress_raw(v)
                ms.append(rm)
                ws.append(rw)
        for m, w in weighted:
            if m.size:
                self.min = min(self.min, float(m.min()))
                self.max = max(self.max, float(m.max()))
                ms.append(m)
                ws.append(w)
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        if m.size == 0:
            return
        self.means, self.weights = self._compress(m, w)

    def _compress_raw(self, values: np.ndarray):
        """Weight-1 fast path: sort once, then place the ~delta scale-
        function bin edges by *index* (for unit weights the cumulative
        weight of sorted element i is i+1, so the edge at quantile q
        sits at index q*n) and reduce each segment with one reduceat
        pass.  The k-function is evaluated on O(delta) edges instead of
        O(n) elements — same invariant (each cluster spans ~1 k-unit),
        ~5x the throughput of the general path."""
        v = np.sort(values)
        n = v.size
        if n <= 2:
            return v.astype(np.float64), np.ones(n)
        k_fn, inv_fn = get_scale(self.scale)
        kmin = float(k_fn(0.5 / n, self.delta, n))
        kmax = float(k_fn(1.0 - 0.5 / n, self.delta, n))
        k_ints = np.arange(np.ceil(kmin), np.ceil(kmax))
        q_edges = inv_fn(k_ints, self.delta, n)
        idx = np.unique(np.clip(np.rint(q_edges * n).astype(np.int64), 0, n))
        bounds = np.concatenate(([0], idx[(idx > 0) & (idx < n)], [n]))
        bounds = np.unique(bounds)
        counts = np.diff(bounds).astype(np.float64)
        sums = np.add.reduceat(v, bounds[:-1])
        return sums / counts, counts

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        """One merge-compression pass (vectorized analogue of
        t_digest.rs:301-361)."""
        order = np.argsort(means, kind="stable")
        m = means[order]
        w = weights[order]
        total = w.sum()
        k_fn, _ = get_scale(self.scale)
        cumw = np.cumsum(w)
        qmid = (cumw - 0.5 * w) / total
        k = k_fn(qmid, self.delta, total)
        bins = np.floor(k)
        # collapse runs of equal bin ids (bins are non-decreasing since
        # qmid is non-decreasing and k is monotone)
        new_run = np.empty(bins.size, dtype=bool)
        new_run[0] = True
        np.not_equal(bins[1:], bins[:-1], out=new_run[1:])
        ids = np.cumsum(new_run) - 1
        nbins = int(ids[-1]) + 1
        out_w = np.bincount(ids, weights=w, minlength=nbins)
        out_m = np.bincount(ids, weights=w * m, minlength=nbins) / out_w
        return out_m, out_w

    # ----------------------------------------------------- incremental clustering
    #
    # Port of the reference's single-centroid insert path
    # (t_digest.rs:368-436 add_cluster, 443-520 add_cluster_tree,
    # 527-575 find_closest_centroids, 581-627 weight_left/total_weight/
    # k_size).  The Spark paths never use these — the reference's own
    # benchmarks show the batch merge path dominates
    # (benches/t_digest.rs:230-258) and Spark feeds batches by
    # construction — but a user streaming true single-event inserts
    # outside Spark gets the same API surface.

    def total_weight(self) -> float:
        """Reference trait alias for count (t_digest.rs:593-603)."""
        return self.count

    def weight_left(self, mean: float) -> float:
        """Total weight of centroids with mean strictly below ``mean``
        (t_digest.rs:581-591)."""
        self._flush()
        return float(self.weights[self.means < float(mean)].sum())

    def k_size_from_weights(
        self, weight: float, weight_left: float, new_total_weight: float
    ) -> float:
        """Scale-space span of a centroid from its weight and the
        weight to its left (t_digest.rs:616-623)."""
        k_fn, _ = get_scale(self.scale)
        q_left = weight_left / new_total_weight
        q_right = q_left + weight / new_total_weight
        return float(
            k_fn(q_right, self.delta, new_total_weight)
            - k_fn(q_left, self.delta, new_total_weight)
        )

    def k_size(self, mean: float, weight: float, total_weight: float) -> float:
        """k-size of a prospective centroid against the current digest
        (t_digest.rs:605-614 — note the reference adds the target's
        weight on top of the passed total, ported as-is)."""
        new_total = total_weight + weight
        return self.k_size_from_weights(weight, self.weight_left(mean), new_total)

    def find_closest_centroids(self, mean: float):
        """Half-open index range of the centroids at minimum SIGNED
        distance from ``mean`` (t_digest.rs:527-575 ported exactly,
        including the signed-difference tie expansion); None when the
        digest is empty."""
        self._flush()
        return _find_closest(self.means.tolist(), float(mean))

    def add_cluster(self, means, weights=None, growth_limit: float = 10.0) -> None:
        """Insert centroids one at a time via clustering
        (t_digest.rs:368-436): each incoming centroid merges into the
        closest existing centroid that stays under one k-unit
        (minimum mean*weight among acceptable candidates, as the
        reference selects), else inserts at its sort position; a merge-
        compression pass runs whenever the digest exceeds
        growth_limit * delta centroids.  No final compression (the
        reference skips it; size stays bounded by the growth limit).

        NOTE: each insert recomputes weight-left over all centroids
        (vectorized here, but still O(n) per candidate — the reference
        does the same scan in t_digest.rs:581-601), so a long trickle
        stream costs O(inserts * growth_limit * delta).  Prefer
        ``add_cluster_tree`` (same semantics, treap-backed O(log n)
        weight-left) above ~10^4 inserts."""
        m_in = np.asarray(means, dtype=np.float64).ravel()
        if weights is None:
            w_in = np.ones(m_in.size)
        else:
            w_in = np.asarray(weights, dtype=np.float64).ravel()
        if m_in.size == 0:
            return
        self._flush()
        # update_limits (t_digest.rs:650-672): limits from cluster means
        self.min = min(self.min, float(m_in.min()))
        self.max = max(self.max, float(m_in.max()))
        ms = self.means.tolist()
        ws = self.weights.tolist()
        total = float(self.weights.sum())
        limit = int(growth_limit * self.delta)
        import bisect

        for xm, xw in zip(m_in.tolist(), w_in.tolist()):
            # exact-equal mean: absorbing the weight is LOSSLESS (a
            # centroid is (mean, weight); two equal means are one
            # centroid) and prevents duplicate-heavy streams (plateau
            # distributions) from piling up thousands of equal-mean
            # entries that the tie expansion then scans quadratically —
            # deviation from the reference, which only merges under the
            # k-size test and hits that quadratic wall
            pos = bisect.bisect_left(ms, xm)
            if pos < len(ms) and ms[pos] == xm:
                ws[pos] += xw
                total += xw
                continue
            idx_range = _find_closest(ms, xm)
            chosen = None
            if idx_range is not None:
                # weight strictly left of each candidate's merged mean:
                # one vectorized masked sum per candidate (in-place
                # merges can leave ms locally unsorted, so a
                # bisect+prefix-sum shortcut would be unsound — the
                # full masked scan is the correct form; numpy makes it
                # memcpy-speed instead of a Python loop per element)
                ms_np = np.asarray(ms)
                ws_np = np.asarray(ws)
                for index in idx_range:
                    nw = xw + ws[index]
                    nm = (xm * xw + ms[index] * ws[index]) / nw
                    wl = float(ws_np[ms_np < nm].sum())
                    if abs(self.k_size_from_weights(nw, wl, total + nw)) < 1.0:
                        if chosen is None or (
                            ms[chosen] * ws[chosen] > ms[index] * ws[index]
                        ):
                            chosen = index
            if chosen is not None:
                ws_c = ws[chosen]
                ms[chosen] = (ms[chosen] * ws_c + xm * xw) / (ws_c + xw)
                ws[chosen] = ws_c + xw
                total += xw
            else:
                pos = bisect.bisect_left(ms, xm)
                ms.insert(pos, xm)
                ws.insert(pos, xw)
                total += xw
            if len(ms) > limit:
                cm, cw = self._compress(np.asarray(ms), np.asarray(ws))
                ms, ws = cm.tolist(), cw.tolist()
        # deviation from the reference: in-place merges can leave means
        # locally unsorted (t_digest.rs keeps them as-is); our queries
        # interpolate over cumulative weights, so restore sort order
        # (a permutation, not a compression — growth-limit semantics
        # and centroid identities are preserved)
        m_arr = np.asarray(ms)
        w_arr = np.asarray(ws)
        order = np.argsort(m_arr, kind="stable")
        self.means, self.weights = m_arr[order], w_arr[order]

    def add_cluster_tree(
        self, means, weights=None, growth_limit: float = 10.0, seed: int = 0
    ) -> None:
        """``add_cluster`` with a KeyedSumTree carrying the
        weight-to-the-left queries (t_digest.rs:443-520): existing
        centroids are shuffled (seeded here — the reference uses
        thread_rng, t_digest.rs:447-449) into a treap (see
        keyed_sum_tree.py — the reference's unbalanced BST) with
        subtree sums, so closest-centroid and weight_left queries run
        in O(depth) instead of a scan.  Deviation: the reference passes
        the merged MEAN where k_size_from_weights expects the merged
        weight (t_digest.rs:459-470); we pass the weight the signature
        declares."""
        from sketchlib.core.keyed_sum_tree import KeyedSumTree

        m_in = np.asarray(means, dtype=np.float64).ravel()
        if weights is None:
            w_in = np.ones(m_in.size)
        else:
            w_in = np.asarray(weights, dtype=np.float64).ravel()
        if m_in.size == 0:
            return
        self._flush()
        self.min = min(self.min, float(m_in.min()))
        self.max = max(self.max, float(m_in.max()))
        rng = np.random.default_rng(seed)
        limit = int(growth_limit * self.delta)

        def build_tree() -> KeyedSumTree:
            perm = rng.permutation(self.means.size)
            return KeyedSumTree.from_centroids(
                self.means[perm], self.weights[perm]
            )

        tree = build_tree()
        total = float(self.weights.sum())
        for xm, xw in zip(m_in.tolist(), w_in.tolist()):
            closest = tree.closest_keys(xm)
            chosen = None
            for cm, cw in closest:
                nw = xw + cw
                nm = (xm * xw + cm * cw) / nw
                wl = tree.less_than_sum(nm) or 0.0
                if abs(self.k_size_from_weights(nw, wl, total + xw)) < 1.0:
                    if chosen is None or chosen[0] * chosen[1] > cm * cw:
                        chosen = (cm, cw)
            if chosen is not None:
                cm, cw = chosen
                tree.delete(cm)
                tree.insert((cm * cw + xm * xw) / (cw + xw), cw + xw)
            else:
                tree.insert(xm, xw)
            total += xw
            if tree.size() > limit:
                pairs = tree.sorted_vec_key()
                m_arr = np.asarray([p[0] for p in pairs])
                w_arr = np.asarray([p[1] for p in pairs])
                self.means, self.weights = self._compress(m_arr, w_arr)
                tree = build_tree()
        pairs = tree.sorted_vec_key()
        self.means = np.asarray([p[0] for p in pairs])
        self.weights = np.asarray([p[1] for p in pairs])

    # ------------------------------------------------------------------ merge

    def merge(self, other: "TDigest") -> "TDigest":
        """In-place merge of another digest (centroid concat + one
        compression pass — par_t_digest.rs:80-86)."""
        other._flush()
        if other.means.size:
            self._buf.append((other.means.copy(), other.weights.copy()))
            self._buf_len += other.means.size
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._flush()
        return self

    # ----------------------------------------------------------------- queries

    @property
    def count(self) -> float:
        self._flush()
        return float(self.weights.sum())

    @property
    def n_centroids(self) -> int:
        self._flush()
        return int(self.means.size)

    def _interp_arrays(self):
        """xp (values) and fp (cumulative weights at half-weight
        midpoints), with min/max endpoints — t_digest.rs:204-266."""
        self._flush()
        m, w = self.means, self.weights
        cumw = np.cumsum(w)
        mid = cumw - 0.5 * w
        total = cumw[-1]
        xs = np.concatenate(([self.min], m, [self.max]))
        ys = np.concatenate(([0.0], mid, [total]))
        # make xs strictly increasing for interp: collapse duplicates
        keep = np.empty(xs.size, dtype=bool)
        keep[0] = True
        np.greater(xs[1:], xs[:-1], out=keep[1:])
        if not keep.all():
            # for runs of equal x keep the midpoint of the run's y-range
            ids = np.cumsum(keep) - 1
            nid = int(ids[-1]) + 1
            lo = np.full(nid, np.inf)
            hi = np.full(nid, -np.inf)
            np.minimum.at(lo, ids, ys)
            np.maximum.at(hi, ids, ys)
            xs = xs[keep]
            ys = (lo + hi) / 2.0
            # endpoint runs: when min==first mean (or max==last mean)
            # the flat region must clamp to that exact value, so the
            # first point carries the run's upper cum-weight and the
            # last its lower (singleton-exactness, t_digest.rs:934-949)
            ys[0] = hi[0]
            ys[-1] = lo[-1]
        return xs, ys, total

    def value_at_quantile(self, q) -> np.ndarray | float:
        """Inverse-CDF estimate (est_value_at_quantile,
        t_digest.rs:204-266)."""
        qa = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.count == 0:
            out = np.full(qa.shape, np.nan)
            return out if np.ndim(q) else float(out[0])
        xs, ys, total = self._interp_arrays()
        out = np.interp(qa * total, ys, xs)
        out = np.clip(out, self.min, self.max)
        return out if np.ndim(q) else float(out[0])

    def quantile_at_value(self, v) -> np.ndarray | float:
        """CDF estimate (est_quantile_at_value, t_digest.rs:68-202)."""
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        if self.count == 0:
            out = np.full(va.shape, np.nan)
            return out if np.ndim(v) else float(out[0])
        xs, ys, total = self._interp_arrays()
        out = np.interp(va, xs, ys) / total
        out[va < self.min] = 0.0
        out[va > self.max] = 1.0
        return out if np.ndim(v) else float(out[0])


    # reference trait-surface aliases (traits.rs:24-29)
    def est_value_at_quantile(self, q):
        return self.value_at_quantile(q)

    def est_quantile_at_value(self, v):
        return self.quantile_at_value(v)

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        """Serialized footprint in bytes (traits.rs:36-41 analogue)."""
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        self._flush()
        scale_b = self.scale.encode("ascii")
        header = struct.pack(
            "<4sB d d d q",
            _MAGIC,
            len(scale_b),
            self.delta,
            self.min,
            self.max,
            self.means.size,
        )
        return b"".join(
            [header, scale_b, self.means.tobytes(), self.weights.tobytes()]
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        hdr = struct.calcsize("<4sB d d d q")
        magic, slen, delta, mn, mx, n = struct.unpack("<4sB d d d q", data[:hdr])
        if magic != _MAGIC:
            raise ValueError("not a TDigest blob")
        scale = data[hdr : hdr + slen].decode("ascii")
        off = hdr + slen
        d = cls(delta=delta, scale=scale)
        d.means = np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
        off += 8 * n
        d.weights = np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
        d.min = mn
        d.max = mx
        return d

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"TDigest(delta={self.delta}, scale={self.scale!r}, "
            f"centroids={self.n_centroids}, count={self.count})"
        )
