"""Exact quantile oracle for accuracy tests.

Numpy re-implementation of the reference's ``LinearDigest``
(/root/reference/src/util/linear_digest.rs:20-57), including its two
query conventions:

* rank query (``est_quantile_at_value``): midpoint-of-equals —
  ``(count_less + count_equal/2) / n`` when more than one value equals
  the probe, else ``count_less_or_equal / n``
  (linear_digest.rs:32-41);
* value query (``est_value_at_quantile``): sort and index
  ``round(q * n)`` clamped to ``n - 1`` (linear_digest.rs:43-52).
"""

from __future__ import annotations

import numpy as np


class LinearOracle:
    """Stores every value; exact answers, test-scale only."""

    def __init__(self, values=None):
        self._values = np.asarray(values, dtype=np.float64) if values is not None else np.empty(0)
        self._sorted = None

    def add_buffer(self, values) -> None:
        self._values = np.concatenate(
            [self._values, np.asarray(values, dtype=np.float64)]
        )
        self._sorted = None

    @property
    def count(self) -> int:
        return int(self._values.size)

    def _get_sorted(self) -> np.ndarray:
        if self._sorted is None:
            self._sorted = np.sort(self._values)
        return self._sorted

    def quantile_at_value(self, value: float) -> float:
        s = self._get_sorted()
        n = s.size
        less = np.searchsorted(s, value, side="left")
        leq = np.searchsorted(s, value, side="right")
        equal = leq - less
        if equal > 1:
            return (less + equal / 2.0) / n
        return leq / n

    def value_at_quantile(self, q: float) -> float:
        s = self._get_sorted()
        idx = min(int(round(q * s.size)), s.size - 1)
        return float(s[idx])

    def values_at_quantiles(self, qs) -> np.ndarray:
        return np.array([self.value_at_quantile(q) for q in np.atleast_1d(qs)])

    def quantiles_at_values(self, vs) -> np.ndarray:
        return np.array([self.quantile_at_value(v) for v in np.atleast_1d(vs)])
