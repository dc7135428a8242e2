"""t-digest scale functions: quantile-space -> k-space maps and inverses.

Semantics follow the reference crate's scale-function family
(/root/reference/src/t_digest/scale_functions.rs:4-120): each function
maps a quantile q in [0,1] to a "k index"; the digest keeps every
centroid's quantile span below one k unit, which concentrates accuracy
at the tails for the non-linear variants.  Implemented from the
published t-digest paper formulas; vectorized over numpy arrays.

  k0      linear (uniform centroid sizes)
  k1      (delta / 2*pi) * asin(2q - 1)           — classic t-digest
  k2      (delta / Z(n)) * log(q / (1-q)),  Z = 4 log(n/delta) + 24
  k2_asym k2 evaluated at q/2 with 2*delta (low-tail accuracy)
  k2n     k2 with delta scaled by log10(n)^2
  k3      +/- log(2q) / Z'(n) piecewise
"""

from __future__ import annotations

import numpy as np

_QEPS = 1e-14  # clamp to keep log/asin finite


def _clamp_q(q):
    return np.clip(q, _QEPS, 1.0 - _QEPS)


def k0(q, delta, n=None):
    return np.asarray(q, dtype=np.float64) * (delta / 2.0)


def inv_k0(k, delta, n=None):
    return np.asarray(k, dtype=np.float64) * (2.0 / delta)


def k1(q, delta, n=None):
    q = _clamp_q(np.asarray(q, dtype=np.float64))
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)


def inv_k1(k, delta, n=None):
    k = np.asarray(k, dtype=np.float64)
    return (np.sin(k * (2.0 * np.pi / delta)) + 1.0) / 2.0


def _z(compression, n):
    n = max(float(n), 1.0)
    # clamp: the reference formula assumes n >> delta; for tiny n it
    # goes non-positive, which would flip k2's monotonicity
    return max(4.0 * np.log(n / compression) + 24.0, 4.0)


def k2(q, delta, n):
    q = _clamp_q(np.asarray(q, dtype=np.float64))
    return (delta / _z(delta, n)) * np.log(q / (1.0 - q))


def inv_k2(k, delta, n):
    k = np.asarray(k, dtype=np.float64)
    x = np.exp(k * _z(delta, n) / delta)
    return x / (1.0 + x)


def k2_asym(q, delta, n):
    q = np.asarray(q, dtype=np.float64)
    return k2(q / 2.0, 2.0 * delta, n)


def inv_k2_asym(k, delta, n):
    return 2.0 * inv_k2(k, 2.0 * delta, n)


def k2n(q, delta, n):
    scaled = delta * max(np.log10(max(float(n), 10.0)) ** 2, 1.0)
    return k2(q, scaled, n)


def inv_k2n(k, delta, n):
    scaled = delta * max(np.log10(max(float(n), 10.0)) ** 2, 1.0)
    return inv_k2(k, scaled, n)


def k3(q, delta, n):
    q = _clamp_q(np.asarray(q, dtype=np.float64))
    zc = _z(delta, n) / delta
    return np.where(q <= 0.5, np.log(2.0 * q) / zc, -np.log(2.0 * (1.0 - q)) / zc)


def inv_k3(k, delta, n):
    k = np.asarray(k, dtype=np.float64)
    zc = _z(delta, n) / delta
    return np.where(k <= 0, np.exp(k * zc) / 2.0, 1.0 - np.exp(-k * zc) / 2.0)


SCALE_FUNCTIONS = {
    "k0": (k0, inv_k0),
    "k1": (k1, inv_k1),
    "k2": (k2, inv_k2),
    "k2_asym": (k2_asym, inv_k2_asym),
    "k2n": (k2n, inv_k2n),
    "k3": (k3, inv_k3),
}


def get_scale(name: str):
    try:
        return SCALE_FUNCTIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown scale function {name!r}; choose from {sorted(SCALE_FUNCTIONS)}"
        ) from None
