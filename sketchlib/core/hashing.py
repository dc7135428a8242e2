"""Vectorized 64-bit hashing for sketch inputs.

All hash-based sketches (HLL / CMS / Bloom) operate on pre-hashed
uint64 streams.  In Spark pipelines the hashing happens JVM-side with
``F.xxhash64`` (whole-stage-codegen, no Python cost) and the int64
column is reinterpreted as uint64 here.  For pure-numpy use (unit
tests, oracles) these helpers provide a deterministic, vectorized
splitmix64.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wraps mod 2^64)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash_i64(values, seed: int = 0) -> np.ndarray:
    """Hash an int-like array to uint64 via splitmix64(x ^ seed)."""
    arr = np.asarray(values).astype(np.int64, copy=False).view(np.uint64)
    if seed:
        arr = arr ^ _U64(seed & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(arr)


def hash_f64(values, seed: int = 0) -> np.ndarray:
    """Hash a float64 array by its bit pattern (canonicalizing -0.0 to 0.0)."""
    arr = np.asarray(values, dtype=np.float64)
    arr = np.where(arr == 0.0, 0.0, arr)  # -0.0 -> 0.0
    return hash_i64(arr.view(np.int64), seed)


def hash_str(values, seed: int = 0) -> np.ndarray:
    """Hash a sequence of strings to uint64 (blake2b-8; test-path only).

    Spark pipelines should hash strings JVM-side with F.xxhash64 instead.
    """
    out = np.empty(len(values), dtype=np.uint64)
    sd = seed.to_bytes(8, "little", signed=False) if seed else b""
    for i, s in enumerate(values):
        h = hashlib.blake2b(sd + str(s).encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x==0 -> 64).

    Uses frexp on the float64 conversion (the exponent IS the bit
    length) with an exact correction for the one case float rounding
    overestimates: a value just below a power of two rounds up to it
    (exponent one too high).  ~12x faster than a shift cascade with
    boolean fancy indexing."""
    x = np.asarray(x, dtype=np.uint64)
    _, e = np.frexp(x.astype(np.float64))
    e = e.astype(np.int64)  # candidate bit length (may be +1, or 65)
    # overestimate detection: true bit length b satisfies x >= 2^(b-1);
    # if x < 2^(e-1) the exponent rounded up.  e-1 is clamped to 63 for
    # the shift: e == 65 (x rounded to 2^64) always has true b == 64
    # and x >= 2^63, so the clamped test correctly reports no-over.
    shift = np.clip(e - 1, 0, 63).astype(np.uint64)
    over = (e >= 1) & (e <= 64) & (x < (_U64(1) << shift))
    bl = np.where(over, e - 1, np.minimum(e, 64))
    return np.where(x == 0, 64, 64 - bl)


_M64 = 0xFFFFFFFFFFFFFFFF


def splitmix64_int(x: int) -> int:
    """Scalar splitmix64 on plain Python ints — bit-identical to
    ``splitmix64`` but ~30x faster for single values (no numpy array
    construction / errstate overhead; this is the hot path of KLL
    compaction coins)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def mix_seed(*parts: int) -> int:
    """Deterministically combine integer parts into one 64-bit seed.

    Used to seed per-(lineage, level, counter) RNG so that compaction
    coin flips are reproducible across job resume (SURVEY.md §7.4).
    """
    acc = 0x243F6A8885A308D3
    for p in parts:
        acc = splitmix64_int(acc ^ (int(p) & _M64))
    return acc
