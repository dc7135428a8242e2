"""Mergeable uniform sample via the bottom-k construction.

Every item receives a uniform 64-bit key derived from (seed, stream
position, value bits) — seeded, so rebuilds reproduce the sample, yet
partition-unique: two summaries built with the same seed over
different data produce independent key streams (position alone is NOT
enough: same-seed partitions would then share one key stream and the
merged bottom-k would select the same positions from every
partition).  The summary keeps the ``capacity`` items with the
smallest keys.  The bottom-k of a union is the bottom-k of the
concatenated summaries, so merge = concatenate + re-select — exactly
associative/commutative, and the kept set is a uniform random
k-subset WITHOUT replacement of everything ever added (the property a
naive merged reservoir loses).  This is the standard distributed
uniform-sampling summary (bottom-k / KMV family).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.core.hashing import mix_seed

_MAGIC = b"RS03"


class ReservoirSample:
    """Uniform sample of a float64 stream (bottom-k construction).

    ``salt`` de-correlates same-seed builders over replicated shards:
    keys are splitmix64(seed ^ salt ^ index ^ value bits), so two
    builders holding the SAME value at the SAME local position with
    different salts draw independent keys (with salt 0 such copies
    would be included/excluded jointly by the merged bottom-k).
    Construction is PURE — same args, same state, anywhere; the Spark
    layer injects a partition-unique salt through the factory
    (``sketchlib.spark.aggregate.task_partition_salt``), keeping this
    module free of pyspark."""

    __slots__ = ("capacity", "seed", "salt", "keys", "values", "count")

    def __init__(self, capacity: int = 1024, seed: int = 42, salt: int = 0):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.seed = int(seed)
        self.salt = int(salt)
        self.keys = np.empty(0, dtype=np.uint64)
        self.values = np.empty(0, dtype=np.float64)
        self.count = 0

    # ------------------------------------------------------------------- build

    def add_buffer(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        # keys = splitmix64 over (seed, absolute index, value bits):
        # vectorized, independent of numpy Generator internals, and
        # data-dependent so same-seed builders over different shards
        # emit independent key streams (see module docstring)
        from sketchlib.core.hashing import splitmix64

        base = mix_seed(self.seed, self.salt, 0x5EED)
        idx = np.arange(self.count, self.count + v.size, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos_keys = splitmix64(idx ^ np.uint64(base))
            new_keys = splitmix64(v.view(np.uint64) ^ pos_keys)
        self.count += v.size
        self._absorb(new_keys, v)

    def _absorb(self, keys: np.ndarray, vals: np.ndarray) -> None:
        k = np.concatenate([self.keys, keys])
        m = np.concatenate([self.values, vals])
        if k.size > self.capacity:
            sel = np.argpartition(k, self.capacity - 1)[: self.capacity]
            k, m = k[sel], m[sel]
        self.keys, self.values = k, m

    # ------------------------------------------------------------------- merge

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        if other.capacity != self.capacity:
            raise ValueError("cannot merge reservoirs of different capacity")
        self.count += other.count
        self._absorb(other.keys, other.values)
        return self

    # ----------------------------------------------------------------- queries

    def sample(self) -> np.ndarray:
        return self.values

    # ------------------------------------------------------------------- serde

    def owned_size(self) -> int:
        return len(self.to_bytes())

    def to_bytes(self) -> bytes:
        # canonical order so serialized state is independent of the
        # absorb/merge sequence (bit-identical resume)
        order = np.argsort(self.keys, kind="stable")
        return (
            struct.pack(
                "<4s i q q q q", _MAGIC, self.capacity, self.seed, self.salt,
                self.count, self.values.size,
            )
            + self.keys[order].tobytes()
            + self.values[order].tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "ReservoirSample":
        if bytes(data[:4]) == b"RS02":  # legacy: no salt field
            hdr = struct.calcsize("<4s i q q q")
            _m, cap, seed, count, n = struct.unpack("<4s i q q q", data[:hdr])
            salt = 0
        else:
            hdr = struct.calcsize("<4s i q q q q")
            magic, cap, seed, salt, count, n = struct.unpack(
                "<4s i q q q q", data[:hdr]
            )
            if magic != _MAGIC:
                raise ValueError("not a ReservoirSample blob")
        sk = cls(capacity=cap, seed=seed, salt=salt)
        off = hdr
        sk.keys = np.frombuffer(data, np.uint64, n, off).copy()
        off += 8 * n
        sk.values = np.frombuffer(data, np.float64, n, off).copy()
        sk.count = count
        return sk
