"""Hypothesis property tests for the merge algebra (north rule):
associativity / commutativity / identity across random splits and
merge-tree shapes — exact state equality for the set-semantics sketches
(HLL / CMS / Bloom), epsilon-equivalence for the quantile sketches."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sketchlib.core.bloom import BloomFilter
from sketchlib.core.cms import CountMinSketch
from sketchlib.core.hashing import hash_i64
from sketchlib.core.hll import HyperLogLog
from sketchlib.core.kll import KLL
from sketchlib.core.oracle import LinearOracle
from sketchlib.core.tdigest import TDigest

FAST = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

keys_strategy = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=300
)
split_strategy = st.integers(min_value=1, max_value=5)


def _split(arr, n_parts, rng_seed):
    rng = np.random.default_rng(rng_seed)
    if len(arr) == 0:
        return [arr] * n_parts
    cuts = np.sort(rng.integers(0, len(arr), max(n_parts - 1, 0)))
    return np.split(np.asarray(arr), cuts)


@FAST
@given(keys=keys_strategy, parts=split_strategy, seed=st.integers(0, 99))
def test_hll_merge_equals_single_build(keys, parts, seed):
    full = HyperLogLog(p=8)
    full.add_hashes(hash_i64(np.array(keys, dtype=np.int64)))
    merged = HyperLogLog(p=8)
    order = list(range(parts))
    np.random.default_rng(seed).shuffle(order)
    chunks = _split(keys, parts, seed)
    for i in order:
        sub = HyperLogLog(p=8)
        sub.add_hashes(hash_i64(np.array(chunks[i], dtype=np.int64)))
        merged.merge(sub)
    np.testing.assert_array_equal(full.registers, merged.registers)


@FAST
@given(keys=keys_strategy, parts=split_strategy, seed=st.integers(0, 99))
def test_cms_merge_equals_single_build(keys, parts, seed):
    full = CountMinSketch(depth=3, width=64)
    full.add_hashes(hash_i64(np.array(keys, dtype=np.int64)))
    merged = CountMinSketch(depth=3, width=64)
    order = list(range(parts))
    np.random.default_rng(seed).shuffle(order)
    chunks = _split(keys, parts, seed)
    for i in order:
        sub = CountMinSketch(depth=3, width=64)
        sub.add_hashes(hash_i64(np.array(chunks[i], dtype=np.int64)))
        merged.merge(sub)
    np.testing.assert_array_equal(full.table, merged.table)
    assert full.total == merged.total


@FAST
@given(keys=keys_strategy, parts=split_strategy, seed=st.integers(0, 99))
def test_bloom_merge_equals_single_build(keys, parts, seed):
    full = BloomFilter(1 << 10, k=3)
    full.add_hashes(hash_i64(np.array(keys, dtype=np.int64)))
    merged = BloomFilter(1 << 10, k=3)
    order = list(range(parts))
    np.random.default_rng(seed).shuffle(order)
    chunks = _split(keys, parts, seed)
    for i in order:
        sub = BloomFilter(1 << 10, k=3)
        sub.add_hashes(hash_i64(np.array(chunks[i], dtype=np.int64)))
        merged.merge(sub)
    np.testing.assert_array_equal(full.words, merged.words)


values_strategy = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=2,
    max_size=400,
)


@FAST
@given(values=values_strategy, parts=split_strategy, seed=st.integers(0, 99))
def test_tdigest_merge_rank_epsilon(values, parts, seed):
    arr = np.array(values)
    chunks = _split(arr, parts, seed)
    order = list(range(parts))
    np.random.default_rng(seed).shuffle(order)
    merged = TDigest(delta=200)
    for i in order:
        sub = TDigest(delta=200)
        sub.add_buffer(chunks[i])
        merged.merge(sub)
    assert merged.count == arr.size
    assert merged.min == arr.min() and merged.max == arr.max()
    oracle = LinearOracle(arr)
    for q in (0.25, 0.5, 0.75):
        est = merged.value_at_quantile(q)
        # rank sanity with count-based slack (duplicate plateaus on
        # tiny inputs shift the oracle's midpoint-of-equals rank by
        # O(1/n)); tight accuracy bars live in test_tdigest.py
        back = oracle.quantile_at_value(est)
        slack = max(0.15, 3.0 / arr.size)
        assert (
            abs(back - q) <= slack
            or abs(est - oracle.value_at_quantile(q)) <= 1e-9
        )


@FAST
@given(values=values_strategy, parts=split_strategy, seed=st.integers(0, 99))
def test_kll_merge_count_and_bounds(values, parts, seed):
    arr = np.array(values)
    chunks = _split(arr, parts, seed)
    order = list(range(parts))
    np.random.default_rng(seed).shuffle(order)
    merged = KLL(k=32, seed=1)
    for i in order:
        sub = KLL(k=32, seed=2 + i)
        sub.add_buffer(chunks[i])
        merged.merge(sub)
    assert merged.count == arr.size
    assert merged.min == arr.min() and merged.max == arr.max()
    # weight conservation: sum of level weights == count
    total = sum(lv.size * (1 << h) for h, lv in enumerate(merged.levels))
    assert total == arr.size


@FAST
@given(values=values_strategy)
def test_serde_identity_tdigest(values):
    d = TDigest(delta=100)
    d.add_buffer(np.array(values))
    rt = TDigest.from_bytes(d.to_bytes())
    assert rt.to_bytes() == d.to_bytes()
