"""SymDigest / RankCombinedGroup wrappers (sym_digest.rs:83-278,
parallel_digest.rs:113-311) and the accuracy-search harness
(util/mod.rs:155-242; examples/accuracy.rs:450-543)."""

import numpy as np
import pytest

from sketchlib.core.harness import opt_accuracy_parameter, sample_accuracy
from sketchlib.core.kll import KLL
from sketchlib.core.oracle import LinearOracle
from sketchlib.core.rc_sketch import RCSketch
from sketchlib.core.tdigest import TDigest
from sketchlib.core.wrappers import RankCombinedGroup, SymDigest
from tests.conftest import make_values


def test_sym_digest_both_tails():
    # sym_digest.rs: both tails get low-quantile accuracy
    values = make_values("uniform", 500_000)
    sym = SymDigest(lambda: KLL(k=100))
    sym.add_buffer(values)
    oracle = LinearOracle(values)
    for q in (0.0005, 0.005, 0.995, 0.9995):
        true = oracle.value_at_quantile(q)
        est = sym.value_at_quantile(q)
        assert abs(est - true) / max(abs(true), 1.0) <= 0.005, (q, est, true)


def test_sym_digest_rank_direction_and_merge():
    values = make_values("uniform", 100_000)
    parts = np.array_split(values, 4)
    syms = []
    for p in parts:
        s = SymDigest(lambda: KLL(k=100))
        s.add_buffer(p)
        syms.append(s)
    merged = syms[0]
    for s in syms[1:]:
        merged.merge(s)
    assert merged.count == 100_000
    oracle = LinearOracle(values)
    for v in (50.0, 500.0, 950.0):
        assert abs(merged.quantile_at_value(v) - oracle.quantile_at_value(v)) <= 0.01


def test_rank_combined_group_additivity():
    # parallel_digest.rs:44-51: rank queries additive across disjoint
    # sub-sketches; bisection inverse (53-80)
    values = make_values("uniform", 200_000)
    parts = np.array_split(values, 4)
    sks = []
    for p in parts:
        d = TDigest(delta=1000)
        d.add_buffer(p)
        sks.append(d)
    grp = RankCombinedGroup(sks)
    oracle = LinearOracle(values)
    for v in (100.0, 500.0, 900.0):
        assert abs(grp.quantile_at_value(v) - oracle.quantile_at_value(v)) <= 0.005
    for q in (0.1, 0.5, 0.9):
        true = oracle.value_at_quantile(q)
        assert abs(grp.value_at_quantile(q) - true) / abs(true) <= 0.01


def test_rank_combined_singletons_bisection():
    # parallel_digest.rs:291-310: singleton exactness through bisection
    sks = []
    for v in (1.0, 2.0, 8.0, 0.5):
        d = TDigest(delta=100)
        d.add_buffer(np.array([v]))
        sks.append(d)
    grp = RankCombinedGroup(sks)
    for q, expect in ((0.2, 0.5), (0.45, 1.0), (0.7, 2.0), (0.95, 8.0)):
        assert abs(grp.value_at_quantile(q) - expect) <= 1e-4


def test_sample_accuracy_shapes_and_determinism():
    errs1 = sample_accuracy(
        lambda: TDigest(delta=500), lambda n, rng: rng.uniform(0, 1000, n),
        n=20_000, quantiles=[0.25, 0.5, 0.75], trials=5,
    )
    errs2 = sample_accuracy(
        lambda: TDigest(delta=500), lambda n, rng: rng.uniform(0, 1000, n),
        n=20_000, quantiles=[0.25, 0.5, 0.75], trials=5,
    )
    assert errs1.shape == (5, 3)
    np.testing.assert_array_equal(errs1, errs2)  # seeded


def test_opt_accuracy_parameter_finds_small_k():
    # bisect KLL k until rank error <= 0.01 at mid quantiles in >= 90%
    # of trials (util/mod.rs:155-205 pattern)
    best = opt_accuracy_parameter(
        make_sketch=lambda k: KLL(k=max(int(k), 4)),
        gen=lambda n, rng: rng.uniform(0, 1000, n),
        n=50_000,
        quantiles=[0.25, 0.5, 0.75],
        max_errors=[0.01, 0.01, 0.01],
        lo=4,
        hi=512,
        trials=8,
    )
    assert 4 <= best < 512
    # and the found parameter actually passes
    errs = sample_accuracy(
        lambda: KLL(k=max(int(best), 4)),
        lambda n, rng: rng.uniform(0, 1000, n),
        n=50_000, quantiles=[0.25, 0.5, 0.75], trials=8, mode="rank",
    )
    assert ((errs <= 0.01).all(axis=1)).mean() >= 0.9


def test_opt_accuracy_parameter_rejects_impossible():
    with pytest.raises(ValueError):
        opt_accuracy_parameter(
            make_sketch=lambda k: KLL(k=max(int(k), 4)),
            gen=lambda n, rng: rng.uniform(0, 1000, n),
            n=50_000,
            quantiles=[0.5],
            max_errors=[1e-9],
            lo=4,
            hi=8,
            trials=3,
        )


def test_rc_in_rank_group():
    # mixed sketch kinds in one combined group (all expose the trait
    # surface of traits.rs:3-34)
    values = make_values("uniform", 100_000)
    parts = np.array_split(values, 2)
    a = RCSketch(input_length=parts[0].size, k=100)
    a.add_buffer(parts[0])
    b = KLL(k=100)
    b.add_buffer(parts[1])
    grp = RankCombinedGroup([a, b])
    oracle = LinearOracle(values)
    assert abs(grp.quantile_at_value(500.0) - oracle.quantile_at_value(500.0)) <= 0.01


def test_multi_digest_ensemble():
    from sketchlib.core.wrappers import MultiDigest

    values = make_values("uniform", 100_000)
    md = MultiDigest([lambda: TDigest(delta=500), lambda: KLL(k=100)])
    md.add_buffer(values)
    assert md.count == 100_000
    oracle = LinearOracle(values)
    for q in (0.25, 0.5, 0.75):
        true = oracle.value_at_quantile(q)
        assert abs(md.value_at_quantile(q) - true) / abs(true) <= 0.01
    # merge composes member-wise
    md2 = MultiDigest([lambda: TDigest(delta=500), lambda: KLL(k=100)])
    md2.add_buffer(values[:100])
    md.merge(md2)
    assert md.count == 100_100
