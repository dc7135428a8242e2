"""Accuracy-experiment harness, mirroring the reference's utilities.

* ``sample_accuracy`` — run N randomized trials of build+query vs the
  exact oracle, return per-trial errors
  (/root/reference/src/util/mod.rs:216-242).
* ``opt_accuracy_parameter`` — bisect an accuracy parameter (delta/k)
  until at least ``pass_ratio`` of trials meet the error bound, i.e.
  find the cheapest configuration that meets a rank-error target
  (/root/reference/src/util/mod.rs:155-205).

Unlike the reference these are seeded (CI determinism).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from sketchlib.core.oracle import LinearOracle


def sample_accuracy(
    factory: Callable[[], object],
    gen: Callable[[int, np.random.Generator], np.ndarray],
    n: int,
    quantiles,
    trials: int = 20,
    seed: int = 42,
    mode: str = "value",
) -> np.ndarray:
    """(trials, len(quantiles)) array of absolute errors.

    mode="value": |est_value - true_value| at each quantile;
    mode="rank":  |est_rank - true_rank| at the true quantile values.
    """
    qs = np.atleast_1d(np.asarray(quantiles, dtype=np.float64))
    errs = np.empty((trials, qs.size))
    for t in range(trials):
        rng = np.random.default_rng(seed + t)
        values = np.asarray(gen(n, rng), dtype=np.float64)
        sk = factory()
        sk.add_buffer(values)
        oracle = LinearOracle(values)
        if mode == "value":
            true = oracle.values_at_quantiles(qs)
            est = np.array(
                [float(np.atleast_1d(sk.value_at_quantile(q))[0]) for q in qs]
            )
            errs[t] = np.abs(est - true)
        elif mode == "rank":
            probes = oracle.values_at_quantiles(qs)
            true = oracle.quantiles_at_values(probes)
            est = np.array(
                [float(np.atleast_1d(sk.quantile_at_value(p))[0]) for p in probes]
            )
            errs[t] = np.abs(est - true)
        else:
            raise ValueError(mode)
    return errs


def opt_accuracy_parameter(
    make_sketch: Callable[[float], object],
    gen: Callable[[int, np.random.Generator], np.ndarray],
    n: int,
    quantiles,
    max_errors,
    lo: float,
    hi: float,
    trials: int = 20,
    pass_ratio: float = 0.9,
    seed: int = 42,
    steps: int = 12,
) -> float:
    """Smallest parameter in [lo, hi] whose sketch meets rank-error
    bounds ``max_errors`` at ``quantiles`` in >= pass_ratio of trials."""
    qs = np.atleast_1d(np.asarray(quantiles, dtype=np.float64))
    bounds = np.atleast_1d(np.asarray(max_errors, dtype=np.float64))

    def passes(param: float) -> bool:
        errs = sample_accuracy(
            lambda: make_sketch(param), gen, n, qs, trials=trials, seed=seed,
            mode="rank",
        )
        ok = (errs <= bounds[None, :]).all(axis=1)
        return ok.mean() >= pass_ratio

    if not passes(hi):
        raise ValueError(f"upper bound {hi} does not meet the error target")
    best = hi
    for _ in range(steps):
        mid = (lo + hi) / 2.0
        if passes(mid):
            best = mid
            hi = mid
        else:
            lo = mid
        if hi - lo <= max(1.0, 0.01 * hi):
            break
    return best
