"""Oracle self-tests — conventions from
/root/reference/src/util/linear_digest.rs:59-131."""

import numpy as np

from sketchlib.core.oracle import LinearOracle


def test_rank_conventions():
    o = LinearOracle([1.0, 2.0, 2.0, 3.0])
    # midpoint-of-equals when >1 equal (linear_digest.rs:91-94)
    assert o.quantile_at_value(2.0) == (1 + 2 / 2.0) / 4
    # single match -> count_leq / n
    assert o.quantile_at_value(1.0) == 1 / 4
    assert o.quantile_at_value(3.0) == 1.0
    assert o.quantile_at_value(0.0) == 0.0


def test_value_at_quantile_round_index():
    o = LinearOracle(np.arange(10, dtype=float))
    # index = round(q*n) clamped (linear_digest.rs:43-52)
    assert o.value_at_quantile(0.0) == 0.0
    assert o.value_at_quantile(1.0) == 9.0
    assert o.value_at_quantile(0.5) == 5.0
