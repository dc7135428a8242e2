"""Round-trip property tests for scale functions, mirroring the
reference's inv_k(k(q)) == q grid tests
(/root/reference/src/t_digest/scale_functions.rs:122-185)."""

import numpy as np
import pytest

from sketchlib.core.scale_functions import SCALE_FUNCTIONS


@pytest.mark.parametrize("name", sorted(SCALE_FUNCTIONS))
@pytest.mark.parametrize("delta", [20.0, 200.0, 3000.0])
def test_roundtrip(name, delta):
    fn, inv = SCALE_FUNCTIONS[name]
    q = np.linspace(0.001, 0.999, 199)
    n = 1_000_000
    back = inv(fn(q, delta, n), delta, n)
    np.testing.assert_allclose(back, q, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", sorted(SCALE_FUNCTIONS))
def test_monotone(name):
    fn, _ = SCALE_FUNCTIONS[name]
    q = np.linspace(0.0, 1.0, 1001)
    k = fn(q, 500.0, 100_000)
    assert np.all(np.diff(k) >= -1e-12)
