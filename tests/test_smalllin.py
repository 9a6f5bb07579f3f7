"""Unrolled small linear algebra vs numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.ops import smalllin as sl


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 16])
@pytest.mark.parametrize("batch", [(), (7,), (3, 4)])
def test_chol_solve(n, batch):
    rng = np.random.default_rng(n)
    M = rng.standard_normal(batch + (n, n))
    A = M @ np.swapaxes(M, -1, -2) + n * np.eye(n)
    b = rng.standard_normal(batch + (n,))
    B = rng.standard_normal(batch + (n, 2))

    L = sl.chol(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(A),
                               rtol=1e-10, atol=1e-10)
    x = sl.cho_solve(L, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(A, b[..., None])[..., 0],
                               rtol=1e-8, atol=1e-8)
    X = sl.cho_solve(L, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, B),
                               rtol=1e-8, atol=1e-8)
