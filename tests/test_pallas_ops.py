"""Unit tests for the Pallas TPU kernels (interpret mode on the CPU
mesh, compiled on real TPU): single-launch block-Thomas solve and the
batched pivoted Gauss-Jordan interior factorization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.ops.thomas_pallas import thomas_solve
from hqp_tpu.ops.gj_pallas import interior_factor


def _tridiag_dense(D, U):
    N, n, _ = D.shape
    T = np.zeros((N * n, N * n))
    for i in range(N):
        T[i*n:(i+1)*n, i*n:(i+1)*n] = D[i]
    for i in range(N - 1):
        T[i*n:(i+1)*n, (i+1)*n:(i+2)*n] = U[i]
        T[(i+1)*n:(i+2)*n, i*n:(i+1)*n] = U[i].T
    return T


@pytest.mark.parametrize("N,n", [(7, 2), (33, 3), (126, 2)])
def test_thomas_solve_vs_dense(N, n):
    rng = np.random.RandomState(0)
    U = rng.randn(N - 1, n, n) * 0.3
    D = np.tile(np.eye(n) * 3.0, (N, 1, 1)) + rng.randn(N, n, n) * 0.1
    D = 0.5 * (D + np.swapaxes(D, -1, -2))
    rhs = rng.randn(N, n)
    x_ref = np.linalg.solve(_tridiag_dense(D, U),
                            rhs.reshape(-1)).reshape(N, n)
    x = thomas_solve(jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs))
    # f32 kernel accuracy on a mildly conditioned SPD system
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=5e-3)


def test_gj_interior_factor_with_pivoting():
    rng = np.random.RandomState(1)
    P, s, b = 11, 17, 4
    M = rng.randn(P, s, s)
    M[:, 0, 0] = 0.0          # forces a pivot swap at step 0
    B = rng.randn(P, s, b)
    Minv, W, S = interior_factor(jnp.asarray(M), jnp.asarray(B))
    res = np.max(np.abs(np.einsum(
        "pij,pjk->pik", np.asarray(Minv, np.float64), M) - np.eye(s)))
    assert res < 1e-3
    Wref = np.linalg.solve(M, B)
    scale = np.abs(Wref).max()
    np.testing.assert_allclose(np.asarray(W), Wref, atol=2e-3 * scale)
    Sref = np.einsum("psb,psc->pbc", B, Wref)
    np.testing.assert_allclose(np.asarray(S), Sref, atol=2e-3 * scale)


def test_gj_chunking_pads_correctly():
    """P not divisible by the VMEM chunk still returns exactly P blocks."""
    from hqp_tpu.ops import gj_pallas

    rng = np.random.RandomState(2)
    P, s, b = 5, 9, 2
    old = gj_pallas.VMEM_BUDGET
    gj_pallas.VMEM_BUDGET = 3 * gj_pallas._padded_bytes(s, s) * 8 + 1
    try:
        M = rng.randn(P, s, s) + 4.0 * np.eye(s)
        B = rng.randn(P, s, b)
        Minv, W, S = interior_factor(jnp.asarray(M), jnp.asarray(B))
        assert Minv.shape[0] == P
        res = np.max(np.abs(np.einsum(
            "pij,pjk->pik", np.asarray(Minv, np.float64), M) - np.eye(s)))
        assert res < 1e-3
    finally:
        gj_pallas.VMEM_BUDGET = old
