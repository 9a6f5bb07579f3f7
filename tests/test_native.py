"""Native sparse kernel tests: LDL' vs dense solve, RCM bandwidth."""

import numpy as np
import pytest
import scipy.sparse as sp

import hqp_tpu  # noqa: F401
from hqp_tpu.native import SparseLDL, rcm_order


def random_quasidefinite(n, me, density=0.05, seed=0):
    """[H A'; A -delta I] with H SPD sparse -- the IP reduced KKT shape."""
    rng = np.random.default_rng(seed)
    H = sp.random(n, n, density=density, random_state=rng)
    H = H @ H.T + 2.0 * sp.eye(n)
    A = sp.random(me, n, density=density, random_state=rng) + \
        sp.eye(me, n)
    K = sp.bmat([[H, A.T], [A, -1e-8 * sp.eye(me)]]).tocsr()
    K.sort_indices()
    return K


@pytest.mark.parametrize("n,me", [(50, 20), (300, 100)])
def test_sparse_ldl_matches_dense(n, me):
    K = random_quasidefinite(n, me)
    N = K.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(N)

    f = SparseLDL(N, K.indptr, K.indices).factor(K.data)
    x = f.solve(b)
    x_ref = np.linalg.solve(K.toarray(), b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-8)


def test_rcm_reduces_bandwidth():
    # a ring graph shuffled: RCM should recover a small bandwidth
    n = 200
    rng = np.random.default_rng(2)
    perm = rng.permutation(n)
    rows, cols = [], []
    for i in range(n):
        j = (i + 1) % n
        rows += [perm[i], perm[j], perm[i]]
        cols += [perm[j], perm[i], perm[i]]
    K = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    K.sort_indices()
    p = rcm_order(n, K.indptr, K.indices)
    inv = np.empty(n, dtype=int)
    inv[p] = np.arange(n)
    Kp = K[p][:, p].tocoo()
    bw = np.max(np.abs(Kp.row - Kp.col))
    assert bw <= 3


def test_reg_safeguard():
    """A singular diagonal gets floored instead of failing."""
    K = sp.csr_matrix(np.array([[1.0, 1.0], [1.0, 1.0]]))
    f = SparseLDL(2, K.indptr, K.indices).factor(K.data, reg=1e-8)
    x = f.solve(np.array([1.0, 0.0]))
    assert np.all(np.isfinite(x))
