"""Sparse Bunch-Kaufman factorization (spBKP kernel role) and the full
3x3 KKT backend over it (Hqp_IpSpBKP role).

Reference parity targets: hqp/spBKP.C:369 (spBKPfactor, 1x1/2x2 pivots,
alpha = (1+sqrt(17))/8 scaled by tol), hqp/spBKP.C:647 (spBKPsolve),
hqp/Hqp_IpSpBKP.C:117-218 (full-KKT assembly, slack scaling, step).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import hqp_tpu
from hqp_tpu.native import SparseBKP, SparseLDL, rcm_order
from hqp_tpu.qp.program import DenseQP
from hqp_tpu.qp.kkt import DenseKKT
from hqp_tpu.qp.kkt_sparse_host import FullSparseBKPKKT
from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.models.nlp_suite import PrgTP383


def _random_sym(rng, n, density=0.15):
    A = sp.random(n, n, density=density,
                  random_state=int(rng.integers(1e6)))
    Ad = (A + A.T).toarray()
    Ad += np.diag(rng.standard_normal(n) * (rng.random(n) > 0.5))
    Ad = (Ad + Ad.T) / 2
    if abs(np.linalg.det(Ad)) < 1e-8:
        Ad += 0.5 * np.eye(n)
    return Ad


def test_bkp_matches_dense_solve():
    """Factor+solve of random symmetric INDEFINITE matrices to machine
    precision (spBKP.C:369 correctness class)."""
    rng = np.random.default_rng(0)
    for _ in range(6):
        n = int(rng.integers(5, 80))
        Ad = _random_sym(rng, n)
        Acs = sp.csr_matrix(Ad)
        Acs.sort_indices()
        f = SparseBKP(n, Acs.indptr, Acs.indices, Acs.data)
        b = rng.standard_normal(n)
        x = f.solve(b)
        xr = np.linalg.solve(Ad, b)
        np.testing.assert_allclose(x, xr, atol=1e-9 * max(
            1.0, np.max(np.abs(xr))))


def test_bkp_handles_zero_diagonal_saddle():
    """The robustness class the pivot-free LDL' cannot reach: a leading
    zero diagonal forces a 2x2 pivot (the BKP '2x2 block' case,
    spBKP.C:487)."""
    K = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))
    ldl = SparseLDL(2, K.indptr, K.indices)
    with pytest.raises(ArithmeticError):
        ldl.factor(K.data, reg=0.0)

    f = SparseBKP(2, K.indptr, K.indices, K.data)
    x = f.solve(np.array([3.0, 4.0]))
    np.testing.assert_allclose(x, [4.0, 3.0])
    assert f.n_2x2 == 1


def test_bkp_interchange_path():
    """A matrix whose BK test requires the row/col interchange branch
    (spBKP.C:480-482): tiny leading diagonal, dominant remote pivot."""
    Ad = np.array([
        [1e-12, 2.0, 0.0],
        [2.0, 5.0, 1.0],
        [0.0, 1.0, 3.0]])
    Acs = sp.csr_matrix(Ad)
    Acs.sort_indices()
    f = SparseBKP(3, Acs.indptr, Acs.indices, Acs.data)
    b = np.array([1.0, -2.0, 0.5])
    np.testing.assert_allclose(f.solve(b), np.linalg.solve(Ad, b),
                               atol=1e-10)


def test_bkp_extreme_barrier_spread():
    """IP-style 3x3 KKT with slack diagonals spanning 1e-8..1e8 solves
    to small residual without regularization (the late-barrier
    conditioning class Hqp_IpSpBKP faces every iteration)."""
    rng = np.random.default_rng(1)
    n, me, mi = 40, 10, 20
    Q = _random_sym(rng, n, 0.2) * 0.1 + 2 * np.eye(n)
    A = rng.standard_normal((me, n))
    C = rng.standard_normal((mi, n))
    D = np.diag(10.0 ** rng.uniform(-8, 8, mi))
    K = np.block([
        [-Q, A.T, C.T],
        [A, np.zeros((me, me)), np.zeros((me, mi))],
        [C, np.zeros((mi, me)), D]])
    Acs = sp.csr_matrix(K)
    Acs.sort_indices()
    N = K.shape[0]
    p = rcm_order(N, Acs.indptr, Acs.indices)
    Kp = Acs[p][:, p].tocsr()
    Kp.sort_indices()
    f = SparseBKP(N, Kp.indptr, Kp.indices, Kp.data)
    b = rng.standard_normal(N)
    x = np.empty(N)
    x[p] = f.solve(b[p])
    res = np.max(np.abs(K @ x - b)) / np.max(np.abs(b))
    assert res < 1e-8


def test_full_bkp_backend_matches_dense_backend():
    """FullSparseBKPKKT directions equal DenseKKT's through a complete
    Mehrotra solve (Hqp_IpSpBKP.C:139-218 contract)."""
    rng = np.random.default_rng(0)
    n, me, mi = 30, 8, 20
    M = rng.standard_normal((n, n)) * 0.3
    Q = jnp.asarray(M @ M.T + np.eye(n))
    c = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((me, n)))
    b = jnp.asarray(rng.standard_normal(me) * 0.1)
    C = jnp.asarray(rng.standard_normal((mi, n)))
    d = jnp.asarray(1.0 + rng.random(mi))
    qp = DenseQP.build(Q, c, A=A, b=b, C=C, d=d)

    s1 = ip.Mehrotra(backend=DenseKKT())
    st1 = s1.solve(qp, s1.init_state(qp))
    s2 = ip.Mehrotra(backend=FullSparseBKPKKT(), jit=False)
    st2 = s2.solve(qp, s2.init_state(qp))
    assert int(st1.result) == ip.OPTIMAL
    assert int(st2.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               atol=1e-6)


def test_full_bkp_backend_eager_autoselect():
    """Selecting the eager-only backend through the registry/with_backend
    seam must drop Mehrotra to eager instead of a tracer crash."""
    from hqp_tpu.utils.registry import modules
    be = modules.create("qp_mat_solver", "SpBKP")
    assert isinstance(be, FullSparseBKPKKT)
    s = ip.Mehrotra()           # jit defaults True
    s2 = s.with_backend(be)
    assert s2.jit is False
    s3 = ip.Mehrotra(backend=be)
    assert s3.jit is False


def test_tp383_via_full_bkp():
    """Full SQP over the full-KKT BKP path (the reference's
    `qp_mat_solver SpBKP` flow)."""
    s = SqpPowell(PrgTP383(), max_iters=60,
                  qp_solver=ip.Mehrotra(eps=1e-9, max_iters=50,
                                        jit=False),
                  kkt_backend=FullSparseBKPKKT())
    s.init()
    assert s.solve() == "optimal"
    np.testing.assert_allclose(float(s.f), 728565.5, rtol=1e-4)
