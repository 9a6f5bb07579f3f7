"""Interior-point solver tests on QPs with known solutions."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.qp.program import DenseQP, StageQP
from hqp_tpu.qp.kkt import DenseKKT, RiccatiKKT
from hqp_tpu.qp import mehrotra as ip


def solve_dense(qp, **kw):
    s = ip.Mehrotra(backend=DenseKKT(), **kw)
    st = s.init_state(qp)
    st = s.solve(qp, st)
    return st


def test_box_qp():
    """min 1/2||x||^2 - [3,1]'x  s.t. 0 <= x <= 2  -> x = (2, 1)."""
    Q = jnp.eye(2)
    c = jnp.array([-3.0, -1.0])
    C = jnp.concatenate([jnp.eye(2), -jnp.eye(2)])
    d = jnp.array([0.0, 0.0, 2.0, 2.0])
    qp = DenseQP.build(Q, c, C=C, d=d)
    st = solve_dense(qp)
    assert int(st.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), [2.0, 1.0], atol=1e-7)


def test_eq_qp():
    """min 1/2||x||^2 s.t. x0 + x1 = 1, x >= 0 -> x = (.5, .5)."""
    Q = jnp.eye(2)
    c = jnp.zeros(2)
    A = jnp.array([[1.0, 1.0]])
    b = jnp.array([-1.0])  # Ax + b = 0
    C = jnp.eye(2)
    d = jnp.zeros(2)
    qp = DenseQP.build(Q, c, A=A, b=b, C=C, d=d)
    st = solve_dense(qp)
    assert int(st.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), [0.5, 0.5], atol=1e-7)


def test_active_ineq_qp():
    """min 1/2||x||^2  s.t. x0 >= 1, x <= 5  -> x = (1, 0), z0 = 1.

    (A single inequality row degenerates Mehrotra's adaptive stepsize --
    mu_pl collapses when the only pair hits the boundary -- in the
    reference exactly as here; its problems always carry several rows.)
    """
    Q = jnp.eye(2)
    c = jnp.zeros(2)
    C = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
    d = jnp.array([-1.0, 5.0, 5.0])
    qp = DenseQP.build(Q, c, C=C, d=d)
    st = solve_dense(qp)
    assert int(st.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), [1.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(float(st.z.g[0]), 1.0, atol=1e-6)


def test_stage_lq_tracking():
    """Unconstrained LQ problem through the Riccati backend: compare
    against the dense-lowered solve of the same QP."""
    rng = np.random.default_rng(3)
    K, nx, nu = 6, 2, 1
    K1, nv = K + 1, nx + nu
    Q = np.tile(np.diag([1.0, 1.0, 0.1]), (K1, 1, 1))
    c = rng.standard_normal((K1, nv)) * 0.1
    A = np.tile(np.array([[1.0, 0.1, 0.05], [0.0, 1.0, 0.1]]), (K, 1, 1))
    b = rng.standard_normal((K, nx)) * 0.01
    lb = np.full((K1, nv), -np.inf)
    ub = np.full((K1, nv), np.inf)
    # x0 fixed via tight bounds; loose box elsewhere keeps m > 0
    lb[0, :nx] = ub[0, :nx] = (1.0, 0.0)
    lb[K, nx:] = ub[K, nx:] = 0.0
    lb[:, nx:] = np.where(np.isfinite(lb[:, nx:]), lb[:, nx:], -5.0)
    ub[:, nx:] = np.where(np.isfinite(ub[:, nx:]), ub[:, nx:], 5.0)
    var_mask = np.ones((K1, nv), bool)
    var_mask[K, nx:] = False
    qp = StageQP(
        Q=jnp.asarray(Q), c=jnp.asarray(c), A=jnp.asarray(A),
        b=jnp.asarray(b), lb=jnp.asarray(lb), ub=jnp.asarray(ub),
        C=jnp.zeros((K1, 0, nv)), d_lo=jnp.zeros((K1, 0)),
        d_up=jnp.zeros((K1, 0)),
        var_mask=jnp.asarray(var_mask),
        con_mask=jnp.zeros((K1, 0), bool),
    )
    s = ip.Mehrotra(backend=RiccatiKKT())
    st = s.solve(qp, s.init_state(qp))
    assert int(st.result) == ip.OPTIMAL

    from hqp_tpu.qp.kkt import FullStageKKT
    s2 = ip.Mehrotra(backend=FullStageKKT())
    st2 = s2.solve(qp, s2.init_state(qp))
    assert int(st2.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(st2.x),
                               atol=1e-6)
    # x0 pinned by tight bounds
    np.testing.assert_allclose(np.asarray(st.x)[0, :nx], [1.0, 0.0],
                               atol=1e-6)
