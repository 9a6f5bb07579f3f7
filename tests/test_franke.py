"""Franke path-following IP solver unit tests (dense QP path)."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.qp.program import DenseQP
from hqp_tpu.qp.kkt import DenseKKT
from hqp_tpu.qp.franke import Franke
from hqp_tpu.qp import mehrotra as ip


def solve(qp, **kw):
    s = Franke(backend=DenseKKT(), **kw)
    return s.solve(qp, s.init_state(qp))


def test_box_qp():
    Q = jnp.eye(2)
    c = jnp.array([-3.0, -1.0])
    C = jnp.concatenate([jnp.eye(2), -jnp.eye(2)])
    d = jnp.array([0.0, 0.0, 2.0, 2.0])
    st = solve(DenseQP.build(Q, c, C=C, d=d))
    assert int(st.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), [2.0, 1.0], atol=1e-6)


def test_eq_ineq_qp():
    Q = jnp.eye(2)
    c = jnp.zeros(2)
    A = jnp.array([[1.0, 1.0]])
    b = jnp.array([-1.0])
    C = jnp.eye(2)
    d = jnp.zeros(2)
    st = solve(DenseQP.build(Q, c, A=A, b=b, C=C, d=d))
    assert int(st.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), [0.5, 0.5], atol=1e-6)


def test_agrees_with_mehrotra():
    rng = np.random.default_rng(0)
    n, mi = 6, 8
    M = rng.standard_normal((n, n))
    Q = jnp.asarray(M @ M.T + n * np.eye(n))
    c = jnp.asarray(rng.standard_normal(n))
    C = jnp.asarray(rng.standard_normal((mi, n)))
    d = jnp.asarray(1.0 + rng.random(mi))
    qp = DenseQP.build(Q, c, C=C, d=d)
    st_f = solve(qp)
    s_m = ip.Mehrotra(backend=DenseKKT())
    st_m = s_m.solve(qp, s_m.init_state(qp))
    assert int(st_f.result) == ip.OPTIMAL
    assert int(st_m.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st_f.x), np.asarray(st_m.x),
                               atol=1e-6)
