"""Host-sparse KKT backend through the eager interior point (CUTE-scale
general NLP path)."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.qp.program import DenseQP
from hqp_tpu.qp.kkt_sparse_host import SparseHostKKT
from hqp_tpu.qp.kkt import DenseKKT
from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.models.nlp_suite import PrgTP383


def test_host_backend_matches_dense_backend():
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
    s2 = ip.Mehrotra(backend=SparseHostKKT(), jit=False)
    st2 = s2.solve(qp, s2.init_state(qp))

    assert int(st1.result) == ip.OPTIMAL
    assert int(st2.result) == ip.OPTIMAL
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               atol=1e-6)


def test_tp383_via_host_sparse():
    """Full SQP over the native sparse path (CUTE-style flow)."""
    s = SqpPowell(PrgTP383(), max_iters=60,
                  qp_solver=ip.Mehrotra(eps=1e-9, max_iters=50,
                                        jit=False),
                  kkt_backend=SparseHostKKT())
    s.init()
    assert s.solve() == "optimal"
    np.testing.assert_allclose(float(s.f), 728565.5, rtol=1e-4)
