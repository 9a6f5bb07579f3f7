"""MPC-style hot start: repeated solves with shifted initial state.

The reference's resume mechanism (SURVEY.md section 5): hqp_solve_hot +
sqp_qp_reinit_bd + Hessian snapshot + IP (z, w) hot pair."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell


def test_mpc_hot_start():
    prg = PrgDID(kmax=60)
    s = SqpPowell(prg, max_iters=50)
    s.init()
    assert s.solve() == "optimal"
    cold_qp_iters = s.qp_iters_total
    f_cold = float(s.f)

    # MPC update: slightly shifted measured initial state
    prg.set_pinned(jnp.array([1.05, 0.0]), stage=0)
    s.qp_iters_total = 0
    assert s.solve_hot() == "optimal"
    hot_qp_iters = s.qp_iters_total
    f_hot = float(s.f)

    # solution moved a little, and the hot re-solve is much cheaper
    assert f_hot == pytest.approx(f_cold, rel=0.2)
    assert hot_qp_iters < cold_qp_iters
    # new initial state is honored exactly
    np.testing.assert_allclose(np.asarray(s.x)[0, :2], [1.05, 0.0],
                               atol=1e-12)
