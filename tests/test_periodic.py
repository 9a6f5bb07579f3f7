"""Periodic controls/states in DynamicOpt (verdict r3 item 7; reference
Prg_DynamicOpt.h:377,382 mdl_u_periodic/mdl_x_periodic, realized through
Hqp_Docp's Periodical state type, hqp/Hqp_Docp.C:497,642).

The TPU realization keeps the stage structure: a constant memory state +
stage-local equality rows at period 0 and the terminal point (see
DynamicOpt.__init__).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.omu.dynamic_opt import DynamicOpt
from hqp_tpu.omu.model import Model
from hqp_tpu.sqp.powell import SqpPowell


class _Forced(Model):
    """Sinusoidally forced double integrator: sdot = v,
    vdot = u + sin(2 pi t)."""

    nx = 2
    nu = 1
    ny = 2
    npar = 0

    def ode(self, t, x, u, p):
        return jnp.array([x[1], u[0] + jnp.sin(2.0 * jnp.pi * t)])


def test_x_periodic_finds_periodic_orbit():
    """With both states periodic and only a u^2 cost, the zero-control
    periodic orbit requires v_0 = -1/(2 pi) (so the position drift
    integral of the forcing cancels); the optimizer must find it from
    the non-periodic initial guess v_0 = 0."""
    prg = DynamicOpt(
        _Forced(), K=8, x0=[0.0, 0.0], x0_fixed=False,
        u_min=[-5.0], u_max=[5.0], u_weight2=[1.0],
        x_periodic=[1, 1],
    )
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    x = np.asarray(s.x)
    # periodicity achieved: x_0 == x_K (both components)
    np.testing.assert_allclose(x[0, :2], x[-1, :2], atol=1e-6)
    # and it is the analytic periodic orbit: u = 0, v_0 = -1/(2 pi)
    assert abs(float(s.f)) < 1e-6
    np.testing.assert_allclose(x[0, 1], -1.0 / (2.0 * np.pi), atol=5e-3)


def test_x_periodic_rows_are_load_bearing():
    """The same problem WITHOUT periodicity has a whole manifold of
    zero-cost (u = 0) solutions and the solver lands on a symmetric one
    with s_K - s_0 ~ 0.013 -- four orders above the periodic run's
    1e-6 closure, so the periodicity rows demonstrably did the work."""
    prg = DynamicOpt(
        _Forced(), K=8, x0=[0.0, 0.0], x0_fixed=False,
        u_min=[-5.0], u_max=[5.0], u_weight2=[1.0],
    )
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    x = np.asarray(s.x)
    assert abs(x[0, 0] - x[-1, 0]) > 5e-3   # open endpoints


class _DIC(Model):
    nx = 2
    nu = 1
    ny = 2
    npar = 0

    def ode(self, t, x, u, p):
        return jnp.array([u[0], x[0]])


def test_u_periodic_closes_the_control():
    """Piecewise-linear control (u_order=1) tracking a mid-horizon
    position reference: with u_periodic the control knots at t=0 and
    t=1 must coincide."""
    kw = dict(K=6, x0=[0.0, 0.0],
              u_min=[-20.0], u_max=[20.0],
              y_ref=[0.0, 0.5], y_weight2=[0.0, 10.0],
              u_weight2=[1e-4], u_order=1)
    per = DynamicOpt(_DIC(), u_periodic=[1], **kw)
    s = SqpPowell(per, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    x = np.asarray(s.x)
    iu = per._iu0
    assert abs(x[0, iu] - x[-1, iu]) < 1e-6

    plain = DynamicOpt(_DIC(), **kw)
    s2 = SqpPowell(plain, max_iters=60)
    s2.init()
    assert s2.solve() == "optimal"
    x2 = np.asarray(s2.x)
    assert abs(x2[0, iu] - x2[-1, iu]) > 1e-3   # open control ends


def test_u_periodic_requires_control_state():
    with pytest.raises(ValueError, match="u_periodic"):
        DynamicOpt(_DIC(), K=4, u_periodic=[1])
