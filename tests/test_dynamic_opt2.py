"""Prg_DynamicOpt full formulation (round-2 verdict item 5).

Covers the features the round-1 review found missing against
omu/Prg_DynamicOpt.h: slack-variable soft constraints with linear (L1)
weights (h:85-89, 201-223), piecewise-linear controls mdl_u_order=1
(h:317), free final time via t_scale (h:321-324), du rate weights, and
decimation (h:233-240).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.omu.model import Model
from hqp_tpu.omu.dynamic_opt import DynamicOpt
from hqp_tpu.sqp.powell import SqpPowell


class DIC(Model):
    """Double integrator: states (v, s), input a, outputs = states."""

    nx = 2
    nu = 1
    ny = 2
    npar = 0

    def ode(self, t, x, u, p):
        return jnp.array([u[0], x[0]])


def test_min_time_via_knobs():
    """Minimum-time rest-to-rest transfer of the double integrator with
    |u| <= 1 over distance 1: the bang-bang optimum takes T* = 2.
    Configured purely through DynamicOpt knobs (t_scale free final time +
    final-stage output equality), no hand-written program."""
    prg = DynamicOpt(
        DIC(), K=24, x0=[0.0, 0.0],
        u_min=[-1.0], u_max=[1.0], u_init=[0.5],
        yf_min=[0.0, 1.0], yf_max=[0.0, 1.0],   # v(T) = 0, s(T) = 1
        t_scale=True, t_weight1=1.0,
    )
    s = SqpPowell(prg, max_iters=80)
    s.init()
    assert s.solve() == "optimal"
    T = float(np.asarray(s.x)[-1, prg._iT])
    # piecewise-constant u at K=24 reaches close to the bang-bang bound
    assert 1.99 < T < 2.15, T
    # terminal conditions hold
    np.testing.assert_allclose(np.asarray(s.x)[-1, :2], [0.0, 1.0],
                               atol=1e-5)


def test_soft_l1_vs_quadratic():
    """The L1 (linear) soft-constraint weight is an exact penalty: with it
    the soft bound is satisfied to high accuracy, while a mild quadratic
    weight alone leaves a visible violation -- the L1 term must change
    the solution (the round-1 review's acceptance check)."""

    def solve(s_lin, s_quad):
        prg = DynamicOpt(
            DIC(), K=30, x0=[1.0, 0.0], u_weight2=[0.01],
            yf_ref=[-1.0, 0.0], yf_weight2=[100.0, 100.0],
            y_soft_max=[np.inf, 0.02], s_lin=s_lin, s_quad=s_quad,
        )
        s = SqpPowell(prg, max_iters=80)
        s.init()
        assert s.solve() == "optimal"
        return float(np.asarray(s.x)[:, 1].max()) - 0.02

    viol_quad = solve(0.0, 50.0)
    viol_l1 = solve(50.0, 50.0)
    assert viol_quad > 5e-3          # quadratic alone: visible violation
    assert viol_l1 < viol_quad / 5   # L1 term changes the solution
    assert viol_l1 < 8e-3


def test_u_order1_piecewise_linear():
    """mdl_u_order = 1: the control is a continuous piecewise-linear
    ramp (a state), du is the decision variable.  The du rate weight
    smooths the profile."""
    prg = DynamicOpt(
        DIC(), K=20, x0=[1.0, 0.0],
        u_order=1, du_weight2=[1e-4],
        yf_ref=[-1.0, 0.0], yf_weight2=[100.0, 100.0],
    )
    assert prg._u_state and prg.nx == 3
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    xK = np.asarray(s.x)[-1, :2]
    np.testing.assert_allclose(xK, [-1.0, 0.0], atol=0.05)
    # the ramp knots are states: stored continuously in the iterate
    u_knots = np.asarray(s.x)[:, prg._iu0]
    assert np.all(np.isfinite(u_knots))
    # du decision variables bounded rate => no jumps beyond du * dt
    assert np.max(np.abs(np.diff(u_knots))) < 10.0


def test_du_penalty_piecewise_const():
    """u_order = 0 with a du weight: previous-control tracking state,
    discrete difference penalty."""
    prg = DynamicOpt(
        DIC(), K=20, x0=[1.0, 0.0], u_weight2=[0.01],
        du_weight2=[0.1],
        yf_ref=[-1.0, 0.0], yf_weight2=[100.0, 100.0],
    )
    assert prg._u_state and prg.u_order == 0
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"

    prg0 = DynamicOpt(
        DIC(), K=20, x0=[1.0, 0.0], u_weight2=[0.01],
        yf_ref=[-1.0, 0.0], yf_weight2=[100.0, 100.0],
    )
    s0 = SqpPowell(prg0, max_iters=60)
    s0.init()
    assert s0.solve() == "optimal"
    # the rate penalty smooths the control sequence: compare the total
    # variation of the control column of the iterate v = (x, u)
    uc_pen = np.asarray(s.x)[:-1, prg.nx]
    uc_ref = np.asarray(s0.x)[:-1, prg0.nx]
    assert np.abs(np.diff(uc_pen)).sum() < np.abs(np.diff(uc_ref)).sum()


def test_decimation_maps_to_sample_periods():
    prg = DynamicOpt(DIC(), K=10, decimation=3, x0=[1.0, 0.0],
                     u_weight2=[0.01], yf_ref=[-1.0, 0.0],
                     yf_weight2=[10.0, 10.0])
    assert prg.sps == 3
    s = SqpPowell(prg, max_iters=40)
    s.init()
    assert s.solve() == "optimal"
