"""DynamicOpt / DynamicEst formulation tests (Prg_DynamicOpt/Est roles)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.omu.model import Model
from hqp_tpu.omu.dynamic_opt import DynamicOpt
from hqp_tpu.omu.dynamic_est import DynamicEst
from hqp_tpu.omu.integrators import RK4
from hqp_tpu.sqp.powell import SqpPowell


class DIC(Model):
    """Continuous double integrator (odc/sfun_dic.c role):
    states (v, s), input a, outputs = states."""

    nx = 2
    nu = 1
    ny = 2
    npar = 0

    def ode(self, t, x, u, p):
        return jnp.array([u[0], x[0]])


class Decay(Model):
    """dx = -p x; y = x.  One estimated rate parameter."""

    nx = 1
    nu = 0
    ny = 1
    npar = 1
    p0 = (0.5,)

    def ode(self, t, x, u, p):
        return -p[0] * x

    def outputs(self, t, x, u, p):
        return x


def test_dynamic_opt_dic():
    """Drive the double integrator from (1, 0) to ~(-1, 0) with a soft
    terminal objective and a control-energy term."""
    prg = DynamicOpt(
        DIC(), K=40, t0=0.0, tf=1.0,
        x0=[1.0, 0.0],
        u_weight2=[0.01],
        yf_ref=[-1.0, 0.0], yf_weight2=[100.0, 100.0],
    )
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    xK = np.asarray(s.x)[-1, :2]
    np.testing.assert_allclose(xK, [-1.0, 0.0], atol=0.05)


def test_dynamic_opt_soft_constraint():
    """Soft upper bound on the position output keeps the overshoot down."""
    prg = DynamicOpt(
        DIC(), K=40, x0=[1.0, 0.0], u_weight2=[0.01],
        yf_ref=[-1.0, 0.0], yf_weight2=[100.0, 100.0],
        y_soft_max=[np.inf, 0.05], s_quad=1e4,
    )
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    p_max = float(np.asarray(s.x)[:, 1].max())
    assert p_max < 0.08     # soft bound approximately respected


def test_dynamic_est_parameter_recovery():
    """Estimate the decay rate from synthetic measurements of two
    experiments; check recovery and confidence interval."""
    p_true = 1.3
    K = 20
    ts = np.linspace(0.0, 1.0, K + 1)
    x0s = np.array([[1.0], [2.0]])
    ys = np.stack([x0 * np.exp(-p_true * ts)[:, None] for x0 in x0s])

    prg = DynamicEst(Decay(), ys_meas=ys, K=K, t0=0.0, tf=1.0,
                     p_init=[0.5], p_min=[0.0], p_max=[10.0],
                     x0_init=x0s, integrator=RK4(steps=4))
    s = SqpPowell(prg, max_iters=60)
    s.init()
    assert s.solve() == "optimal"
    p_hat = float(np.asarray(s.x)[0, 0])
    np.testing.assert_allclose(p_hat, p_true, rtol=1e-3)

    cov, half = prg.confidence(s.x)
    # noise-free data: tight confidence interval around the estimate
    assert float(half[0]) < 1e-2
