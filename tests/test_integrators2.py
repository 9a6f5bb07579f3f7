"""Tests for the extended integrator family: SDIRK (implicit DAE), BDF
(DASPK role), RKsuite pairs, OdeTs (Taylor series)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.omu.integrators import (
    SDIRK, BDF, RKsuite, OdeTs, Dopri5, RK4)


def _osc(kk, t, x, u, dx):
    """Harmonic oscillator as implicit residual: x0' = x1, x1' = -x0."""
    return jnp.array([x[1] - dx[0], -x[0] - dx[1]])


def _osc_exact(t):
    return np.array([np.cos(t), -np.sin(t)])


X0 = jnp.array([1.0, 0.0])
U = jnp.zeros((0,))


def test_sdirk_accuracy_and_order():
    # error at two resolutions -> slope ~3
    errs = []
    for steps in (8, 16):
        xf = SDIRK(steps=steps).solve(_osc, 0, 0.0, 1.0, X0, U)
        errs.append(np.max(np.abs(np.asarray(xf) - _osc_exact(1.0))))
    order = np.log2(errs[0] / errs[1])
    assert errs[1] < 1e-4
    assert 2.5 < order < 3.7


def test_sdirk_dae_index1():
    """Index-1 DAE: x0' = -x0 + x1, 0 = x1 - x0^2 (algebraic x1).
    Solution satisfies the manifold at every step (stiff accuracy)."""

    def dae(kk, t, x, u, dx):
        return jnp.array([-x[0] + x[1] - dx[0],
                          x[1] - x[0] * x[0]])  # no dx -> algebraic

    x0 = jnp.array([0.5, 0.25])  # consistent start
    xf = SDIRK(steps=20, newton_iters=10).solve(dae, 0, 0.0, 1.0, x0, U)
    xf = np.asarray(xf)
    # algebraic constraint holds at the end
    np.testing.assert_allclose(xf[1], xf[0] ** 2, atol=1e-9)
    # compare the differential state against a dense reference solve of
    # the reduced ODE  z' = -z + z^2
    from scipy.integrate import solve_ivp  # scipy is available via jax deps
    sol = solve_ivp(lambda t, z: [-z[0] + z[0] ** 2], (0, 1), [0.5],
                    rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(xf[0], sol.y[0, -1], atol=1e-5)


def test_sdirk_stiff_stability():
    """L-stable: lambda = -1e4 with large steps stays bounded and decays."""

    def stiff(kk, t, x, u, dx):
        return jnp.array([-1e4 * x[0] - dx[0]])

    xf = SDIRK(steps=4).solve(stiff, 0, 0.0, 1.0, jnp.array([1.0]), U)
    assert abs(float(xf[0])) < 1e-3


def test_bdf_accuracy_and_stiff():
    xf = BDF(steps=64).solve(_osc, 0, 0.0, 1.0, X0, U)
    np.testing.assert_allclose(np.asarray(xf), _osc_exact(1.0), atol=2e-3)

    def stiff(kk, t, x, u, dx):
        return jnp.array([-1e4 * (x[0] - jnp.cos(t)) - dx[0]])

    # stiff relaxation onto cos(t): BDF2 with modest steps tracks it
    xf = BDF(steps=20).solve(stiff, 0, 0.0, 1.0, jnp.array([0.0]), U)
    np.testing.assert_allclose(float(xf[0]), np.cos(1.0), atol=1e-3)


def test_bdf_sensitivities_via_ift():
    """d(xf)/d(x0) of the BDF solve matches the analytic flow Jacobian
    of the linear oscillator (rotation matrix)."""

    def phi(x0):
        return BDF(steps=64).solve(_osc, 0, 0.0, 1.0, x0, U)

    J = np.asarray(jax.jacfwd(phi)(X0))
    R = np.array([[np.cos(1.0), np.sin(1.0)],
                  [-np.sin(1.0), np.cos(1.0)]])
    np.testing.assert_allclose(J, R, atol=5e-3)


def test_rksuite_pairs():
    for method, tol in ((2, 1e-5), (4, 1e-7)):
        it = RKsuite(method=method, rtol=1e-8, atol=1e-8)
        xf = it.solve(_osc, 0, 0.0, 1.0, X0, U)
        np.testing.assert_allclose(np.asarray(xf), _osc_exact(1.0),
                                   atol=tol)


def test_odets_taylor_high_accuracy():
    xf = OdeTs(order=8, steps=4).solve(_osc, 0, 0.0, 1.0, X0, U)
    np.testing.assert_allclose(np.asarray(xf), _osc_exact(1.0), atol=1e-10)


def test_odets_differentiable():
    def phi(x0):
        return OdeTs(order=6, steps=2).solve(_osc, 0, 0.0, 1.0, x0, U)

    J = np.asarray(jax.jacfwd(phi)(X0))
    R = np.array([[np.cos(1.0), np.sin(1.0)],
                  [-np.sin(1.0), np.cos(1.0)]])
    np.testing.assert_allclose(J, R, atol=1e-5)


def test_registry_names():
    from hqp_tpu.utils.registry import modules

    for name in ("Euler", "RK4", "Dopri5", "RKsuite", "IMP", "GRK4",
                 "SDIRK", "BDF", "DASPK", "OdeTs"):
        assert modules.has("prg_integrator", name), name


def test_sdirk_in_optimization():
    """SDIRK drives an OmuProgram end to end (DIC example)."""
    from hqp_tpu.models.hxi_suite import PrgDIC
    from hqp_tpu.sqp.powell import SqpPowell

    prg = PrgDIC(K=8, integrator=SDIRK(steps=1, newton_iters=6))
    s = SqpPowell(prg, max_iters=40)
    s.init()
    assert s.solve() == "optimal"
    prg2 = PrgDIC(K=8)
    s2 = SqpPowell(prg2, max_iters=40)
    s2.init()
    s2.solve()
    np.testing.assert_allclose(float(s.f), float(s2.f), rtol=1e-6)


def test_bdf_krylov_matches_direct():
    """DASPK Krylov option (Omu_IntDASPK.h:112-119, info[12]=1): the
    matrix-free GMRES corrector reproduces the dense-Jacobian Newton
    corrector on the same grid to tight tolerance."""
    xd = BDF(steps=32).solve(_osc, 0, 0.0, 1.0, X0, U)
    xk = BDF(steps=32, krylov=True).solve(_osc, 0, 0.0, 1.0, X0, U)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xd),
                               atol=1e-9)


def test_bdf_krylov_stiff_and_sensitivities():
    """Krylov corrector handles the stiff relaxation and stays
    differentiable through the implicit function theorem."""
    def stiff(kk, t, x, u, dx):
        return jnp.array([-1000.0 * (x[0] - jnp.cos(t)) - dx[0]])

    xf = BDF(steps=20, krylov=True).solve(stiff, 0, 0.0, 1.0,
                                          jnp.array([0.0]), U)
    assert abs(float(xf[0]) - np.cos(1.0)) < 2e-2

    def flow(x0):
        return BDF(steps=32, krylov=True).solve(_osc, 0, 0.0, 1.0, x0, U)

    J = jax.jacfwd(flow)(X0)
    t = 1.0
    Jex = np.array([[np.cos(t), np.sin(t)], [-np.sin(t), np.cos(t)]])
    np.testing.assert_allclose(np.asarray(J), Jex, atol=5e-3)


def test_bdf_varorder_inherits_krylov():
    """The Krylov switch is orthogonal to order/step selection, like
    DASPK's: BDFVarOrder(krylov=True) matches its direct variant."""
    from hqp_tpu.omu.integrators import BDFVarOrder
    xd = BDFVarOrder(rtol=1e-7, atol=1e-12).solve(
        _osc, 0, 0.0, 1.0, X0, U)
    xk = BDFVarOrder(rtol=1e-7, atol=1e-12, krylov=True).solve(
        _osc, 0, 0.0, 1.0, X0, U)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xd),
                               atol=1e-7)
