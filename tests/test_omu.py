"""Omuses layer tests: integrator orders + Crane regression."""

import numpy as np
import jax.numpy as jnp
import pytest

import hqp_tpu  # noqa: F401
from hqp_tpu.omu.integrators import Euler, RK4, Dopri5, IMP, GRK4


def F_linear(kk, t, x, u, dx):
    """xdot = A x + b u; solution known in closed form."""
    A = jnp.array([[0.0, 1.0], [-2.0, -0.3]])
    b = jnp.array([0.0, 1.0])
    return A @ x + b * u[0] - dx


def exact(t, x0, u):
    import scipy.linalg as sla
    A = np.array([[0.0, 1.0], [-2.0, -0.3]])
    b = np.array([0.0, 1.0])
    # x(t) = e^{At}x0 + A^-1(e^{At}-I) b u
    E = sla.expm(A * t)
    return E @ x0 + np.linalg.solve(A, (E - np.eye(2)) @ (b * u))


X0 = jnp.array([1.0, -0.5])
U = jnp.array([0.7])
T = 0.8
REF = exact(T, np.asarray(X0), np.asarray(U))


@pytest.mark.parametrize("integ,tol", [
    (Euler(steps=4000), 2e-3),
    (RK4(steps=20), 1e-6),
    (Dopri5(rtol=1e-10, atol=1e-10), 1e-8),
    (IMP(steps=200), 1e-4),
    (GRK4(steps=50), 1e-6),
])
def test_integrator_accuracy(integ, tol):
    xf = integ.solve(F_linear, 0, 0.0, T, X0, U)
    np.testing.assert_allclose(np.asarray(xf), REF, atol=tol)


@pytest.mark.parametrize("integ", [RK4(steps=8), IMP(steps=8),
                                   GRK4(steps=8)])
def test_integrator_sensitivities(integ):
    """Forward-mode sensitivities through the integrator match finite
    differences (the reference's prg_test role, Hqp_SqpProgram.C:116)."""
    import jax

    def roll(x0):
        return integ.solve(F_linear, 0, 0.0, T, x0, U)

    J = jax.jacfwd(roll)(X0)
    eps = 1e-6
    for i in range(2):
        dx = np.zeros(2)
        dx[i] = eps
        fd = (np.asarray(roll(X0 + dx)) - np.asarray(roll(X0 - dx))) \
            / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[:, i], fd, atol=1e-5)


def test_crane():
    """odc Crane minimum-time problem: tf* = 11.675 (cross-validated with
    an independent SLSQP solve of the same discretization, 11.6767)."""
    from hqp_tpu.models.crane import PrgCrane
    from hqp_tpu.sqp.powell import SqpPowell

    prg = PrgCrane(K=50)
    s = SqpPowell(prg, max_iters=100)
    s.init()
    result = s.solve()
    assert result == "optimal"
    np.testing.assert_allclose(float(s.f), 11.6751, rtol=1e-3)
