"""ODE/DAE integrators with differentiable sensitivities.

Re-creates the reference's integrator family (omu/Omu_Integrator.{h,C} and
subclasses) the TPU way: each integrator advances a sample period under
``jit``/``vmap`` (batched over all stages at once -- replacing the OpenMP
stage loop), and sensitivities come from JAX forward-mode differentiation
*through* the integrator instead of hand-propagated sensitivity ODEs
(omu/Omu_IntODE.C:118-346 packs state+sensitivity columns; here jacfwd
does the packing).  Implicit methods use ``lax.custom_root`` so
sensitivities come from the implicit function theorem rather than
differentiating Newton iterations (the strategy SURVEY.md section 7
prescribes for the Omu_IntIMP/SDIRK ports).

The model interface is the implicit residual of the reference
(omu/Omu_Program.h continuous):  F(kk, t, x, u, dx) = 0, with dx entering
linearly; explicit models are written F = f(x, u) - dx, and explicit
integrators recover  xdot = F(kk, t, x, u, 0)  exactly like
Omu_IntODE::syseq.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils.registry import modules


class Integrator:
    """Base integrator (Omu_Integrator analog).

    solve(F, kk, t0, t1, x, u) -> x(t1), where F is the implicit residual.
    """

    def __init__(self, stepsize: float = 0.0, steps: int = 1,
                 rtol: float = 1e-8, atol: float = 1e-8):
        self.stepsize = stepsize
        self.steps = steps
        self.rtol = rtol
        self.atol = atol

    def _xdot(self, F, kk, t, x, u):
        return F(kk, t, x, u, jnp.zeros_like(x))

    def solve(self, F, kk, t0, t1, x, u):
        raise NotImplementedError


@modules.register("prg_integrator", "Euler")
class Euler(Integrator):
    """Fixed-step explicit Euler (omu/Omu_IntEuler.C)."""

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps

        def body(i, xs):
            t = t0 + i * h
            return xs + h * self._xdot(F, kk, t, xs, u)

        return jax.lax.fori_loop(0, self.steps, body, x)


@modules.register("prg_integrator", "RK4")
class RK4(Integrator):
    """Fixed-step classical Runge-Kutta (omu/Omu_IntRK4.C)."""

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps

        def body(i, xs):
            t = t0 + i * h
            k1 = self._xdot(F, kk, t, xs, u)
            k2 = self._xdot(F, kk, t + 0.5 * h, xs + 0.5 * h * k1, u)
            k3 = self._xdot(F, kk, t + 0.5 * h, xs + 0.5 * h * k2, u)
            k4 = self._xdot(F, kk, t + h, xs + h * k3, u)
            return xs + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        return jax.lax.fori_loop(0, self.steps, body, x)


# Dormand-Prince 5(4) tableau (same pair as omu/Omu_IntDopri5.C, the
# Hairer/Wanner dopri5 port)
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                    11 / 84, 0.0])
_DP_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                    -92097 / 339200, 187 / 2100, 1 / 40])


@modules.register("prg_integrator", "Dopri5")
class Dopri5(Integrator):
    """Adaptive Dormand-Prince RK45 (omu/Omu_IntDopri5.C) as a
    ``lax.while_loop`` with PI step control; forward-differentiable."""

    def __init__(self, max_steps: int = 1000, **kw):
        super().__init__(**kw)
        self.max_steps = max_steps

    def solve(self, F, kk, t0, t1, x, u):
        rtol, atol = self.rtol, self.atol
        span = t1 - t0

        def fstep(t, xs, h):
            ks = []
            for i in range(7):
                xi = xs
                for j, a in enumerate(_DP_A[i]):
                    xi = xi + h * a * ks[j]
                ks.append(self._xdot(F, kk, t + _DP_C[i] * h, xi, u))
            kmat = jnp.stack(ks)
            x5 = xs + h * (_DP_B5 @ kmat)
            x4 = xs + h * (_DP_B4 @ kmat)
            err = jnp.sqrt(jnp.mean(
                ((x5 - x4) / (atol + rtol * jnp.maximum(
                    jnp.abs(xs), jnp.abs(x5)))) ** 2) + 1e-300)
            return x5, err

        def cond(st):
            t, xs, h, n = st
            return (t < t1 - 1e-12 * jnp.abs(span)) & (n < self.max_steps)

        def body(st):
            t, xs, h, n = st
            h = jnp.minimum(h, t1 - t)
            x5, err = fstep(t, xs, h)
            accept = err <= 1.0
            fac = jnp.clip(0.9 * err ** (-0.2), 0.2, 5.0)
            hn = h * fac
            return (jnp.where(accept, t + h, t),
                    jnp.where(accept, x5, xs), hn, n + 1)

        h0 = jnp.where(self.stepsize > 0.0, self.stepsize, span / 10.0)
        t, xs, h, n = jax.lax.while_loop(cond, body, (t0, x, h0, 0))
        return xs


@modules.register("prg_integrator", "IMP")
class IMP(Integrator):
    """Implicit midpoint rule with Newton solve (omu/Omu_IntIMP.C);
    A-stable, for stiff/marginally stable models.  Sensitivities via
    ``lax.custom_root`` (implicit function theorem), replacing the
    reference's hand-rolled sensitivity propagation through the Newton
    solve (Omu_IntIMP.C:416-560)."""

    def __init__(self, newton_iters: int = 8, **kw):
        super().__init__(**kw)
        self.newton_iters = newton_iters

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps

        def step(xs, t):
            tm = t + 0.5 * h

            def res(k):
                # k = xdot at the midpoint: k - f(x + h/2 k) = 0
                return k - self._xdot(F, kk, tm, xs + 0.5 * h * k, u)

            def newton(f, k0):
                def it(i, k):
                    J = jax.jacfwd(f)(k)
                    r = f(k)
                    return k - jnp.linalg.solve(J, r)
                return jax.lax.fori_loop(0, self.newton_iters, it, k0)

            def tangent_solve(g, y):
                return jnp.linalg.solve(jax.jacfwd(g)(y), y)

            k0 = self._xdot(F, kk, t, xs, u)
            k = jax.lax.custom_root(res, k0, newton, tangent_solve)
            return xs + h * k

        def body(i, xs):
            return step(xs, t0 + i * h)

        return jax.lax.fori_loop(0, self.steps, body, x)


# Kaps-Rentrop GRK4A coefficients (the reference's omu/Omu_IntGRK4.C is a
# port of Hairer/Wanner ros4.f with the same family)
_G_GAMMA = 0.395
_G_A = [[0.0], [0.438, 0.0], [0.796920457938, 0.0730795420615, 0.0],
        [0.796920457938, 0.0730795420615, 0.0, 0.0]]
_G_C = [[0.0],
        [-0.767672395484, 0.0],
        [-0.851675323742, 0.522967289188, 0.0],
        [0.288463109545, 0.0880214273381, -0.337389840627, 0.0]]
_G_B = [0.199293275701, 0.482645235674, 0.0680614886256, 0.25]


@modules.register("prg_integrator", "GRK4")
class GRK4(Integrator):
    """4th-order linear-implicit Rosenbrock (Kaps-Rentrop GRK4A), the role
    of omu/Omu_IntGRK4.C for stiff systems; one Jacobian + one
    factorization per step, no Newton iteration."""

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps
        n = x.shape[0]

        def step(xs, t):
            f_of = lambda xx: self._xdot(F, kk, t, xx, u)
            J = jax.jacfwd(f_of)(xs)
            M = jnp.eye(n) - h * _G_GAMMA * J
            lu = jnp.linalg.inv(M)  # small n; explicit inverse, fused

            ks = []
            for i in range(4):
                xi = xs
                for j in range(i):
                    xi = xi + _G_A[i][j] * ks[j]
                rhs = f_of(xi)
                for j in range(i):
                    rhs = rhs + (_G_C[i][j] / h) * ks[j]
                ks.append(h * (lu @ rhs))
            out = xs
            for i in range(4):
                out = out + _G_B[i] * ks[i]
            return out

        def body(i, xs):
            return step(xs, t0 + i * h)

        return jax.lax.fori_loop(0, self.steps, body, x)
