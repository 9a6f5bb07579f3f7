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


def _nan_unless_reached(t, t1, span, xs):
    """Poison a truncated adaptive integration with NaN.

    An adaptive loop that exhausts ``max_steps`` (or whose step controller
    drives h to the clip floor) exits with t < t1; silently returning the
    partial state would corrupt objective/constraint values and their
    gradients with no signal.  NaN propagates into the SQP layer's
    finite-checks, which handle it as a failed model evaluation -- the
    same contract as the reference's DASPK/ros4 IDID/KFLAG failure codes
    (omu/Omu_IntDASPK.C error return; Omu_IntGRK4's m_error on KFLAG<0)."""
    reached = t >= t1 - 1e-10 * jnp.abs(span) - 1e-300
    return jnp.where(reached, xs, jnp.nan)


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

# Bogacki-Shampine 3(2) pair (the low-order pair offered by the
# reference's rksuite wrapper, omu/Omu_IntRKsuite.C method=1)
_BS_C = jnp.array([0.0, 1 / 2, 3 / 4, 1.0])
_BS_A = [
    [],
    [1 / 2],
    [0.0, 3 / 4],
    [2 / 9, 1 / 3, 4 / 9],
]
_BS_B3 = jnp.array([2 / 9, 1 / 3, 4 / 9, 0.0])
_BS_B2 = jnp.array([7 / 24, 1 / 4, 1 / 3, 1 / 8])


class _EmbeddedRK(Integrator):
    """Adaptive embedded RK pair as a ``lax.while_loop`` with step
    control; forward-differentiable.  Subclasses supply the tableau."""

    C = _DP_C
    A = _DP_A
    BHI = _DP_B5
    BLO = _DP_B4
    ERR_ORDER = 5.0  # exponent base for step control

    def __init__(self, max_steps: int = 1000, **kw):
        super().__init__(**kw)
        self.max_steps = max_steps

    def solve(self, F, kk, t0, t1, x, u):
        rtol, atol = self.rtol, self.atol
        span = t1 - t0
        C, A, BHI, BLO = self.C, self.A, self.BHI, self.BLO

        def fstep(t, xs, h):
            ks = []
            for i in range(len(A)):
                xi = xs
                for j, a in enumerate(A[i]):
                    xi = xi + h * a * ks[j]
                ks.append(self._xdot(F, kk, t + C[i] * h, xi, u))
            kmat = jnp.stack(ks)
            xhi = xs + h * (BHI @ kmat)
            xlo = xs + h * (BLO @ kmat)
            err = jnp.sqrt(jnp.mean(
                ((xhi - xlo) / (atol + rtol * jnp.maximum(
                    jnp.abs(xs), jnp.abs(xhi)))) ** 2) + 1e-300)
            return xhi, err

        def cond(st):
            t, xs, h, n = st
            return (t < t1 - 1e-12 * jnp.abs(span)) & (n < self.max_steps)

        def body(st):
            t, xs, h, n = st
            h = jnp.minimum(h, t1 - t)
            xhi, err = fstep(t, xs, h)
            accept = err <= 1.0
            fac = jnp.clip(0.9 * err ** (-1.0 / self.ERR_ORDER), 0.2, 5.0)
            hn = h * fac
            return (jnp.where(accept, t + h, t),
                    jnp.where(accept, xhi, xs), hn, n + 1)

        h0 = jnp.where(self.stepsize > 0.0, self.stepsize, span / 10.0)
        t, xs, h, n = jax.lax.while_loop(cond, body, (t0, x, h0, 0))
        return _nan_unless_reached(t, t1, span, xs)


@modules.register("prg_integrator", "Dopri5")
class Dopri5(_EmbeddedRK):
    """Adaptive Dormand-Prince RK45 (omu/Omu_IntDopri5.C)."""


@modules.register("prg_integrator", "RKsuite")
class RKsuite(_EmbeddedRK):
    """Adaptive RK-pair family in the role of the reference's Fortran
    rksuite wrapper (omu/Omu_IntRKsuite.{h,C} over rksuite/rksuite.f,
    which offers RK(2,3)/RK(4,5)/RK(7,8) under the UT interface):
    ``method=2`` selects the Bogacki-Shampine 3(2) pair, ``method=4``
    (default) the Dormand-Prince 5(4) pair."""

    def __init__(self, method: int = 4, **kw):
        super().__init__(**kw)
        self.method = method
        if method <= 2:
            self.C, self.A = _BS_C, _BS_A
            self.BHI, self.BLO = _BS_B3, _BS_B2
            self.ERR_ORDER = 3.0


def _newton_root(res, z0, iters):
    """Solve res(z) = 0 by damped-free Newton under ``lax.custom_root``
    so differentiation uses the implicit function theorem (the strategy
    replacing the reference's hand-propagated sensitivities through
    Newton solves, omu/Omu_IntIMP.C:416-560, Omu_IntSDIRK.C)."""

    def newton(f, z):
        def it(i, zk):
            J = jax.jacfwd(f)(zk)
            return zk - sl.solve_nopiv(J, f(zk))
        return jax.lax.fori_loop(0, iters, it, z)

    def tangent_solve(g, y):
        return sl.solve_nopiv(jax.jacfwd(g)(y), y)

    return jax.lax.custom_root(res, z0, newton, tangent_solve)


def _newton_root_krylov(res, z0, iters, restart):
    """Matrix-free Newton-Krylov corrector: the DASPK Krylov option
    (omu/Omu_IntDASPK.h:112-119 `_krylov`/`_krylov_prec`, DASPK
    ``info[12]=1``), where corrector linear systems are solved by GMRES
    with J*v products instead of a dense Jacobian factorization.  Here
    J*v is an exact ``jax.jvp`` (no finite-difference noise), GMRES is
    ``jax.scipy.sparse.linalg.gmres``, and sensitivities flow through
    the implicit function theorem exactly as in :func:`_newton_root` --
    the tangent solve is itself matrix-free."""
    import jax.scipy.sparse.linalg as jsl

    def newton(f, z):
        def it(i, zk):
            fz = f(zk)
            mv = (lambda v: jax.jvp(f, (zk,), (v,))[1])
            dz, _ = jsl.gmres(mv, fz, restart=restart, maxiter=2,
                              tol=0.0, atol=0.0)
            return zk - dz
        return jax.lax.fori_loop(0, iters, it, z)

    def tangent_solve(g, y):
        sol, _ = jsl.gmres(g, y, restart=restart, maxiter=2,
                           tol=0.0, atol=0.0)
        return sol

    return jax.lax.custom_root(res, z0, newton, tangent_solve)


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
                    return k - sl.solve_nopiv(J, r)
                return jax.lax.fori_loop(0, self.newton_iters, it, k0)

            def tangent_solve(g, y):
                return sl.solve_nopiv(jax.jacfwd(g)(y), y)

            k0 = self._xdot(F, kk, t, xs, u)
            k = jax.lax.custom_root(res, k0, newton, tangent_solve)
            return xs + h * k

        def body(i, xs):
            return step(xs, t0 + i * h)

        return jax.lax.fori_loop(0, self.steps, body, x)


# Shampine's Rosenbrock parameters (Numerical Recipes "stiff"), same
# linear-implicit 4th-order family as the reference's ros4.f port
# (omu/Omu_IntGRK4.C), including the embedded 3rd-order error estimator
# the Fortran code uses for its step control
_RB_GAM = 0.5
_RB_A21 = 2.0
_RB_A31, _RB_A32 = 48.0 / 25.0, 6.0 / 25.0
_RB_C21 = -8.0
_RB_C31, _RB_C32 = 372.0 / 25.0, 12.0 / 5.0
_RB_C41, _RB_C42, _RB_C43 = -112.0 / 125.0, -54.0 / 125.0, -2.0 / 5.0
_RB_B1, _RB_B2, _RB_B3, _RB_B4 = 19.0 / 9.0, 0.5, 25.0 / 108.0, 125.0 / 108.0
_RB_E1, _RB_E2, _RB_E3, _RB_E4 = 17.0 / 54.0, 7.0 / 36.0, 0.0, 125.0 / 108.0
_RB_C1X, _RB_C2X, _RB_C3X, _RB_C4X = 0.5, -1.5, 121.0 / 50.0, 29.0 / 250.0
_RB_A2X, _RB_A3X = 1.0, 3.0 / 5.0


@modules.register("prg_integrator", "GRK4")
class GRK4(Integrator):
    """4th-order linear-implicit Rosenbrock (Shampine parameters), the role
    of omu/Omu_IntGRK4.C for stiff systems; one Jacobian + one
    factorization per step, no Newton iteration.  Fixed-step driver; the
    embedded step control of the ros4.f port is :class:`GRK4Adaptive`."""

    def _rb_step(self, F, kk, t, xs, u, h):
        """One Rosenbrock step -> (x4, embedded error vector)."""
        n = xs.shape[0]

        def f_of(xx, tt):
            return self._xdot(F, kk, tt, xx, u)

        J = jax.jacfwd(f_of, argnums=0)(xs, t)
        dfdt = jax.jacfwd(f_of, argnums=1)(xs, t)
        M = jnp.eye(n) / (_RB_GAM * h) - J
        lu = sl.lu_nopiv(M)

        g1 = sl.lu_nopiv_solve(lu, f_of(xs, t) + h * _RB_C1X * dfdt)
        g2 = sl.lu_nopiv_solve(
            lu, f_of(xs + _RB_A21 * g1, t + _RB_A2X * h)
            + h * _RB_C2X * dfdt + _RB_C21 * g1 / h)
        x3 = xs + _RB_A31 * g1 + _RB_A32 * g2
        g3 = sl.lu_nopiv_solve(
            lu, f_of(x3, t + _RB_A3X * h) + h * _RB_C3X * dfdt
            + (_RB_C31 * g1 + _RB_C32 * g2) / h)
        g4 = sl.lu_nopiv_solve(
            lu, f_of(x3, t + _RB_A3X * h) + h * _RB_C4X * dfdt
            + (_RB_C41 * g1 + _RB_C42 * g2 + _RB_C43 * g3) / h)
        x4 = xs + _RB_B1 * g1 + _RB_B2 * g2 + _RB_B3 * g3 + _RB_B4 * g4
        err = _RB_E1 * g1 + _RB_E2 * g2 + _RB_E3 * g3 + _RB_E4 * g4
        return x4, err

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps

        def body(i, xs):
            xn, _ = self._rb_step(F, kk, t0 + i * h, xs, u, h)
            return xn

        return jax.lax.fori_loop(0, self.steps, body, x)


@modules.register("prg_integrator", "GRK4Adaptive")
class GRK4Adaptive(GRK4):
    """Rosenbrock with the EMBEDDED step control of the reference's
    ros4.f port (omu/Omu_IntGRK4.C / NR 'stiff' driver): the 3rd-order
    embedded solution supplies the local error, steps shrink as
    err^(-1/3) on rejection and grow as err^(-1/4) on acceptance, as a
    single ``lax.while_loop``."""

    def __init__(self, max_steps: int = 2000, **kw):
        super().__init__(**kw)
        self.max_steps = max_steps

    def solve(self, F, kk, t0, t1, x, u):
        rtol, atol = self.rtol, self.atol
        span = t1 - t0

        def cond(st):
            t, xs, h, n = st
            return (t < t1 - 1e-12 * jnp.abs(span)) & (n < self.max_steps)

        def body(st):
            t, xs, h, n = st
            h = jnp.minimum(h, t1 - t)
            xn, ev = self._rb_step(F, kk, t, xs, u, h)
            err = jnp.sqrt(jnp.mean(
                (ev / (atol + rtol * jnp.maximum(jnp.abs(xs),
                                                 jnp.abs(xn)))) ** 2)
                + 1e-300)
            accept = err <= 1.0
            fac = jnp.where(accept,
                            jnp.clip(0.9 * err ** (-0.25), 1.0, 5.0),
                            jnp.clip(0.9 * err ** (-1.0 / 3.0), 0.1, 1.0))
            return (jnp.where(accept, t + h, t),
                    jnp.where(accept, xn, xs), h * fac, n + 1)

        h0 = jnp.where(self.stepsize > 0.0, self.stepsize, span / 4.0)
        t, xs, _, _ = jax.lax.while_loop(cond, body, (t0, x, h0, 0))
        return _nan_unless_reached(t, t1, span, xs)


# Alexander's 3-stage, 3rd-order, L-stable, stiffly accurate SDIRK
# coefficients (gamma = middle root of x^3 - 3x^2 + 3x/2 - 1/6)
_SD_GAMMA = 0.4358665215084590
_SD_C2 = (1.0 + _SD_GAMMA) / 2.0
_SD_A21 = (1.0 - _SD_GAMMA) / 2.0
_SD_B1 = -1.5 * _SD_GAMMA * _SD_GAMMA + 4.0 * _SD_GAMMA - 0.25
_SD_B2 = 1.5 * _SD_GAMMA * _SD_GAMMA - 5.0 * _SD_GAMMA + 1.25


@modules.register("prg_integrator", "SDIRK")
class SDIRK(Integrator):
    """Singly diagonally implicit Runge-Kutta for implicit DAEs
    F(x, xdot, u) = 0 (role of omu/Omu_IntSDIRK.{h,C}): Alexander's
    3-stage L-stable, stiffly accurate order-3 method.  Each stage
    derivative k_i solves F(t_i, x + h*sum a_ij k_j, u, k_i) = 0 by
    Newton; algebraic states (rows of F with no xdot dependence) are
    handled naturally for index-1 DAEs because the stage Jacobian
    gamma*h*dF/dx + dF/dxdot stays regular (the reference marks them
    via _x_algebraic, Omu_IntSDIRK.h:139).  Stiff accuracy (b = last
    row of A) makes the step end exactly on the algebraic manifold.
    Sensitivities via lax.custom_root (implicit function theorem)."""

    def __init__(self, newton_iters: int = 8, **kw):
        super().__init__(**kw)
        self.newton_iters = newton_iters

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps
        g = _SD_GAMMA

        def stage(t_i, base):
            def res(k):
                return F(kk, t_i, base + h * g * k, u, k)

            k0 = jnp.zeros_like(x)
            return _newton_root(res, k0, self.newton_iters)

        def step(xs, t):
            k1 = stage(t + g * h, xs)
            k2 = stage(t + _SD_C2 * h, xs + h * _SD_A21 * k1)
            k3 = stage(t + h, xs + h * (_SD_B1 * k1 + _SD_B2 * k2))
            # stiffly accurate: x+ = last stage value
            return xs + h * (_SD_B1 * k1 + _SD_B2 * k2 + g * k3)

        def body(i, xs):
            return step(xs, t0 + i * h)

        return jax.lax.fori_loop(0, self.steps, body, x)


@modules.register("prg_integrator", "DASPK")
@modules.register("prg_integrator", "BDF")
class BDF(Integrator):
    """Fixed-leading-coefficient BDF for implicit DAEs F(x, xdot, u)=0,
    the role of the reference's DASPK 3.0 interface
    (omu/Omu_IntDASPK.{h,C}: BDF with staggered sensitivity analysis).
    BDF2 with a BDF1 (implicit Euler) starter; each step solves
    F(t_{n+1}, x_{n+1}, u, (a0 x_{n+1} - rhs)/h) = 0 for x_{n+1} by
    Newton.  DASPK's sensitivity machinery (_info[20-1]=2 staggered
    corrector) is replaced by implicit-function-theorem differentiation
    of the Newton solve via lax.custom_root."""

    def __init__(self, newton_iters: int = 8, order: int = 2,
                 krylov: bool = False, krylov_restart: int = 20, **kw):
        # DASPK is an adaptive multistep code; a single fixed step per
        # sample period would degrade to implicit Euler, so default to a
        # few substeps.
        kw.setdefault("steps", 4)
        super().__init__(**kw)
        self.newton_iters = newton_iters
        self.order = order
        #: DASPK ``info[12]=1``: matrix-free GMRES corrector instead of
        #: the dense Jacobian solve -- inherited by BDFAdaptive and
        #: BDFVarOrder exactly as DASPK's Krylov switch is orthogonal
        #: to its order/step selection (Omu_IntDASPK.h:112-119)
        self.krylov = krylov
        self.krylov_restart = krylov_restart

    def _implicit_step(self, F, kk, t_next, x_pred, a0_h, hist):
        """Solve F(t, x, u_, (a0*x - hist)/h) = 0 for x."""

        def res(xn):
            return F(kk, t_next, xn, self._u, a0_h * xn - hist)

        if self.krylov:
            return _newton_root_krylov(res, x_pred, self.newton_iters,
                                       self.krylov_restart)
        return _newton_root(res, x_pred, self.newton_iters)

    def solve(self, F, kk, t0, t1, x, u):
        h = (t1 - t0) / self.steps
        self._u = u

        # BDF1 starter: xdot = (x1 - x0)/h
        x1 = self._implicit_step(F, kk, t0 + h, x, 1.0 / h, x / h)
        if self.steps == 1 or self.order == 1:
            if self.order == 1:
                def body1(i, xs):
                    t = t0 + (i + 1) * h
                    return self._implicit_step(F, kk, t + h, xs,
                                               1.0 / h, xs / h)
                return jax.lax.fori_loop(0, self.steps - 1, body1, x1)
            return x1

        # BDF2: xdot = (3 x_{n+1} - 4 x_n + x_{n-1}) / (2h)
        def body(i, carry):
            xm1, xn = carry
            t_next = t0 + (i + 2) * h
            hist = (4.0 * xn - xm1) / (2.0 * h)
            xp = 2.0 * xn - xm1  # linear predictor
            xnext = self._implicit_step(F, kk, t_next, xp,
                                        1.5 / h, hist)
            return (xn, xnext)

        _, xK = jax.lax.fori_loop(0, self.steps - 1, body, (x, x1))
        return xK


@modules.register("prg_integrator", "OdeTs")
class OdeTs(Integrator):
    """Taylor-series integration of autonomous ODEs (role of
    omu/Omu_IntOdeTs.{h,C}, which uses ADOL-C's forodec higher-order
    forward mode): Taylor coefficients of the solution come from the
    recursion y_{k+1} = (f o y)_k / (k+1) evaluated with
    ``jax.experimental.jet`` -- the JAX equivalent of ADOL-C Taylor
    propagation.  Like the reference, the model is treated as
    autonomous within a step (t frozen at the step start)."""

    def __init__(self, order: int = 6, **kw):
        super().__init__(**kw)
        self.order = order

    def solve(self, F, kk, t0, t1, x, u):
        from jax.experimental.jet import jet

        h = (t1 - t0) / self.steps

        def step(xs, t):
            def f(z):
                return self._xdot(F, kk, t, z, u)

            cs = [f(xs)]
            for k in range(1, self.order):
                _, series = jet(f, (xs,), ((*cs, jnp.zeros_like(xs)),))
                cs.append(series[k - 1] / (k + 1))
            out = xs
            hp = h
            for c in cs:
                out = out + c * hp
                hp = hp * h
            return out

        def body(i, xs):
            return step(xs, t0 + i * h)

        return jax.lax.fori_loop(0, self.steps, body, x)


# ---------------------------------------------------------------------------
# Round-2 adaptivity parity (VERDICT item 8)
# ---------------------------------------------------------------------------

# Fehlberg 7(8) tableau (the high-order pair rksuite offers as method 3,
# rksuite/rksuite.f RK(7,8)); 13 stages, 7th-order solution with an
# 8th-order error estimator.
_F78_C = jnp.array([0.0, 2 / 27, 1 / 9, 1 / 6, 5 / 12, 1 / 2, 5 / 6,
                    1 / 6, 2 / 3, 1 / 3, 1.0, 0.0, 1.0])
_F78_A = [
    [],
    [2 / 27],
    [1 / 36, 1 / 12],
    [1 / 24, 0.0, 1 / 8],
    [5 / 12, 0.0, -25 / 16, 25 / 16],
    [1 / 20, 0.0, 0.0, 1 / 4, 1 / 5],
    [-25 / 108, 0.0, 0.0, 125 / 108, -65 / 27, 125 / 54],
    [31 / 300, 0.0, 0.0, 0.0, 61 / 225, -2 / 9, 13 / 900],
    [2.0, 0.0, 0.0, -53 / 6, 704 / 45, -107 / 9, 67 / 90, 3.0],
    [-91 / 108, 0.0, 0.0, 23 / 108, -976 / 135, 311 / 54, -19 / 60,
     17 / 6, -1 / 12],
    [2383 / 4100, 0.0, 0.0, -341 / 164, 4496 / 1025, -301 / 82,
     2133 / 4100, 45 / 82, 45 / 164, 18 / 41],
    [3 / 205, 0.0, 0.0, 0.0, 0.0, -6 / 41, -3 / 205, -3 / 41, 3 / 41,
     6 / 41, 0.0],
    [-1777 / 4100, 0.0, 0.0, -341 / 164, 4496 / 1025, -289 / 82,
     2193 / 4100, 51 / 82, 33 / 164, 12 / 41, 0.0, 1.0],
]
_F78_B7 = jnp.array([41 / 840, 0.0, 0.0, 0.0, 0.0, 34 / 105, 9 / 35,
                     9 / 35, 9 / 280, 9 / 280, 41 / 840, 0.0, 0.0])
_F78_B8 = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 34 / 105, 9 / 35, 9 / 35,
                     9 / 280, 9 / 280, 0.0, 41 / 840, 41 / 840])


@modules.register("prg_integrator", "RKF78")
class RKF78(_EmbeddedRK):
    """Adaptive Fehlberg 7(8) pair -- the reference's rksuite high-order
    method (omu/Omu_IntRKsuite.C method 3 over rksuite/rksuite.f)."""

    C = _F78_C
    A = _F78_A
    BHI = _F78_B8   # propagate the 8th-order solution (local extrap.)
    BLO = _F78_B7
    ERR_ORDER = 8.0


@modules.register("prg_integrator", "IMPAdaptive")
class IMPAdaptive(IMP):
    """Implicit midpoint with RICHARDSON step control
    (omu/Omu_IntIMP.C:379-385): each accepted step compares one h-step
    against two h/2-steps; the extrapolated value (order 3) is
    propagated and the error estimate ||x_2h/2 - x_h|| / 3 drives the
    step size, as a ``lax.while_loop``."""

    def __init__(self, max_steps: int = 1000, **kw):
        super().__init__(**kw)
        self.max_steps = max_steps

    def solve(self, F, kk, t0, t1, x, u):
        rtol, atol = self.rtol, self.atol
        span = t1 - t0

        def one(t, xs, h):
            return self._imp_step(F, kk, t, xs, u, h)

        def cond(st):
            t, xs, h, n = st
            return (t < t1 - 1e-12 * jnp.abs(span)) & (n < self.max_steps)

        def body(st):
            t, xs, h, n = st
            h = jnp.minimum(h, t1 - t)
            x1 = one(t, xs, h)
            xh = one(t, xs, 0.5 * h)
            x2 = one(t + 0.5 * h, xh, 0.5 * h)
            # midpoint rule is order 2: Richardson error and extrapolant
            diff = (x2 - x1) / 3.0
            err = jnp.sqrt(jnp.mean(
                (diff / (atol + rtol * jnp.maximum(
                    jnp.abs(xs), jnp.abs(x2)))) ** 2) + 1e-300)
            accept = err <= 1.0
            fac = jnp.clip(0.9 * err ** (-1.0 / 3.0), 0.2, 5.0)
            return (jnp.where(accept, t + h, t),
                    jnp.where(accept, x2 + diff, xs), h * fac, n + 1)

        h0 = jnp.where(self.stepsize > 0.0, self.stepsize, span / 4.0)
        t, xs, _, _ = jax.lax.while_loop(cond, body, (t0, x, h0, 0))
        return _nan_unless_reached(t, t1, span, xs)

    def _imp_step(self, F, kk, t, xs, u, h):
        tm = t + 0.5 * h

        def res(k):
            return k - self._xdot(F, kk, tm, xs + 0.5 * h * k, u)

        def newton(f, k0):
            def it(i, k):
                J = jax.jacfwd(f)(k)
                return k - sl.solve_nopiv(J, f(k))
            return jax.lax.fori_loop(0, self.newton_iters, it, k0)

        def tangent_solve(g, y):
            return sl.solve_nopiv(jax.jacfwd(g)(y), y)

        k0 = self._xdot(F, kk, t, xs, u)
        k = jax.lax.custom_root(res, k0, newton, tangent_solve)
        return xs + h * k


@modules.register("prg_integrator", "BDFAdaptive")
class BDFAdaptive(BDF):
    """Variable-step BDF2 with predictor-corrector error control -- the
    adaptive-multistep role of DASPK (omu/Omu_IntDASPK.C; DASPK 3.0 is
    an adaptive-order/step BDF code).  Variable-step BDF2 coefficients
    over steps (h, h_prev), linear-extrapolation predictor, local error
    ~ ||corrector - predictor|| / 3; runs as one ``lax.while_loop``.
    (Order 2: size max_steps for the tolerance -- h ~ rtol^(1/3).)"""

    def __init__(self, max_steps: int = 20000, **kw):
        super().__init__(**kw)
        self.max_steps = max_steps

    def solve(self, F, kk, t0, t1, x, u):
        rtol, atol = self.rtol, self.atol
        span = t1 - t0
        self._u = u
        # BDF1 (implicit Euler) starter: its O(h^2) local error enters
        # the global error unreduced, so scale the start step with the
        # tolerance (h_s ~ sqrt(rtol) * span) -- the step controller
        # then grows h geometrically.
        hs = jnp.asarray(span) * jnp.sqrt(jnp.maximum(rtol, 1e-14))
        if self.stepsize > 0.0:
            hs = jnp.minimum(hs, self.stepsize)
        x1 = self._implicit_step(F, kk, t0 + hs, x, 1.0 / hs, x / hs)

        def cond(st):
            t, xm1, xn, h, hp, n = st
            return (t < t1 - 1e-12 * jnp.abs(span)) & (n < self.max_steps)

        def body(st):
            t, xm1, xn, h, hp, n = st
            h = jnp.minimum(h, t1 - t)
            # variable-step BDF2: x'(t_{n+1}) = a0 x_{n+1} - hist
            a0 = 1.0 / h + 1.0 / (h + hp)
            hist = (h + hp) / (h * hp) * xn \
                - h / (hp * (h + hp)) * xm1
            xp = xn + (xn - xm1) * (h / hp)          # predictor
            xc = self._implicit_step(F, kk, t + h, xp, a0, hist)
            diff = (xc - xp) / 3.0
            err = jnp.sqrt(jnp.mean(
                (diff / (atol + rtol * jnp.maximum(
                    jnp.abs(xn), jnp.abs(xc)))) ** 2) + 1e-300)
            accept = err <= 1.0
            fac = jnp.clip(0.9 * err ** (-1.0 / 3.0), 0.2, 2.5)
            return (jnp.where(accept, t + h, t),
                    jnp.where(accept, xn, xm1),
                    jnp.where(accept, xc, xn),
                    h * fac,
                    jnp.where(accept, h, hp), n + 1)

        t, _, xK, _, _, _ = jax.lax.while_loop(
            cond, body, (t0 + hs, x, x1, hs, hs, 0))
        return _nan_unless_reached(t, t1, span, xK)


@modules.register("prg_integrator", "BDFVarOrder")
class BDFVarOrder(BDF):
    """Variable-ORDER, variable-step BDF(1..3) -- the adaptive-multistep
    role of DASPK (omu/Omu_IntDASPK.C; DASPK 3.0 selects the BDF order
    per step).  A four-point history with per-interval steps supports
    orders 1-3 with true variable-step Lagrange coefficients; each step
    makes ONE implicit solve at the current order, then order selection
    compares the per-order predictor residuals e_j = ||xc - xp_j||
    (Shampine's order-selection-by-predictor-residual heuristic) and
    moves the order by at most one toward the largest permissible step
    factor (1/e_j)^(1/(j+1)).  Runs as one ``lax.while_loop``."""

    def __init__(self, max_steps: int = 20000, max_order: int = 3, **kw):
        super().__init__(**kw)
        self.max_steps = max_steps
        self.max_order = max_order

    @staticmethod
    def _lagrange_dot_weights(taus, t_at):
        """w_j = l_j'(t_at) for nodes taus (list of scalars)."""
        m = len(taus)
        ws = []
        for j in range(m):
            total = 0.0
            for i in range(m):
                if i == j:
                    continue
                term = 1.0 / (taus[j] - taus[i])
                for q in range(m):
                    if q in (i, j):
                        continue
                    term = term * (t_at - taus[q]) / (taus[j] - taus[q])
                total = total + term
            ws.append(total)
        return ws

    @staticmethod
    def _lagrange_weights(taus, t_at):
        """w_j = l_j(t_at) (extrapolation weights)."""
        m = len(taus)
        ws = []
        for j in range(m):
            term = 1.0
            for q in range(m):
                if q == j:
                    continue
                term = term * (t_at - taus[q]) / (taus[j] - taus[q])
            ws.append(term)
        return ws

    def _loop_parts(self, F, kk, t0, t1, x, u):
        rtol, atol = self.rtol, self.atol
        span = t1 - t0
        self._u = u
        n = x.shape[0]
        kmax = min(3, self.max_order)

        hs0 = jnp.asarray(span) * jnp.sqrt(jnp.maximum(rtol, 1e-14))
        if self.stepsize > 0.0:
            hs0 = jnp.minimum(hs0, self.stepsize)

        def scaled(e, a, b):
            return jnp.sqrt(jnp.mean(
                (e / (atol + rtol * jnp.maximum(jnp.abs(a),
                                                jnp.abs(b)))) ** 2)
                + 1e-300)

        def body(st):
            t, X, hh, k, h, nh, nstep = st
            # X: [4, n] newest-last; hh: [3] intervals newest-last
            h = jnp.minimum(h, t1 - t)
            # node times relative to t_n (X[3]):
            tau1 = -hh[2]
            tau2 = tau1 - hh[1]
            tau3 = tau2 - hh[0]
            # per-order corrector coefficients (computed for all orders,
            # selected by where -- the scalars are nearly free)
            a0s, hists, xps = [], [], []
            for order, taus in ((1, [h, 0.0]),
                                (2, [h, 0.0, tau1]),
                                (3, [h, 0.0, tau1, tau2])):
                wd = self._lagrange_dot_weights(taus, h)
                a0s.append(wd[0])
                hist = jnp.zeros(n)
                for j in range(1, len(taus)):
                    hist = hist - wd[j] * X[3 - (j - 1)]
                hists.append(hist)
                wp = self._lagrange_weights(taus[1:], h)
                xp = jnp.zeros(n)
                for j, w in enumerate(wp):
                    xp = xp + w * X[3 - j]
                xps.append(xp)

            a0 = jnp.where(k == 1, a0s[0],
                           jnp.where(k == 2, a0s[1], a0s[2]))
            hist = jnp.where(k == 1, hists[0],
                             jnp.where(k == 2, hists[1], hists[2]))
            xp = jnp.where(k == 1, xps[0],
                           jnp.where(k == 2, xps[1], xps[2]))

            xc = self._implicit_step(F, kk, t + h, xp, a0, hist)
            kf = k.astype(x.dtype)
            err = scaled((xc - xp) / (kf + 1.0), X[3], xc)
            accept = err <= 1.0

            # order selection: predictor residuals per order
            e1 = scaled((xc - xps[0]) / 2.0, X[3], xc)
            e2 = scaled((xc - xps[1]) / 3.0, X[3], xc)
            e3 = scaled((xc - xps[2]) / 4.0, X[3], xc)
            r1 = 0.9 * e1 ** (-1.0 / 2.0)
            r2 = jnp.where(nh >= 2, 0.9 * e2 ** (-1.0 / 3.0), 0.0)
            r3 = jnp.where(nh >= 3, 0.9 * e3 ** (-1.0 / 4.0), 0.0)
            rs = jnp.stack([r1, r2, r3][:kmax])
            kbest = jnp.argmax(rs) + 1
            knext = jnp.clip(kbest, k - 1, k + 1)
            knext = jnp.clip(knext, 1, jnp.minimum(nh + 1, kmax))
            rsel = rs[knext - 1]

            fac = jnp.where(accept, jnp.clip(rsel, 0.2, 2.5),
                            jnp.clip(0.9 * err ** (-1.0 / (kf + 1.0)),
                                     0.1, 0.9))
            Xn = jnp.where(accept,
                           jnp.concatenate([X[1:], xc[None]], axis=0), X)
            hhn = jnp.where(accept,
                            jnp.concatenate([hh[1:], h[None]]), hh)
            return (jnp.where(accept, t + h, t), Xn, hhn,
                    jnp.where(accept, knext, k),
                    h * fac,
                    jnp.where(accept, jnp.minimum(nh + 1, 3), nh),
                    nstep + 1)

        def cond(st):
            t, X, hh, k, h, nh, nstep = st
            return (t < t1 - 1e-12 * jnp.abs(span)) & \
                (nstep < self.max_steps)

        return cond, body, hs0

    def _run(self, F, kk, t0, t1, x, u):
        cond, body, hs0 = self._loop_parts(F, kk, t0, t1, x, u)
        X0 = jnp.tile(x[None], (4, 1))
        hh0 = jnp.full((3,), hs0)
        st = (jnp.asarray(t0, x.dtype), X0, hh0, jnp.asarray(1),
              jnp.asarray(hs0, x.dtype), jnp.asarray(0), 0)
        return jax.lax.while_loop(cond, body, st)


    def solve(self, F, kk, t0, t1, x, u):
        t, X, _, _, _, _, _ = self._run(F, kk, t0, t1, x, u)
        return _nan_unless_reached(t, t1, t1 - t0, X[3])

    def solve_stats(self, F, kk, t0, t1, x, u):
        """(x(t1), attempted steps, final order) -- test/diagnostic hook
        (the reference reads DASPK's IWORK counters the same way)."""
        _, X, _, k, _, _, nstep = self._run(F, kk, t0, t1, x, u)
        return X[3], int(nstep), int(k)
