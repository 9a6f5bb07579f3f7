"""Franke path-following interior-point QP solver.

Re-implementation of hqp/Hqp_IpsFranke.C (refs: Franke's 1994 diploma
thesis; Wright, "An infeasible-interior-point algorithm for LCPs", JOTA
1993): an embedding path-following method that scales the initial KKT
residuals (a1, a2, a3) by a homotopy parameter zeta driven to zero
together with the duality gap:

* cold start from x = 0 with the Wright/mu0 'Ltilde' slack shift
  (C:157-203),
* single corrector per iteration with mu from a potential-reduction /
  centering blend controlled by the averaged step length alphabar and
  rho_min (C:278-288),
* fraction-to-boundary step with beta = 0.995 (C:311-334),
* rho_min doubling/halving adaptation (C:338-343),
* termination: zeta < eps and gap < eps and solve residual < eps
  (C:363-375), with hot-start fallback to cold start (C:379-418).

Same backend interface and IPState as the Mehrotra solver; registered as
``qp_solver Franke`` for module parity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp import kkt as K_
from hqp_tpu.qp import mehrotra as ipm
from hqp_tpu.qp.mehrotra import (IPState, OPTIMAL, FEASIBLE, INFEASIBLE,
                                 SUBOPTIMAL, DEGENERATE, ITERATING)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrankeState:
    ip: IPState
    a1: jnp.ndarray
    a2: object
    a3: object
    zeta: jnp.ndarray
    alphabar: jnp.ndarray
    rhomin: jnp.ndarray
    residuum: jnp.ndarray

    # passthrough so the SQP layer can consume either IP solver's state
    @property
    def x(self):
        return self.ip.x

    @property
    def y(self):
        return self.ip.y

    @property
    def z(self):
        return self.ip.z

    @property
    def w(self):
        return self.ip.w

    @property
    def result(self):
        return self.ip.result

    @property
    def iter(self):
        return self.ip.iter


class Franke:
    """Franke path-following IP solver (module name 'Franke')."""

    def __init__(self, backend=None, eps=1e-9, max_iters=50,
                 max_warm_iters=15, beta=0.995, mu0=0.0):
        self.backend = backend
        self.eps = eps
        self.max_iters = max_iters
        self.max_warm_iters = max_warm_iters
        self.beta = beta
        self.mu0 = mu0

    def with_backend(self, backend):
        """Fresh copy bound to ``backend`` (same contract as
        Mehrotra.with_backend)."""
        if backend is self.backend:
            return self
        import copy
        new = copy.copy(self)
        new.backend = backend
        return new

    def init_state(self, qp):
        base = ipm.Mehrotra(backend=self.backend,
                            max_iters=self.max_iters).init_state(qp)
        return FrankeState(
            ip=base, a1=jnp.zeros_like(qp.c),
            a2=mk.fill(qp.eq_offsets(), 0.0),
            a3=mk.fill(qp.ineq_mask(), 0.0),
            zeta=jnp.asarray(1.0), alphabar=jnp.asarray(1.0),
            rhomin=jnp.asarray(1.0), residuum=jnp.asarray(jnp.inf))

    # -- cold start (C:157-220) ----------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def cold_start(self, qp, state: FrankeState):
        mask = qp.ineq_mask()
        m = mk.count(mask)
        d = qp.ineq_offsets()
        rhomin = 1000.0 * m
        min_d = mk.vmin(d, mask)
        if self.mu0 > 0:
            mean_d_h = 0.5 * mk.total(d, mask) / m
            Lt = -mean_d_h + jnp.sqrt(mean_d_h ** 2 + m * rhomin * self.mu0)
            Lt = jnp.maximum(Lt, -min_d)
        else:
            Lt = jnp.maximum(mk.norm_inf(d, mask), -min_d)
            Lt = jnp.maximum(Lt, 1e2 * m)

        x = qp.zero_x()
        y = mk.fill(qp.eq_offsets(), 0.0)
        z = mk.where(mask, mk.fill(mask, Lt / (m * m)), 1.0)
        w = mk.where(mask, mk.tmap(lambda di: Lt + di + 1e-10, d), 1.0)

        a1 = jnp.where(qp.x_mask(),
                       qp.c - qp.matvec_ineqT(mk.where(mask, z, 0.0)), 0.0)
        a2 = mk.scale(-1.0, qp.eq_offsets())
        a3 = mk.where(mask, mk.fill(mask, Lt), 0.0)
        gap = mk.inner(z, w, mask)

        ip = dataclasses.replace(
            state.ip, x=x, y=y, z=z, w=w, iter=jnp.asarray(0),
            result=jnp.asarray(ITERATING), gap=gap,
            alpha=jnp.asarray(1.0))
        return FrankeState(ip=ip, a1=a1, a2=a2, a3=a3,
                           zeta=jnp.asarray(1.0), alphabar=jnp.asarray(1.0),
                           rhomin=rhomin, residuum=jnp.asarray(jnp.inf))

    # -- hot start (C:226-268) -----------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def hot_start(self, qp, state: FrankeState):
        mask = qp.ineq_mask()
        ip = state.ip
        x, y = ip.x, ip.y
        z = ip.z
        w = mk.where(mask, mk.tmap(lambda wi: wi + 1e-10, ip.w), 1.0)
        a1 = jnp.where(
            qp.x_mask(),
            qp.matvec_Q(x) + qp.c - qp.matvec_eqT(y)
            - qp.matvec_ineqT(mk.where(mask, z, 0.0)), 0.0)
        a2 = mk.scale(-1.0, qp.eval_eq(x))
        a3 = mk.where(mask,
                      mk.scale(-1.0, mk.sub(qp.eval_ineq(x), w)), 0.0)
        gap = mk.inner(z, w, mask) + 1.0
        ip = dataclasses.replace(
            ip, w=w, iter=jnp.asarray(0), result=jnp.asarray(ITERATING),
            gap=gap, alpha=jnp.asarray(1.0))
        return dataclasses.replace(state, ip=ip, a1=a1, a2=a2, a3=a3,
                                   zeta=jnp.asarray(1.0),
                                   alphabar=jnp.asarray(1.0))

    # -- one path-following step (C:271-377) ---------------------------------

    def step(self, qp, state: FrankeState) -> FrankeState:
        eps = self.eps
        mask = qp.ineq_mask()
        m = mk.count(mask)
        ip = state.ip
        x, y, z, w = ip.x, ip.y, ip.z, ip.w
        gap, zeta = ip.gap, state.zeta
        alphabar = jnp.where(ip.iter == 0, 1.0, state.alphabar)
        rhomin = state.rhomin

        mu = jnp.where(
            (1.0 / gap < rhomin) | (ip.alpha < 1.0),
            alphabar * gap / rhomin + (1.0 - alphabar) * gap / m,
            gap * gap)

        r1 = -zeta * state.a1
        r2 = mk.scale(-zeta, state.a2)
        r3 = mk.where(mask, mk.scale(-zeta, state.a3), 0.0)
        r4 = mk.where(mask,
                      mk.tmap(lambda zi, wi: zi * wi - mu, z, w), 0.0)

        fac = self.backend.factor(qp, z, w, mask)
        dx, dy, dz, dw = self.backend.solve(fac, qp, z, w, mask,
                                            r1, r2, r3, r4)

        # fraction to boundary; steps are SUBTRACTED so blocking needs
        # dz > 0: min z/dz over dz > 0 (C:311-334)
        val = jnp.minimum(mk.ratio_min(z, mk.scale(-1.0, dz), mask),
                          mk.ratio_min(w, mk.scale(-1.0, dw), mask))
        alpha = jnp.minimum(1.0, self.beta * val)

        alphabar = 0.5 * alphabar + 0.5 * alpha
        rhomin = jnp.where(alphabar == 1.0, rhomin * 2.0,
                           jnp.where((alphabar < 0.5)
                                     & (rhomin > 100.0 * m),
                                     rhomin / 2.0, rhomin))

        x_n = x - alpha * dx
        y_n = mk.axpy(-alpha, dy, y)
        z_n = mk.where(mask, mk.axpy(-alpha, dz, z), 1.0)
        w_n = mk.where(mask, mk.axpy(-alpha, dw, w), 1.0)
        zeta_n = zeta * (1.0 - alpha)
        gap_n = mk.inner(z_n, w_n, mask)

        bad = ~(jnp.isfinite(gap_n) & jnp.isfinite(mk.norm_inf(dx)))

        # residual of the solve for the termination test
        *_, res = K_.kkt_residual(qp, z, w, mask, r1, r2, r3, r4,
                                  dx, dy, dz, dw)

        result = jnp.where(
            bad, DEGENERATE,
            jnp.where(~(zeta_n < eps),
                      jnp.where(alpha < eps, SUBOPTIMAL, INFEASIBLE),
                      jnp.where(~(gap_n < eps) | ~(res < eps),
                                FEASIBLE, OPTIMAL)))

        sel = lambda a, b: jax.tree_util.tree_map(
            lambda ai, bi: jnp.where(bad, ai, bi), a, b)
        ip = dataclasses.replace(
            ip, x=jnp.where(bad, x, x_n), y=sel(y, y_n), z=sel(z, z_n),
            w=sel(w, w_n), gap=jnp.where(bad, gap, gap_n), alpha=alpha,
            iter=ip.iter + jnp.where(bad, 0, 1), result=result)
        return dataclasses.replace(state, ip=ip,
                                   zeta=jnp.where(bad, zeta, zeta_n),
                                   alphabar=alphabar, rhomin=rhomin,
                                   residuum=res)

    @partial(jax.jit, static_argnums=0)
    def step_jit(self, qp, state):
        return self.step(qp, state)

    # -- solve driver with hot-start fallback (C:380-418) --------------------

    def solve(self, qp, state, hot: bool = False):
        fail_iters = 0
        state = self.hot_start(qp, state) if hot \
            else self.cold_start(qp, state)
        hot_started = hot
        gap1 = None
        while True:
            while True:
                state = self.step_jit(qp, state)
                it = int(state.ip.iter)
                if hot_started:
                    if it == 1:
                        gap1 = float(state.ip.gap)
                    elif gap1 is not None and float(state.ip.gap) > gap1:
                        fail_iters += it
                        state = self.cold_start(qp, state)
                        hot_started = False
                        continue
                if it + fail_iters >= self.max_iters:
                    break
                if hot_started and it >= self.max_warm_iters:
                    break
                if int(state.ip.result) in (OPTIMAL, SUBOPTIMAL,
                                            DEGENERATE):
                    break
            if hot_started and int(state.ip.result) != OPTIMAL:
                fail_iters += int(state.ip.iter)
                state = self.cold_start(qp, state)
                hot_started = False
            else:
                break
        ip = dataclasses.replace(
            state.ip, iter=state.ip.iter + jnp.asarray(fail_iters))
        return dataclasses.replace(state, ip=ip)


modules.register("sqp_qp_solver", "Franke")(Franke)
