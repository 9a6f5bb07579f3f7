"""Mehrotra predictor-corrector interior-point QP solver.

TPU-native re-implementation of the reference's primal-dual predictor-
corrector (hqp/Hqp_IpsMehrotra.C; refs: Mehrotra SIOPT 1992, Wright 1997,
PCx, and the Salahi/Peng/Terlaky modification).  The algorithmic heuristics
are kept faithfully:

* cold start with unit (z, w) + Mehrotra's initial-point shift
  (Hqp_IpsMehrotra.C:209-327, four ``qp_init_method`` variants),
* relative KKT test phi = (||r||_inf + |gap|) / ||data||  (C:455-465),
* infeasibility / slow-progress / blow-up aborts (C:487-519),
* affine predictor + Terlaky centering sigma (C:576-623, ``mod_terlaky``),
* Mehrotra's adaptive step length with gamma_f = 0.01 (C:625-669),
* hot starts from snapshotted (z, w) taken while phi > eps^(1/3)
  (C:472-478, 330-352), with failure fallback to cold start (C:696-733).

The design difference is structural, not algorithmic: the whole iteration is
a pure JAX function over pytree state (x, y, z, w are pytrees whose shape is
owned by the QP IR), the inner loop is a ``lax.while_loop`` compiled once and
run entirely on device, and the exchangeable KKT backend
(:mod:`hqp_tpu.qp.kkt`) is selected per problem structure.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules

# result codes, aligned with hqp/Hqp_impl.h:37-46
OPTIMAL = 0
FEASIBLE = 1
INFEASIBLE = 2
SUBOPTIMAL = 3
DEGENERATE = 4
ITERATING = 5

RESULT_STRINGS = {
    OPTIMAL: "optimal",
    FEASIBLE: "feasible",
    INFEASIBLE: "infeasible",
    SUBOPTIMAL: "suboptimal",
    DEGENERATE: "degenerate",
    ITERATING: "iterating",
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IPState:
    """Full interior-point iterate -- a pytree living on device."""

    x: jnp.ndarray   # primal (pytree shape owned by the QP IR)
    y: jnp.ndarray   # equality multipliers
    z: object        # inequality multipliers (IneqGroups / DenseIneq pytree)
    w: object        # inequality slacks (same structure)
    z_hot: object
    w_hot: object
    iter: jnp.ndarray        # int
    result: jnp.ndarray      # int code
    gap: jnp.ndarray
    test: jnp.ndarray        # phi of last step
    alpha: jnp.ndarray
    mu0: jnp.ndarray
    norm_r0: jnp.ndarray
    phimin: jnp.ndarray      # [max_iters + 1]


class Mehrotra:
    """Mehrotra predictor-corrector IP solver over an exchangeable backend."""

    # Defaults deviate from the reference in two measured ways (DID-60
    # first-SQP QP, the reference's own smoke problem): the Terlaky
    # modification (reference hardcodes it on, C:360) wanders for ~20
    # iterations and stalls at phi ~ 1e-4, while Mehrotra's original
    # cubic centering converges in 23 iterations to phi < 1e-6; and the
    # Gondzio correctors (a beyond-reference addition) cost 2 extra
    # backend solves per iteration without reducing the iteration count
    # once the SIGMA_CAP active-set treatment cures the centering stalls
    # they were added for.  Both remain selectable.
    def __init__(self, backend=None, eps=1e-9, max_iters=50, max_warm_iters=25,
                 gammaf=0.01, init_method=0, mod_terlaky=False,
                 gondzio_correctors=0, cheap_predictor=False, jit=True):
        self.backend = backend
        self.eps = eps
        self.max_iters = max_iters
        self.max_warm_iters = max_warm_iters
        self.gammaf = gammaf
        self.init_method = init_method
        self.mod_terlaky = mod_terlaky
        self.gondzio_correctors = gondzio_correctors
        #: solve the affine predictor WITHOUT the true-residual refine
        #: gate (backend.with_refine(0)); the analytic regularization
        #: corrections still run, so the predictor residual stays at the
        #: ~delta*|dy| floor -- enough to shape sigma, while the accepted
        #: corrector direction keeps the full gate
        self.cheap_predictor = cheap_predictor
        #: jit=False runs eagerly -- required for host-callback backends
        #: (SparseHostKKT) whose factorizations live outside XLA.
        #: Backends that declare ``eager_only = True`` (SparseHostKKT,
        #: FullSparseBKPKKT) force it off so a shell/registry user
        #: selecting them by name cannot hit a tracer crash.
        self.jit = jit and not getattr(backend, "eager_only", False)
        #: unique-bumped by the shell on in-place knob writes (qp_eps ...)
        #: so mutated instances stop matching stale trace-cache entries
        self._trace_nonce = 0

    # Value-based identity so identically-configured solver instances share
    # jitted traces (the solver is a static argument of its own jitted
    # entry points; see PartitionedKKT._config).  ``backend`` participates
    # through its own value-based hash.
    def _config(self):
        return (type(self), self.backend, self.eps, self.max_iters,
                self.max_warm_iters, self.gammaf, self.init_method,
                self.mod_terlaky, self.gondzio_correctors,
                self.cheap_predictor, self.jit, self._trace_nonce)

    def __hash__(self):
        return hash(self._config())

    def __eq__(self, other):
        return isinstance(other, Mehrotra) and \
            self._config() == other._config()

    def with_backend(self, backend):
        """A solver with ``backend`` bound -- a fresh copy if it differs.

        The instance's value-based hash covers ``backend``, and jitted
        entry points take the solver as a static argument, so mutating
        ``backend`` on an instance that has already been traced would
        leave stale trace-cache entries behind.  Callers that resolve the
        backend late (SqpSolver.init) must rebind through this method."""
        if backend is self.backend:
            return self
        import copy
        new = copy.copy(self)
        new.backend = backend
        if getattr(backend, "eager_only", False):
            new.jit = False
        return new

    def _cond(self, pred, tfn, ffn):
        if self.jit:
            return jax.lax.cond(pred, tfn, ffn)
        return tfn() if bool(pred) else ffn()

    # -- state construction --------------------------------------------------

    def init_state(self, qp):
        mask = qp.ineq_mask()
        ones = mk.fill(mk.tmap(lambda m: m.astype(jnp.float64), mask), 1.0)
        x = qp.zero_x()
        y = mk.fill(qp.eq_offsets(), 0.0)
        return IPState(
            x=x, y=y, z=ones, w=ones, z_hot=ones, w_hot=ones,
            iter=jnp.asarray(0), result=jnp.asarray(ITERATING),
            gap=jnp.asarray(0.0), test=jnp.asarray(jnp.inf),
            alpha=jnp.asarray(1.0), mu0=jnp.asarray(1.0),
            norm_r0=jnp.asarray(1.0),
            phimin=jnp.zeros(self.max_iters + 1),
        )

    # -- cold start (Hqp_IpsMehrotra.C:209-327) ------------------------------

    @staticmethod
    def _no_ineq(qp):
        """Structurally no inequality rows (reference's m == 0 case)."""
        return all(l.size == 0
                   for l in jax.tree_util.tree_leaves(qp.ineq_mask()))

    def cold_start(self, qp, state: IPState):
        if self.jit:
            return self._cold_start_jit(qp, state)
        return self._cold_start(qp, state)

    @partial(jax.jit, static_argnums=0)
    def _cold_start_jit(self, qp, state: IPState):
        return self._cold_start(qp, state)

    def _cold_start(self, qp, state: IPState):
        if self._no_ineq(qp):
            # program without inequality constraints (C:322-327)
            return dataclasses.replace(
                state, x=qp.zero_x(), y=mk.fill(qp.eq_offsets(), 0.0),
                iter=jnp.asarray(0), result=jnp.asarray(ITERATING),
                test=jnp.asarray(jnp.inf), alpha=jnp.asarray(1.0),
                phimin=jnp.zeros(self.max_iters + 1))
        mask = qp.ineq_mask()
        m = jnp.maximum(mk.count(mask), 1.0)
        ones = mk.where(mask, mk.fill(mask, 1.0), 1.0)
        z = ones
        if self.init_method == 1:
            w = mk.fill(mask, _norm_d(qp) * _norm_Q(qp) / _norm_C(qp))
            w = mk.where(mask, w, 1.0)
        elif self.init_method == 2:
            w = mk.fill(mask, _norm_C(qp) / _norm_d(qp) / _norm_Q(qp))
            w = mk.where(mask, w, 1.0)
        else:
            w = ones

        r1 = jnp.where(qp.x_mask(), qp.c, 0.0)
        r2 = mk.scale(-1.0, qp.eq_offsets())
        r3 = mk.where(mask, mk.scale(-1.0, qp.ineq_offsets()), 0.0)
        if self.init_method:
            r4 = mk.where(mask, mk.tmap(lambda a, b: -a * b, z, w), 0.0)
        else:
            r4 = mk.fill(mask, 0.0)

        fac = self.backend.factor(qp, z, w, mask)
        dx, dy, dz, dw = self.backend.solve(fac, qp, z, w, mask,
                                            r1, r2, r3, r4)
        x = dx
        y = dy
        if self.init_method == 3:
            dz = mk.add(dz, z)
            dw = mk.add(dw, w)

        # Mehrotra's initial point shift (C:299-315)
        dz = _unzero(dz, mask)
        dw = _unzero(dw, mask)
        delz = jnp.maximum(-1.5 * mk.vmin(dz, mask), 0.0)
        delw = jnp.maximum(-1.5 * mk.vmin(dw, mask), 0.0)
        d1 = mk.tmap(lambda a: a + delz, dz)
        d2 = mk.tmap(lambda a: a + delw, dw)
        gap = mk.inner(d1, d2, mask)
        den_z = mk.total(dw, mask) + m * delw
        delz = delz + jnp.where(den_z != 0.0, 0.5 * gap / den_z, 0.0)
        den_w = mk.total(dz, mask) + m * delz
        delw = delw + jnp.where(den_w != 0.0, 0.5 * gap / den_w, 0.0)
        z = mk.where(mask, mk.tmap(lambda a: a + delz, dz), 1.0)
        w = mk.where(mask, mk.tmap(lambda a: a + delw, dw), 1.0)

        onesz = mk.where(mask, mk.fill(mask, 1.0), 1.0)
        degen = ~(jnp.isfinite(mk.norm_inf(dx)) & jnp.isfinite(gap))
        return IPState(
            x=x, y=y, z=z, w=w, z_hot=onesz, w_hot=onesz,
            iter=jnp.asarray(0),
            result=jnp.where(degen, DEGENERATE, ITERATING),
            gap=gap, test=jnp.asarray(jnp.inf), alpha=jnp.asarray(1.0),
            mu0=jnp.asarray(1.0), norm_r0=jnp.asarray(1.0),
            phimin=jnp.zeros(self.max_iters + 1),
        )

    def hot_start(self, qp, state: IPState):
        """Re-use snapshotted (z, w); Hqp_IpsMehrotra.C:330-352."""
        return dataclasses.replace(
            state, z=state.z_hot, w=state.w_hot,
            iter=jnp.asarray(0), result=jnp.asarray(ITERATING),
            test=jnp.asarray(jnp.inf), alpha=jnp.asarray(1.0),
            phimin=jnp.zeros(self.max_iters + 1),
        )

    # -- one predictor-corrector step (Hqp_IpsMehrotra.C:355-693) ------------

    def step(self, qp, state: IPState) -> IPState:
        if self._no_ineq(qp):
            return self._step_eq_only(qp, state)
        eps = self.eps
        gammaf = self.gammaf
        mask = qp.ineq_mask()
        m = jnp.maximum(mk.count(mask), 1.0)
        x, y, z, w = state.x, state.y, state.z, state.w

        # residuals of the KKT conditions (C:425-445)
        Qx = qp.matvec_Q(x)
        gap = (mk.inner(x, Qx + qp.c)
               + mk.inner(y, qp.eq_offsets(), qp.eq_mask())
               + mk.inner(z, qp.ineq_offsets(), mask))
        r1 = jnp.where(
            qp.x_mask(),
            Qx + qp.c - qp.matvec_eqT(y) - qp.matvec_ineqT(
                mk.where(mask, z, 0.0)), 0.0)
        r2 = mk.scale(-1.0, qp.eval_eq(x))
        r3 = mk.where(mask, mk.sub(w, qp.eval_ineq(x)), 0.0)
        r4 = mk.where(mask, mk.tmap(lambda a, b: -a * b, z, w), 0.0)
        mu = mk.inner(z, w, mask) / m

        norm_r = jnp.maximum(
            jnp.maximum(mk.norm_inf(r1), mk.norm_inf(r2, qp.eq_mask())),
            mk.norm_inf(r3, mask))
        norm_data = qp.norm_data()

        first = state.iter == 0
        mu0 = jnp.where(first, mu, state.mu0)
        norm_r0 = jnp.where(first, norm_r, state.norm_r0)

        phi = (norm_r + jnp.abs(gap)) / norm_data
        phimin = state.phimin.at[state.iter].set(phi)

        # hot start snapshot while still far from the central path (C:475-478)
        snap = phi > eps ** 0.3333
        z_hot = jax.tree_util.tree_map(
            lambda a, b: jnp.where(snap, a, b), z, state.z_hot)
        w_hot = jax.tree_util.tree_map(
            lambda a, b: jnp.where(snap, a, b), w, state.w_hot)

        # termination / abort tests (C:482-519)
        iters = jnp.arange(self.max_iters + 1)
        seen = iters <= state.iter
        pm = jnp.min(jnp.where(seen, phimin, jnp.inf))
        # never declare optimality at entry (iter 0) before any step: a
        # cold start enters with zeroed (x, y) and a hot start with the
        # PREVIOUS solution -- declaring optimal there returns a stale or
        # zero direction and zero multipliers.  Bites when no inequality
        # is finite (mu == 0 identically, e.g. pure equality-constrained
        # stage QPs) while the relative norm_r test passes against a
        # large-||Q|| BFGS Hessian.
        optimal = (mu <= eps) & (norm_r <= eps * norm_data) \
            & (state.iter > 0)
        subopt = (phi > eps) & (phi >= 1.0e4 * pm)
        seen30 = (iters >= 1) & (iters <= state.iter - 30)
        pm30 = jnp.min(jnp.where(seen30, phimin, jnp.inf))
        slow = (state.iter >= 30) & (pm >= 0.5 * pm30)
        blowup = (norm_r > eps * norm_data) & \
            (norm_r / mu >= 1.0e8 * norm_r0 / mu0)

        # note: the blow-up test sets Suboptimal but does NOT skip the step
        # (the reference's branch has no return, C:513-519); the solve loop
        # then exits after this final step.
        result = jnp.where(
            optimal, OPTIMAL,
            jnp.where(subopt | slow | blowup, SUBOPTIMAL, ITERATING))
        take_step = (~optimal) & (~subopt) & (~slow)

        base = dataclasses.replace(
            state, z_hot=z_hot, w_hot=w_hot, gap=gap, test=phi, mu0=mu0,
            norm_r0=norm_r0, phimin=phimin, result=result)

        def do_step(st: IPState) -> IPState:
            # factorization + affine predictor (C:524-562).  A cheaper
            # (unrefined) predictor solve was tried and REVERTED: at
            # K=1000 the mis-centered sigma it produces makes the IP
            # exhaust max_iters (the reference refines every solve too,
            # hqp/Hqp_IpMatrix.C).
            fac = self.backend.factor(qp, z, w, mask)
            pred_be = self.backend.with_refine(0) \
                if self.cheap_predictor and \
                hasattr(self.backend, "with_refine") else self.backend
            dxa, dya, dza, dwa = pred_be.solve(
                fac, qp, z, w, mask, r1, r2, r3, r4)

            alpha_aff = jnp.clip(
                jnp.minimum(mk.ratio_min(z, dza, mask),
                            mk.ratio_min(w, dwa, mask)), 0.0, 1.0)

            def corrector(sig):
                smm = sig * mu
                r4c = mk.where(
                    mask,
                    mk.tmap(lambda zi, wi, a, b: -(zi * wi + a * b - smm),
                            z, w, dza, dwa), 0.0)
                return self.backend.solve(fac, qp, z, w, mask,
                                          r1, r2, r3, r4c)

            if self.mod_terlaky:
                # Terlaky centering (C:584-591).  The sigma formula is
                # unclamped in the reference; with the SIGMA_CAP active-set
                # treatment (hqp_tpu.qp.kkt) the affine products dza*dwa on
                # capped rows can inflate t to 1e5+, driving sigma >> 1 and
                # DE-centering the iteration (measured: mu oscillated
                # between 3e-7 and 4e-6 for 25 iterations on the DID QP).
                # Centering parameters are meaningful only in [0, 1], so
                # clamp.
                gamma = 1.0e-4 ** 0.25
                t = mk.vmax(
                    mk.tmap(lambda a, b, zi, wi:
                            jnp.where(a * b > 0.0, a * b / zi / wi, 0.0),
                            dza, dwa, z, w), mask)
                t = jnp.maximum(t, 0.0)
                sigma = jnp.minimum(
                    gamma * (t + 1.0 - alpha_aff) / (1.0 - gamma), 1.0)

                dx, dy, dz, dw = corrector(sigma)
                alpha_corr = jnp.clip(
                    jnp.minimum(mk.ratio_min(z, dz, mask),
                                mk.ratio_min(w, dw, mask)), 0.0, 1.0)

                # fall back to pure centering when the corrector is blocked
                # (Terlaky modification, C:604-623)
                redo = (alpha_aff < 0.1) | \
                    (alpha_corr < gamma * gamma / 2.0 / m / m)
                dx, dy, dz, dw = self._cond(
                    redo, lambda: corrector(gamma / (1.0 - gamma)),
                    lambda: (dx, dy, dz, dw))
            else:
                # Mehrotra's original centering (C:578-583)
                zp = mk.where(mask, mk.axpy(alpha_aff, dza, z), 0.0)
                wp = mk.where(mask, mk.axpy(alpha_aff, dwa, w), 0.0)
                mu_aff = mk.inner(zp, wp, mask) / m
                sigma = (mu_aff / mu) ** 3.0
                dx, dy, dz, dw = corrector(sigma)

            # Mehrotra's adaptive step size (C:625-669)
            alpha = self._adaptive_alpha(z, w, dz, dw, mask, m)

            # Gondzio multiple centrality correctors (beyond the reference;
            # Gondzio 1996): push the trial complementarity products into
            # [beta_min, beta_max]*sigma*mu by extra correction solves with
            # the same factorization, accepting a corrector only if it
            # enlarges the step.  Cures the bad-centering stalls the plain
            # predictor-corrector hits on degenerate QPs.
            mu_t = jnp.maximum(sigma * mu, 1e-30)

            def gondzio_round(carry, _):
                dx, dy, dz, dw, alpha = carry
                abar = jnp.minimum(1.0, 2.0 * alpha + 0.1)
                zt = mk.where(mask, mk.axpy(abar, dz, z), 1.0)
                wt = mk.where(mask, mk.axpy(abar, dw, w), 1.0)
                pr = mk.tmap(lambda a, b: a * b, zt, wt)
                tgt = mk.tmap(
                    lambda p: jnp.clip(p, 0.1 * mu_t, 10.0 * mu_t), pr)
                r4g = mk.where(mask, mk.sub(tgt, pr), 0.0)
                zero1 = jnp.zeros_like(r1)
                zero2 = mk.fill(r2, 0.0)
                zero3 = mk.fill(r3, 0.0)
                cx, cy, cz, cw = self.backend.solve(
                    fac, qp, z, w, mask, zero1, zero2, zero3, r4g)
                nx_, ny_ = dx + cx, mk.add(dy, cy)
                nz_, nw_ = mk.add(dz, cz), mk.add(dw, cw)
                na = self._adaptive_alpha(z, w, nz_, nw_, mask, m)
                take = na > alpha
                sel = lambda a, b: jax.tree_util.tree_map(
                    lambda ai, bi: jnp.where(take, ai, bi), a, b)
                return (sel(nx_, dx), sel(ny_, dy), sel(nz_, dz),
                        sel(nw_, dw), jnp.where(take, na, alpha)), None

            ng = self.gondzio_correctors
            if ng > 0 and self.jit:
                (dx, dy, dz, dw, alpha), _ = jax.lax.scan(
                    gondzio_round, (dx, dy, dz, dw, alpha), None, length=ng)
            elif ng > 0:
                carry = (dx, dy, dz, dw, alpha)
                for _ in range(ng):
                    carry, _n = gondzio_round(carry, None)
                dx, dy, dz, dw, alpha = carry

            x_n = x + alpha * dx
            y_n = mk.axpy(alpha, dy, y)
            z_n = mk.where(mask, mk.axpy(alpha, dz, z), 1.0)
            w_n = mk.where(mask, mk.axpy(alpha, dw, w), 1.0)

            mu_n = mk.inner(z_n, w_n, mask) / m
            bad = ~(jnp.isfinite(mu_n) & jnp.isfinite(mk.norm_inf(dx)))

            def sel(a, b):
                return jax.tree_util.tree_map(
                    lambda ai, bi: jnp.where(bad, ai, bi), a, b)

            return dataclasses.replace(
                st,
                x=jnp.where(bad, x, x_n),
                y=sel(y, y_n),
                z=sel(z, z_n),
                w=sel(w, w_n),
                alpha=alpha,
                iter=st.iter + jnp.where(bad, 0, 1),
                result=jnp.where(bad, DEGENERATE, st.result),
            )

        if self.jit:
            return jax.lax.cond(take_step, do_step, lambda s: s, base)
        return do_step(base) if bool(take_step) else base

    def _step_eq_only(self, qp, state: IPState) -> IPState:
        """Newton step for a program without inequality constraints
        (Hqp_IpsMehrotra.C:364-415): one factor+solve, then optimal."""
        mask = qp.ineq_mask()
        x, y = state.x, state.y
        r1 = jnp.where(qp.x_mask(),
                       qp.matvec_Q(x) + qp.c - qp.matvec_eqT(y), 0.0)
        r2 = mk.scale(-1.0, qp.eval_eq(x))
        r3 = mk.fill(mask, 0.0)
        r4 = mk.fill(mask, 0.0)
        z = mk.fill(mask, 1.0)
        w = mk.fill(mask, 1.0)
        fac = self.backend.factor(qp, z, w, mask)
        dx, dy, _, _ = self.backend.solve(fac, qp, z, w, mask,
                                          r1, r2, r3, r4)
        bad = ~(jnp.isfinite(mk.norm_inf(dx)) & jnp.isfinite(mk.norm_inf(dy)))
        return dataclasses.replace(
            state,
            x=jnp.where(bad, x, x + dx),
            y=jax.tree_util.tree_map(
                lambda a, b: jnp.where(bad, a, a + b), y, dy),
            iter=state.iter + jnp.where(bad, 0, 1),
            result=jnp.where(bad, DEGENERATE, OPTIMAL),
            test=mk.norm_inf(r1) + mk.norm_inf(r2, qp.eq_mask()),
        )

    def _adaptive_alpha(self, z, w, dz, dw, mask, m):
        """Mehrotra's adaptive stepsize heuristic (C:625-669)."""
        gammaf = self.gammaf
        zf, _ = ravel_pytree(z)
        wf, _ = ravel_pytree(w)
        dzf, _ = ravel_pytree(dz)
        dwf, _ = ravel_pytree(dw)
        mf, _ = ravel_pytree(mk.tmap(lambda a: a, mask))

        okz = mf & (dzf < 0.0)
        ratz = jnp.where(okz, -zf / jnp.where(okz, dzf, -1.0), mk.BIG)
        okw = mf & (dwf < 0.0)
        ratw = jnp.where(okw, -wf / jnp.where(okw, dwf, -1.0), mk.BIG)
        izmin = jnp.argmin(ratz)
        iwmin = jnp.argmin(ratw)
        zmin = ratz[izmin]
        wmin = ratw[iwmin]

        none_blocking = (zmin >= mk.BIG) & (wmin >= mk.BIG)
        alpha = jnp.minimum(jnp.minimum(zmin, wmin), 1.0)

        mu_pl = jnp.sum(jnp.where(mf, (zf + alpha * dzf) * (wf + alpha * dwf),
                                  0.0)) / m

        w_blocks = wmin <= zmin
        ib = jnp.where(w_blocks, iwmin, izmin)
        # at the blocking index: the "other" variable's positivity decides
        a_other = jnp.where(w_blocks, zf[ib] + alpha * dzf[ib],
                            wf[ib] + alpha * dwf[ib])
        d_block = jnp.where(w_blocks, alpha * dwf[ib], alpha * dzf[ib])
        v_block = jnp.where(w_blocks, wf[ib], zf[ib])
        fpd = jnp.where(a_other > 0.0,
                        (gammaf * mu_pl / a_other - v_block) / d_block, 0.0)
        alpha = jnp.clip(jnp.maximum(1.0 - gammaf, fpd) * alpha, 0.0, 1.0)
        return jnp.where(none_blocking, 1.0, alpha)

    # -- full solve with hot-start fallback (C:696-733) ----------------------

    def _solve_loop(self, qp, state: IPState, hot: bool, iter_cap):
        """Run IP steps to termination as ONE ``lax.while_loop`` on device
        (the reference's single-call Hqp_IpsMehrotra::solve, C:696-733).

        ``hot`` is static; the hot-start failure test (per-iteration phi
        must decay at least like 1.2^-k and alpha must stay above 1e-5,
        C:707-719) is folded into the loop carry as a break flag so a
        failing hot solve exits immediately for the host to fall back
        to a cold start.  Returns (state, hot_failed)."""

        def cond(c):
            st, test1, fail = c
            return (st.result == ITERATING) & (st.iter < iter_cap) & ~fail

        def body(c):
            st, test1, fail = c
            st = self.step(qp, st)
            if hot:
                it = st.iter
                test1 = jnp.where(it == 1, st.test, test1)
                failn = (it >= 2) & (
                    (st.test > test1 / 1.2 ** (it.astype(jnp.float64) - 1.0))
                    | (st.alpha < 1.0e-5))
                fail = fail | failn
            return st, test1, fail

        st, _, fail = jax.lax.while_loop(
            cond, body, (state, jnp.asarray(jnp.inf), jnp.asarray(False)))
        return st, fail

    @partial(jax.jit, static_argnums=(0, 3))
    def _solve_loop_jit(self, qp, state, hot, iter_cap):
        return self._solve_loop(qp, state, hot, iter_cap)

    def solve_device(self, qp, state: IPState) -> IPState:
        """Cold-started full solve as a single device program -- jittable
        and vmappable (scenario batches solve QPs to completion in one
        compiled call, hqp_tpu.parallel.scenarios.make_scenario_solve)."""
        state = self._cold_start(qp, state)
        st, _ = self._solve_loop(qp, state, False,
                                 jnp.asarray(self.max_iters))
        return st

    def solve(self, qp, state: IPState, hot: bool = False):
        """Full solve with hot-start failure fallback (C:696-733).

        The iteration runs on device (:meth:`_solve_loop`); only the
        rare hot-start fallback decision crosses back to the host."""
        if hasattr(self.backend, "prepare"):
            # host-callback backends pin the loop-invariant problem data
            # (Q, C, A) host-side ONCE per solve; the per-iteration factor
            # callback then ships only the barrier diagonal instead of
            # re-transferring ~O(n^2) matrices every iteration
            self.backend.prepare(qp)
        if not self.jit:
            return self._solve_host(qp, state, hot)
        fail_iters = 0
        if hot:
            st = self.hot_start(qp, state)
            st, failed = self._solve_loop_jit(
                qp, st, True, jnp.asarray(min(self.max_warm_iters,
                                              self.max_iters)))
            if bool(failed) or int(st.result) != OPTIMAL:
                fail_iters = int(st.iter)
                st = self.cold_start(qp, st)
                st, _ = self._solve_loop_jit(
                    qp, st, False,
                    jnp.asarray(max(self.max_iters - fail_iters, 1)))
        else:
            st = self.cold_start(qp, state)
            st, _ = self._solve_loop_jit(qp, st, False,
                                         jnp.asarray(self.max_iters))
        return dataclasses.replace(
            st, iter=st.iter + jnp.asarray(fail_iters))

    def _solve_host(self, qp, state: IPState, hot: bool = False):
        """Host-driven stepper (for non-jittable backends, e.g. the
        host-callback SparseHostKKT); same logic as the device loop."""
        fail_iters = 0
        state = self.hot_start(qp, state) if hot else self.cold_start(qp, state)
        hot_started = hot
        while True:
            test1 = None
            while True:
                state = self.step_jit(qp, state)
                it = int(state.iter)
                if hot_started:
                    if it == 1:
                        test1 = float(state.test)
                    elif test1 is not None and (
                        float(state.test) > test1 / (1.2 ** (it - 1.0))
                        or float(state.alpha) < 1.0e-5
                    ):
                        fail_iters += it
                        state = self.cold_start(qp, state)
                        hot_started = False
                        continue
                if it + fail_iters >= self.max_iters:
                    break
                if hot_started and it >= self.max_warm_iters:
                    break
                if int(state.result) in (OPTIMAL, SUBOPTIMAL, DEGENERATE):
                    break
            if hot_started and int(state.result) != OPTIMAL:
                fail_iters += int(state.iter)
                state = self.cold_start(qp, state)
                hot_started = False
            else:
                break
        state = dataclasses.replace(
            state, iter=state.iter + jnp.asarray(fail_iters))
        return state

    @partial(jax.jit, static_argnums=0)
    def _step_jitted(self, qp, state):
        return self.step(qp, state)

    def step_jit(self, qp, state):
        if self.jit:
            return self._step_jitted(qp, state)
        return self.step(qp, state)


modules.register("sqp_qp_solver", "Mehrotra")(Mehrotra)


# -- helpers ----------------------------------------------------------------

def _unzero(t, mask):
    """If a direction is identically zero, nudge it (C:299-302)."""
    n = mk.norm_inf(t, mask)
    return jax.tree_util.tree_map(
        lambda a: jnp.where(n == 0.0, 1.0e-10, a), t)


def _norm_Q(qp):
    return jnp.maximum(jnp.max(jnp.abs(qp.Q)), 1e-10)


def _norm_C(qp):
    return jnp.maximum(jnp.max(jnp.abs(qp.C)), 1e-10)


def _norm_d(qp):
    return jnp.maximum(mk.norm_inf(qp.ineq_offsets(), qp.ineq_mask()), 1e-10)
