"""SQP iteration engine and solve driver.

Re-implements the reference's SQP machinery:

* ``Hqp_SqpSolver`` (hqp/Hqp_SqpSolver.C): qp_update (Lagrangian gradient,
  quasi-Newton update), qp_solve (hot/cold started IP subproblem), step
  (globalization + rescue ``feasible_vals``), Hessian restart.
* the Tcl driver loop ``hqp_solve`` (hqp/hqp_solve.tcl:83-265): the
  convergence, error and stall tests that define when a problem counts as
  solved (termination: ||inf|| < eps and ||grd_L|| < eps, or small-step
  tests; errors: evaluation, subiters, iters, infeasible, degenerate,
  stall).

The solver is program-generic: a program exposes ``make_qp`` /
``update_fbd_qp`` / ``eval_grd_L`` / ``split_blocks`` and yields either a
:class:`~hqp_tpu.qp.program.StageQP` (structured path, Riccati KKT) or a
:class:`~hqp_tpu.qp.program.DenseQP` (general path, dense KKT).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hqp_tpu.qp import kkt
from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.qp.program import StageQP
from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules


class SqpError(RuntimeError):
    """Driver error, reason strings as in hqp/hqp_solve.tcl
    (evaluation, subiters, iters, infeasible, degenerate, stall)."""

    def __init__(self, reason):
        super().__init__(reason)
        self.reason = reason


def infeasibility(qp):
    """max(||b||_inf, max(0, -min d)) -- hqp/Hqp_SqpSolver.C:155-170."""
    mask = qp.ineq_mask()
    vals = qp.eval_ineq(qp.zero_x())
    viol = jnp.maximum(0.0, -mk.vmin(vals, mask))
    b = qp.eq_offsets()
    if mk.tsize(b):
        viol = jnp.maximum(viol, mk.norm_inf(b, qp.eq_mask()))
    return viol


@jax.jit
def _phi(f, qp, re, r):
    """Powell's exact penalty phi = f + re'|b| - r'min(0, d)
    (hqp/Hqp_SqpPowell.C:189-210)."""
    mask = qp.ineq_mask()
    vals = qp.eval_ineq(qp.zero_x())
    pen_i = mk.total(mk.tmap(lambda ri, di: -ri * jnp.minimum(0.0, di),
                             r, vals), mask)
    b = qp.eq_offsets()
    pen_e = (mk.inner(re, mk.tmap(jnp.abs, b), qp.eq_mask())
             if mk.tsize(b) else 0.0)
    return f + pen_e + pen_i


@jax.jit
def _phi1(f, qp, s, re, r):
    """Predicted penalty at unit step (hqp/Hqp_SqpPowell.C:213-244)."""
    mask = qp.ineq_mask()
    vals = qp.eval_ineq(s)
    pen_i = mk.total(mk.tmap(lambda ri, di: -ri * jnp.minimum(0.0, di),
                             r, vals), mask)
    ret = f + mk.inner(qp.c, s)
    b = qp.eval_eq(s)
    if mk.tsize(b):
        ret = ret + mk.inner(re, mk.tmap(jnp.abs, b), qp.eq_mask())
    return ret + pen_i


@jax.jit
def _grd_L_of_qp(qp, y, z):
    """c - A'y - C'z from the (possibly stale) QP data
    (hqp/Hqp_SqpSolver.C:430-445)."""
    return qp.c - qp.matvec_eqT(y) - qp.matvec_ineqT(z)


@jax.jit
def _update_stats(qp, x, f, f_bak, grd_L):
    """All qp_update scalars in ONE device array (one host transfer
    instead of five: every device->host readback on the tunneled TPU
    backend costs ~1 ms of round-trip + dispatch)."""
    xQx = mk.inner(qp.matvec_Q(x), x)
    return jnp.stack([
        xQx,
        infeasibility(qp),
        jnp.abs(f_bak - f),
        mk.norm_inf(grd_L, qp.x_mask()),
        mk.norm_inf(x),
    ])


@jax.jit
def _solve_stats(qp, s):
    """qp_solve scalars in one transfer: [sQs, norm_dx]."""
    return jnp.stack([mk.inner(qp.matvec_Q(s), s), mk.norm_inf(s)])


@jax.jit
def _step_stats(qp, x):
    """step scalars in one transfer: [norm_x, norm_inf]."""
    return jnp.stack([mk.norm_inf(x), infeasibility(qp)])


class SqpSolver:
    """Base SQP solver; subclasses implement ``update_vals`` (line search).

    Defaults follow hqp/Hqp_SqpSolver.C:57-130: eps = 1e-5, QP eps = 1e-9,
    max_iters = 500(*), min_alpha = 1e-10, max_inf_iters = 10.
    (*) the reference constructor sets 500; driver scripts usually lower it.
    """

    name = "SqpSolverBase"

    def __init__(self, prg, hela=None, qp_solver=None, kkt_backend=None,
                 eps=1e-5, qp_eps=1e-9, max_iters=500, min_alpha=1e-10,
                 max_inf_iters=10, qp_max_iters=50, logging=False):
        from hqp_tpu.sqp.hessian import BFGS

        self.prg = prg
        self.hela = hela if hela is not None else BFGS()
        self.eps = eps
        self.min_alpha = min_alpha
        self.max_iters = max_iters
        self.max_inf_iters = max_inf_iters
        self.logging = logging

        if qp_solver is None:
            # the QP tolerance cannot be tighter than the KKT solve's
            # achievable residual: on f32-factorization backends (TPU)
            # the refined floor is ~1e-7, so demanding 1e-9 would turn
            # every QP 'optimal' into 'suboptimal' and stall the SQP
            # (the reference couples qp_eps to factor quality the same
            # way via its default eps choices)
            from hqp_tpu.qp import kkt as _kkt

            if _kkt.lu_dtype() == jnp.float32:
                qp_eps = max(qp_eps, 1e-7)
            qp_solver = ip.Mehrotra(eps=qp_eps, max_iters=qp_max_iters)
        self.qp_solver = qp_solver
        self._kkt_backend = kkt_backend  # resolved at init() from QP type

        # iterate state
        self.x = None
        self.f = None
        self.qp = None
        self.ip_state = None
        self.y = None
        self.z = None
        self.d = None          # last accepted step = alpha * s
        self.s = None          # last QP solution
        self.iter = 0
        self.inf_iters = 0
        self.alpha = 1.0
        self.status = ip.ITERATING
        self.qp_iters_last = 0
        self.qp_iters_total = 0
        self.xQx = 0.0
        self.sQs = 0.0
        self.norm_dx = 0.0
        self.norm_x = 0.0
        self.norm_inf = jnp.inf
        self.norm_grd_L = jnp.inf
        self.norm_df = 0.0
        self.f_bak = 0.0
        self.grd_L = None
        self._hot_started_sqp = False

    # -- setup ---------------------------------------------------------------

    def init(self):
        """Analog of prg_setup + sqp_init."""
        self.x = self.prg.setup()
        f, qp = self.prg.make_qp(self.x)
        self.f, self.qp = f, qp
        if self._kkt_backend is None:
            if isinstance(qp, StageQP):
                from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
                self._kkt_backend = PartitionedKKT()
            else:
                self._kkt_backend = kkt.DenseKKT()
        # rebind (not mutate): the IP solver is hash-identified by its
        # config including the backend; see Mehrotra.with_backend
        self.qp_solver = self.qp_solver.with_backend(self._kkt_backend)
        self.ip_state = self.qp_solver.init_state(qp)
        if getattr(self.hela, "init_multipliers", False):
            # least-squares multiplier initialization before the first
            # Hessian scale estimate (Hqp_HL::est_y, hqp/Hqp_HL.C)
            from hqp_tpu.utils.diagnostics import est_y
            self.y = est_y(qp)
        else:
            self.y = mk.fill(qp.eq_offsets(), 0.0)
        self.z = mk.fill(mk.tmap(lambda m: m.astype(jnp.float64),
                                 qp.ineq_mask()), 0.0)
        self.iter = 0
        self.inf_iters = 0
        self.alpha = 1.0
        self.status = ip.ITERATING
        self.subclass_init()

    def subclass_init(self):
        pass

    def simulate(self):
        """prg_simulate: initial-value rollout before solving."""
        if hasattr(self.prg, "simulate"):
            self.x = self.prg.simulate(self.x)
            f, qp = self.prg.make_qp(self.x, Q=self.qp.Q if self.qp is not
                                     None else None)
            self.f, self.qp = f, qp

    # -- qp_update (hqp/Hqp_SqpSolver.C:206-267) ----------------------------

    def qp_update(self):
        prg = self.prg
        if self.iter == 0:
            f, qp = prg.make_qp(self.x)
            Qb = self.hela.init(prg, self.x, self.y, self.z,
                                prg.q_to_blocks(qp.Q))
            qp = dataclasses.replace(qp, Q=prg.q_from_blocks(Qb))
            self.f, self.qp = f, qp
            import numpy as np
            st = np.asarray(_update_stats(qp, self.x, f, f, qp.c))
            self.xQx = float(st[0])
            self.sQs = self.xQx
            self.norm_inf = float(st[1])
            self.norm_df = 0.0
            self.norm_grd_L = float(st[3])
            self.norm_x = float(st[4])
            self.grd_L = qp.c
        else:
            dL_old = _grd_L_of_qp(self.qp, self.y, self.z)
            f, qp = prg.make_qp(self.x, Q=self.qp.Q)
            self.f, self.qp = f, qp
            grd_L = _grd_L_of_qp(qp, self.y, self.z)
            dL = jnp.where(qp.x_mask(), grd_L - dL_old, 0.0)
            if hasattr(self.hela, "bind"):
                # exact-Hessian strategies re-evaluate at the iterate
                # (Hqp_HL_Gerschgorin role)
                self.hela.bind(prg, self.x, self.y, self.z)
            Qb = self.hela.update(prg.q_to_blocks(qp.Q),
                                  prg.split_blocks(self.d),
                                  prg.split_blocks(dL), self.alpha)
            qp = dataclasses.replace(qp, Q=prg.q_from_blocks(Qb))
            self.qp = qp
            self.grd_L = grd_L
            import numpy as np
            st = np.asarray(_update_stats(qp, self.x, f, self.f_bak,
                                          grd_L))
            self.xQx = float(st[0])
            self.norm_inf = float(st[1])
            self.norm_df = float(st[2])
            self.norm_grd_L = float(st[3])

    # -- qp_solve (hqp/Hqp_SqpSolver.C:270-302) ------------------------------

    def qp_solve(self):
        self.f_bak = self.f
        hot = (self.iter > 0 and self.status == ip.OPTIMAL
               and self.alpha > self.min_alpha)
        self.ip_state = self.qp_solver.solve(self.qp, self.ip_state, hot=hot)
        self.s = self.ip_state.x
        self.y = self.ip_state.y
        self.z = self.ip_state.z
        self.status = int(self.ip_state.result)
        self.qp_iters_last = int(self.ip_state.iter)
        self.qp_iters_total += self.qp_iters_last
        import numpy as np
        st = np.asarray(_solve_stats(self.qp, self.s))
        self.sQs = float(st[0])
        self.norm_dx = float(st[1])

    # -- MPC hot start (hqp/Hqp_SqpSolver.C:321-340, hqp_solve.tcl:76-78) ----

    def qp_reinit_bd(self):
        """Re-initialize bounds/values after problem data changed (e.g. a
        shifted initial state in an MPC loop), snapshotting or restoring
        the Hessian of the last cold solution."""
        if hasattr(self.prg, "repin"):
            self.x = self.prg.repin(self.x)
        f, qp = self.prg.update_fbd_qp(self.qp, self.x, self.x)
        self.f, self.qp = f, qp
        self.norm_inf = float(infeasibility(qp))
        if not self._hot_started_sqp:
            self._qp_Q_hot = self.qp.Q
            self._hot_started_sqp = True
        else:
            self.qp = dataclasses.replace(self.qp, Q=self._qp_Q_hot)

    def solve_hot(self, max_iters=None):
        """Re-solve after a bound change, reusing the SQP iterate,
        multipliers, Hessian snapshot and the IP's (z, w) hot-start pair
        (hqp_solve_hot, hqp/hqp_solve.tcl:76-78)."""
        self.qp_reinit_bd()
        return self.solve(max_iters=max_iters, hot=True)

    # -- hessian restart (hqp/Hqp_SqpSolver.C:305-318) -----------------------

    def hela_restart(self):
        Q0 = jnp.zeros_like(self.prg.q_to_blocks(self.qp.Q))
        Qb = self.hela.init(self.prg, self.x, self.y, self.z, Q0)
        self.qp = dataclasses.replace(self.qp, Q=self.prg.q_from_blocks(Qb))

    # -- rescue for suboptimal QP (hqp/Hqp_SqpSolver.C:343-369) --------------

    def feasible_vals(self):
        old_norm_inf = max(self.norm_inf, self.eps)
        self.y = mk.fill(self.y, 0.0)
        self.z = mk.fill(self.z, 0.0)
        x0 = self.x
        alpha = 1.0
        while True:
            xk = x0 + alpha * self.s
            f, qp = self.prg.update_fbd_qp(self.qp, x0, xk)
            self.x, self.f, self.qp = xk, f, qp
            ninf = float(infeasibility(qp))
            self.norm_inf = ninf
            if jnp.isfinite(f) and ninf < 1e2 * old_norm_inf:
                break
            alpha *= 0.5
            if alpha <= self.min_alpha:
                break
        self.alpha = alpha
        self.d = alpha * self.s

    # -- step (hqp/Hqp_SqpSolver.C:372-405) ----------------------------------

    def step(self):
        if self.status == ip.SUBOPTIMAL:
            self.feasible_vals()
        else:
            self.update_vals()
            if self.alpha <= self.min_alpha:
                self.feasible_vals()
        import numpy as np
        st = np.asarray(_step_stats(self.qp, self.x))
        self.norm_x = float(st[0])
        self.norm_inf = float(st[1])
        self.iter += 1
        if self.status not in (ip.OPTIMAL, ip.FEASIBLE):
            self.inf_iters += 1
        else:
            self.inf_iters = 0

    def update_vals(self):
        raise NotImplementedError

    # -- driver loop (hqp/hqp_solve.tcl:83-265) ------------------------------

    def solve(self, max_iters=None, hot=False):
        if max_iters is not None:
            self.max_iters = max_iters
        if self.x is None:
            self.init()
        eps = self.eps
        nullsteps = 0
        skip_update = hot  # hot start cannot reuse higher-order info
        while True:
            if skip_update:
                skip_update = False
            else:
                self.qp_update()
            if not (jnp.isfinite(self.f) and jnp.isfinite(self.norm_inf)):
                raise SqpError("evaluation")
            if self.logging:
                self._log_row()
            hela_restart = False
            if self.xQx < 0.0:
                self.hela_restart()
                hela_restart = True
            if self.iter > 0 and self.norm_inf < eps \
                    and self.norm_grd_L < eps:
                break
            self.qp_solve()
            if self.qp_iters_last == 0 and self.status != ip.OPTIMAL:
                raise SqpError(ip.RESULT_STRINGS[self.status])
            if self.sQs < 0.0:
                self.hela_restart()
                hela_restart = True
            if self.iter > 0 and self.sQs >= 0.0 and not hela_restart:
                if self.norm_inf < eps and self.status == ip.OPTIMAL:
                    if self.sQs < eps * eps:
                        break
                    if self.iter > 2 and \
                            self.norm_dx < eps * self.norm_x and \
                            self.norm_df < eps * abs(float(self.f)) and \
                            self.sQs < eps:
                        break
            self.step()
            if self.qp_iters_last >= self.qp_solver.max_iters \
                    and self.status != ip.FEASIBLE:
                raise SqpError("subiters")
            if self.iter >= self.max_iters:
                raise SqpError("iters")
            if self.inf_iters >= self.max_inf_iters:
                if self.status == ip.SUBOPTIMAL:
                    raise SqpError("infeasible")
                raise SqpError("degenerate")
            if self.alpha < 1e-8 and \
                    self.norm_df < eps * abs(float(self.f)):
                nullsteps += 1
            else:
                nullsteps = 0
            if nullsteps > 5:
                raise SqpError("stall")
        return "optimal"

    def _log_row(self):
        print(f"{self.iter:3d} {float(self.f):12.6g} "
              f"{self.norm_inf:10.4g} {self.norm_grd_L:10.4g} "
              f"[{self.qp_iters_last:3d}] {self.norm_dx:10.4g} "
              f"{self.sQs:10.4g} {self.alpha:8.3g}", flush=True)


def solve(prg, solver="Powell", **kw):
    """Convenience: build the named SQP solver for a program and run it.

    Mirrors the odc driver flow prg_setup; prg_simulate; sqp_init; hqp_solve
    (odc/run:26-79)."""
    s = modules.create("sqp_solver", solver, prg, **kw)
    s.init()
    s.simulate()
    result = s.solve()
    return s, result
