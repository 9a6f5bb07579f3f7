"""Powell SQP globalization: exact penalty line search with watchdog.

Faithful re-implementation of hqp/Hqp_SqpPowell.C:

* penalty update  r_i = |z_i|            on the first iteration,
                  r_i = max(|z_i|, (|z_i| + r_i)/2)  afterwards  (C:118-150),
* penalty function phi = f + re'|b| - r'min(0, d)   (C:189-210),
* predicted phi1 at the full QP step                (C:213-244),
* backtracking line search with the quadratic-interpolation lower bound
  n_alpha = 0.5 d0 a^2 / (d0 a - (phik - phi0))     (C:350-377),
* watchdog relaxation with backing store            (C:280-346),
* optionally damped multipliers                     (C:253-260, 353-356).
"""

from __future__ import annotations

import jax.numpy as jnp

import jax
import numpy as np

from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.sqp.solver import SqpSolver, _phi, _phi1
from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules


@jax.jit
def _phi_pair(f, qp, s, re, r):
    """[phi(x), phi1(x + s)] in one device array -- one host transfer
    per line-search setup instead of two."""
    return jnp.stack([_phi(f, qp, re, r), _phi1(f, qp, s, re, r)])


@jax.jit
def _ls_stats(f, qp, re, r):
    """[f, phi] per line-search trial in one transfer."""
    return jnp.stack([f, _phi(f, qp, re, r)])


@modules.register("sqp_solver", "Powell")
class SqpPowell(SqpSolver):
    name = "Powell"

    def __init__(self, prg, watchdog_start=10, watchdog_credit=0,
                 damped_multipliers=False, **kw):
        super().__init__(prg, **kw)
        self.watchdog_start = watchdog_start
        self.watchdog_credit = watchdog_credit
        self.damped_multipliers = damped_multipliers
        self.re = None
        self.r = None

    def subclass_init(self):
        self.re = mk.fill(self.qp.eq_offsets(), 0.0)
        self.r = mk.fill(self.z, 0.0)
        self._relaxed = False
        self._watchdog_iter = -1
        self._phil = 0.0
        self._phil_test = 0.0
        self._wd_backup = None
        #: observability counters (reference logs these events when
        #: sqp_watchdog_logging, Hqp_SqpPowell.C:280-346)
        self.wd_relaxed_steps = 0
        self.wd_backouts = 0

    # penalty coefficient update (Powell's rule, C:118-150)
    def _update_r(self, z, r):
        az = mk.tmap(jnp.abs, z)
        if self.iter == 0:
            return az
        return mk.tmap(
            lambda a, ro: jnp.where(a > ro, a, 0.5 * (a + ro)), az, r)

    def update_vals(self):
        eps = self.eps
        qp = self.qp

        # update penalties with the QP multipliers (C:255-264)
        if self.damped_multipliers:
            y0, z0 = self.y, self.z
            sy_y = mk.sub(self.ip_state.y, self.y)
            sz_z = mk.sub(self.ip_state.z, self.z)
        self.y = self.ip_state.y
        self.z = self.ip_state.z
        self.re = self._update_r(self.y, self.re)
        self.r = self._update_r(self.z, self.r)

        x0 = self.x
        f0v = self.f
        qp0 = qp
        pp = np.asarray(_phi_pair(self.f, qp, self.s, self.re, self.r))
        phi0 = float(pp[0])
        phik = phi0
        dphi0 = float(pp[1]) - phi0

        alpha = self.min_alpha if dphi0 > 0.0 else 1.0

        # watchdog bookkeeping (C:280-346)
        if self.iter == 0:
            self._phil = phi0
        if self._watchdog_iter < 0:
            self._phil_test = self._phil
            self._phil = phi0
        if self.watchdog_credit > 0 and self.iter >= self.watchdog_start:
            if phi0 <= self._phil_test:
                self._relaxed = True
                self.wd_relaxed_steps += 1
                self._watchdog_iter = self.iter
                self._wd_backup = (x0, self.s, self.y, self.z)
                self._phil = phi0
                if dphi0 < 0.0:
                    self._phil_test += 0.1 * self.min_alpha * dphi0
            else:
                self._relaxed = False
            if (self._watchdog_iter >= 0 and
                    self.iter >= self._watchdog_iter + self.watchdog_credit):
                # back out to the stored iterate (C:313-345)
                self.wd_backouts += 1
                xl, qp_xl, yl, zl = self._wd_backup
                self.x = xl
                self.y, self.z = yl, zl
                f, qpn = self.prg.make_qp(self.x, Q=self.qp.Q)
                self.f, self.qp = f, qpn
                self.hela_restart()
                if self.damped_multipliers:
                    y0, z0 = self.y, self.z
                    sy_y = mk.fill(self.y, 0.0)
                    sz_z = mk.fill(self.z, 0.0)
                self.re = self._update_r(self.y, self.re)
                self.r = self._update_r(self.z, self.r)
                self.s = qp_xl
                qp = self.qp
                x0 = self.x
                pp = np.asarray(_phi_pair(self.f, qp, self.s, self.re,
                                          self.r))
                phi0 = phik = float(pp[0])
                dphi0 = float(pp[1]) - phi0
                self._phil = phi0
                self._relaxed = False
                self._watchdog_iter = -1

        # line search (C:350-377)
        while True:
            d = alpha * self.s
            xk = x0 + d
            if self.damped_multipliers and alpha < 1.0:
                self.y = mk.axpy(alpha, sy_y, y0)
                self.z = mk.axpy(alpha, sz_z, z0)
            f, qpv = self.prg.update_fbd_qp(qp0, x0, xk)
            self.x, self.f, self.qp = xk, f, qpv
            if alpha <= self.min_alpha:
                break
            if self._relaxed and self.watchdog_credit > 0:
                break  # accept full step under watchdog relaxation
            ls = np.asarray(_ls_stats(f, qpv, self.re, self.r))
            if not np.isfinite(ls[0]):
                alpha *= 0.1
                continue
            phik = float(ls[1])
            if phik <= phi0 + 0.1 * alpha * dphi0 or abs(dphi0) <= eps:
                break
            n_alpha = 0.5 * dphi0 * alpha * alpha / \
                (dphi0 * alpha - (phik - phi0))
            if abs(alpha - n_alpha) < self.min_alpha:
                break
            alpha = max(alpha * 0.1, n_alpha, self.min_alpha)

        self.alpha = alpha
        self.d = alpha * self.s
        self.dphi = dphi0
        self.phi = phi0
