"""DynamicEst: parameter and initial-state estimation with confidence
intervals.

TPU-native re-creation of the reference's Prg_DynamicEst
(omu/Prg_DynamicEst.{h,C}): least-squares fit of model outputs to
measurements over one or more experiments,

    min  sum_ex sum_k sum_i ((y_i(t_k) - y_meas)/y_nominal)^2

with selected model parameters p and/or initial states x0 estimated.
Estimated parameters are promoted to constant states (p' = 0) so the
whole problem stays a stage-structured DOCP; multiple experiments are a
vmapped batch inside the stage functions (the stage axis carries all
experiments at once -- the TPU replacement of the reference's per-thread
model instances).

After solving, the measurement sensitivity matrix M = dy/d(p, x0), the
covariance COV = s^2 (M'M)^-1 and the confidence intervals
(Prg_DynamicEst.h:225-378: mdl_p_confidence / mdl_x0_confidence) are
computed by forward-mode differentiation of the whole rollout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hqp_tpu.omu.program import OmuProgram
from hqp_tpu.omu.integrators import RK4
from hqp_tpu.omu.model import Model
from hqp_tpu.utils.registry import modules


@modules.register("prg_name", "DynamicEst")
class DynamicEst(OmuProgram):
    """Least-squares estimation over a :class:`Model`.

    State layout per stage: [p (np_est) | x (nx * n_ex)]; controls are
    the known experiment inputs (not optimized -- there are no u
    variables; inputs enter through the time grid interpolation).
    """

    name = "DynamicEst"

    def __init__(self, model: Model, ys_meas, us=None, K=None,
                 t0=0.0, tf=1.0, integrator=None,
                 p_init=None, p_min=None, p_max=None,
                 x0_init=None, estimate_x0=False):
        super().__init__(integrator if integrator is not None
                         else RK4(steps=2))
        self.model = model
        ys = np.asarray(ys_meas, np.float64)
        if ys.ndim == 2:
            ys = ys[None]
        self.n_ex = ys.shape[0]
        self.K = K if K is not None else ys.shape[1] - 1
        assert ys.shape[1] == self.K + 1
        self.ys_meas = jnp.asarray(ys)          # [n_ex, K+1, ny]
        if us is None:
            us = np.zeros((self.n_ex, self.K, model.nu))
        self.us_known = jnp.asarray(us, np.float64)
        self.t0, self.tf = float(t0), float(tf)

        self.np_est = model.npar
        self.estimate_x0 = estimate_x0
        self.nx = self.np_est + model.nx * self.n_ex
        self.nu = 0
        self.mc = 0

        self.p_init = np.broadcast_to(
            np.asarray(p_init if p_init is not None else model.p0,
                       np.float64), (self.np_est,)).copy()
        self.p_min = np.broadcast_to(
            np.asarray(p_min if p_min is not None else -np.inf),
            (self.np_est,)).copy()
        self.p_max = np.broadcast_to(
            np.asarray(p_max if p_max is not None else np.inf),
            (self.np_est,)).copy()
        self.x0_init = np.broadcast_to(
            np.asarray(x0_init if x0_init is not None else 0.0,
                       np.float64), (self.n_ex, model.nx)).copy()
        self.ynom = jnp.asarray(np.broadcast_to(
            np.asarray(model.y_nominal if model.y_nominal is not None
                       else 1.0, np.float64), (model.ny,)))

    def setup_vars(self):
        K1, nx = self.K + 1, self.nx
        inf = np.inf
        x_min = np.full((K1, nx), -inf)
        x_max = np.full((K1, nx), inf)
        x_min[:, : self.np_est] = self.p_min
        x_max[:, : self.np_est] = self.p_max
        x_init = np.zeros((K1, nx))
        x_init[:, : self.np_est] = self.p_init
        x_init[:, self.np_est:] = self.x0_init.reshape(-1)
        if not self.estimate_x0:
            x_min[0, self.np_est:] = x_max[0, self.np_est:] = \
                self.x0_init.reshape(-1)
        return dict(x_min=x_min, x_max=x_max, x_init=x_init)

    # -- stage maps ----------------------------------------------------------

    def _split(self, xall):
        p = xall[: self.np_est]
        xs = xall[self.np_est:].reshape(self.n_ex, self.model.nx)
        return p, xs

    def continuous(self, kk, t, x, u, dx):
        p, xs = self._split(x)
        uk = self.us_known[:, jnp.minimum(kk, self.K - 1)]   # [n_ex, nu]
        dxs = jax.vmap(lambda xe, ue: self.model.ode(t, xe, ue, p))(
            xs, uk)
        F = jnp.concatenate([jnp.zeros(self.np_est),
                             dxs.reshape(-1)])
        return F - dx

    def _residuals(self, kk, t, x):
        p, xs = self._split(x)
        uk = self.us_known[:, jnp.minimum(kk, self.K - 1)]
        ys = jax.vmap(lambda xe, ue: self.model.outputs(t, xe, ue, p))(
            xs, uk)                                          # [n_ex, ny]
        ym = self.ys_meas[:, jnp.minimum(kk, self.K)]
        return (ys - ym) / self.ynom

    def update(self, kk, x, u, xf):
        t = self.ts[jnp.minimum(kk, self.K)]
        r = self._residuals(kk, t, x)
        f0 = jnp.sum(r * r)
        return xf, f0, jnp.zeros((0,))

    # -- post-processing: covariance and confidence intervals ----------------

    def confidence(self, v):
        """COV and ~95% confidence half-widths for the estimates
        (Prg_DynamicEst.h:225-378).  v: converged iterate [K1, nv]."""
        theta0 = jnp.concatenate(
            [v[0, : self.np_est],
             v[0, self.np_est: self.nx]])

        def all_res(theta):
            p = theta[: self.np_est]
            x0 = theta[self.np_est:]
            x = jnp.concatenate([p, x0])

            def stepk(xk, k):
                t0k, t1k = self.ts[k], self.ts[k + 1]
                xn = self.integrator.solve(self.continuous, k, t0k, t1k,
                                           xk, jnp.zeros((0,)))
                return xn, xk

            xK, xs = jax.lax.scan(stepk, x, jnp.arange(self.K))
            xs = jnp.concatenate([xs, xK[None]], axis=0)
            rs = jax.vmap(lambda k, xk: self._residuals(
                k, self.ts[jnp.minimum(k, self.K)], xk))(
                    jnp.arange(self.K + 1), xs)
            return rs.reshape(-1)

        r = all_res(theta0)
        M = jax.jacfwd(all_res)(theta0)
        dof = max(r.shape[0] - theta0.shape[0], 1)
        s2 = jnp.sum(r * r) / dof
        cov = s2 * jnp.linalg.inv(M.T @ M + 1e-300 * jnp.eye(M.shape[1]))
        half = 1.96 * jnp.sqrt(jnp.diagonal(cov))
        return cov, half
