"""DTOpt / DTEst: discrete-time optimization and estimation formulations.

TPU-native re-creation of the reference's Prg_DTOpt / Prg_DTEst
(omu/Prg_DTOpt.{h,C}, omu/Prg_DTEst.{h,C}): the DynamicOpt / DynamicEst
formulations built directly on the DOCP layer for purely discrete-time
models -- no integrator; the model's discrete update (mdlUpdate role) is
the stage map and its outputs (mdlOutputs role) enter the weighted
criterion (Prg_DTOpt.h:1-25).  Consumes any :class:`hqp_tpu.omu.model.
Model` with ``dt_update`` -- native JAX models and hosted S-functions
(hqp_tpu.omu.hosted.HostedModel over hqp_tpu.hxi) alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hqp_tpu.docp.program import Docp
from hqp_tpu.omu.model import Model
from hqp_tpu.utils.registry import modules


@modules.register("prg_name", "DTOpt")
class DTOpt(Docp):
    """Weighted optimal control of a discrete-time model.

    Objective terms mirror Prg_DTOpt's weighted formulation: quadratic
    and linear output terms along the path and at the final stage,
    quadratic control terms, soft output bounds as quadratic penalties,
    hard output bounds as general constraint rows.
    """

    name = "DTOpt"

    def __init__(self, model: Model, K: int = 50, dt: float = 1.0,
                 x0=None, x0_fixed=True,
                 u_min=None, u_max=None, u_init=None,
                 y_ref=None, y_weight2=None, y_weight1=None,
                 yf_ref=None, yf_weight2=None, yf_weight1=None,
                 u_ref=None, u_weight2=None,
                 y_min=None, y_max=None,
                 y_soft_min=None, y_soft_max=None, s_quad=1e4):
        self.model = model
        self.K = K
        self.dt = float(dt)
        self.nx = model.nx
        self.nu = model.nu
        ny = model.ny

        def arr(v, size, default):
            if v is None:
                return np.full(size, default, np.float64)
            return np.broadcast_to(np.asarray(v, np.float64),
                                   (size,)).copy()

        self.x0 = arr(x0, model.nx, 0.0)
        self.x0_fixed = x0_fixed
        self._u_min = arr(u_min, model.nu, -np.inf)
        self._u_max = arr(u_max, model.nu, np.inf)
        self._u_init = arr(u_init, model.nu, 0.0)
        self.y_ref = jnp.asarray(arr(y_ref, ny, 0.0))
        self.y_w2 = jnp.asarray(arr(y_weight2, ny, 0.0))
        self.y_w1 = jnp.asarray(arr(y_weight1, ny, 0.0))
        self.yf_ref = jnp.asarray(arr(yf_ref, ny, 0.0))
        self.yf_w2 = jnp.asarray(arr(yf_weight2, ny, 0.0))
        self.yf_w1 = jnp.asarray(arr(yf_weight1, ny, 0.0))
        self.u_ref = jnp.asarray(arr(u_ref, model.nu, 0.0))
        self.u_w2 = jnp.asarray(arr(u_weight2, model.nu, 0.0))
        self.y_min = arr(y_min, ny, -np.inf)
        self.y_max = arr(y_max, ny, np.inf)
        self.y_soft_min = jnp.asarray(arr(y_soft_min, ny, -np.inf))
        self.y_soft_max = jnp.asarray(arr(y_soft_max, ny, np.inf))
        self.s_quad = s_quad
        self.ynom = jnp.asarray(arr(model.y_nominal, ny, 1.0))
        self._hard = (np.isfinite(self.y_min)
                      | np.isfinite(self.y_max)).any()
        self.mc = ny if self._hard else 0
        self._p = model.default_p()

    def setup_vars(self):
        K, K1, nx = self.K, self.K + 1, self.nx
        inf = np.inf
        x_min = np.full((K1, nx), -inf)
        x_max = np.full((K1, nx), inf)
        x_init = np.tile(self.x0, (K1, 1))
        if self.x0_fixed:
            x_min[0] = x_max[0] = self.x0
        out = dict(
            x_min=x_min, x_max=x_max, x_init=x_init,
            u_min=np.tile(self._u_min, (K, 1)),
            u_max=np.tile(self._u_max, (K, 1)),
            u_init=np.tile(self._u_init, (K, 1)),
        )
        if self._hard:
            out["c_min"] = np.tile(self.y_min, (K1, 1))
            out["c_max"] = np.tile(self.y_max, (K1, 1))
        return out

    # -- stage maps ------------------------------------------------------------
    def f(self, k, x, u):
        return self.model.dt_update(k * self.dt, x, u, self._p)

    def _y(self, k, x, u):
        return self.model.outputs(k * self.dt, x, u, self._p)

    def f0(self, k, x, u):
        y = self._y(k, x, u)
        final = k >= self.K
        ys = (y - jnp.where(final, self.yf_ref, self.y_ref)) / self.ynom
        w2 = jnp.where(final, self.yf_w2, self.y_w2)
        w1 = jnp.where(final, self.yf_w1, self.y_w1)
        J = jnp.sum(w2 * ys * ys) + jnp.sum(w1 * y)
        lo = jnp.where(jnp.isfinite(self.y_soft_min),
                       jnp.maximum(0.0, self.y_soft_min - y), 0.0)
        hi = jnp.where(jnp.isfinite(self.y_soft_max),
                       jnp.maximum(0.0, y - self.y_soft_max), 0.0)
        J = J + self.s_quad * (jnp.sum(lo * lo) + jnp.sum(hi * hi))
        us = u - self.u_ref
        return J + jnp.where(final, 0.0, jnp.sum(self.u_w2 * us * us))

    def c(self, k, x, u):
        if not self._hard:
            return jnp.zeros((0,))
        return self._y(k, x, u)


@modules.register("prg_name", "DTEst")
class DTEst(Docp):
    """Discrete-time least-squares estimation (Prg_DTEst role): fit the
    model's outputs to measurements over one or more experiments,
    estimating parameters (promoted to constant states) and optionally
    initial states; confidence intervals as in DynamicEst."""

    name = "DTEst"

    def __init__(self, model: Model, ys_meas, us=None, K=None,
                 dt: float = 1.0,
                 p_init=None, p_min=None, p_max=None,
                 x0_init=None, estimate_x0=False):
        self.model = model
        ys = np.asarray(ys_meas, np.float64)
        if ys.ndim == 2:
            ys = ys[None]
        self.n_ex = ys.shape[0]
        self.K = K if K is not None else ys.shape[1] - 1
        assert ys.shape[1] == self.K + 1
        self.ys_meas = jnp.asarray(ys)
        if us is None:
            us = np.zeros((self.n_ex, self.K, model.nu))
        self.us_known = jnp.asarray(us, np.float64)
        self.dt = float(dt)

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

    def _split(self, xall):
        p = xall[: self.np_est]
        xs = xall[self.np_est:].reshape(self.n_ex, self.model.nx)
        return p, xs

    def f(self, k, x, u):
        p, xs = self._split(x)
        uk = self.us_known[:, jnp.minimum(k, self.K - 1)]
        t = k * self.dt
        xn = jax.vmap(lambda xe, ue: self.model.dt_update(t, xe, ue, p))(
            xs, uk)
        return jnp.concatenate([p, xn.reshape(-1)])

    def _residuals(self, k, x):
        p, xs = self._split(x)
        uk = self.us_known[:, jnp.minimum(k, self.K - 1)]
        t = k * self.dt
        ys = jax.vmap(lambda xe, ue: self.model.outputs(t, xe, ue, p))(
            xs, uk)
        ym = self.ys_meas[:, jnp.minimum(k, self.K)]
        return (ys - ym) / self.ynom

    def f0(self, k, x, u):
        r = self._residuals(k, x)
        return jnp.sum(r * r)

    def confidence(self, v):
        """COV and ~95% confidence half-widths (Prg_DTEst / DynamicEst
        confidence computation, omu/Prg_DynamicEst.h:225-378)."""
        theta0 = jnp.concatenate(
            [v[0, : self.np_est], v[0, self.np_est: self.nx]])

        def all_res(theta):
            x = theta

            def stepk(xk, k):
                return self.f(k, xk, jnp.zeros((0,))), xk

            xK, xs = jax.lax.scan(stepk, x, jnp.arange(self.K))
            xs = jnp.concatenate([xs, xK[None]], axis=0)
            rs = jax.vmap(self._residuals)(jnp.arange(self.K + 1), xs)
            return rs.reshape(-1)

        r = all_res(theta0)
        M = jax.jacfwd(all_res)(theta0)
        dof = max(r.shape[0] - theta0.shape[0], 1)
        s2 = jnp.sum(r * r) / dof
        cov = s2 * jnp.linalg.inv(M.T @ M + 1e-300 * jnp.eye(M.shape[1]))
        half = 1.96 * jnp.sqrt(jnp.diagonal(cov))
        return cov, half


# back-compat aliases, as in the reference (Prg_DynamicOpt.h:947,
# Prg_DynamicEst.h:508 register SFunctionOpt/SFunctionEst)
def _alias(name, base_slot_name):
    def factory(*args, **kwargs):
        return modules.create("prg_name", base_slot_name, *args, **kwargs)
    modules.register("prg_name", name)(factory)


_alias("SFunctionOpt", "DynamicOpt")
_alias("SFunctionEst", "DynamicEst")
