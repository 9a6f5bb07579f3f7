"""DynamicOpt: the flagship weighted optimal-control formulation.

TPU-native re-creation of the reference's Prg_DynamicOpt
(omu/Prg_DynamicOpt.{h,C}; formulation documented at Prg_DynamicOpt.h:
36-200): optimal control of a hosted model with a fully weighted
objective

    J = sum_initial + sum_path + sum_final  of
        y_lin*y + y_quad*((y - y_ref)/y_nominal)^2
      + u_lin*u + u_quad*((u - u_ref)/u_nominal)^2
      + du_quad*(du/dt)^2
  and soft path constraints  y_soft_min <= y <= y_soft_max  penalized
  quadratically with weight s_quad  (the reference's slack-variable soft
  constraints, Prg_DynamicOpt.h soft formulation; here realized as exact
  quadratic penalties -- equivalent for the quadratic term, without the
  extra slack variables).

Controls are piecewise constant over sample periods (mdl_u_order = 0);
hard bounds on y are expressed through the general constraint path.
About 50 of the reference's mdl_* knobs map onto the constructor
arguments / attributes here (Prg_DynamicOpt.C:121-170).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hqp_tpu.omu.program import OmuProgram
from hqp_tpu.omu.integrators import RK4
from hqp_tpu.omu.model import Model
from hqp_tpu.utils.registry import modules


@modules.register("prg_name", "DynamicOpt")
class DynamicOpt(OmuProgram):
    """Weighted optimal control of a :class:`Model` over [t0, tf]."""

    name = "DynamicOpt"

    def __init__(self, model: Model, K: int = 50, t0=0.0, tf=1.0,
                 integrator=None,
                 x0=None, x0_fixed=True,
                 u_min=None, u_max=None, u_init=None,
                 y_ref=None, y_weight2=None, y_weight1=None,
                 yf_ref=None, yf_weight2=None, yf_weight1=None,
                 u_ref=None, u_weight2=None, du_weight2=None,
                 y_min=None, y_max=None,
                 y_soft_min=None, y_soft_max=None, s_quad=1e4):
        super().__init__(integrator if integrator is not None
                         else RK4(steps=2))
        self.model = model
        self.K = K
        self.t0, self.tf = float(t0), float(tf)
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
        self.du_w2 = jnp.asarray(arr(du_weight2, model.nu, 0.0))
        self.y_min = arr(y_min, ny, -np.inf)
        self.y_max = arr(y_max, ny, np.inf)
        self.y_soft_min = jnp.asarray(arr(y_soft_min, ny, -np.inf))
        self.y_soft_max = jnp.asarray(arr(y_soft_max, ny, np.inf))
        self.s_quad = s_quad
        self.ynom = jnp.asarray(arr(model.y_nominal, ny, 1.0))

        # hard output bounds become general constraint rows
        self._hard = (np.isfinite(self.y_min)
                      | np.isfinite(self.y_max)).any()
        self.mc = ny if self._hard else 0

        self._p = model.default_p()

    # -- bounds --------------------------------------------------------------

    def setup_vars(self):
        K, K1, nx, nu = self.K, self.K + 1, self.nx, self.nu
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
            c_min = np.tile(np.where(np.isfinite(self.y_min),
                                     self.y_min, -inf), (K1, 1))
            c_max = np.tile(np.where(np.isfinite(self.y_max),
                                     self.y_max, inf), (K1, 1))
            out["c_min"] = c_min
            out["c_max"] = c_max
        return out

    # -- dynamics + objective ------------------------------------------------

    def continuous(self, kk, t, x, u, dx):
        return self.model.ode(t, x, u, self._p) - dx

    def _stage_cost(self, kk, t, x, u, final):
        y = self.model.outputs(t, x, u, self._p)
        ys = (y - jnp.where(final, self.yf_ref, self.y_ref)) / self.ynom
        w2 = jnp.where(final, self.yf_w2, self.y_w2)
        w1 = jnp.where(final, self.yf_w1, self.y_w1)
        J = jnp.sum(w2 * ys * ys) + jnp.sum(w1 * y)
        # soft output constraints (quadratic penalty)
        lo = jnp.where(jnp.isfinite(self.y_soft_min),
                       jnp.maximum(0.0, self.y_soft_min - y), 0.0)
        hi = jnp.where(jnp.isfinite(self.y_soft_max),
                       jnp.maximum(0.0, y - self.y_soft_max), 0.0)
        J = J + self.s_quad * (jnp.sum(lo * lo) + jnp.sum(hi * hi))
        # control terms (path only)
        us = u - self.u_ref
        J = J + jnp.where(final, 0.0, jnp.sum(self.u_w2 * us * us))
        return J

    def update(self, kk, x, u, xf):
        KK = self.K * self.sps
        t = self.ts[kk]
        final = kk >= KK
        f0 = self._stage_cost(kk, t, x, u, final)
        if self.mc:
            c = self.model.outputs(t, x, u, self._p)
        else:
            c = jnp.zeros((0,))
        return xf, f0, c
