"""Further Omuses example programs from the reference's odc suite.

BatchReactor (odc/Prg_BatchReactor.C), Bio (odc/Prg_Bio.C), and the
Omu-layer variants of HS99/TP383 run as single-stage problems elsewhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hqp_tpu.omu.program import OmuProgram
from hqp_tpu.omu.integrators import RK4, IMP
from hqp_tpu.utils.registry import modules


@modules.register("prg_name", "BatchReactor")
class PrgBatchReactor(OmuProgram):
    """Optimal control of a batch reactor (odc/Prg_BatchReactor.C):
    maximize final product x2 with reaction x1 -> x2, control bounds
    0 <= u <= 5; f* = -0.57354 for kinf = 0.5, K = 40."""

    name = "BatchReactor"
    nx = 2
    nu = 1
    mc = 0
    t0, tf = 0.0, 1.0

    def __init__(self, K=40, kinf=0.5, integrator=None):
        super().__init__(integrator if integrator is not None
                         else RK4(steps=4))
        self.K = K
        self.kinf = kinf

    def setup_vars(self):
        K, K1 = self.K, self.K + 1
        inf = np.inf
        x_min = np.full((K1, 2), -inf)
        x_max = np.full((K1, 2), inf)
        x_init = np.full((K1, 2), 0.5)
        x_min[0] = x_max[0] = x_init[0] = (1.0, 0.0)
        x_min[1:] = 0.0
        x_max[1:, 1] = 1.0
        return dict(
            x_min=x_min, x_max=x_max, x_init=x_init,
            u_min=np.zeros((K, 1)), u_max=np.full((K, 1), 5.0),
            u_init=np.ones((K, 1)),
        )

    def continuous(self, kk, t, x, u, dx):
        F0 = -(u[0] + self.kinf * u[0] * u[0]) * x[0] - dx[0]
        F1 = u[0] * x[0] - dx[1]
        return jnp.array([F0, F1])

    def update(self, kk, x, u, xf):
        KK = self.K * self.sps
        f0 = jnp.where(kk >= KK, -x[1], 0.0)
        return xf, f0, jnp.zeros((0,))


@modules.register("prg_name", "Bio")
class PrgBio(OmuProgram):
    """Fed-batch fermentation process (odc/Prg_Bio.C, Pfaff 1991):
    maximize product profit minus substrate cost; states (product mass,
    added substrate), control = substrate inflow in [0, 0.1]."""

    name = "Bio"
    nx = 2
    nu = 1
    mc = 0

    def __init__(self, K=51, tf=10.0, cs0=5.0, uinit=0.01,
                 integrator=None):
        super().__init__(integrator if integrator is not None
                         else IMP(steps=4))
        self.K = K
        self.t0, self.tf = 0.0, tf
        # kinetic and stochiometric parameters (Prg_Bio.C:66-85)
        self.pimax, self.ks, self.kis, self.kip = 0.16, 1.0, 160.0, 75.0
        self.kd, self.yps, self.kappa, self.cdos = 0.006, 0.55, 600.0, 750.0
        self.kp, self.kap, self.kos = 0.08, 0.1, 0.02
        self.cs0 = cs0
        self.v0 = 5.0
        self.p0 = 0.0
        self.x0m = 30.0 * self.v0
        self.Fsmin, self.Fsmax = 0.0, 0.1
        self.uinit = uinit

    def setup_vars(self):
        K, K1 = self.K, self.K + 1
        inf = np.inf
        x_min = np.full((K1, 2), -inf)
        x_max = np.full((K1, 2), inf)
        x_init = np.zeros((K1, 2))
        x_min[0] = x_max[0] = x_init[0] = (self.p0, 0.0)
        x_min[1:] = 0.0
        return dict(
            x_min=x_min, x_max=x_max, x_init=x_init,
            u_min=np.full((K, 1), self.Fsmin),
            u_max=np.full((K, 1), self.Fsmax),
            u_init=np.full((K, 1), self.uinit),
        )

    def _concentrations(self, x):
        v = self.v0 + (x[0] - self.p0) / self.kappa + x[1]
        s = self.cs0 * self.v0 - (x[0] - self.p0) / self.yps \
            + self.cdos * x[1]
        cs = jnp.maximum(s / v, 0.0)
        cp = jnp.maximum(x[0] / v, 0.0)
        return cs, cp

    def continuous(self, kk, t, x, u, dx):
        cs, cp = self._concentrations(x)
        Pi = self.x0m * self.pimax * jnp.exp(-self.kd * t - cp / self.kip) \
            * cs / (self.ks + cs + cs * cs / self.kis)
        return jnp.array([Pi - dx[0], u[0] - dx[1]])

    def update(self, kk, x, u, xf):
        KK = self.K * self.sps
        f0 = jnp.where(
            kk >= KK,
            -((self.kp + self.kap / self.kappa) * x[0]
              - (self.kos * self.cdos + self.kap) * x[1]
              - self.kap * self.v0 + self.kap / self.kappa * self.p0),
            0.0)
        return xf, f0, jnp.zeros((0,))
