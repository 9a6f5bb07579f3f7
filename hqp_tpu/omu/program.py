"""Omuses front-end: continuous-time multistage programs.

The TPU-native analog of ``Omu_Program`` + ``Hqp_Omuses``
(omu/Omu_Program.{h,C}, omu/Hqp_Omuses.C): a user describes a dynamic
optimization problem by

* ``setup_stages`` -- horizon/time grid (stages_alloc semantics,
  omu/Omu_Program.C:853-878: K stages x sps sample periods over [t0, tf]),
* ``setup_vars``   -- bounds and initial guesses (Omu_VariableVec min/max),
* ``consistic``    -- consistent initial/expansion states per sample period,
* ``continuous``   -- implicit DAE residual F(kk, t, x, u, dx) = 0,
* ``update``       -- discrete-time update/criterion/constraints; receives
  the start-of-period state x and the integrated end state xf, returns
  (f, f0, c) with f defaulting to xf (omu/Hqp_Omuses.C:566-780 chains
  consistic -> integrator -> update per sample period and composes the
  Jacobians; here the whole chain is one differentiable function and
  jacfwd does the composing).

The class lowers onto :class:`hqp_tpu.docp.program.Docp` by overriding the
combined stage evaluation; everything downstream (SQP, IP, Riccati) is
shared.
"""

from __future__ import annotations

import jax.numpy as jnp

from hqp_tpu.docp.program import Docp
from hqp_tpu.omu.integrators import RK4, Integrator
from hqp_tpu.utils.registry import modules


class OmuProgram(Docp):
    """Continuous-time multistage program over an exchangeable integrator."""

    sps: int = 1          # sample periods per stage (stages_alloc 'sps')
    t0: float = 0.0
    tf: float = 1.0

    def __init__(self, integrator: Integrator | None = None):
        self.integrator = integrator if integrator is not None else RK4()
        self.ts = None

    # -- user interface ------------------------------------------------------

    def setup_stages(self):
        """Default uniform grid (omu/Omu_Program.C stages_alloc)."""
        KK = self.K * self.sps
        self.ts = jnp.linspace(self.t0, self.tf, KK + 1)

    def consistic(self, kk, t, x, u):
        """Consistent initial states of a sample period (default: pass x)."""
        return x

    def continuous(self, kk, t, x, u, dx):
        """Implicit residual F(kk, t, x, u, dx); override for models with
        continuous dynamics.  Components never written stay 0, meaning
        xdot = 0 for explicit integrators (matching the reference's
        untouched-F convention, e.g. odc/Prg_Crane.C:164-175)."""
        return jnp.zeros_like(x)

    def update(self, kk, x, u, xf):
        """Discrete update at the end of sample period kk.

        Returns (f, f0, c); default passes the integrated state through
        and contributes nothing to criterion/constraints."""
        return xf, jnp.asarray(0.0), jnp.zeros((self.mc,))

    def has_continuous(self) -> bool:
        return True

    # -- lowering onto Docp --------------------------------------------------

    def setup(self):
        self.setup_stages()
        # Per-sample-period constraint rows: the user's `mc` counts the
        # constraints one update() call returns; with sps sample periods
        # per stage, EACH period contributes its own rows (the reference
        # keeps separate rows per kk, omu/Hqp_Omuses.C:566-780 --
        # summing them would let a violation in one period cancel
        # against slack in another, a feasibility bug).  Stage-level
        # arrays are therefore sps*mc wide; the terminal pseudo-stage
        # has one update() call, its rows beyond the first mc block are
        # masked off via infinite bounds.
        if not hasattr(self, "_mc_user"):
            self._mc_user = self.mc
        self.mc = self._mc_user * (self.sps if self._mc_user else 1)
        return super().setup()

    def _setup_vars_processed(self):
        import numpy as np

        # user code (setup_vars) sees the per-period constraint count;
        # the assembly (Docp.setup) sees the widened stage-level count
        self.mc = self._mc_user
        try:
            v = dict(self.setup_vars())
        finally:
            self.mc = self._mc_user * (self.sps if self._mc_user else 1)
        mcu, sps = self._mc_user, self.sps
        if mcu and sps > 1:
            for key in ("c_min", "c_max"):
                a = v.get(key)
                if a is None:
                    continue
                a = np.asarray(a, np.float64).reshape(self.K + 1, mcu)
                wide = np.tile(a, (1, sps))
                # terminal stage: only the first per-period block exists
                fill = -np.inf if key == "c_min" else np.inf
                wide[-1, mcu:] = fill
                v[key] = wide
        return v

    def _period(self, kk, t0k, t1k, x, u):
        x0 = self.consistic(kk, t0k, x, u)
        if self.has_continuous():
            xf = self.integrator.solve(self.continuous, kk, t0k, t1k, x0, u)
        else:
            xf = x0
        return self.update(kk, x0, u, xf)

    def stage_all(self, k, x, u):
        """Chain the stage's sample periods; constraint rows CONCATENATE
        per period (one block per kk, omu/Hqp_Omuses.C:566-780)."""
        f0sum = jnp.asarray(0.0)
        cs = []
        xcur = x
        for j in range(self.sps):
            kk = k * self.sps + j
            t0k = self.ts[kk]
            t1k = self.ts[kk + 1]
            f, f0, c = self._period(kk, t0k, t1k, xcur, u)
            f0sum = f0sum + f0
            cs.append(jnp.atleast_1d(c))
            xcur = f
        call = (jnp.concatenate(cs) if self._mc_user
                else jnp.zeros((self.mc,)))
        return xcur, f0sum, call

    def stage_final(self, x, u):
        """Terminal stage: update() with kk = KK and xf = x, no dynamics.
        Rows beyond the first per-period block are padding (masked by
        infinite bounds, see _setup_vars_processed)."""
        KK = self.K * self.sps
        x0 = self.consistic(jnp.asarray(KK), self.ts[-1], x, u)
        _, f0, c = self.update(jnp.asarray(KK), x0, u, x0)
        c = jnp.atleast_1d(c)
        if self._mc_user and self.sps > 1:
            c = jnp.concatenate(
                [c, jnp.zeros(((self.sps - 1) * self._mc_user,))])
        return f0, c
