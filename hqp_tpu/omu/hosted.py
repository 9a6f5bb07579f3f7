"""Hosted models: external (non-JAX) models inside the JAX compute path.

Bridges an hxi evaluator (compiled S-function, Python S-function, or FMU
-- hqp_tpu/hxi) into the :class:`hqp_tpu.omu.model.Model` protocol that
the DynamicOpt/DynamicEst/DTOpt formulations consume.  Host evaluation
crosses the device boundary via ``jax.pure_callback`` (sequential under
vmap, like the reference's per-thread host model instances,
omu/Omu_Model.h:55), and differentiation uses ``jax.custom_jvp`` whose
rule fetches the model Jacobian from the host: analytic when the model
provides one (FMU fmi2GetDirectionalDerivative -- the reference's
mdl_jac path, omu/Omu_Model.C setup_jac), else central finite
differences with the reference's perturbation size policy
(hqp/Hqp_Docp.C:1098: dv = 1e-4|v| + 1e-6).

Time is a stage-grid constant, not an optimization variable, so the JVP
ignores the t tangent (free-final-time problems scale time through an
extra state instead, as in Prg_DynamicOpt's time-scale variable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hqp_tpu.omu.model import Model


def _fd_jacobian(fn, t, x, u, m):
    """Central-difference Jacobian [m, nx+nu] of fn(t, x, u) on host."""
    v = np.concatenate([x, u])
    nx = x.shape[0]
    J = np.zeros((m, v.shape[0]))
    for j in range(v.shape[0]):
        dv = 1e-4 * abs(v[j]) + 1e-6
        vp = v.copy()
        vm = v.copy()
        vp[j] += dv
        vm[j] -= dv
        J[:, j] = (np.asarray(fn(t, vp[:nx], vp[nx:]))
                   - np.asarray(fn(t, vm[:nx], vm[nx:]))) / (2 * dv)
    return J


class HostedModel(Model):
    """Model protocol over an hxi evaluator.

    Continuous models (evaluator.nx > 0) provide ``ode``; discrete models
    (nxd > 0) provide ``dt_update``.  Parameters are bound at evaluator
    construction (S-function parameters / FMU start values), so
    ``npar = 0`` from the optimizer's point of view.
    """

    def __init__(self, evaluator):
        self.ev = evaluator
        self.discrete = evaluator.nx == 0 and evaluator.nxd > 0
        self.nx = evaluator.nxd if self.discrete else evaluator.nx
        self.nu = evaluator.nu
        self.ny = evaluator.ny
        self.npar = 0
        self.p0 = ()

        jac = getattr(evaluator, "jacobian", None)
        if self.discrete:
            self._upd = self._wrap(evaluator.update, self.nx, None)
        else:
            self._ode = self._wrap(evaluator.derivatives, self.nx, jac)
        self._out = self._wrap(evaluator.outputs, self.ny, None)

    def _wrap(self, fn, m, jac):
        nx, nu = self.nx, self.nu

        def host_val(t, x, u):
            return np.asarray(fn(float(t), np.asarray(x, np.float64),
                                 np.asarray(u, np.float64)), np.float64)

        def host_jac(t, x, u):
            t = float(t)
            x = np.asarray(x, np.float64)
            u = np.asarray(u, np.float64)
            J = jac(t, x, u) if jac is not None else None
            if J is None:
                J = _fd_jacobian(host_val, t, x, u, m)
            return np.asarray(J, np.float64)

        @jax.custom_jvp
        def g(t, x, u):
            return jax.pure_callback(
                host_val, jax.ShapeDtypeStruct((m,), jnp.float64),
                t, x, u, vmap_method="sequential")

        @g.defjvp
        def g_jvp(primals, tangents):
            t, x, u = primals
            _, dx, du = tangents
            y = g(t, x, u)
            J = jax.pure_callback(
                host_jac, jax.ShapeDtypeStruct((m, nx + nu), jnp.float64),
                t, x, u, vmap_method="sequential")
            dy = J[:, :nx] @ dx + J[:, nx:] @ du
            return y, dy

        return g

    # -- Model protocol --------------------------------------------------------
    def ode(self, t, x, u, p):
        if self.discrete:
            raise TypeError("discrete hosted model has no ODE; use DTOpt")
        return self._ode(jnp.asarray(t, jnp.float64), x, u)

    def outputs(self, t, x, u, p):
        return self._out(jnp.asarray(t, jnp.float64), x, u)

    def dt_update(self, t, x, u, p):
        """Discrete-time state update x+ = f(t, x, u) (mdlUpdate role)."""
        if not self.discrete:
            raise TypeError("continuous hosted model has no dt_update")
        return self._upd(jnp.asarray(t, jnp.float64), x, u)

    def default_p(self):
        return jnp.zeros((0,))
